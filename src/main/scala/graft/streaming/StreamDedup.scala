package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous-ingestion form of the
  * batch d01 operator: documents arrive on a stream and only the FIRST
  * occurrence of each content fingerprint passes through.
  *
  * Scale: `dropDuplicatesWithinWatermark` keys state by the md5
  * fingerprint (one shuffle), and the event-time watermark BOUNDS the
  * state — a fingerprint older than the watermark horizon is evicted, so
  * state is O(arrival rate x horizon), never O(corpus). That is the only
  * state policy that survives an unbounded stream; global-forever dedup
  * of 100 TB/day needs the batch d01/d06 pass over the stored table
  * instead (both views exist here, like the reference's retina
  * (streaming) vs storage (batch) split).
  */
object StreamDedup {

  /** NULL-text rule shared by both operators: a null document is NEVER a
    * duplicate of anything (there is no content to equal). Without the
    * rule the two paths were silently wrong in OPPOSITE directions:
    * dropDuplicates treats NULL keys as equal (firstSeen kept one
    * null-text row and discarded every later one), while an anti join
    * never matches NULL (screen passed them all). firstSeen realizes the
    * rule with a per-row unique surrogate fingerprint for null text, so
    * the state store never equates two null rows. */
  private def fingerprint(textCol: String) =
    coalesce(md5(col(textCol).cast("binary")),
      concat(lit("null-"), expr("uuid()")))

  /** rows: (ts, text, meta...) with an event-time column `ts`.
    * Emits the first-seen row per content fingerprint, with fingerprints
    * forgotten once older than `horizon` (e.g. "10 minutes"). The output
    * carries the internal `fp` column; callers with their own `fp`
    * column must rename theirs first (documented clobber). */
  def firstSeen(rows: DataFrame, tsCol: String, textCol: String,
      horizon: String): DataFrame =
    rows
      .withColumn("fp", fingerprint(textCol))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming ingest screen against a PERSISTED corpus — the streaming
    * form of the batch d08 incremental screen: an arriving doc is dropped
    * when its content fingerprint already exists in the stored corpus
    * table. Implemented as a stream-static LEFT ANTI join (stream side
    * left, the only orientation Structured Streaming allows), so each
    * micro-batch probes the corpus with a normal batch join plan:
    * broadcast when the fingerprint projection is small, shuffled hash
    * otherwise. With a DSv2 corpus source (gpx: latest-snapshot listing at
    * planning time) the static side re-resolves per micro-batch, picking
    * up corpus compactions/appends between batches; a DSv1 file relation
    * (spark.read.parquet) pins its file listing when the DataFrame is
    * created, so pass a gpx/DSv2 table — or re-create the corpus frame —
    * when mid-stream appends must screen. No streaming state at
    * all: the corpus table IS the state, which is the only form that
    * survives a 100 TB corpus (watermark state cannot hold it).
    *
    * `corpus` must expose one `fp` column (md5 of text, the d01/t04
    * fingerprint). Compose with [[firstSeen]] upstream to also drop
    * within-stream duplicates that the corpus has not absorbed yet. */
  def screenAgainstCorpus(rows: DataFrame, textCol: String,
      corpus: DataFrame): DataFrame =
    rows
      // plain md5 here: a NULL fp never matches an anti-join key, which
      // already realizes the shared null-text rule (never a duplicate)
      .withColumn("fp", md5(col(textCol).cast("binary")))
      .join(corpus.select(col("fp")), Seq("fp"), "left_anti")
}
