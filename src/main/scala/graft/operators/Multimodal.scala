package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * Real image/audio decode libraries are not in this container, so the
  * decode step is a clearly-marked deterministic fake — but the Spark-side
  * plumbing (binary columns, schema, partition-parallel batch decode via
  * mapPartitions, metadata extraction) is real and is what matters at
  * 100 TB: payload bytes never leave the executor, decode is per-partition
  * streaming, and metadata fields are ordinary pushdown-able columns.
  */
object Multimodal {

  /** Deterministic FAKE decoder (stands in for an image codec): derives
    * pseudo width/height/brightness from payload bytes. Replace the body
    * with a real codec when libraries are available.
    *
    * The per-byte brightness scan is DELIBERATE even where no consumer
    * reads the column: it is the stand-in for real codec cost (a decode
    * that touched no payload bytes would make the m02/m04 batch-decode
    * timings meaninglessly cheap relative to a real deployment). */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Double) = {
    val len = payload.length
    var sum = 0L
    var i = 0
    while (i < len) { sum += (payload(i) & 0xff); i += 1 }
    val width = 16 + (len % 640)
    val height = 16 + ((len * 7) % 480)
    val brightness = if (len == 0) 0.0 else sum.toDouble / len
    (width, height, brightness)
  }

  /** documents text encoded as a binary "payload" column — the multimodal
    * table shape: (id, payload binary, mime string, meta...). */
  def payloads(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      col("source"))

  /** Batch decode via mapPartitions: one decoder instance per partition,
    * streaming rows — the Scala analog of a Pandas-UDF batch decode. */
  def decoded(s: SparkSession, d: String): DataFrame = {
    val in = payloads(s, d)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("brightness", DoubleType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    in.select("doc_id", "payload").mapPartitions { rows =>
      // per-partition decoder setup would go here (codec init, etc.)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        // null payload -> null decoded fields (matches the oracle's
        // octet_length(NULL)/derived-NULL behavior; an NPE here would
        // kill the task instead of degrading the row)
        if (payload == null) Row(id, null, null, null, null)
        else {
          val (w, h, b) = fakeDecode(payload)
          Row(id, payload.length, w, h, b)
        }
      }
    }
  }

  val queries: Seq[GQuery] = Seq(

    // Metadata extraction over binary payloads — expression-only path
    // (octet_length / sha256 / deterministic derived fields), fully
    // oracle-checkable.
    GQuery("m01_multimodal_meta", (s, d) =>
      payloads(s, d)
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("byte_len"),
          sha2(col("payload"), 256).as("sha"),
          (octet_length(col("payload")) % 640 + 16).as("fake_width"),
          (octet_length(col("payload")) * 7 % 480 + 16).as("fake_height"),
          col("mime"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
             |  sha256(text) AS sha,
             |  CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS fake_width,
             |  CAST(octet_length(encode(text)) * 7 % 480 + 16 AS INT) AS fake_height,
             |  'application/octet-stream' AS mime
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // Batch decode through mapPartitions (the stubbed codec path) + an
    // aggregation over decoded metadata. byte_len/width/height are
    // integer-deterministic; brightness is an integer-sum / length ratio
    // => engine-exact doubles.
    GQuery("m02_multimodal_decode", (s, d) =>
      decoded(s, d)
        .groupBy((col("byte_len") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("width")).as("min_w"),
          max(col("height")).as("max_h"))
        .orderBy("bucket"),
      Some("""SELECT CAST(octet_length(encode(text)) % 10 AS INT) AS bucket,
             |  COUNT(*) AS n,
             |  CAST(MIN(16 + octet_length(encode(text)) % 640) AS INT) AS min_w,
             |  CAST(MAX(16 + (octet_length(encode(text)) * 7) % 480) AS INT) AS max_h
             |FROM documents
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Video frame sampling — the third multimodal plumbing shape after
    // metadata-extract (m01) and batch-decode (m02): one input payload row
    // fans out to N sampled-frame rows (1 frame per "second" of fake
    // video). The expansion runs as a streaming flatMap inside
    // mapPartitions (a real frame grabber would seek/decode per sample
    // here): payload bytes never leave the executor, output rows stream
    // without buffering a document's full frame list, and the fan-out
    // factor is bounded by the sampling rate, not the video length.
    // fps/frame-count/brightness are deterministic functions of the
    // payload byte length, so the whole fan-out is oracle-checkable.
    GQuery("m03_frame_sample", (s, d) => {
      val in = payloads(s, d)
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("ts_ms", LongType),
        StructField("brightness", IntegerType)))
      implicit val enc = RowEncoder.encoderFor(outSchema)
      in.select("doc_id", "payload").mapPartitions { rows =>
        // per-partition codec/frame-grabber init would go here
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          // a null payload has no frames (the oracle's range(0, NULL)
          // unnests to zero rows)
          if (payload == null) Iterator.empty
          else {
            val len = payload.length
            val fps = 1 + len % 24 // fake container metadata
            val seconds = 1 + len % 10 // fake duration, 1 sample/second
            (0 until seconds).iterator.map { k =>
              val frameIdx = k * fps
              // 64-bit product: DuckDB promotes len * BIGINT k, and an
              // Int wrap past ~9.9 MB payloads would go negative here
              Row(id, frameIdx, k * 1000L,
                ((len.toLong * (frameIdx + 1)) % 256L).toInt)
            }
          }
        }
      }.orderBy("doc_id", "frame_idx")
    },
      Some("""WITH p AS (
             |  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS len
             |  FROM documents),
             |f AS (SELECT doc_id, len, 1 + len % 24 AS fps,
             |             1 + len % 10 AS n FROM p),
             |k AS (SELECT doc_id, len, fps, unnest(range(0, n)) AS k FROM f)
             |SELECT doc_id,
             |  CAST(k * fps AS INT) AS frame_idx,
             |  CAST(k * 1000 AS BIGINT) AS ts_ms,
             |  CAST(len * (k * fps + 1) % 256 AS INT) AS brightness
             |FROM k
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // Decode-then-dedup — the fourth multimodal plumbing shape: payloads
    // are batch-decoded (mapPartitions, codec per partition), a compact
    // perceptual signature is derived from the decoded features (here the
    // deterministic fake (width, height) geometry + coarse size bucket —
    // a real pHash would hash decoded pixels in the same slot), and docs
    // collapse into signature groups with one shuffle (partial-agg
    // groupBy, no window). Payload bytes never leave the executor; only
    // the 3-int signature travels. The signature is length-derived, so
    // the whole pipeline stays oracle-checkable.
    GQuery("m04_phash_dedup", (s, d) => {
      decoded(s, d)
        .withColumn("sig",
          (col("width").cast(LongType) * 480 + col("height")) * 16 +
            (col("byte_len") % 16))
        .groupBy("sig")
        .agg(count(lit(1)).as("n_copies"),
          min(col("doc_id")).as("keep_id"))
        .filter(col("n_copies") > 1)
        .orderBy("sig")
    },
      Some("""WITH p AS (SELECT doc_id,
             |    CAST(octet_length(encode(text)) AS INT) AS len FROM documents),
             |s AS (SELECT doc_id,
             |    (CAST(16 + len % 640 AS BIGINT) * 480 +
             |     (16 + (len * 7) % 480)) * 16 + len % 16 AS sig
             |  FROM p)
             |SELECT sig, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
             |FROM s GROUP BY sig HAVING COUNT(*) > 1
             |ORDER BY sig""".stripMargin))
  )
}
