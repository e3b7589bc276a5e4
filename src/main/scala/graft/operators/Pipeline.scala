package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end batch curation pipeline — the composition the individual
  * t/d operators exist for, as ONE verifiable query: language filter →
  * quality gate → prefix-fingerprint dedup → benchmark decontamination,
  * reporting the funnel (documents surviving each stage). The streaming
  * form lives in graft.streaming (CDC tail → watermark dedup → gpx sink);
  * this is the batch backbone a training-data refresh runs.
  *
  * Scale shape: stages 1–2 are partition-local expression math (no
  * shuffle, persisted once for the funnel's multi-branch consumption);
  * stage 3 is ONE shuffle on the content fingerprint; stage 4's anti
  * join is AQE-promoted to broadcast when the benchmark set is actually
  * small (never forced: the synthetic stand-in grows with the corpus);
  * the funnel counts are partial-aggregated. Nothing here collects
  * unbounded state to the driver — at 100 TB the plan is the same five
  * stages with bigger partitions.
  */
object Pipeline {

  val queries: Seq[GQuery] = Seq(

    GQuery("p01_curation_pipeline", (s, d) => {
      import graft.CacheScope.Trackable
      val docs = Tables.documents(s, d)
      // stage 1: language id (t01 semantics), keep argmax == 'en'.
      // `.tracked`: the funnel consumes enDocs (and q below) from
      // MULTIPLE branches, and stages 1-2 are shuffle-free map lineage
      // that exchange reuse cannot deduplicate — unpersisted, the
      // 12-replace language scorer would re-run over the corpus once per
      // consuming branch
      val scored = TextOps.markers.foldLeft(docs) {
        case (df, (lang, ws)) =>
          df.withColumn(s"${lang}_score", ws.map(TextOps.cnt).reduce(_ + _))
      }
      val Seq(en, es, de, fr) =
        Seq("en_score", "es_score", "de_score", "fr_score").map(col)
      val enDocs = scored
        .filter(en >= es && en >= de && en >= fr)
        .select("doc_id", "text")
        .tracked
      // stage 2: quality gate (t02 measures): enough tokens AND at least
      // one stopword hit (drops non-prose junk)
      val q = enDocs
        .withColumn("n_tokens",
          (length(trim(col("text"))) -
            length(expr("replace(trim(text), ' ', '')")) + 1).cast(IntegerType))
        .withColumn("stop_hits",
          TextOps.cnt("the") + TextOps.cnt("and") + TextOps.cnt("a"))
        .filter(col("n_tokens") >= 10 && col("stop_hits") >= 1)
        .select("doc_id", "text")
        .tracked
      // stage 3: prefix-fingerprint dedup, keep the first doc per key —
      // the cheap first collapse a curation run does before the heavier
      // MinHash/SimHash passes (d02+): near-dups in this corpus share
      // prefixes, exact md5 of the full text would collapse nothing.
      // One shuffle on the fingerprint (d01 shape).
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val dd = q
        .withColumn("fp", md5(substring(col("text"), 1, 64).cast(BinaryType)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "fp")
      // stage 4: decontamination (d09 shape): drop anything whose content
      // matches the benchmark sample (synthetic: every 97th corpus doc).
      // NO forced broadcast: the stand-in benchmark is 1/97th of the
      // CORPUS, i.e. it grows linearly — a broadcast() hint would push a
      // corpus-proportional set past autoBroadcastJoinThreshold into the
      // driver and OOM at stretch scale (d09 documents and avoids the
      // same hazard). AQE promotes the join to broadcast whenever the
      // set actually is small — true for any real benchmark suite.
      val bench = docs.filter(col("doc_id") % 97 === 0)
        .select(md5(substring(col("text"), 1, 64).cast(BinaryType)).as("bfp"))
        .distinct()
      val clean = dd.join(bench, dd("fp") === bench("bfp"), "left_anti")
      // the funnel: documents surviving each stage
      docs.agg(count(lit(1)).as("n_docs")).select(lit("0_corpus").as("stage"), col("n_docs"))
        .unionByName(enDocs.agg(count(lit(1)).as("n_docs"))
          .select(lit("1_lang_en").as("stage"), col("n_docs")))
        .unionByName(q.agg(count(lit(1)).as("n_docs"))
          .select(lit("2_quality").as("stage"), col("n_docs")))
        .unionByName(dd.agg(count(lit(1)).as("n_docs"))
          .select(lit("3_dedup").as("stage"), col("n_docs")))
        .unionByName(clean.agg(count(lit(1)).as("n_docs"))
          .select(lit("4_decontaminated").as("stage"), col("n_docs")))
        .orderBy("stage")
    },
      Some {
        val sc = TextOps.markers.map { case (lang, ws) =>
          s"${ws.map(TextOps.oCnt).mkString(" + ")} AS ${lang}_score"
        }.mkString(",\n    ")
        s"""WITH scored AS (
           |  SELECT doc_id, text,
           |    $sc
           |  FROM documents),
           |en AS (
           |  SELECT doc_id, text FROM scored
           |  WHERE en_score >= es_score AND en_score >= de_score
           |    AND en_score >= fr_score),
           |q AS (
           |  SELECT doc_id, text FROM (
           |    SELECT doc_id, text,
           |      CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS INT) AS n_tokens,
           |      ${TextOps.oCnt("the")} + ${TextOps.oCnt("and")} + ${TextOps.oCnt("a")} AS stop_hits
           |    FROM en) t
           |  WHERE n_tokens >= 10 AND stop_hits >= 1),
           |dd AS (
           |  SELECT doc_id, md5(substr(text, 1, 64)) AS fp FROM (
           |    SELECT doc_id, text,
           |      ROW_NUMBER() OVER (PARTITION BY md5(substr(text, 1, 64)) ORDER BY doc_id) AS rn
           |    FROM q) t
           |  WHERE rn = 1),
           |bench AS (
           |  SELECT DISTINCT md5(substr(text, 1, 64)) AS bfp FROM documents
           |  WHERE doc_id % 97 = 0),
           |clean AS (
           |  SELECT doc_id FROM dd WHERE fp NOT IN (SELECT bfp FROM bench))
           |SELECT stage, n_docs FROM (
           |  SELECT '0_corpus' AS stage, COUNT(*) AS n_docs FROM documents
           |  UNION ALL SELECT '1_lang_en', COUNT(*) FROM en
           |  UNION ALL SELECT '2_quality', COUNT(*) FROM q
           |  UNION ALL SELECT '3_dedup', COUNT(*) FROM dd
           |  UNION ALL SELECT '4_decontaminated', COUNT(*) FROM clean) t
           |ORDER BY stage""".stripMargin
      })
  )
}
