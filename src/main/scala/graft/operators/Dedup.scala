package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design (100 TB): every variant is shuffle-bounded — candidates come
  * from equality joins on fingerprints/band-keys (never a cross join); the
  * only O(n^2) work is inside tiny candidate buckets. The DuckDB oracles ARE
  * brute-force O(n^2) — feasible only because verification runs at sf0.01;
  * the Spark side never materializes the quadratic space.
  */
object Dedup {

  /** distinct word tokens of `text` */
  private def tokens: Column = array_distinct(split(col("text"), " "))

  /** exact token-set Jaccard between two pre-tokenized columns; an exact
    * integer ratio evaluated in double => engine-identical. */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b))

  private val NumHashes = 128 // minhash functions (xxhash64 seeded by index)
  private val BandR = 2 // rows per band -> 64 bands

  /** DuckDB brute-force token-set jaccard pair query (oracle side). */
  private def oJaccardPairs(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) s FROM documents)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
       |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= $threshold
       |ORDER BY a_id, b_id""".stripMargin

  /** 32-bit SimHash from the high bit of each md5 hex nibble of each
    * distinct token: bit_k = majority over tokens of (hexchar_k >= '8').
    * Pure string/integer ops => identical in Spark and DuckDB. */
  private def simhashDF(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens).as("tok"))
      .withColumn("h", md5(col("tok").cast(BinaryType)))
    val sums = (1 to 32).map(k =>
      sum(when(substring(col("h"), k, 1) >= "8", 1).otherwise(-1)).as(s"s$k"))
    val fp = (1 to 32).map(k =>
      when(col(s"s$k") > 0, lit(1L << (k - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    toks.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** Shared oracle CTE computing the same 32-bit simhash in DuckDB. */
  private def oSimhashCte: String = {
    val sums = (1 to 32)
      .map(k => s"SUM(CASE WHEN substring(md5(tok), $k, 1) >= '8' THEN 1 ELSE -1 END) AS s$k")
      .mkString(",\n    ")
    val fp = (1 to 32)
      .map(k => s"(CASE WHEN s$k > 0 THEN CAST(${1L << (k - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
       |bits AS (SELECT doc_id,
       |    $sums
       |  FROM toks GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fp AS simhash FROM bits)""".stripMargin
  }

  val queries: Seq[GQuery] = Seq(

    // Exact dedup: hash-groupBy on a content fingerprint. At scale this is
    // one shuffle on the fingerprint (map-side partial agg applies).
    GQuery("d01_dedup_exact", (s, d) => {
      val w = Window.partitionBy(col("fp"))
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("fp"))
        .withColumn("n_copies", count(lit(1)).over(w))
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
        .select("doc_id", "fp", "n_copies", "keep_id", "is_dup")
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id, fp, n_copies, keep_id, doc_id <> keep_id AS is_dup
             |FROM (SELECT doc_id, md5(text) AS fp,
             |        COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
             |        MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // MinHash + LSH near-dup pairs, exact-verified. 128 minhashes, 64 bands
    // of r=2: at J>=0.8 the miss probability per pair is (1-J^2)^64 < 1e-28,
    // so the LSH candidate set provably covers the brute-force oracle.
    // Scale: only equality-join on (band, h1, h2) buckets — no cross join.
    GQuery("d02_minhash_lsh", (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), tokens.as("toks"))
      val exploded = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      val mh = exploded.groupBy("doc_id").agg(
        min(xxhash64(lit(0), col("tok"))).as("mh0"),
        (1 until NumHashes).map(i => min(xxhash64(lit(i), col("tok"))).as(s"mh$i")): _*)
      val bandCols = (0 until NumHashes / BandR).map { b =>
        struct(lit(b).as("band"), col(s"mh${2 * b}").as("h1"), col(s"mh${2 * b + 1}").as("h2"))
      }
      val banded = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      candidates
        .join(docs.select(col("doc_id").as("a_id"), col("toks").as("a_toks")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("toks").as("b_toks")), "b_id")
        .withColumn("jaccard", jaccard(col("a_toks"), col("b_toks")))
        .filter(col("jaccard") >= 0.8)
        .select("a_id", "b_id", "jaccard")
        .orderBy("a_id", "b_id")
    },
      Some(oJaccardPairs(0.8))),

    // Character n-gram (3-gram) Jaccard within language blocks — exact
    // similarity, blocking keeps the pair space bounded per block.
    GQuery("d03_ngram_jaccard", (s, d) => {
      val g = Tables.documents(s, d)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"),
          array_distinct(expr(
            "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")).as("s"))
      g.as("a").join(g.as("b"),
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .withColumn("jaccard", jaccard(col("a.s"), col("b.s")))
        .filter(col("jaccard") >= 0.6)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"), col("jaccard"))
        .orderBy("a_id", "b_id")
    },
      Some("""WITH g AS (SELECT doc_id, lang,
             |    list_distinct([substring(text, i, 3) for i in range(1, length(text) - 1)]) s
             |  FROM documents WHERE length(text) >= 3)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
             |FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.6
             |ORDER BY a_id, b_id""".stripMargin)),

    // SimHash fingerprints (32-bit, md5-nibble bits — engine-portable).
    GQuery("d04_simhash", (s, d) =>
      simhashDF(s, d).orderBy("doc_id"),
      Some(s"""WITH $oSimhashCte
              |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin)),

    // SimHash near-dup pairs: hamming(a,b) <= 6 on the 32-bit fingerprint.
    // 8 bands x 4 bits: any pair with <= 7 differing bits shares at least
    // one clean band (pigeonhole) => banding has PROVABLY exact recall.
    GQuery("d05_simhash_pairs", (s, d) => {
      val fp = simhashDF(s, d)
      val bandCols = (0 until 8).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), 4 * b).bitwiseAND(lit(15L)).as("key"))
      }
      val banded = fp.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      banded.as("x").join(banded.as("y"),
          col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          col("x.simhash").as("a_fp"), col("y.simhash").as("b_fp"))
        .distinct()
        .withColumn("hamming",
          bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast(IntegerType))
        .filter(col("hamming") <= 6)
        .select("a_id", "b_id", "hamming")
        .orderBy("a_id", "b_id")
    },
      Some(s"""WITH $oSimhashCte
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
              |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
              |ORDER BY a_id, b_id""".stripMargin))
  )
}
