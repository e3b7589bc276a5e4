package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Answer-equivalence gate for the heavy dedup family at the sf1 stretch
  * scale (VERDICT r13 #5): CORRECTNESS runs the DuckDB oracle at sf0.01
  * and the stretch run proves TIMING at sf1, but nothing proved the
  * answers at the scale where the optimized plans actually diverge from
  * naive ones. DuckDB lives driver-side only, so the oracle here is an
  * INDEPENDENT SPARK PLAN: each query runs twice in one session —
  *
  *   leg A: the shipped plan (mask-tier verify, measured broadcasts,
  *          numbered repartition at defaultParallelism, 32 shuffle
  *          partitions);
  *   leg B: `spark.graft.dedup.referencePlan=true` + 7 shuffle
  *          partitions — array-tier jaccard (different Catalyst
  *          expressions), shuffle joins instead of explicit broadcasts,
  *          a different pinned parallelism for the exploding band joins.
  *
  * and the gate hash-compares (row count, order-independent row hash).
  * Matching answers under structurally different plans is direct
  * evidence the r13 scale fixes optimize WITHOUT altering results —
  * catching exactly the failure class a partition-count- or
  * expression-level bug would introduce (mask vs array jaccard skew,
  * candidate sets depending on task layout, tie-breaks depending on
  * partition order).
  *
  * Output: one JSON line (+ /tmp/graft_dedup_sf1.json); exit 1 on any
  * mismatch. */
object DedupSf1Gate {
  private val Targets = Seq(
    "d02_minhash_lsh", "d03_ngram_jaccard", "d05_simhash_pairs",
    "d06_dup_clusters", "d08_incremental_dedup", "d10_indexed_incremental_dedup")

  /** ANN SERVE cores (VERDICT r14 #5): the approximate family's recall
    * audits run at sf0.01, but probe counts, quantization and bucket
    * pruning are exactly the knobs a scale bug would hide behind — so
    * the serve paths get the same two-leg treatment at sf1. Leg B flips
    * the centroid/query broadcasts and the bucket-prune IN pushdown off
    * (VectorOps honors the same referencePlan flag) under 7 shuffle
    * partitions. v05/v06/v07 serve deterministic values (persisted or
    * per-vector-deterministic candidates, bit-deterministic cosine,
    * id tie-breaks) -> exact hash compare; v03 TRAINS k-means in-run,
    * and float-sum order across a different partitioning legitimately
    * perturbs centroids in the last bits -> compared by (q_id, n_id)
    * top-k OVERLAP >= 90% with equal row counts instead. */
  private val VTargets: Seq[(String, String,
      (org.apache.spark.sql.SparkSession, String) => DataFrame)] = Seq(
    ("v03_knn_ivf", "overlap", operators.VectorOps.knnIvf _),
    ("v05_cosine_pairs_lsh", "hash", operators.VectorOps.cosinePairsLsh _),
    ("v06_knn_ivf_indexed", "hash", operators.VectorOps.knnIvfIndexed _),
    ("v07_knn_sq8", "hash", operators.VectorOps.knnSq8 _))

  /** (rows, order-independent content hash): xxhash64 over the canonical
    * JSON of every row, summed exactly as decimal — column order is
    * pinned by name sort so both legs hash identical canonical strings */
  private[graft] def fingerprint(df: DataFrame): (Long, java.math.BigDecimal) = {
    val cols = df.columns.sorted.map(col)
    val r = df.select(to_json(struct(cols: _*)).as("j"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("j")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("h"))
      .head()
    (r.getLong(0), r.getDecimal(1))
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRETCH_FACTOR", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_STRETCH_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft_stretch_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.localSession(cpus)
    StretchBench.generate(spark, src, out, factor)
    def s3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    var mismatches = 0
    var errs = 0
    val allTargets: Seq[(String, String,
        (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
      Targets.map(n => (n, "hash", SparkEntry.queries(n))) ++ VTargets
    val rows = allTargets.map { case (name, mode, fn) =>
      val short = name.takeWhile(_ != '_')
      try {
        // leg A: shipped plan (construction pass first so cachedDir
        // materializations are not charged to either leg's timing)
        fn(spark, out)
        CacheScope.release(blocking = true)
        val tA0 = System.nanoTime()
        val dfA = fn(spark, out)
        val (nA, hA) = fingerprint(dfA)
        val setA: Set[(Long, Long)] =
          if (mode == "overlap")
            dfA.select(col("q_id").cast("long"), col("n_id").cast("long"))
              .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          else Set.empty
        val tA = (System.nanoTime() - tA0) / 1e9
        CacheScope.release(blocking = true)
        // leg B: reference plan, diverging shuffle layout
        spark.conf.set("spark.graft.dedup.referencePlan", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val (nB, hB, setB, tB) = try {
          val t0 = System.nanoTime()
          val dfB = fn(spark, out)
          val (n, h) = fingerprint(dfB)
          val sB: Set[(Long, Long)] =
            if (mode == "overlap")
              dfB.select(col("q_id").cast("long"), col("n_id").cast("long"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            else Set.empty
          (n, h, sB, (System.nanoTime() - t0) / 1e9)
        } finally {
          spark.conf.unset("spark.graft.dedup.referencePlan")
          spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
        }
        CacheScope.release(blocking = true)
        val overlapPct: Int =
          if (mode != "overlap") -1
          else if (setA.isEmpty) 0
          else (setA.intersect(setB).size * 100) / setA.size
        val ok =
          if (mode == "overlap") nA == nB && nA > 0 && overlapPct >= 90
          else nA == nB && hA.compareTo(hB) == 0
        if (!ok) mismatches += 1
        val cmp =
          if (mode == "overlap") s"overlap=$overlapPct%"
          else s"hashEq=${hA.compareTo(hB) == 0}"
        System.err.println(s"DEDUPSF1 $short rowsA=$nA rowsB=$nB " +
          s"$cmp tA=${s3(tA)} tB=${s3(tB)}${if (ok) "" else " MISMATCH"}")
        val ovField = if (mode == "overlap") s""","overlapPct":$overlapPct""" else ""
        s""""$short":{"rows":$nA,"rowsRef":$nB,"match":$ok$ovField,""" +
          s""""secA":${s3(tA)},"secRef":${s3(tB)}}"""
      } catch {
        case t: Throwable =>
          errs += 1
          spark.conf.unset("spark.graft.dedup.referencePlan")
          spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
          System.err.println(s"DEDUPSF1 $short ERR ${t.getClass.getSimpleName}: " +
            s"${Option(t.getMessage).getOrElse("").take(200)}")
          s""""$short":{"err":"${t.getClass.getSimpleName}"}"""
      }
    }
    val line =
      s"""{"metric":"dedup_sf1_equivalence","mismatches":$mismatches,""" +
      s""""errs":$errs,"cpus":$cpus,"factor":$factor,""" +
      s""""queries":${rows.mkString("{", ",", "}")},"sf":"$out"}"""
    println(line)
    try { java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_dedup_sf1.json"),
      (line + "\n").getBytes("UTF-8")); () }
    catch { case _: Throwable => () }
    println(s"DEDUPSF1 ${if (mismatches == 0 && errs == 0) "PASS" else "FAIL"} " +
      s"mismatches=$mismatches errs=$errs " +
      s"queries=${Targets.size + VTargets.size}")
    spark.stop()
    if (mismatches > 0 || errs > 0) sys.exit(1)
  }
}
