package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 stretch bench (VERDICT r8 #7): runs every expensive query at 10x
  * the per-round benchmark scale to surface skew, spill and
  * candidate-blowup behavior that sf0.1 cannot (the AQE skew-join and
  * salted paths only matter when partitions actually get heavy).
  *
  * The sf1 dataset is derived from sf0.1 by a SEMANTICS-PRESERVING 10x
  * replication: each copy shifts every join/entity key by a large constant
  * divisible by the moduli the queries filter on (so per-copy selectivity
  * is unchanged), token-suffixes document text per copy (disjoint token
  * spaces — near-dup pair density scales exactly linearly, the honest
  * scaling), and perturbs embeddings per copy (no artificial exact-dup
  * vectors at cosine 1.0). Dimensions (nation/region) stay single-copy.
  *
  * Output: ONE JSON line with, per query, the sf0.1 time, the sf1 time,
  * and the superlinearity ratio t_sf1 / (10 * t_sf0.1) — the gate is
  * ratio <= 2 for every query (a ratio well under 1 just means sf0.1 is
  * fixed-overhead-dominated at 32 cores).
  */
object StretchBench {

  /** divisible by every modulus the query suite filters on (lcm(1..30)) */
  private val Shift = 2329089562800L

  /** content stamp of the SOURCE dir (names + lengths + mtimes, one
    * level of nesting for parquet dirs): the derived sf1 corpus must be
    * REGENERATED when the driver regenerates testdata — a factor-only
    * ready marker would silently reuse stale derived data and every
    * ratio/candidate stamp would compare apples to oranges */
  private def srcStamp(src: String): String = {
    def sig(f: java.io.File): Seq[(String, Long, Long)] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq
          .sortBy(_.getName).flatMap(sig)
      else Seq((f.getName, f.length, f.lastModified))
    val h = sig(new java.io.File(src)).hashCode
    (h & 0x7fffffff).toString
  }

  /** every bench row >1 s at sf0.1, plus the near-1 s rows the round-11
    * verdict called out (v06/v07, q33/q39) — the policy is "no heavy row
    * without a stretch witness". The x-rows carry ~1 s of FIXED
    * streaming-engine setup in both numerator and denominator
    * (unsubtracted — it only pushes the ratio DOWN, so a passing ratio
    * is conservative); x03 additionally forks its producer JVM per run.
    * d05 runs over the replicated documents corpus, which is
    * duplicate-heavy by construction (each copy carries the source's
    * full near-dup cluster structure), so its banded-distinct-
    * fingerprint path is exercised at 10x the cluster mass. */
  private val TopQueries = Seq(
    "d02_minhash_lsh", "d03_ngram_jaccard", "d05_simhash_pairs",
    "d06_dup_clusters",
    "d08_incremental_dedup", "d10_indexed_incremental_dedup",
    "v03_knn_ivf", "v05_cosine_pairs_lsh", "v06_knn_ivf_indexed",
    "v07_knn_sq8",
    "q33_tpch_q8_market_share", "q39_tpch_q18_large_volume",
    "q42_tpch_q21_waiting_supplier", "q43_tpch_q2_min_cost_supplier",
    "p01_curation_pipeline",
    // the w-family heavy hitters (VERDICT r9 #8): the ordered gpx hits
    // layout + high-cardinality group-bys at 10x the rows
    "w04_wide_url_traffic", "w07_wide_date_region", "w22_wide_sketch_rollup",
    // the pipelined-exchange family: producer/consumer overlap under 10x
    // the streamed row groups (x03 = the cross-JVM socket path)
    "x01_exchange_agg", "x02_exchange_join", "x03_exchange_remote_agg")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRETCH_FACTOR", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_STRETCH_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft_stretch_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    generate(spark, src, out, factor)

    // resolve which registered queries exist under the wanted prefixes
    val queries = TopQueries.flatMap { want =>
      SparkEntry.queries.keys.find(k =>
        k == want || k.startsWith(want.takeWhile(_ != '_') + "_")).map(k =>
        k -> SparkEntry.queries(k))
    }.distinctBy(_._1)

    // the pair-finders whose candidate stage gets counted per leg: their
    // cost is legitimately output/duplicate-mass-driven, so without
    // per-leg {candidates, outputRows} stamps a future superlinear
    // candidate blowup would be indistinguishable from corpus drift
    val counted = Set("d02", "d03", "d05", "d06", "d08", "d10", "v05")

    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    /** (seconds, output rows, candidate rows, loadavg at leg start,
      * loadavg at leg end) — candidates counted UNTIMED after the timed
      * window, from the exact plan the timed run registered
      * (Dedup.PairStats, construction-time). Per-LEG loadavg (VERDICT
      * r14 #8): a ratio regression must be attributable from the
      * artifact alone — one global end-of-run loadavg cannot say which
      * leg a co-tenant spike actually hit (the r14 d03x 0.798-vs-0.769
      * discussion burned a paragraph on exactly that). */
    def timeAt(dir: String, name: String,
        fn: (SparkSession, String) => DataFrame)
        : (Double, Long, Long, Double, Double) = {
      // construction pass builds any cachedDir materialization untimed
      // (indexes, gpx layouts) — timed rows measure the query, like Bench
      try { fn(spark, dir); () } catch { case _: Throwable => () }
      CacheScope.release(blocking = true)
      val l0 = loadavg
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val l1 = loadavg
      val short = name.takeWhile(_ != '_')
      // guarded: the untimed count re-executes the candidate stage, and a
      // transient failure there must cost ONE stamp (-1 sentinel), never
      // the whole multi-hour run's artifact
      val cand =
        if (!counted(short)) -1L
        else try operators.Dedup.candidatePlan(short)
          .map(_.count()).getOrElse(-1L)
        catch { case _: Throwable => -1L }
      CacheScope.release(blocking = true)
      (dt, n, cand, l0, l1)
    }

    def s3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = queries.map { case (name, fn) =>
      val (t01, n01, c01, a0, a1) = timeAt(src, name, fn)
      val (t1, n1, c1, b0, b1) = timeAt(out, name, fn)
      val ratio = t1 / (factor * t01)
      (name.takeWhile(_ != '_'), t01, t1, ratio, (n01, n1, c01, c1),
        (a0, a1, b0, b1))
    }
    // d03 additionally at a corpus built to STRADDLE the old 4096-gram
    // mask gate (sf0.1 vocab is ~377, so 12 near-disjoint copies land at
    // ~4500 > 4096): under the pre-r11 tiering this flipped every pair
    // onto the ~10x array verify at once; the unified mask tier must
    // degrade linearly instead. Denominator is factor-scaled like every
    // other row.
    val straddle = queries.find(_._1.startsWith("d03")).map { case (_, fn) =>
      val xf = 27
      val xdir = s"${out}_straddle$xf"
      val ready = new java.io.File(s"$xdir/_READY_v3_${xf}_${srcStamp(src)}")
      if (!ready.exists()) {
        new java.io.File(xdir).mkdirs()
        writeDocCopies(spark, src, xdir, xf, wide = true)
        ready.createNewFile()
      }
      // the straddle is only a straddle if the corpus vocabulary
      // measurably crossed the old 4096-gram gate — record it in the
      // artifact rather than trusting the generator (a 12-copy narrow
      // variant measured 2145: sentinel boundary grams collapse
      // cross-word diversity to O(words))
      val vocab = spark.read.parquet(s"$xdir/documents.parquet")
        .filter(length(col("text")) >= 3)
        .select(explode(graft.functions.VectorFunctions
          .trigram_ids(col("text"))).as("g"))
        .distinct().count()
      require(vocab > 4096,
        s"straddle corpus failed to cross the 4096-gram gate: $vocab")
      val t01 = rows.find(_._1 == "d03").map(_._2)
        .getOrElse(timeAt(src, "d03", fn)._1)
      val (tx, nx, cx, x0, x1) = timeAt(xdir, "d03", fn)
      ("d03x", t01, tx, tx / (xf * t01), vocab, xf, nx, cx, (x0, x1))
    }
    def counts(t: (Long, Long, Long, Long)): String = t match {
      case (n01, n1, c01, c1) =>
        val base = s""","rows01":$n01,"rows1":$n1"""
        if (c01 >= 0 || c1 >= 0) base + s""","cand01":$c01,"cand1":$c1"""
        else base
    }
    // per-leg loadavg stamps: [start, end] around the timed leg only
    def legLoads(a0: Double, a1: Double, b0: Double, b1: Double): String =
      s""","ld01":[${s3(a0)},${s3(a1)}],"ld1":[${s3(b0)},${s3(b1)}]"""
    val qjson = (rows.map { case (k, t01, t1, r, cs, (a0, a1, b0, b1)) =>
      s""""$k":{"sf01":${s3(t01)},"sf1":${s3(t1)},"ratio":${s3(r)}""" +
        s"""${counts(cs)}${legLoads(a0, a1, b0, b1)}}"""
    } ++ straddle.map { case (k, t01, t1, r, vocab, xf, nx, cx, (x0, x1)) =>
      s""""$k":{"sf01":${s3(t01)},"sf1":${s3(t1)},"ratio":${s3(r)},""" +
        s""""factor":$xf,"vocab":$vocab,"rows1":$nx,"cand1":$cx,""" +
        s""""ldx":[${s3(x0)},${s3(x1)}]}"""
    }).mkString("{", ",", "}")
    val worst = (rows.map(_._4) ++ straddle.map(_._4)).max
    // loadavg in the artifact + a file copy (the Bench discipline): host
    // load regularly fabricates 3-10x row inflation, and a stretch
    // artifact recorded under load must be identifiable as such
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    val line =
      s"""{"metric":"stretch","factor":$factor,"worst_ratio":${s3(worst)},""" +
        s""""loadavg":${s3(load)},"queries":$qjson,"src":"$src"}"""
    println(line)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${System.getProperty("java.io.tmpdir")}/graft_stretch.json"),
      line.getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }
    spark.stop()
  }

  /** factor-x replicated documents table under `out` — per-copy random
    * letter PERMUTATION + per-copy word SENTINEL:
    * WORD tokens and CHARACTER trigrams are both (near-)disjoint
    * across copies, so token-level (d02/d08) and char-gram (d03) pair
    * densities scale exactly linearly — the honest 10x. Neither a
    * token suffix nor a Caesar ROTATION is enough: suffixed words
    * share most trigrams with their originals, and rotation preserves
    * letter DIFFERENCES, so rotated trigram images collide across
    * copies (measured: vocab 1903 of a possible 3770, candidates 125M
    * instead of ~10x). The permutation ALONE is not enough either on
    * a small-alphabet corpus: word-BOUNDARY trigrams (letter-letter-
    * space) live in a ~676-element universe, and ten random ~100-
    * element images of it collide heavily (measured round 10: union
    * vocab 1863 instead of ~3770, candidates 119M = 59x instead of
    * 10x, d03 stretch ratio 2.8). Wrapping every word with a
    * copy-unique UPPERCASE sentinel letter puts every boundary
    * trigram in a per-copy-disjoint class while interior trigrams
    * stay in the big 26^3 universe where permutation images are
    * near-disjoint; tokens remain distinct per copy.
    *
    * `wide` widens each copy's permutation TARGET from [a-z] to a random
    * 26-subset of [a-z0-9], applied AFTER the sentinel wrap (wrap first
    * so the word regex sees the original lowercase words; then translate
    * only lowercase letters, leaving the uppercase sentinels untouched):
    * images land in the 36^3 universe, the map is injective (26 distinct
    * targets), and interior grams can never collide with any copy's
    * uppercase sentinel class. The straddle corpus needs ~27 copies to
    * cross the 4096-gram mask gate (sentinel boundary grams scale with
    * WORDS, not word pairs, so per-copy vocabulary is only ~170; see the
    * d03x row). Uppercase sentinels cap `factor` at 27 in wide mode
    * (copy 0 is untransformed; copies 1..26 use 'A'..'Z'). */
  def writeDocCopies(spark: SparkSession, src: String, out: String,
      factor: Int, wide: Boolean = false): Unit = {
    require(!wide || factor <= 27,
      "wide doc replication has 26 sentinel letters (copies 1..26)")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until factor).map { i =>
      val lower = "abcdefghijklmnopqrstuvwxyz"
      def perm(k: Int): String = {
        val rnd = new scala.util.Random(k * 7919 + 13)
        val target = if (wide)
          rnd.shuffle((('a' to 'z') ++ ('0' to '9')).toSeq).take(26)
        else rnd.shuffle(lower.toSeq)
        target.mkString
      }
      val p = perm(i)
      val text = if (i == 0) col("text")
        else {
          val sentinel = ('A' + (i - 1)).toChar.toString
          val wrapped = regexp_replace(col("text"),
            "([a-zA-Z]+)", s"$sentinel$$1$sentinel")
          if (wide) translate(wrapped, lower, p)
          else regexp_replace(
            translate(col("text"), lower + lower.toUpperCase,
              p + p.toUpperCase),
            "([a-zA-Z]+)", s"$sentinel$$1$sentinel")
        }
      docs.select((col("doc_id") + i * Shift).as("doc_id"), text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  /** derive the 10x dataset (idempotent: skipped when the marker exists) */
  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    // v2: events replicate too (w-family stretch rows);
    // v3: per-copy word sentinels (boundary-trigram disjointness)
    val ready = new java.io.File(s"$out/_READY_v3_${factor}_${srcStamp(src)}")
    if (ready.exists()) return
    new java.io.File(out).mkdirs()
    def copies(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => tx(df, i)).reduce(_ unionByName _)

    writeDocCopies(spark, src, out, factor)

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    copies(emb) { (df, i) =>
      // deterministic per-copy perturbation: shifts angles, never scales
      // (a pure scale would leave cosine similarity unchanged)
      val vec = if (i == 0) col("embedding")
        else expr(s"transform(embedding, (x, j) -> " +
          s"cast(x + 0.015d * $i * sin(j + $i) as float))")
      df.select((col("vec_id") + i * Shift).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    def shiftCols(t: String, keys: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      copies(df) { (d, i) =>
        keys.foldLeft(d)((acc, k) => acc.withColumn(k, col(k) + i * Shift))
      }.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    shiftCols("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    shiftCols("orders", Seq("o_orderkey", "o_custkey"))
    shiftCols("supplier", Seq("s_suppkey"))
    shiftCols("part", Seq("p_partkey"))
    shiftCols("customer", Seq("c_custkey"))
    // events: 10x the traffic in the SAME time range (each copy shifts
    // event/user ids; the wide-table columns derive from id moduli, so a
    // uniform shift keeps every per-copy distribution — group counts and
    // filter selectivities scale linearly, which is the honest 10x for
    // the w-family's high-cardinality group-bys)
    shiftCols("events", Seq("event_id", "user_id"))
    // dimensions stay single-copy (nation/region are genuine dimensions)
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    ready.createNewFile()
    ()
  }
}
