package graft

import org.apache.spark.scheduler._

/** Regression gates for the AQE explode-coalesce pathology class (round
  * 13's flagship scale find): a byte-tiny shuffle feeding a row-exploding
  * join must never collapse to single-task execution. The full-registry
  * sweep at sf1 is [[StageGate]] (a per-round main gating on stage
  * metrics); this spec pins the class's cheapest reliable witnesses into
  * `sbt test` so the numbered-repartition fix cannot regress silently
  * between rounds. */
class StageGateSpec extends GraftSpec {
  private val sf01 = "/root/testdata/sf0.01"

  test("d05 banded candidate join runs at pinned parallelism, not AQE-coalesced to one task") {
    val pairs = SparkEntry.queries("d05_simhash_pairs")(spark, sf01)
    pairs.count()
    val cand = operators.Dedup.candidatePlan("d05")
      .getOrElse(fail("d05 did not register its candidate plan"))
    // .rdd materializes the AQE query stages: the partition count IS the
    // band join's task count (the exploding probe side streams through a
    // broadcast join, so upstream partitioning survives). Pre-fix, AQE
    // coalesced the byte-tiny distinct-fingerprint shuffle to ONE
    // partition and the whole ~70x-exploding join ran in a single task.
    val n = cand.rdd.getNumPartitions
    val pinned = spark.sparkContext.defaultParallelism
    assert(n >= math.min(pinned, 2),
      s"banded candidate join collapsed to $n partition(s) — the " +
        s"AQE-coalesce-exempt numbered repartition (expected ~$pinned) " +
        "is gone or no longer upstream of the join")
  }

  test("d08 fused band join runs at pinned parallelism, not AQE-coalesced to one task") {
    SparkEntry.queries("d08_incremental_dedup")(spark, sf01).count()
    val cand = operators.Dedup.candidatePlan("d08")
      .getOrElse(fail("d08 did not register its candidate plan"))
    // the matched-pair enumeration is CPU-quadratic inside dense band
    // buckets while its input is byte-tiny, so AQE's byte-based
    // coalescing collapsed it to 1-2 tasks (sf0.1: 17 s runSum behind a
    // 3 s single-task wall). The REPARTITION_BY_NUM pin on both join
    // inputs is coalesce-exempt; its partition count survives to the
    // join output.
    val n = cand.rdd.getNumPartitions
    val pinned = spark.sparkContext.defaultParallelism
    assert(n >= math.min(pinned, 2),
      s"d08 band join collapsed to $n partition(s) — the numbered " +
        s"repartition pin (expected ~$pinned) is gone")
  }

  test("v02 scored join streams its corpus side at pinned parallelism (spread witness)") {
    // same single-file exposure v01/v05 had: the broadcast theta join
    // streams the whole q x corpus scoring through the corpus scan's one
    // partition. The numbered repartition is coalesce-exempt, so the
    // witness is the plan carrying it at defaultParallelism.
    // the spread is scan-size-gated (off at test/bench scale where the
    // forced exchange only costs); force it on for the shape witness
    spark.conf.set("spark.graft.vec.spreadMinScanBytes", "0")
    val df =
      try SparkEntry.queries("v02_knn_brute")(spark, sf01)
      finally spark.conf.unset("spark.graft.vec.spreadMinScanBytes")
    val reparts = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition
        if r.shuffle => r.numPartitions
    }
    val pinned = spark.sparkContext.defaultParallelism
    assert(reparts.contains(pinned),
      s"v02 corpus spread (REPARTITION_BY_NUM $pinned) missing from the " +
        s"plan — found $reparts")
    // and the answer is unchanged vs the unspread (default, gated-off)
    // shape — row-identical
    val spreadRows = df.collect().map(_.toString).sorted.toSeq
    val plainRows = SparkEntry.queries("v02_knn_brute")(spark, sf01)
      .collect().map(_.toString).sorted.toSeq
    assert(spreadRows == plainRows, "v02 spread changed the answer")
  }

  test("no query stage at sf0.01 runs >2s of executor time in <=2 tasks (collapse witness at test scale)") {
    // cheap in-test analog of the sf1 sweep over the heavy dedup family:
    // the pathology is scale-amplified but already VISIBLE at sf0.01 as
    // a single-task stage consuming most of the query's runtime
    val stages = scala.collection.mutable.Map.empty[Int, (Long, Int)]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          stages(si.stageId) = (si.taskMetrics.executorRunTime, si.numTasks)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Seq("d02_minhash_lsh", "d05_simhash_pairs", "d08_incremental_dedup")
        .foreach { q =>
          stages.synchronized(stages.clear())
          SparkEntry.queries(q)(spark, sf01).count()
          Thread.sleep(200)
          val collapsed = stages.synchronized(stages.toSeq).filter {
            case (_, (rt, nt)) => nt <= 2 && rt > 2000
          }
          assert(collapsed.isEmpty,
            s"$q ran stages ${collapsed.map(_._1).mkString(",")} with " +
              "<=2 tasks and >2s executor time — explode-coalesce class")
        }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("shipped plan and reference plan agree on every dedup answer (sf0.01 leg of the sf1 gate)") {
    // the fast in-test leg of DedupSf1Gate: same flag, same fingerprint,
    // tiny corpus — catches an expression- or layout-dependent answer
    // change at `sbt test` time; the sf1 run is the per-round artifact
    val names = Seq("d02_minhash_lsh", "d03_ngram_jaccard",
      "d05_simhash_pairs", "d06_dup_clusters", "d08_incremental_dedup",
      "d10_indexed_incremental_dedup")
    names.foreach { name =>
      val a = DedupSf1Gate.fingerprint(SparkEntry.queries(name)(spark, sf01))
      CacheScope.release(blocking = true)
      spark.conf.set("spark.graft.dedup.referencePlan", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val b =
        try DedupSf1Gate.fingerprint(SparkEntry.queries(name)(spark, sf01))
        finally {
          spark.conf.unset("spark.graft.dedup.referencePlan")
          spark.conf.set("spark.sql.shuffle.partitions", "4")
        }
      CacheScope.release(blocking = true)
      assert(a == b, s"$name diverged between shipped and reference plans: $a vs $b")
    }
  }

  test("d06/d07 answers are identical with the CC contraction forced on") {
    // the spanning-forest contraction is edge-count-gated (sf0.01 never
    // reaches it); forcing the threshold to 0 exercises the contracted
    // loop end-to-end on the tiny corpus and pins answer identity
    Seq("d06_dup_clusters", "d07_dedup_keep_best").foreach { name =>
      val a = DedupSf1Gate.fingerprint(SparkEntry.queries(name)(spark, sf01))
      CacheScope.release(blocking = true)
      spark.conf.set("spark.graft.dedup.ccContractMinEdges", "0")
      val b =
        try DedupSf1Gate.fingerprint(SparkEntry.queries(name)(spark, sf01))
        finally spark.conf.unset("spark.graft.dedup.ccContractMinEdges")
      CacheScope.release(blocking = true)
      assert(a == b, s"$name diverged with the CC contraction forced: $a vs $b")
      assert(a._1 > 0, s"$name returned zero rows — vacuous contraction check")
    }
  }

  test("all three d03 verify tiers (mask, varint, array) agree on every answer") {
    // the tier choice is a pure payload/kernel tradeoff — the ANSWER must
    // be identical whichever representation carries the sets (fused
    // popcount masks, delta-varint rank streams, raw sorted-id arrays)
    val legs = Seq("mask", "varint", "array").map { tier =>
      spark.conf.set("spark.graft.dedup.d03VerifyTier", tier)
      try {
        val fp = DedupSf1Gate.fingerprint(
          SparkEntry.queries("d03_ngram_jaccard")(spark, sf01))
        CacheScope.release(blocking = true)
        tier -> fp
      } finally spark.conf.unset("spark.graft.dedup.d03VerifyTier")
    }
    assert(legs.map(_._2).distinct.size == 1,
      s"d03 verify tiers disagree: $legs")
    assert(legs.head._2._1 > 0, "d03 returned zero rows — vacuous tier check")
  }

  test("varint set encoding: jaccard matches the sorted-merge kernel on random sets") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    // random sorted distinct id sets over a skewed id space, including
    // empty sets, singletons, identical pairs and disjoint pairs
    val sets: Seq[(Seq[Long], Seq[Long])] = (0 until 300).map { i =>
      def mk(): Seq[Long] =
        if (rnd.nextInt(20) == 0) Seq.empty
        else (0 until (1 + rnd.nextInt(60)))
          .map(_ => rnd.nextInt(1 << (3 + rnd.nextInt(14))).toLong)
          .distinct.sorted
      val a = mk()
      val b = rnd.nextInt(10) match {
        case 0 => a // identical
        case 1 => mk().filterNot(a.contains) // disjoint-ish
        case _ => (mk() ++ a.take(rnd.nextInt(a.size + 1))).distinct.sorted
      }
      (a, b)
    }
    val dict = sets.flatMap(p => p._1 ++ p._2).distinct.sorted.toArray
    val sp = spark
    import sp.implicits._
    val df = sets.toDF("a", "b")
    val both = df.select(
      graft.functions.VectorFunctions.sorted_jaccard(col("a"), col("b")).as("sj"),
      graft.functions.VectorFunctions.varint_jaccard(
        graft.functions.VectorFunctions.sorted_ids_to_varint(col("a"), dict),
        graft.functions.VectorFunctions.sorted_ids_to_varint(col("b"), dict)).as("vj"))
      .collect()
    both.zipWithIndex.foreach { case (r, i) =>
      val sj = if (r.isNullAt(0)) null else r.getDouble(0)
      val vj = if (r.isNullAt(1)) null else r.getDouble(1)
      assert(sj == vj, s"pair $i: sorted=$sj varint=$vj (${sets(i)})")
    }
  }

  test("ANN serve cores agree between shipped and reference plans (sf0.01 leg of the sf1 gate)") {
    // v05/v06/v07 are value-deterministic (persisted or per-vector
    // candidates, bit-deterministic cosine, id tie-breaks): exact hash.
    // v03 trains k-means in-run — float-sum order across a different
    // partitioning legitimately perturbs centroids — so it compares by
    // top-k (q_id, n_id) overlap, like the sf1 gate.
    import org.apache.spark.sql.functions.col
    val fns: Seq[(String, String,
        (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      ("v03", "overlap", operators.VectorOps.knnIvf _),
      ("v05", "hash", operators.VectorOps.cosinePairsLsh _),
      ("v06", "hash", operators.VectorOps.knnIvfIndexed _),
      ("v07", "hash", operators.VectorOps.knnSq8 _))
    fns.foreach { case (short, mode, fn) =>
      val dfA = fn(spark, sf01)
      val a = DedupSf1Gate.fingerprint(dfA)
      val setA =
        if (mode == "overlap")
          dfA.select(col("q_id").cast("long"), col("n_id").cast("long"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        else Set.empty[(Long, Long)]
      CacheScope.release(blocking = true)
      spark.conf.set("spark.graft.dedup.referencePlan", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val (b, setB) =
        try {
          val dfB = fn(spark, sf01)
          val fp = DedupSf1Gate.fingerprint(dfB)
          val sB =
            if (mode == "overlap")
              dfB.select(col("q_id").cast("long"), col("n_id").cast("long"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            else Set.empty[(Long, Long)]
          (fp, sB)
        } finally {
          spark.conf.unset("spark.graft.dedup.referencePlan")
          spark.conf.set("spark.sql.shuffle.partitions", "4")
        }
      CacheScope.release(blocking = true)
      assert(a._1 > 0, s"$short returned zero rows — vacuous check")
      if (mode == "overlap") {
        assert(a._1 == b._1, s"$short row counts diverged: ${a._1} vs ${b._1}")
        val ov = if (setA.isEmpty) 0 else (setA.intersect(setB).size * 100) / setA.size
        assert(ov >= 90, s"$short top-k overlap $ov% < 90% between plans")
      } else
        assert(a == b, s"$short diverged between shipped and reference plans: $a vs $b")
    }
  }

  test("d10 verify tiers (varint wire form vs raw strings) agree on every answer") {
    // round 15: the varint rank-stream tier is the shipped plan (it cut
    // the sf1 top-shuffle exchange ~10x); the raw-string tier stays the
    // unbounded-vocabulary fallback and the reference leg. Answers must
    // be identical — and the varint run must actually have taken the
    // varint path (the index carries the dict, or this check is vacuous)
    val legs = Seq("varint", "array").map { tier =>
      spark.conf.set("spark.graft.dedup.d10VerifyTier", tier)
      try {
        val fp = DedupSf1Gate.fingerprint(
          SparkEntry.queries("d10_indexed_incremental_dedup")(spark, sf01))
        CacheScope.release(blocking = true)
        tier -> fp
      } finally spark.conf.unset("spark.graft.dedup.d10VerifyTier")
    }
    assert(legs.map(_._2).distinct.size == 1,
      s"d10 verify tiers disagree: $legs")
    assert(legs.head._2._1 > 0, "d10 returned zero rows — vacuous tier check")
  }

  test("token varint encoding: jaccard with an out-of-dict tail matches set arithmetic") {
    // models d10 exactly: the dictionary covers every CORPUS token by
    // construction; the batch side may carry novel tokens, which encode
    // as a count and can intersect nothing. Includes empty sets,
    // identical sets, all-novel batches and single-token sets.
    val rnd = new scala.util.Random(11)
    val dict = (0 until 400).map(i => s"tok$i")
    val novel = (0 until 50).map(i => s"new$i")
    val cases: Seq[(Seq[String], Seq[String])] = (0 until 300).map { _ =>
      def corpusSet(): Seq[String] =
        if (rnd.nextInt(20) == 0) Seq.empty
        else (0 until 1 + rnd.nextInt(40))
          .map(_ => dict(rnd.nextInt(dict.size))).distinct.sorted
      val c = corpusSet()
      val b = rnd.nextInt(10) match {
        case 0 => c
        case 1 => (0 until 1 + rnd.nextInt(5))
          .map(_ => novel(rnd.nextInt(novel.size))).distinct.sorted
        case _ => (corpusSet() ++ c.take(rnd.nextInt(c.size + 1)) ++
          (0 until rnd.nextInt(4)).map(_ => novel(rnd.nextInt(novel.size))))
          .distinct.sorted
      }
      (b, c) // (batch side with possible novels, corpus side all in-dict)
    }
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val got = cases.toDF("b", "c").select(
      graft.functions.VectorFunctions.varint_jaccard_ex(
        graft.functions.VectorFunctions.sorted_tokens_to_varint(col("b"), dict.toArray),
        graft.functions.VectorFunctions.sorted_tokens_to_varint(col("c"), dict.toArray))
        .as("j"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val (b, c) = cases(i)
      val union = (b.toSet ++ c.toSet).size
      val want: Any =
        if (union == 0) null
        else b.toSet.intersect(c.toSet).size.toDouble / union
      val j: Any = if (r.isNullAt(0)) null else r.getDouble(0)
      assert(j == want, s"case $i: got $j want $want ($b vs $c)")
    }
  }

  test("positive control: the collapse detector actually fires on a synthetic single-task stage") {
    // a green sweep is only evidence if the witness machinery DETECTS
    // collapses — run >2s of executor work in one task and assert the
    // same listener/filter shape used by StageGate flags it
    val stages = scala.collection.mutable.Map.empty[Int, (Long, Int)]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          stages(si.stageId) = (si.taskMetrics.executorRunTime, si.numTasks)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // nondeterministic so neither column pruning (count() dropped the
      // deterministic UDF entirely — measured 476 ms) nor project
      // pushdown can elide the work; coalesce so no exchange lets it
      // fan out upstream (observed with repartition: 4 tasks)
      val slow = org.apache.spark.sql.functions.udf { (i: Long) =>
        Thread.sleep(60); i
      }.asNondeterministic()
      import org.apache.spark.sql.functions.{col, sum => fsum}
      spark.range(40).coalesce(1)
        .select(slow(col("id")).as("v")).agg(fsum(col("v"))).collect()
      Thread.sleep(300)
      val collapsed = stages.synchronized(stages.toSeq).filter {
        case (_, (rt, nt)) => nt <= 2 && rt > 2000
      }
      assert(collapsed.nonEmpty,
        s"synthetic 1-task 2.4s stage not flagged — detector is blind: $stages")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("positive control: the straggler detector fires on a synthetic skewed stage") {
    // the runSum >= wall refinement (added after a false-positive class:
    // near-idle stages QUEUED behind a core-hogging sibling) must still
    // fire on genuine skew — one ~6 s task among 31 ~0.35 s ones: wall
    // is held by the long task (runSum >= wall), total runtime is well
    // under 4x the wall, and the wall exceeds 5 s. Without this control
    // a regression could silently blind the branch (VERDICT r14 #6).
    val stages = scala.collection.mutable.Map.empty[Int, (Long, Long, Int)]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          stages(si.stageId) = (
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.taskMetrics.executorRunTime, si.numTasks)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // skew by partition id: nondeterministic so nothing elides the
      // sleep; 32 partitions so the stage genuinely fans out
      val skewed = org.apache.spark.sql.functions.udf { (i: Long) =>
        Thread.sleep(if (i == 0L) 6200 else 350); i
      }.asNondeterministic()
      import org.apache.spark.sql.functions.{col, sum => fsum}
      spark.range(32).repartition(32)
        .select(skewed(col("id")).as("v")).agg(fsum(col("v"))).collect()
      Thread.sleep(300)
      // exact StageGate straggler shape
      val flagged = stages.synchronized(stages.toSeq).filter {
        case (_, (w, rt, nt)) =>
          w > 5000 && rt >= w && rt.toDouble / math.max(w, 1) < 4 && nt > 2
      }
      assert(flagged.nonEmpty,
        s"synthetic skewed stage (one 6.2s task of 32) not flagged: $stages")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
