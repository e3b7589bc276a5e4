package graft

import org.apache.spark.sql.functions._

class DedupSpec extends GraftSpec {
  test("sorted_jaccard matches the array_intersect/union formula (codegen + eval)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(99)
    val rows = (0 until 2000).map { i =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (i, a, b)
    } :+ ((2000, Seq.empty[Long], Seq.empty[Long]))
    val df = rows.toDF("i", "a", "b")
    val got = df.select(col("i"),
      graft.functions.VectorFunctions.sorted_jaccard(col("a"), col("b")).as("j"),
      try_divide(size(array_intersect(col("a"), col("b"))).cast("double"),
        size(array_union(col("a"), col("b")))).as("ref"))
    // whole-stage codegen path
    val mismatch = got.filter(!(col("j") <=> col("ref")) &&
      // SQL x/0 yields NULL like sorted_jaccard's empty-input null
      !(col("j").isNull && col("ref").isNull)).count()
    assert(mismatch == 0)
    // interpreted eval path too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(got.filter(!(col("j") <=> col("ref"))).count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("d01 exact dedup: fingerprints cover all docs") {
    val df = run("d01_dedup_exact")
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("keep_id") > col("doc_id")).count() == 0)
  }

  test("d02 minhash-lsh pairs: all above threshold, a<b") {
    val df = run("d02_minhash_lsh").cache()
    assert(df.filter(col("jaccard") < 0.8).count() == 0)
    assert(df.filter(col("a_id") >= col("b_id")).count() == 0)
    assert(df.count() > 0)
  }

  test("d03 ngram jaccard pairs above threshold") {
    assert(run("d03_ngram_jaccard").filter(col("jaccard") < 0.6).count() == 0)
  }

  test("d02/d03 plans contain no single-partition Window stage") {
    // A Window with an empty partitionSpec funnels all rows through one
    // task — the dictionary-encoding scale-killer the ids fix removed.
    for (q <- Seq("d02_minhash_lsh", "d03_ngram_jaccard")) {
      val plan = run(q).queryExecution.optimizedPlan
      val globalWindows = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty,
        s"$q has ${globalWindows.size} global Window node(s)")
    }
  }

  test("d04 simhash: one 32-bit fingerprint per doc") {
    val df = run("d04_simhash").cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("simhash") < 0 || col("simhash") > ((1L << 32) - 1)).count() == 0)
  }

  test("d05 simhash pairs: hamming <= 6 and banding recall is exact") {
    val df = run("d05_simhash_pairs").cache()
    assert(df.filter(col("hamming") > 6).count() == 0)
    // pigeonhole: banding must find every pair with hamming <= 6
    val fp = run("d04_simhash")
    val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("hamming") <= 6)
      .count()
    assert(df.count() == brute)
  }

  test("d06 clusters: every near-dup pair lands in one cluster, labels are min ids") {
    val cc = run("d06_dup_clusters").cache()
    val docs = Tables.documents(spark, sf).count()
    assert(cc.count() == docs, "every doc gets a cluster row")
    // transitivity contract: both endpoints of every d05 pair share a cluster
    val pairs = run("d05_simhash_pairs")
    val viol = pairs
      .join(cc.select(col("doc_id").as("a_id"), col("cluster_id").as("ca")), "a_id")
      .join(cc.select(col("doc_id").as("b_id"), col("cluster_id").as("cb")), "b_id")
      .filter(col("ca") =!= col("cb")).count()
    assert(viol == 0, s"$viol pairs split across clusters")
    // the label is the min doc_id of its component, and sizes add up
    assert(cc.filter(col("cluster_id") > col("doc_id")).count() == 0)
    val sizeSum = cc.select(col("cluster_id"), col("cluster_size")).distinct()
      .agg(sum(col("cluster_size"))).head.getLong(0)
    assert(sizeSum == docs)
    cc.unpersist()
  }

  test("d08 incremental dedup: exact vs brute-force batch x corpus screen") {
    val got = run("d08_incremental_dedup").cache()
    // every output doc is a batch doc with a qualifying best-match score
    assert(got.filter(col("doc_id") % 5 =!= 0).count() == 0)
    assert(got.filter(col("best_jaccard") < 0.8 || col("best_jaccard") > 1.0)
      .count() == 0)
    // brute-force reference (feasible at test scale only): max corpus
    // jaccard per batch doc, thresholded
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("s"))
    val bf = toks.filter(col("doc_id") % 5 === 0).as("n")
      .crossJoin(toks.filter(col("doc_id") % 5 =!= 0).as("c"))
      .withColumn("j", size(array_intersect(col("n.s"), col("c.s")))
        .cast("double") / size(array_union(col("n.s"), col("c.s"))))
      .filter(col("j") >= 0.8)
      .groupBy(col("n.doc_id").as("doc_id"))
      .agg(max(col("j")).as("best_jaccard"))
    assert(got.exceptAll(bf).count() == 0 && bf.exceptAll(got).count() == 0,
      "incremental LSH screen must equal the brute-force screen")
    got.unpersist()
    graft.CacheScope.release()
  }

  test("d08 plan: candidates come from equality joins, never a cross join") {
    val plan = run("d08_incremental_dedup").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"),
      "d08 must not contain a cartesian join")
    // a regression dropping the band equality would lower to a nested-loop
    // join at test scale (tiny broadcastable sides), not a cartesian —
    // assert that shape away too
    assert(!plan.contains("BroadcastNestedLoop"),
      "d08 must not contain a nested-loop join")
    graft.CacheScope.release()
  }

  test("d09 decontamination: equals a set-semantics brute-force recompute") {
    val got = run("d09_decontaminate").cache()
    assert(got.count() > 0, "synthetic near-dup corpus must contaminate")
    assert(got.filter(col("doc_id") % 29 === 0).count() == 0,
      "benchmark docs must not flag themselves")
    // brute force via per-doc gram SETS: same answer, no join on grams
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, size(t) - 4)," +
          " i -> concat_ws(' ', slice(t, i, 5)))")).as("gs"))
    val benchGrams = toks.filter(col("doc_id") % 29 === 0)
      .select(explode(col("gs")).as("g")).distinct()
      .collect().map(_.getString(0)).toSet
    val bcast = spark.sparkContext.broadcast(benchGrams)
    val hitCount = udf((gs: Seq[String]) => gs.count(bcast.value.contains))
    val bf = toks.filter(col("doc_id") % 29 =!= 0)
      .withColumn("n_hit_grams", hitCount(col("gs")).cast("long"))
      .filter(col("n_hit_grams") > 0)
      .select("doc_id", "n_hit_grams")
    assert(got.exceptAll(bf).count() == 0 && bf.exceptAll(got).count() == 0,
      "broadcast-join decontamination must equal the brute-force screen")
    got.unpersist()
  }

  test("d09 plan: benchmark gram set joins by broadcast, corpus side unshuffled") {
    val plan = run("d09_decontaminate").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      "corpus grams must probe a broadcast benchmark set")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the 100 TB corpus side must not shuffle for the join")
  }
}

class VectorOpsSpec extends GraftSpec {
  test("v01 cosine pairs: values in [-1, 1] and above threshold") {
    val df = run("v01_cosine_pairs_brute").cache()
    assert(df.filter(col("cos_sim") < 0.4 - 1e-4 || col("cos_sim") > 1.0001).count() == 0)
  }

  test("v02 knn brute: exactly 5 neighbors per query, rank ordered") {
    val df = run("v02_knn_brute").cache()
    assert(df.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
  }

  test("v05 lsh pairs: exact precision vs brute force, recall measured") {
    val brute = run("v01_cosine_pairs_brute").select("a_id", "b_id").cache()
    val lsh = graft.operators.VectorOps.cosinePairsLsh(spark, sf)
      .select("a_id", "b_id").cache()
    // precision must be exact: every LSH pair passes the true threshold
    assert(lsh.exceptAll(brute).count() == 0)
    val recall = lsh.count().toDouble / math.max(1, brute.count())
    info(s"v05 recall vs brute = $recall")
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("v03 knn ivf: learned k-means centroids, recall@5 vs brute >= 0.6") {
    val brute = run("v02_knn_brute").select("q_id", "n_id")
    val ivf = graft.operators.VectorOps.knnIvf(spark, sf).select("q_id", "n_id")
    val hits = brute.intersect(ivf).count().toDouble
    val recall = hits / brute.count()
    info(s"v03 ivf recall@5 = $recall")
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("nearest_centroid matches the crossJoin/max_by assignment exactly") {
    // the round-15 map-side k-means assignment: same dot/norm accumulation
    // order, same argmax tie-break (highest cosine, lowest cid, all-invalid
    // to 0) as the max_by(struct(ccos, -cid)) formulation — so on identical
    // centroids the assignments must be IDENTICAL, not just close. Random
    // vectors include a zero vector (no valid candidate -> cid 0).
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16; val k = 5
    val data = ((0 until 400).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian()))
    } :+ (400L, Seq.fill(dim)(0.0))).toDF("n_id", "nv")
      .withColumn("nnorm", sqrt(expr(
        "aggregate(nv, cast(0 as double), (acc, x) -> acc + x * x)")))
      .cache()
    val cents = Array.fill(k)(Seq.fill(dim)(rnd.nextGaussian()))
    val centDf = cents.zipWithIndex.toSeq
      .map { case (v, i) => (i, v) }.toDF("cid", "cv")
      .withColumn("cnorm", sqrt(expr(
        "aggregate(cv, cast(0 as double), (acc, x) -> acc + x * x)")))
    val denom = col("nnorm") * col("cnorm")
    val ref = data.crossJoin(centDf)
      .withColumn("ccos", when(denom =!= 0.0,
        graft.functions.VectorFunctions.dot_product(col("nv"), col("cv")) / denom))
      .groupBy("n_id")
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flat = cents.flatMap(_.toArray)
    val cnorms = cents.map(v => math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
    def fastMap() = data.select(col("n_id"),
        coalesce(graft.functions.VectorFunctions
          .nearest_centroid(col("nv"), col("nnorm"), flat, cnorms), lit(0)).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fastMap() == ref, "codegen nearest_centroid diverged from max_by")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(fastMap() == ref, "interpreted nearest_centroid diverged")
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    data.unpersist()
  }

  test("vec_sum_count matches the posexplode/avg mean step") {
    // exact-representable values (halves) so sum/count is bit-equal to
    // avg regardless of partial-merge order
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 8
    val data = (0 until 500).map { i =>
      (i % 7, Seq.fill(dim)((rnd.nextInt(64) - 32) / 2.0))
    }.toDF("cid", "nv").repartition(13).cache()
    val viaAgg = data.groupBy("cid")
      .agg(graft.functions.VectorFunctions.vec_sum_count(col("nv")).as("sc"))
      .select(col("cid"), col("sc.sums"), col("sc.n"))
      .collect().map { r =>
        r.getInt(0) -> r.getSeq[Double](1).map(_ / r.getLong(2))
      }.toMap
    val viaExplode = data
      .select(col("cid"), posexplode(col("nv")).as(Seq("i", "x")))
      .groupBy("cid", "i").agg(avg(col("x")).as("cx"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("ps"))
      .select(col("cid"), expr("transform(ps, p -> p.cx)").as("cv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(viaAgg == viaExplode, "vec_sum_count mean diverged from avg")
    data.unpersist()
  }

  test("v07 sq8 knn: recall@5 vs brute >= 0.8, exact-reranked scores") {
    val brute = run("v02_knn_brute").cache()
    val sq = graft.operators.VectorOps.knnSq8(spark, sf).cache()
    assert(sq.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
    val hits = brute.select("q_id", "n_id")
      .intersect(sq.select("q_id", "n_id")).count().toDouble
    val recall = hits / brute.count()
    info(s"v07 sq8 recall@5 = $recall")
    assert(recall >= 0.8, s"recall=$recall")
    // the rerank is exact: any (q,n) pair the two paths share must carry
    // the identical full-precision score
    val diff = brute.select(col("q_id"), col("n_id"), col("cos_sim").as("cb"))
      .join(sq.select(col("q_id"), col("n_id"), col("cos_sim").as("cs")),
        Seq("q_id", "n_id"))
      .filter(col("cb") =!= col("cs")).count()
    assert(diff == 0, "shared neighbors must have identical exact scores")
    brute.unpersist(); sq.unpersist()
    graft.CacheScope.release()
  }

  test("v06 persisted ivf index: recall@5 vs brute >= 0.6, bucket-pruned serve") {
    val brute = run("v02_knn_brute").select("q_id", "n_id")
    val ivf = graft.operators.VectorOps.knnIvfIndexed(spark, sf)
    assert(ivf.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
    val hits = brute.intersect(ivf.select("q_id", "n_id")).count().toDouble
    val recall = hits / brute.count()
    info(s"v06 indexed ivf recall@5 = $recall")
    assert(recall >= 0.6, s"recall=$recall")
    // the clustered table is bucketed by cid: a single-cid read plans
    // fewer splits than the full table (bucket pruning on the IN list)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gpx" +
      s"/v${graft.format.GpxFormat.FormatVersion}/ivf_${sf.replaceAll("[^a-zA-Z0-9]", "_")}/clustered"
    val all = spark.read.format("gpx").load(dir)
    val full = all.rdd.getNumPartitions
    val one = all.filter(org.apache.spark.sql.functions.col("cid") === 0).rdd.getNumPartitions
    assert(one < full, s"one=$one full=$full")
  }

  test("topk_by_score heap: random insert/merge streams equal a full sort") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      // duplicate scores on purpose: the id tiebreak must match ORDER BY
      val items = Seq.fill(n)((rnd.nextInt(10).toDouble, rnd.nextLong() % 50))
      // split into partial buffers, serialize/deserialize across the
      // "shuffle", then merge — the full TypedImperativeAggregate life
      val parts = items.grouped(math.max(1, n / 3)).map { chunk =>
        val h = new org.apache.spark.sql.graft.TopKHeap(k)
        chunk.foreach { case (s, i) => h.insert(s, i) }
        org.apache.spark.sql.graft.TopKHeap.fromBytes(h.toBytes)
      }.toSeq
      val merged = parts.foldLeft(new org.apache.spark.sql.graft.TopKHeap(k)) {
        (acc, h) => acc.absorb(h); acc
      }
      // heap keeps duplicate (score, id) entries, so the reference does too
      val expect = items.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(merged.sortedDesc.toSeq == expect,
        s"trial $trial k=$k n=$n: ${merged.sortedDesc.toSeq} != $expect")
    }
  }

  test("v08 mips topk: no Window stage; candidates never shuffle raw") {
    val df = run("v08_mips_topk")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the whole point: bounded-heap aggregate instead of a window sort
    assert(!plan.contains("Window"), "v08 must not use a window")
    assert(plan.contains("ObjectHashAggregate"),
      "topk_by_score should plan as an object hash aggregate")
    // partial + final pair => map-side heaps ran before the exchange
    assert(plan.contains("partial_topk_by_score"),
      "aggregate must run in partial mode before the shuffle")
    // agrees with the window-based exact ranking at test scale
    val got = df.select("q_id", "rank", "n_id").collect().toSet
    val ref = run("v02_knn_brute").select("q_id", "rank", "n_id")
      .collect().toSet
    // v02 ranks by cosine, v08 by raw dot — same corpus, different order;
    // only check the invariants that must hold regardless: 5 per query,
    // ranks 1..5, neighbors drawn from the corpus side
    assert(got.groupBy(_.getLong(0)).forall(_._2.size == 5))
    assert(got.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 5))
    assert(ref.nonEmpty)
  }

  test("registered ANN audits emit recall_ok=1 (the driver-checkable gate)") {
    // the registered v03/v05/v06/v07 queries are recall audits whose one
    // row the DuckDB oracle reproduces; a recall regression flips
    // recall_ok to 0 and both this test and the driver gate go red
    Seq("v03_knn_ivf", "v06_knn_ivf_indexed", "v07_knn_sq8").foreach { q =>
      val row = run(q).collect()
      assert(row.length == 1, s"$q audit must emit one row")
      assert(row.head.getAs[Int]("recall_ok") == 1, s"$q recall gate failed")
      assert(row.head.getAs[Long]("n_queries") > 0, s"$q n_queries")
      graft.CacheScope.release()
    }
    val v05 = run("v05_cosine_pairs_lsh").collect()
    assert(v05.length == 1 && v05.head.getAs[Int]("recall_ok") == 1,
      s"v05 audit: ${v05.mkString}")
    assert(v05.head.getAs[Long]("true_pairs") > 0)
    graft.CacheScope.release()
  }
}

class TextOpsSpec extends GraftSpec {
  test("t01 langid: predictions from the marker set") {
    val df = run("t01_langid")
    assert(df.filter(!col("predicted").isin("en", "es", "de", "fr")).count() == 0)
    assert(df.count() == Tables.documents(spark, sf).count())
  }

  test("t02 quality: token counts positive, ratios finite") {
    val df = run("t02_quality_score")
    assert(df.filter(col("n_tokens") <= 0).count() == 0)
    assert(df.filter(col("avg_token_len") <= 0).count() == 0)
  }

  test("t08 repetition: one row per doc, all ratios in [0,1], consistent") {
    val df = run("t08_repetition").cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    for (c <- Seq("dup_token_ratio", "top_token_ratio", "dup_bigram_ratio"))
      assert(df.filter(col(c) < 0.0 || col(c) > 1.0).count() == 0, c)
    // the modal token accounts for at least its uniform share (compare
    // with a tolerance: (1.0/n)*n rounds below 1.0 for many n), and a doc
    // with zero duplicate tokens cannot have a duplicate bigram
    assert(df.filter(col("top_token_ratio") * col("n_tokens") < 0.999999)
      .count() == 0)
    assert(df.filter(col("dup_token_ratio") === 0.0 &&
      col("dup_bigram_ratio") > 0.0).count() == 0)
    df.unpersist()
  }

  test("t09 ngram novelty: conservation, ranges, and first-doc ownership") {
    val df = run("t09_ngram_novelty").cache()
    assert(df.count() > 0)
    assert(df.filter(col("novelty") < 0.0 || col("novelty") > 1.0).count() == 0)
    assert(df.filter(col("n_novel") > col("n_grams")).count() == 0)
    // the earliest doc owns every one of its grams by definition
    val first = df.orderBy("doc_id").limit(1).head
    assert(first.getLong(2) == first.getLong(1), "first doc must be 100% novel")
    // conservation: sum of per-doc novel grams = global distinct gram count
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(t) - 4)," +
          " i -> concat_ws(' ', slice(t, i, 5)))"))).as("g"))
    val distinctGrams = toks.select("g").distinct().count()
    val sumNovel = df.agg(sum(col("n_novel"))).head.getLong(0)
    assert(sumNovel == distinctGrams,
      s"novel-gram sum $sumNovel != distinct grams $distinctGrams")
    // the synthetic corpus is 64% near-dup: novelty must actually separate
    assert(df.filter(col("novelty") < 0.5).count() > 0, "dup docs score low")
    df.unpersist()
  }
}

class MultimodalSpec extends GraftSpec {
  test("fakeDecode is deterministic and matches the expression path") {
    val (w, h, b) = operators.Multimodal.fakeDecode("hello".getBytes("UTF-8"))
    assert(w == 16 + 5 && h == 16 + 35)
    assert(math.abs(b - "hello".getBytes("UTF-8").map(_ & 0xff).sum / 5.0) < 1e-12)
  }

  test("m02 mapPartitions decode aggregates per bucket") {
    val df = run("m02_multimodal_decode")
    assert(df.count() > 0 && df.count() <= 10)
  }

  test("m03 frame sampling: one row per sampled frame, deterministic layout") {
    val frames = run("m03_frame_sample").cache()
    val docs = Tables.documents(spark, sf)
    // frame count per doc = 1 + byte_len % 10 (UTF-8 bytes, not chars)
    val want = docs.select(
      col("doc_id"),
      (lit(1) + octet_length(encode(col("text"), "UTF-8")) % 10).as("n"))
    val got = frames.groupBy("doc_id").count()
    val bad = want.join(got, "doc_id")
      .filter(col("n") =!= col("count")).count()
    assert(bad == 0, s"$bad docs with wrong sampled-frame count")
    // within a doc: ts strictly increasing, frame_idx = second * fps
    assert(frames.filter(col("ts_ms") % 1000 =!= 0).count() == 0)
    assert(frames.count() == want.agg(sum(col("n"))).head.getLong(0))
    frames.unpersist()
  }

  test("m04 phash dedup: only multi-copy groups, keep_id is a group member") {
    val groups = run("m04_phash_dedup").cache()
    assert(groups.filter(col("n_copies") < 2).count() == 0)
    // group sizes account for every doc beyond the unique ones
    val docs = Tables.documents(spark, sf).count()
    val grouped = groups.agg(sum("n_copies")).head.getLong(0)
    assert(grouped <= docs)
    assert(groups.filter(col("keep_id") < 0).count() == 0)
    groups.unpersist()
  }
}

class TimeFunctionsSpec extends GraftSpec {
  test("TIME mapping: millis-since-midnight round-trips to HH:mm:ss") {
    val sp = TestSpark.spark
    import sp.implicits._
    import graft.functions.TimeFunctions._
    val df = Seq("2024-01-01 00:00:00.000", "2024-01-01 13:45:30.250",
      "2024-01-01 23:59:59.999")
      .toDF("s")
      .select(org.apache.spark.sql.functions.col("s").cast("timestamp").as("ts"))
      .withColumn("millis", time_of_day_millis(org.apache.spark.sql.functions.col("ts")))
      .withColumn("str", time_to_string(org.apache.spark.sql.functions.col("millis")))
      .withColumn("h", time_hour(org.apache.spark.sql.functions.col("millis")))
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("millis")).toSeq ==
      Seq(0, (13 * 3600 + 45 * 60 + 30) * 1000 + 250, 86399999))
    assert(rows.map(_.getAs[String]("str")).toSeq ==
      Seq("00:00:00", "13:45:30", "23:59:59"))
    assert(rows.map(_.getAs[Int]("h")).toSeq == Seq(0, 13, 23))
  }
}

class EventOpsSpec extends GraftSpec {
  test("e03 cdc upsert: unique (user, event_type) keys") {
    val df = run("e03_cdc_upsert_latest")
    assert(df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("e04 snapshot is a subset of key space with older versions") {
    assert(run("e04_mvcc_snapshot").count() <= run("e03_cdc_upsert_latest").count())
  }

  test("e12 cohort retention: offset-0 rate is 1, rates bounded, users conserved") {
    val df = run("e12_cohort_retention").cache()
    assert(df.filter(col("offset_days") === 0 && col("retention") =!= 1.0)
      .count() == 0, "a cohort is fully present on its first day")
    assert(df.filter(col("retention") <= 0.0 || col("retention") > 1.0)
      .count() == 0)
    assert(df.filter(col("offset_days") < 0).count() == 0)
    // cohort sizes partition the user base
    val cohortSum = df.filter(col("offset_days") === 0)
      .agg(sum("cohort_size")).head.getLong(0)
    val users = graft.operators.EventOps.events(spark, sf)
      .select("user_id").distinct().count()
    assert(cohortSum == users, s"cohorts must partition users: $cohortSum != $users")
    df.unpersist()
  }
}
