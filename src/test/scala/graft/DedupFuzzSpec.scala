package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential fuzzing of the near-dup operators: random synthetic
  * corpora with controlled exact-clone and one-token-mutation families,
  * each LSH/prefix-filtered operator compared against an in-Spark brute
  * force over the SAME corpus. This is the adversarial complement to the
  * fixed-corpus oracle gate: corpus shape (clone-family sizes, mutation
  * density, vocabulary pressure) varies per seed, so a filter that only
  * happens to be complete on the driver corpus fails here.
  *
  * (d02's banding miss probability at J>=0.8 is < 4e-8 per pair — across
  * these corpora the expected miss count is ~1e-3, so exact equality is
  * the correct assertion, not a recall bound.)
  */
class DedupFuzzSpec extends GraftSpec {

  /** Write a synthetic documents.parquet; returns its table dir. */
  private def mkCorpus(seed: Int, nDocs: Int): String = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector.tabulate(50)(i => s"w$i")
    def fresh(): String =
      Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val base = Vector.fill(math.max(nDocs / 3, 1))(fresh())
    val langs = Vector("en", "es")
    val rows = (0 until nDocs).map { i =>
      val text = (i % 3: @unchecked) match {
        case 0 => base(rnd.nextInt(base.size)) // exact-clone family
        case 1 => // near-dup: mutate one token of a base doc
          val t = base(rnd.nextInt(base.size)).split(" ").toVector
          t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size)))
            .mkString(" ")
        case 2 => fresh()
      }
      (i.toLong, text, langs(rnd.nextInt(langs.size)), s"src$seed",
        text.length.toLong)
    }
    val dir = TestSpark.tempDir(s"dfuzz$seed")
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(2).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def at(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private def tokSets(dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("s"))

  private def assertSame(got: DataFrame, want: DataFrame, what: String): Unit = {
    val missing = want.exceptAll(got).count()
    val extra = got.exceptAll(want).count()
    assert(missing == 0 && extra == 0,
      s"$what: $missing missing / $extra extra rows vs brute force")
  }

  for (seed <- Seq(11, 42)) {
    test(s"seed $seed: d02 minhash-lsh pairs equal brute force") {
      val dir = mkCorpus(seed, 150)
      val toks = tokSets(dir)
      val brute = toks.as("a").join(toks.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .withColumn("jaccard", size(array_intersect(col("a.s"), col("b.s")))
          .cast("double") / size(array_union(col("a.s"), col("b.s"))))
        .filter(col("jaccard") >= 0.8)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("jaccard"))
      assertSame(at("d02_minhash_lsh", dir), brute, s"d02 seed $seed")
      CacheScope.release()
    }

    test(s"seed $seed: d03 ngram-jaccard pairs equal brute force") {
      val dir = mkCorpus(seed + 1000, 150)
      assertSame(at("d03_ngram_jaccard", dir), d03Brute(dir), s"d03 seed $seed")
      CacheScope.release()
    }

    test(s"seed $seed: d08 incremental screen equals brute force") {
      val dir = mkCorpus(seed + 2000, 150)
      val toks = tokSets(dir)
      val brute = toks.filter(col("doc_id") % 5 === 0).as("n")
        .crossJoin(toks.filter(col("doc_id") % 5 =!= 0).as("c"))
        .withColumn("j", size(array_intersect(col("n.s"), col("c.s")))
          .cast("double") / size(array_union(col("n.s"), col("c.s"))))
        .filter(col("j") >= 0.8)
        .groupBy(col("n.doc_id").as("doc_id"))
        .agg(max(col("j")).as("best_jaccard"))
      assertSame(at("d08_incremental_dedup", dir), brute, s"d08 seed $seed")
      // the persisted-index formulation must reach the identical result
      assertSame(at("d10_indexed_incremental_dedup", dir), brute,
        s"d10 seed $seed")
      CacheScope.release()
    }

    test(s"seed $seed: d09 decontamination screen equals brute force") {
      val dir = mkCorpus(seed + 3000, 150)
      // structurally different reference: per-doc gram SETS intersected
      // against one collected benchmark array — no gram-keyed join at all
      val sets = Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 5)
        .select(col("doc_id"), array_distinct(expr(
          "transform(sequence(1, size(t) - 4)," +
            " i -> concat_ws(' ', slice(t, i, 5)))")).as("gs"))
      val benchSet = sets.filter(col("doc_id") % 29 === 0)
        .select(explode(col("gs")).as("g")).distinct()
        .agg(collect_set(col("g")).as("bs"))
      val brute = sets.filter(col("doc_id") % 29 =!= 0)
        .crossJoin(benchSet)
        .withColumn("n_hit_grams",
          size(array_intersect(col("gs"), col("bs"))).cast("long"))
        .filter(col("n_hit_grams") > 0)
        .select("doc_id", "n_hit_grams")
      assertSame(at("d09_decontaminate", dir), brute, s"d09 seed $seed")
      CacheScope.release()
    }
  }

  /** d03 brute force over an arbitrary documents table dir. */
  private def d03Brute(dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), array_distinct(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("s"))
    g.as("a").join(g.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard", size(array_intersect(col("a.s"), col("b.s")))
        .cast("double") / size(array_union(col("a.s"), col("b.s"))))
      .filter(col("jaccard") >= 0.6)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("jaccard"))
  }

  /** Corpus whose token vocabulary is built to hit a target trigram
    * diversity: clone/mutation families over `wordChars`-alphabet words. */
  private def mkDiverseCorpus(seed: Int, nDocs: Int, nWordsVocab: Int,
      tokensPerDoc: Int, alphabet: String): String = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector.fill(nWordsVocab)(
      (0 until 6).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    def fresh(): String =
      Seq.fill(2 + rnd.nextInt(tokensPerDoc))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val base = Vector.fill(math.max(nDocs / 3, 1))(fresh())
    val rows = (0 until nDocs).map { i =>
      val text = (i % 3: @unchecked) match {
        case 0 => base(rnd.nextInt(base.size))
        case 1 =>
          val t = base(rnd.nextInt(base.size)).split(" ").toVector
          t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size)))
            .mkString(" ")
        case 2 => fresh()
      }
      (i.toLong, text, "en", s"src$seed", text.length.toLong)
    }
    val dir = TestSpark.tempDir(s"dfuzzv$seed")
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(2).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def trigramVocab(dir: String): Long =
    Tables.documents(spark, dir).filter(length(col("text")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("g")).distinct().count()

  test("d03 with a vocabulary past the old 64-word gate (middle mask tier) equals brute force") {
    // 6-char words over a 36-char alphabet: trigram vocabulary lands in
    // (4096, 65536) — the range the old gate dumped onto the 10x array
    // path wholesale and the unified mask tier now serves gradually
    val dir = mkDiverseCorpus(7001, 240, 2000, 25,
      "abcdefghijklmnopqrstuvwxyz0123456789")
    val v = trigramVocab(dir)
    assert(v > 4096, s"corpus built too small to straddle the gate: $v grams")
    assertSame(at("d03_ngram_jaccard", dir), d03Brute(dir), "d03 straddle")
    CacheScope.release()
  }

  test("d03 with a sparse vocabulary (array tier) equals brute force") {
    // tiny docs over a wide unicode alphabet: vocabulary large relative
    // to 256x the average set size, so the density rule picks the
    // sorted-merge array verify — the honest representation for sparse
    // sets
    val dir = mkDiverseCorpus(7002, 700, 6000, 2,
      "一丁丂七丄丅丆万丈三" +
        "上下丌不与丏丐丑丒专" +
        "abcdefghijklmnopqrstuvwxyz0123456789")
    assert(trigramVocab(dir) > 4096, "corpus too small to leave tier 1")
    assertSame(at("d03_ngram_jaccard", dir), d03Brute(dir), "d03 sparse")
    CacheScope.release()
  }

  test("SortedIdsToMask is bit-identical to positions_to_mask over the rank table") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(31)
    val dict = Seq.fill(5000)(rnd.nextLong()).distinct.sorted.toArray
    val rows = (0 until 300).map { i =>
      // mix of in-dictionary ids and (rare) misses
      val ids = (Seq.fill(1 + rnd.nextInt(60))(dict(rnd.nextInt(dict.length))) ++
        (if (i % 7 == 0) Seq(rnd.nextLong()) else Nil)).distinct.sorted
      (i.toLong, ids)
    }
    val df = rows.toDF("id", "ids")
    val direct = df.select(col("id"), graft.functions.VectorFunctions
      .sorted_ids_to_mask(col("ids"), dict).as("m"))
    val rank = dict.zipWithIndex.map { case (g, p) => (g, p + 1) }
      .toSeq.toDF("gid", "pos")
    val nWords = (dict.length + 63) / 64
    val viaRanks = df.select(col("id"), explode(col("ids")).as("gid"))
      .join(rank, "gid") // inner: misses drop, matching the direct skip
      .groupBy("id").agg(collect_list(col("pos")).as("ps"))
      .select(col("id"), graft.functions.VectorFunctions
        .positions_to_mask(col("ps"), nWords).as("m"))
    val a = direct.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = viaRanks.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b, "map-side mask diverged from the rank-join mask")
  }

  test("MinHashSigs is bit-identical to the array_min/transform formula") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(99)
    val n = 64
    val rows = (0 until 300).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong()).distinct.sorted)
    }
    val df = rows.toDF("id", "tids")
    val native = df.select(col("id"), graft.functions.VectorFunctions
      .minhash_sigs(col("tids"), n).as("m"))
    val formula = df.select(Seq(col("id")) ++ (0 until n).map(i =>
      array_min(transform(col("tids"), x => xxhash64(lit(i), x))).as(s"mh$i")): _*)
    val a = native.collect().map(r => r.getLong(0) ->
      r.getSeq[Long](1).toVector).toMap
    val b = formula.collect().map(r => r.getLong(0) ->
      (1 to n).map(r.getLong(_)).toVector).toMap
    assert(a == b, "native minhash diverged from the Catalyst formula")
  }

  test("Simhash32 is bit-identical to the md5-nibble voting formula") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = Vector.tabulate(60)(i => s"tok$i") ++
      Vector("", "äöü", "漢字", "a b") // empty + unicode edges
    val rows = (0 until 400).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "toks")
    val native = df.select(col("id"), graft.functions.VectorFunctions
      .simhash32(col("toks")).as("fp"))
    val exploded = df.select(col("id"), explode(col("toks")).as("tok"))
      .withColumn("h", md5(col("tok").cast(org.apache.spark.sql.types.BinaryType)))
    val sums = (1 to 32).map(k =>
      sum(when(substring(col("h"), k, 1) >= "8", 1).otherwise(-1)).as(s"s$k"))
    val fp = (1 to 32).map(k =>
      when(col(s"s$k") > 0, lit(1L << (k - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    val formulaFp = exploded.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"), fp.as("fp"))
    val a = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = formulaFp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "native simhash diverged from the md5-nibble formula")
  }

  test("per-partition spanning forest preserves connected components exactly") {
    // the d06 contraction contract: for ANY edge list and ANY partition
    // split, the union of per-partition forests has the same components
    // as the full graph — checked against a reference union-find over
    // random graphs spanning sparse chains to dense near-cliques
    def components(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.map(n => n -> find(n)).toMap
    }
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val nNodes = 2 + rnd.nextInt(60)
      // ids spread over the full long range, including 0
      val ids = Vector(0L) ++ Vector.fill(nNodes - 1)(rnd.nextLong() >>> 1)
      val nEdges = rnd.nextInt(nNodes * nNodes / 2 + 1)
      val edges = Vector.fill(nEdges)(
        (ids(rnd.nextInt(nNodes)), ids(rnd.nextInt(nNodes))))
      val nParts = 1 + rnd.nextInt(5)
      val forest = edges.grouped(math.max(1, edges.size / nParts + 1))
        .flatMap(part => operators.Dedup.forestEdges(part.iterator))
        .toVector
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(forest.size <= edges.size)
      val full = components(nodes, edges)
      val contracted = components(nodes, forest)
      // same partition into components: equal label-classes
      val byFull = full.groupBy(_._2).values.map(_.keySet).toSet
      val byForest = contracted.groupBy(_._2).values.map(_.keySet).toSet
      assert(byFull == byForest,
        s"seed=$seed: forest changed the component partition")

      // the d06 LOCAL-FINISH contract (round-15 optimization): for ANY
      // edge list, localCcLabels emits exactly the min-node-id-per-
      // component fixpoint the distributed min-label loop converges to —
      // every edge-endpoint node present, labeled with its component's
      // minimum id, regardless of edge order
      val local = operators.Dedup
        .localCcLabels(rnd.shuffle(edges).toArray).toMap
      val expected = byFull.flatMap(cls => cls.map(n => n -> cls.min)).toMap
      assert(local == expected,
        s"seed=$seed: localCcLabels diverged from min-per-component")
      // the round-16 primitive-packed collect path: identical labels
      // from flat per-partition long arrays, any split
      val shuffled = rnd.shuffle(edges)
      val flat = shuffled.grouped(math.max(1, shuffled.size / nParts + 1))
        .map(part => part.flatMap(e => Seq(e._1, e._2)).toArray)
        .toArray
      val localFlat = operators.Dedup.localCcLabelsFlat(flat).toMap
      assert(localFlat == expected,
        s"seed=$seed: localCcLabelsFlat diverged from localCcLabels")
    }
  }
}
