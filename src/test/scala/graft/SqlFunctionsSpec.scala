package graft

/** The SQL registration surface: after GraftFunctions.registerAll (or the
  * GraftExtensions spark.sql.extensions hook, which injects the same
  * builders), plain SQL reaches every native expression. */
class SqlFunctionsSpec extends GraftSpec {
  private val sp = TestSpark.spark

  test("registered SQL functions evaluate the native expressions") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(sp)
    assert(sp.sql("SELECT cos_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .head.getDouble(0) == 1.0)
    assert(sp.sql("SELECT dot_product(array(2.0d, 3.0d), array(4.0d, 5.0d))")
      .head.getDouble(0) == 23.0)
    assert(sp.sql(
      "SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L))")
      .head.getDouble(0) == 0.5)
    // mask jaccard: {bits 1,2} vs {bits 2,65} -> |AND|=1, |OR|=3
    assert(sp.sql(
      "SELECT mask_jaccard(array(3L, 0L), array(2L, 1L))")
      .head.getDouble(0) == 1.0 / 3)
    // width mismatch: extra words count toward the union only
    assert(sp.sql("SELECT mask_jaccard(array(1L), array(1L, 7L))")
      .head.getDouble(0) == 0.25)
    // positions_to_mask: bits 1, 64, 65 -> words (1 | 1<<63, 1)
    assert(sp.sql("SELECT positions_to_mask(array(1, 64, 65), 2)")
      .head.getSeq[Long](0) == Seq(1L | (1L << 63), 1L))
    // round trip: mask of positions vs mask of same positions = J 1.0
    assert(sp.sql(
      """SELECT mask_jaccard(positions_to_mask(array(5, 70), 2),
        |  positions_to_mask(array(70, 5, 5), 2))""".stripMargin)
      .head.getDouble(0) == 1.0)
    // trigram_ids('abcd') = {abc, bcd} as packed codepoint ids
    val tg = sp.sql("SELECT trigram_ids('abcd')").head.getSeq[Long](0)
    def pack(a: Char, b: Char, c: Char): Long =
      (a.toLong << 42) | (b.toLong << 21) | c.toLong
    assert(tg.toSet == Set(pack('a', 'b', 'c'), pack('b', 'c', 'd')))
    // simhash32 matches the expression API on the same input
    val viaSql = sp.sql("SELECT simhash32(array('x', 'y'))").head.getLong(0)
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val viaApi = Seq(Tuple1(Seq("x", "y"))).toDF("t")
      .select(graft.functions.VectorFunctions.simhash32(col("t")))
      .head.getLong(0)
    assert(viaSql == viaApi)
    // minhash_sigs requires an int-literal hash count
    val mh = sp.sql("SELECT minhash_sigs(array(7L, 9L), 16)")
      .head.getSeq[Long](0)
    assert(mh.length == 16)
    // the bounded-heap aggregate works as a SQL aggregate, grouped
    val tk = sp.sql(
      """SELECT g, topk_by_score(s, i, 2) AS top FROM VALUES
        |  (1, 0.5d, 10L), (1, 0.9d, 11L), (1, 0.7d, 12L),
        |  (2, 0.1d, 20L) AS t(g, s, i)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val g1 = tk(0).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getDouble(0), r.getLong(1)))
    assert(g1 == Seq((0.9, 11L), (0.7, 12L)), g1)
    assert(tk(1).getSeq[org.apache.spark.sql.Row](1)
      .map(_.getLong(1)) == Seq(20L))
    // the extensions class injects the same builders without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new org.apache.spark.sql.graft.GraftExtensions().apply(ext)
    // the legacy graft.GraftExtensions entry point delegates to the same
    // list (it used to hand-roll 2 of the 7 functions)
    val ext2 = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext2)
  }

  test("vector kernels null-propagate on null ELEMENTS instead of reading 0") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(sp)
    // array<double> with nullable elements passes analysis
    // (ExpectsInputTypes ignores containsNull) — a null slot must yield
    // NULL, not a similarity computed with a phantom 0.0
    assert(sp.sql(
      "SELECT cos_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))")
      .head.isNullAt(0))
    assert(sp.sql(
      "SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))")
      .head.isNullAt(0))
    assert(sp.sql(
      "SELECT sorted_jaccard(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L))")
      .head.isNullAt(0))
    assert(sp.sql(
      "SELECT minhash_sigs(array(1L, CAST(NULL AS BIGINT)), 4)")
      .head.isNullAt(0))
    // non-null inputs unaffected
    assert(math.abs(sp.sql(
      "SELECT cos_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))")
      .head.getDouble(0) - 1.0) < 1e-12)
  }

  test("minhash_bands emits exactly the composed minhash_sigs band structs") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(sp)
    import org.apache.spark.sql.functions._
    import sp.implicits._
    val NumHashes = 128
    val BandR = 4
    val rnd = new scala.util.Random(7)
    val arrays: Seq[Seq[Long]] =
      (1 to 50).map(_ => Seq.fill(1 + rnd.nextInt(200))(rnd.nextLong())) :+
        Seq(7L) :+ Seq(Long.MinValue, 0L, Long.MaxValue)
    val df = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("i", "tids")
    // the fused kernel vs the composed formula bandRows used before r16
    val fused = df.select(col("i"), graft.functions.VectorFunctions
      .minhash_bands(col("tids"), NumHashes, BandR).as("bks"))
    val mh = df.select(col("i"), graft.functions.VectorFunctions
      .minhash_sigs(col("tids"), NumHashes).as("mhs"))
    val bandCols = (0 until NumHashes / BandR).map { b =>
      struct(lit(b).as("band") +:
        (0 until BandR).map(r =>
          col("mhs").getItem(BandR * b + r).as(s"h$r")): _*)
    }
    val composed = mh.select(col("i"), array(bandCols: _*).as("bks"))
    val prev = sp.conf.getOption("spark.sql.codegen.fallback")
    sp.conf.set("spark.sql.codegen.fallback", "false") // prove codegen path
    try {
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
        r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(b =>
          (b.getInt(0), b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4)))
      }.toMap
      val f = rows(fused)
      val c = rows(composed)
      assert(f == c, "fused band keys diverge from the composed formula")
      // interpreted path agrees too (collect on a local Dataset eval)
      val interp = arrays.zipWithIndex.map { case (a, i) =>
        val arr = org.apache.spark.sql.graft.MinHashBandsKernel.eval(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray),
          NumHashes, BandR, checkNulls = false)
        i -> (0 until arr.numElements()).map { k =>
          val s0 = arr.getStruct(k, 1 + BandR)
          (s0.getInt(0), s0.getLong(1), s0.getLong(2), s0.getLong(3), s0.getLong(4))
        }
      }.toMap
      assert(interp == c, "interpreted kernel diverges from the composed formula")
    } finally prev match {
      case Some(v) => sp.conf.set("spark.sql.codegen.fallback", v)
      case None => sp.conf.unset("spark.sql.codegen.fallback")
    }
    // null/empty semantics: null on empty input and on null elements —
    // the composed formula yields all-null-field structs there, which can
    // never satisfy a band-key equality, so candidates are identical
    val edge = Seq((0, Seq.empty[Long]), (1, Seq(1L))).toDF("i", "tids")
    val e = edge.select(graft.functions.VectorFunctions
      .minhash_bands(col("tids"), 8, 4)).collect()
    assert(e(0).isNullAt(0) && !e(1).isNullAt(0))
  }

  test("two simhash32 calls share one codegen scope without colliding") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(sp)
    val prev = sp.conf.getOption("spark.sql.codegen.fallback")
    // fail on codegen errors instead of silently interpreting: the
    // hard-coded local in the old doGenCode compiled `r` twice when two
    // non-nullable-child simhash32 calls landed in one projection
    sp.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = sp.sql(
        "SELECT simhash32(array('a','b')) AS x, simhash32(array('c')) AS y " +
          "FROM range(3)").collect()
      assert(r.length == 3 && r.forall(row => !row.isNullAt(0) && !row.isNullAt(1)))
    } finally prev match {
      case Some(v) => sp.conf.set("spark.sql.codegen.fallback", v)
      case None => sp.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("topk heap normalizes -0.0: boundary id matches ORDER BY score DESC, id") {
    val h = new org.apache.spark.sql.graft.TopKHeap(1)
    h.insert(-0.0, 1L)
    h.insert(0.0, 2L)
    val (s, id) = h.sortedDesc.head
    // equal scores tie-break by smaller id, and the stored score is +0.0
    // (raw bits zero), matching Spark's normalized sort and the oracle
    assert(id == 1L)
    assert(java.lang.Double.doubleToRawLongBits(s) == 0L,
      "heap must store the normalized +0.0")
  }
}
