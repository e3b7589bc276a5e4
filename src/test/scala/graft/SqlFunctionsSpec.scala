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
  }
}
