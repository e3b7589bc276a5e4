package graft

import org.apache.spark.sql.functions._

/** The pixels-cli workflow (LOAD → COMPACT → STAT → QUERY → VACUUM)
  * driven end-to-end through graft.Cli.run over real testdata. */
class CliSpec extends GraftSpec {
  private val sp = TestSpark.spark

  test("LOAD -> COMPACT -> STAT -> QUERY -> VACUUM round trip") {
    val sf = "/root/testdata/sf0.001"
    val t1 = TestSpark.tempDir("cli_orders")
    Cli.run(sp, Seq("LOAD", s"$sf/orders.parquet", t1,
      "--sortBy", "o_orderkey", "--rowGroupRows", "2048", "--overwrite"))
    val loaded = sp.read.format("gpx").load(t1)
    val want = sp.read.parquet(s"$sf/orders.parquet")
    assert(loaded.count() == want.count())
    assert(loaded.agg(sum(col("o_orderkey"))).head.getLong(0) ==
      want.agg(sum(col("o_orderkey"))).head.getLong(0))

    val t2 = TestSpark.tempDir("cli_compact")
    Cli.run(sp, Seq("COMPACT", t1, t2))
    assert(sp.read.format("gpx").load(t2).count() == want.count())

    Cli.run(sp, Seq("STAT", t2))
    // the sidecar serves NDV to planning
    val ndv = sp.read.format("gpx").load(t2)
      .queryExecution.optimizedPlan.stats.attributeStats.collectFirst {
        case (a, cs) if a.name == "o_orderkey" => cs
      }.flatMap(_.distinctCount)
    assert(ndv.exists(v => (v - BigInt(want.count())).abs <=
      BigInt((want.count() * 0.05).toLong + 1)), s"ndv=$ndv")

    Cli.run(sp, Seq("QUERY",
      "SELECT count(*) AS n FROM ord WHERE o_orderkey <= 100",
      "--table", s"ord=$t2"))

    Cli.run(sp, Seq("INDEX", t2, "o_orderkey"))
    val someKey = want.select(min(col("o_orderkey"))).head.getLong(0)
    val hit = graft.format.GpxPointIndex.lookup(sp, t2, "o_orderkey",
      Set(someKey), Seq("o_orderkey", "o_custkey"))
    assert(hit.count() == 1, s"indexed point lookup must find key $someKey")

    Cli.run(sp, Seq("VACUUM", t2, "0"))
    // vacuum with ttl 0 on a clean table sweeps nothing visible
    assert(sp.read.format("gpx").load(t2).count() == want.count())
  }

  test("malformed command lines raise UsageException, not MatchError") {
    def bad(args: String*): Unit =
      intercept[Cli.UsageException](Cli.run(sp, args.toSeq))
    bad("LOAD", "/only/one/operand")
    bad("COMPACT") // zero operands; ONE operand is the in-place form,
    // which is a semantic (not usage) error on a non-log table:
    intercept[IllegalArgumentException](
      Cli.run(sp, Seq("COMPACT", "/src/only")))
    bad("STAT")
    bad("INDEX", "/tbl") // missing column list
    bad("INDEX", "/tbl", ",") // empty column list
    bad("VACUUM")
    bad("VACUUM", "/tbl", "not-a-number")
    bad("QUERY", "SELECT 1", "--table") // dangling --table
    bad("QUERY", "SELECT 1", "--table", "noequals")
    bad("NOSUCH")
  }
}
