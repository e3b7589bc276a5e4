package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** EXPLAIN-shape gates for the plans the engine earns (VERDICT r8 #3):
  * each headline pushdown is asserted on the PHYSICAL plan itself — with a
  * negative control proving the assertion goes red when the pushdown is
  * disabled — so a planner regression fails `sbt test`, not a future
  * bench. Complements CatalogSpec's zero-Exchange SPJ asserts and
  * FormatSpec's SortExec-elision / top-N partition-count asserts. */
class PlanShapeSpec extends GraftSpec {
  private val sp = spark

  private def scanOf(q: DataFrame): BatchScanExec =
    q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail(s"no BatchScanExec in:\n${q.queryExecution.executedPlan}"))

  private def tmp(): String = tempDir("gpx_planshape")

  test("pushed top-N is visible in the scan description; filters suppress the push") {
    import sp.implicits._
    val dir = tmp()
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).orderBy("id").write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir)
    val t = sp.read.format("gpx").load(dir)
    val top = t.orderBy(col("id").desc).limit(10)
    val desc = scanOf(top).scan.description()
    assert(desc.contains("topN=10 by id desc"),
      s"pushed top-N must be visible in the scan description, got: $desc")
    // negative control: a filter makes the coverage counting unsound, so
    // the push must NOT happen — and the description must not claim it
    val filtered = t.filter(col("id") % 2 === 0).orderBy(col("id").desc).limit(10)
    assert(!scanOf(filtered).scan.description().contains("topN="),
      "top-N must not be pushed beneath a filter")
  }

  test("storage-partitioned join goes red when v2 bucketing is disabled (negative control)") {
    // CatalogSpec asserts the zero-Exchange plan with bucketing ON; this
    // proves the assertion is SENSITIVE: same query, pushdown off, the
    // Exchanges reappear. If both states produced the same plan, the
    // positive assert would be vacuous.
    val wh = Files.createTempDirectory("gpx_spjneg").toString
    sp.conf.set("spark.sql.catalog.gspjn", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gspjn.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gspjn.db")
    sp.sql("CREATE TABLE gspjn.db.a (k BIGINT, v BIGINT) USING gpx")
    sp.sql("CREATE TABLE gspjn.db.b (k BIGINT, w BIGINT) USING gpx")
    import sp.implicits._
    (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v")
      .write.format("gpx").mode("append")
      .option("bucketBy", "k").option("numBuckets", "4").save(s"$wh/db/a")
    (0L until 1000L).map(i => (i % 89, i * 3)).toDF("k", "w")
      .write.format("gpx").mode("append")
      .option("bucketBy", "k").option("numBuckets", "4").save(s"$wh/db/b")
    def exchangesUnderJoin(enabled: Boolean): Int = {
      val keys = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> enabled.toString,
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> enabled.toString,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      val saved = keys.map { case (k, _) => k -> sp.conf.getOption(k) }
      keys.foreach { case (k, v) => sp.conf.set(k, v) }
      try {
        val agg = sp.table("gspjn.db.a").join(sp.table("gspjn.db.b"), "k")
          .agg(count(lit(1)).as("n"))
        agg.queryExecution.executedPlan.collect {
          case smj: SortMergeJoinExec =>
            (smj.left.collect { case e: ShuffleExchangeExec => e } ++
              smj.right.collect { case e: ShuffleExchangeExec => e }).size
        }.sum
      } finally saved.foreach {
        case (k, Some(v)) => sp.conf.set(k, v)
        case (k, None) => sp.conf.unset(k)
      }
    }
    assert(exchangesUnderJoin(enabled = true) == 0,
      "bucketed join must plan with zero Exchange when SPJ is on")
    assert(exchangesUnderJoin(enabled = false) > 0,
      "disabling v2 bucketing must bring the Exchanges back — " +
        "otherwise the zero-Exchange assert is vacuous")
  }

  test("runtime (DPP-style) filters reach the gpx scan on a selective broadcast join") {
    import sp.implicits._
    val dir = tmp()
    Tables.orders(sp, sf).orderBy("o_custkey").coalesce(1)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "100").save(dir)
    val dim = Tables.customer(sp, sf).filter(col("c_custkey") < 5)
    val before = graft.format.GpxScan.runtimeFilterCalls.get()
    val joined = sp.read.format("gpx").load(dir)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
    val got = joined.count()
    val want = Tables.orders(sp, sf)
      .join(dim, col("o_custkey") === col("c_custkey")).count()
    assert(got == want)
    // HARD gate (FormatSpec's sibling test records this as info only):
    // the scan must actually receive the runtime IN-set — a regression in
    // filterAttributes()/filter() silently degrades every selective join
    // from pruned-scan to full-scan at 100 TB
    assert(graft.format.GpxScan.runtimeFilterCalls.get() > before,
      "no runtime filter reached the gpx scan on a selective broadcast join")
  }
}
