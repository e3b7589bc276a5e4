package graft

import graft.format.{GpxInputPartition, GpxProjection}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Projection layouts: materialized column-subset copies with exact
  * coverage manifests, scan routing, incremental refresh, and fallback. */
class ProjectionSpec extends GraftSpec {
  private val sp = TestSpark.spark
  private val conf = new Configuration()

  /** paths of the gpx splits the query's physical plan actually scans
    * (descends through AQE wrappers) */
  private def scannedPaths(df: DataFrame): Seq[String] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect { case gp: GpxInputPartition => gp.path }
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
      }.flatten
    walk(df.queryExecution.executedPlan)
  }

  private def freshWide(): String = {
    val d = Files.createTempDirectory("gpx_proj").toString
    graft.operators.WideOps.hitsDf(sp, sf)
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    d
  }

  test("covered query routes to the narrowest projection; uncovered reads base") {
    val d = freshWide()
    GpxProjection.build(sp, d, "p_wide", Seq("counter_id", "url", "user_id", "os"))
    GpxProjection.build(sp, d, "p_narrow", Seq("counter_id", "url"))

    val covered = sp.read.format("gpx").load(d)
      .groupBy("url").agg(count(lit(1)).as("n"))
    assert(scannedPaths(covered).nonEmpty)
    assert(scannedPaths(covered).forall(_.contains("/_proj/p_narrow/")),
      s"expected p_narrow routing, got ${scannedPaths(covered).take(2)}")

    val threeCol = sp.read.format("gpx").load(d)
      .filter(col("counter_id") === 7).select("url", "user_id")
    assert(scannedPaths(threeCol).forall(_.contains("/_proj/p_wide/")),
      "3-col query must route to the narrowest COVERING projection")

    val uncovered = sp.read.format("gpx").load(d).select("url", "title")
    assert(scannedPaths(uncovered).forall(!_.contains("/_proj/")),
      "uncovered query must read the base")

    // routed results are identical to base results
    val base = graft.operators.WideOps.hitsDf(sp, sf)
      .groupBy("url").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = covered.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == base)
  }

  test("INSERT invalidates; refresh() appends incrementally and re-validates") {
    val d = freshWide()
    GpxProjection.build(sp, d, "p1", Seq("counter_id", "url"))
    val q = () => sp.read.format("gpx").load(d).select("counter_id", "url")
    assert(scannedPaths(q()).forall(_.contains("/_proj/p1/")))

    // append new base data -> manifest no longer matches -> base fallback
    graft.operators.WideOps.hitsDf(sp, sf).limit(100)
      .coalesce(1).write.format("gpx").mode("append").save(d)
    assert(scannedPaths(q()).forall(!_.contains("/_proj/")),
      "stale projection must not serve")
    val wantRows = sp.read.format("gpx").load(d).count()

    // pure-append refresh: only the new file's columns are copied
    val projFilesBefore =
      graft.format.GpxTable.listFiles(
        Seq(GpxProjection.projPath(d, "p1").toString), conf).toSet
    GpxProjection.refresh(sp, d, "p1")
    val projFilesAfter =
      graft.format.GpxTable.listFiles(
        Seq(GpxProjection.projPath(d, "p1").toString), conf).toSet
    assert(projFilesBefore.subsetOf(projFilesAfter) &&
      projFilesAfter.size > projFilesBefore.size,
      "refresh of a pure append must keep existing projection files")
    assert(scannedPaths(q()).forall(_.contains("/_proj/p1/")))
    assert(q().count() == wantRows)
    // no-op refresh: nothing changes
    GpxProjection.refresh(sp, d, "p1")
    assert(graft.format.GpxTable.listFiles(
      Seq(GpxProjection.projPath(d, "p1").toString), conf).toSet == projFilesAfter)
  }

  test("a MOR delete sidecar invalidates the projection until refresh") {
    val d = freshWide()
    GpxProjection.build(sp, d, "p1", Seq("watch_id", "counter_id"))
    val q = () => sp.read.format("gpx").load(d).select("watch_id", "counter_id")
    assert(scannedPaths(q()).forall(_.contains("/_proj/p1/")))
    sp.conf.set("spark.graft.gpx.deleteMode", "mor")
    try graft.format.GpxDelete.run(
      sp.read.format("gpx").load(d).schema, Seq(d),
      Array(org.apache.spark.sql.sources.LessThan("watch_id", 50L)))
    finally sp.conf.unset("spark.graft.gpx.deleteMode")
    assert(scannedPaths(q()).forall(!_.contains("/_proj/")),
      "bitmap delete must invalidate the projection")
    val wantRows = sp.read.format("gpx").load(d).count()
    GpxProjection.refresh(sp, d, "p1") // sidecar diff -> full rebuild
    assert(scannedPaths(q()).forall(_.contains("/_proj/p1/")))
    assert(q().count() == wantRows, "rebuilt projection must fold the mask")
  }

  test("time travel and synthetic columns never route to a projection") {
    val d = Files.createTempDirectory("gpx_projtt").toString
    val sp2 = sp
    import sp2.implicits._
    (0 until 500).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("commitTs", "100").save(d)
    GpxProjection.build(sp, d, "p1", Seq("id"))
    assert(scannedPaths(sp.read.format("gpx").load(d).select("id"))
      .forall(_.contains("/_proj/p1/")))
    // snapshot read: base only (the copy cannot replay MVCC)
    assert(scannedPaths(sp.read.format("gpx").option("snapshotTs", "100")
      .load(d).select("id")).forall(!_.contains("/_proj/")))
    // _pos/_file identity columns: base only
    assert(scannedPaths(sp.read.format("gpx").load(d)
      .select(col("id"), col(graft.format.GpxTable.PosCol)))
      .forall(!_.contains("/_proj/")))
  }

  test("projectionAutoRefresh: INSERT keeps projections current; OVERWRITE keeps definitions") {
    val d = freshWide()
    GpxProjection.build(sp, d, "p1", Seq("counter_id", "url"))
    val q = () => sp.read.format("gpx").load(d).select("counter_id", "url")
    sp.conf.set("spark.graft.gpx.projectionAutoRefresh", "true")
    try {
      graft.operators.WideOps.hitsDf(sp, sf).limit(64)
        .coalesce(1).write.format("gpx").mode("append").save(d)
      // the append's commit refreshed the projection: still routed
      assert(scannedPaths(q()).forall(_.contains("/_proj/p1/")),
        "auto-refresh must keep the projection serving after INSERT")
      assert(q().count() == sp.read.format("gpx").load(d).count())
      // OVERWRITE keeps the projection DEFINITION and rebuilds it
      graft.operators.WideOps.hitsDf(sp, sf).limit(200)
        .coalesce(1).write.format("gpx").mode("overwrite").save(d)
      assert(GpxProjection.listProjections(d, conf) == Seq("p1"))
      assert(scannedPaths(q()).forall(_.contains("/_proj/p1/")))
      assert(q().count() == 200)
    } finally sp.conf.unset("spark.graft.gpx.projectionAutoRefresh")
  }

  test("catalog DDL creates and drops projections") {
    val wh = Files.createTempDirectory("gpx_projddl").toString
    sp.conf.set("spark.sql.catalog.gprj", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gprj.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gprj.db")
    sp.sql("CREATE TABLE gprj.db.t (id BIGINT, a BIGINT, b STRING, c STRING) USING gpx")
    sp.sql("INSERT INTO gprj.db.t SELECT id, id % 10, CAST(id AS STRING), 'x' FROM range(2000)")
    sp.sql("ALTER TABLE gprj.db.t SET TBLPROPERTIES('projection.pa'='id,a')")
    val tdir = s"$wh/db/t"
    assert(GpxProjection.listProjections(tdir, conf) == Seq("pa"))
    val q = sp.sql("SELECT a, COUNT(*) AS n FROM gprj.db.t GROUP BY a")
    assert(scannedPaths(q).forall(_.contains("/_proj/pa/")),
      "catalog scan must route through the projection")
    assert(q.collect().map(_.getLong(1)).sum == 2000L)
    sp.sql("ALTER TABLE gprj.db.t UNSET TBLPROPERTIES('projection.pa')")
    assert(GpxProjection.listProjections(tdir, conf).isEmpty)
  }

  test("concurrent refreshes never double-append: projection rows stay exact") {
    val sp2 = sp
    import sp2.implicits._
    val d = Files.createTempDirectory("gpx_proj_conc").toString
    (0L until 500L).map(i => (i, i * 2L, s"r$i")).toDF("a", "b", "c")
      .coalesce(1).write.format("gpx").mode("overwrite").save(d)
    GpxProjection.build(sp, d, "p", Seq("a", "b"))
    // one lock-free append, then N racing refreshes — without per-
    // projection serialization, two refreshers both take the pure-append
    // path and the projection serves every new row twice forever
    (500L until 600L).map(i => (i, i * 2L, s"r$i")).toDF("a", "b", "c")
      .coalesce(1).write.format("gpx").mode("append").save(d)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val start = new java.util.concurrent.CountDownLatch(1)
    try {
      val fs = (0 until 4).map(_ => pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          GpxProjection.refresh(sp, d, "p")
        }
      }))
      start.countDown()
      fs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // at least one refresh won the projection lock; stale losers skipped.
    // Refresh once more (now uncontended) to guarantee currency, then
    // the projection must hold exactly one copy of every row
    GpxProjection.refresh(sp, d, "p")
    val projDf = sp.read.format("gpx").load(s"$d/_proj/p")
    assert(projDf.count() == 600L,
      s"projection must hold exactly 600 rows, got ${projDf.count()}")
    assert(projDf.select("a").distinct().count() == 600L)
  }
}
