package graft

import graft.format.{GpxInputPartition, GpxTable}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Range-partitioned layout: ingest-time routing by declared split points
  * and file-name-level scan pruning (Range.java / RangeIndex.java analog). */
class RangeLayoutSpec extends GraftSpec {
  private val sp = TestSpark.spark
  private val conf = new Configuration()

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

  test("rangeOf: id = number of bounds <= key") {
    val b = Seq(100L, 200L)
    assert(GpxTable.rangeOf(-5L, b) == 0 && GpxTable.rangeOf(99L, b) == 0)
    assert(GpxTable.rangeOf(100L, b) == 1 && GpxTable.rangeOf(199L, b) == 1)
    assert(GpxTable.rangeOf(200L, b) == 2 && GpxTable.rangeOf(5000L, b) == 2)
  }

  test("write routes rows to per-range files; scans prune by name") {
    val d = Files.createTempDirectory("gpx_range").toString
    val sp2 = sp
    import sp2.implicits._
    (0L until 4000L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(2).write.format("gpx").mode("overwrite")
      .option("rangeBy", "id").option("rangeBounds", "1000,2000,3000")
      .save(d)
    val files = GpxTable.listFiles(Seq(d), conf)
    // every file carries a range tag; all four ranges are populated
    val tags = files.flatMap(GpxTable.rangeOfFile)
    assert(tags.size == files.size && tags.toSet == Set(0, 1, 2, 3))
    // rows landed in the right ranges (zone maps per range file are tight)
    val df = sp.read.format("gpx").load(d)
    assert(df.count() == 4000)
    // equality inside range 1: only range-1 files planned
    val q1 = df.filter(col("id") === 1500L)
    assert(scannedPaths(q1).nonEmpty &&
      scannedPaths(q1).forall(GpxTable.rangeOfFile(_).contains(1)))
    assert(q1.count() == 1)
    // boundary key 2000 belongs to range 2
    val qb = df.filter(col("id") === 2000L)
    assert(scannedPaths(qb).forall(GpxTable.rangeOfFile(_).contains(2)))
    // range predicate spanning two ranges plans only those
    val q2 = df.filter(col("id") >= 900L && col("id") < 2100L)
    assert(scannedPaths(q2).flatMap(GpxTable.rangeOfFile).toSet == Set(0, 1, 2))
    assert(q2.count() == 1200)
    // IN across distant ranges
    val q3 = df.filter(col("id").isin(5L, 3500L))
    assert(scannedPaths(q3).flatMap(GpxTable.rangeOfFile).toSet == Set(0, 3))
    assert(q3.count() == 2)
  }

  test("delta (mor) update on a ranged table keeps routing tags on appended files") {
    val wh = Files.createTempDirectory("gpx_range_mor").toString
    sp.conf.set("spark.sql.catalog.grngm", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.grngm.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS grngm.db")
    sp.sql("""CREATE TABLE grngm.db.t (id BIGINT, v BIGINT) USING gpx
             |TBLPROPERTIES('range_by'='id:1000')""".stripMargin)
    sp.sql("INSERT INTO grngm.db.t SELECT id, id FROM range(2000)")
    val tdir = s"$wh/db/t"
    sp.conf.set("spark.graft.gpx.rowLevelMode", "mor")
    try sp.sql("UPDATE grngm.db.t SET v = v + 1 WHERE id % 250 = 0")
    finally sp.conf.unset("spark.graft.gpx.rowLevelMode")
    val files = GpxTable.listFiles(Seq(tdir), conf)
    assert(files.flatMap(GpxTable.rangeOfFile).size == files.size,
      s"every file (incl. delta-appended m*) must carry a range tag: $files")
    val got = sp.table("grngm.db.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 2000 && got(250L) == 251L && got(1L) == 1L)
  }

  test("cow UPDATE on a ranged sort-clustered table keeps range tags and the sortedBy claim") {
    val wh = Files.createTempDirectory("gpx_range_cow").toString
    sp.conf.set("spark.sql.catalog.grngc", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.grngc.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS grngc.db")
    sp.sql("""CREATE TABLE grngc.db.t (id BIGINT, v BIGINT) USING gpx
             |TBLPROPERTIES('range_by'='id:1000', 'sort_by'='id')""".stripMargin)
    sp.sql("INSERT INTO grngc.db.t SELECT id, id FROM range(2000)")
    val tdir = s"$wh/db/t"
    // default rowLevelMode = cow: the whole matched file set rewrites
    sp.sql("UPDATE grngc.db.t SET v = v + 1 WHERE id % 250 = 0")
    val files = GpxTable.listFiles(Seq(tdir), conf)
    assert(files.flatMap(GpxTable.rangeOfFile).size == files.size,
      s"every file (incl. cow-rewritten r*) must carry a range tag: $files")
    // the rewrite must not erode the ordered layout's footer claim
    files.foreach { f =>
      assert(graft.format.GpxFileReader.FooterCache.get(f, conf)
        .sortedBy == Seq("id"),
        s"cow rewrite dropped the sortedBy claim on $f")
    }
    val got = sp.table("grngc.db.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 2000 && got(250L) == 251L && got(1L) == 1L)
  }

  test("delta (mor) update on a sort-clustered table stamps sortedBy on its insert files") {
    val wh = Files.createTempDirectory("gpx_sort_mor").toString
    sp.conf.set("spark.sql.catalog.gsrtm", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gsrtm.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gsrtm.db")
    sp.sql("""CREATE TABLE gsrtm.db.t (id BIGINT, v BIGINT) USING gpx
             |TBLPROPERTIES('sort_by'='id')""".stripMargin)
    sp.sql("INSERT INTO gsrtm.db.t SELECT id, id FROM range(2000)")
    val tdir = s"$wh/db/t"
    sp.conf.set("spark.graft.gpx.rowLevelMode", "mor")
    try sp.sql("UPDATE gsrtm.db.t SET v = v + 1 WHERE id % 250 = 0")
    finally sp.conf.unset("spark.graft.gpx.rowLevelMode")
    val mFiles = GpxTable.listFiles(Seq(tdir), conf)
      .filter(f => new org.apache.hadoop.fs.Path(f).getName.startsWith("m"))
    assert(mFiles.nonEmpty, "expected delta insert files")
    mFiles.foreach { f =>
      assert(graft.format.GpxFileReader.FooterCache.get(f, conf)
        .sortedBy == Seq("id"),
        s"delta insert file lost the sortedBy claim: $f")
    }
    assert(sp.table("gsrtm.db.t").count() == 2000)
  }

  test("catalog rejects malformed range_by specs at CREATE") {
    val wh = Files.createTempDirectory("gpx_range_bad").toString
    sp.conf.set("spark.sql.catalog.grngb", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.grngb.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS grngb.db")
    def bad(name: String, prop: String): Unit = {
      val e = intercept[Exception](sp.sql(
        s"""CREATE TABLE grngb.db.$name (id BIGINT, s STRING) USING gpx
           |TBLPROPERTIES('range_by'='$prop')""".stripMargin))
      assert(e.getMessage != null)
    }
    bad("t1", "id")            // no bounds
    bad("t2", "id:9,3")        // unsorted
    bad("t3", "id:x")          // non-numeric
    bad("t4", "s:10")          // non-integer column
    bad("t5", "missing:10")    // unknown column
  }

  test("catalog range_by property: INSERT routes, DELETE keeps the layout") {
    val wh = Files.createTempDirectory("gpx_range_wh").toString
    sp.conf.set("spark.sql.catalog.grng", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.grng.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS grng.db")
    sp.sql("""CREATE TABLE grng.db.t (id BIGINT, s STRING) USING gpx
             |TBLPROPERTIES('range_by'='id:1000,2000')""".stripMargin)
    sp.sql("INSERT INTO grng.db.t SELECT id, CAST(id AS STRING) FROM range(3000)")
    val tdir = s"$wh/db/t"
    assert(GpxTable.readRangeSpec(tdir, conf)
      .contains(GpxTable.RangeSpec("id", Seq(1000L, 2000L))))
    val files = GpxTable.listFiles(Seq(tdir), conf)
    assert(files.flatMap(GpxTable.rangeOfFile).toSet == Set(0, 1, 2))
    // a range-bounded COW delete rewrites survivors INTO range files
    sp.conf.set("spark.graft.gpx.deleteMode", "cow")
    try sp.sql("DELETE FROM grng.db.t WHERE id BETWEEN 500 AND 1499")
    finally sp.conf.unset("spark.graft.gpx.deleteMode")
    assert(sp.table("grng.db.t").count() == 2000)
    val after = GpxTable.listFiles(Seq(tdir), conf)
    assert(after.flatMap(GpxTable.rangeOfFile).size == after.size,
      "delete survivors must keep range routing tags")
    val q = sp.table("grng.db.t").filter(col("id") === 2500L)
    assert(scannedPaths(q).forall(GpxTable.rangeOfFile(_).contains(2)))
  }
}
