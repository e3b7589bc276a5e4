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

  test("IMPORT registers pre-existing gpx files: plain dir and log table") {
    val sf = "/root/testdata/sf0.001"
    // pre-existing files: written by the normal writer API into a
    // STAGING dir that is not (and never becomes) the table
    val staging = TestSpark.tempDir("cli_import_src")
    sp.read.parquet(s"$sf/nation.parquet").write.format("gpx")
      .mode("overwrite").save(staging)
    val want = sp.read.parquet(s"$sf/nation.parquet")

    // plain-table adoption: IMPORT the whole staging dir
    val plain = TestSpark.tempDir("cli_import_plain")
    Cli.run(sp, Seq("IMPORT", staging, plain))
    val got = sp.read.format("gpx").load(plain)
    assert(got.count() == want.count())
    assert(got.agg(sum(col("n_nationkey"))).head.getLong(0) ==
      want.agg(sum(col("n_nationkey"))).head.getLong(0))
    // second import of the same files appends (fresh names, no clobber)
    Cli.run(sp, Seq("IMPORT", staging, plain))
    assert(sp.read.format("gpx").load(plain).count() == 2 * want.count())

    // log-table registration: one manifest append, atomically visible
    val log = TestSpark.tempDir("cli_import_log")
    sp.read.parquet(s"$sf/region.parquet").write.format("gpx")
      .mode("overwrite").option("commitProtocol", "manifest").save(log)
    val conf = sp.sparkContext.hadoopConfiguration
    assert(graft.format.GpxCommitLog.isLogTable(log, conf))
    val v0 = graft.format.GpxCommitLog.head(log, conf).get.version
    val regionStaging = TestSpark.tempDir("cli_import_src2")
    sp.read.parquet(s"$sf/region.parquet").write.format("gpx")
      .mode("overwrite").save(regionStaging)
    Cli.run(sp, Seq("IMPORT", regionStaging, log))
    assert(graft.format.GpxCommitLog.head(log, conf).get.version == v0 + 1,
      "import must publish as exactly one manifest commit")
    assert(sp.read.format("gpx").load(log).count() ==
      2 * sp.read.parquet(s"$sf/region.parquet").count())

    // schema-incompatible import is refused BEFORE any copy
    val otherStaging = TestSpark.tempDir("cli_import_bad")
    sp.range(5).selectExpr("CAST(id AS STRING) AS n_nationkey")
      .write.format("gpx").mode("overwrite").save(otherStaging)
    val before = sp.read.format("gpx").load(plain).inputFiles.length
    intercept[Exception](Cli.run(sp, Seq("IMPORT", otherStaging, plain)))
    assert(sp.read.format("gpx").load(plain).inputFiles.length == before,
      "a refused import must not leave adopted files behind")

    // a non-gpx source fails footer validation
    val junk = new java.io.File(TestSpark.tempDir("cli_import_junk"), "x.gpx")
    java.nio.file.Files.write(junk.toPath, "not a gpx file".getBytes)
    intercept[Exception](
      Cli.run(sp, Seq("IMPORT", junk.getAbsolutePath, plain)))

    // a source masked by delete SIDECARS is refused: the bitmap does not
    // travel with the data file, so adoption would resurrect the deleted
    // rows — and the refusal must hit the explicit-file form too
    val masked = TestSpark.tempDir("cli_import_masked")
    sp.range(0, 100).selectExpr("id", "id * 2 AS v")
      .coalesce(1).write.format("gpx").mode("overwrite").save(masked)
    val maskedSchema = sp.read.format("gpx").load(masked).schema
    val prevMode = sp.conf.getOption("spark.graft.gpx.deleteMode")
    sp.conf.set("spark.graft.gpx.deleteMode", "mor")
    try graft.format.GpxDelete.run(maskedSchema, Seq(masked),
      Array(org.apache.spark.sql.sources.LessThan("id", 10L): org.apache.spark.sql.sources.Filter))
    finally prevMode match {
      case Some(v) => sp.conf.set("spark.graft.gpx.deleteMode", v)
      case None => sp.conf.unset("spark.graft.gpx.deleteMode")
    }
    assert(sp.read.format("gpx").load(masked).count() == 90)
    val dest2 = TestSpark.tempDir("cli_import_masked_dest")
    val eDir = intercept[Exception](Cli.run(sp, Seq("IMPORT", masked, dest2)))
    assert(eDir.getMessage.contains("sidecars"), eDir.getMessage)
    val maskedFile = graft.format.GpxTable.listFiles(Seq(masked),
      sp.sparkContext.hadoopConfiguration).head
    val eFile = intercept[Exception](
      Cli.run(sp, Seq("IMPORT", maskedFile, dest2)))
    assert(eFile.getMessage.contains("sidecars"), eFile.getMessage)
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

  test("STAT prints the effective liveness boundary and its validation verdict") {
    val t = TestSpark.tempDir("cli_stat_liveness")
    Cli.run(sp, Seq("LOAD", "/root/testdata/sf0.001/region.parquet", t,
      "--overwrite"))
    def statOut(): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        Cli.run(sp, Seq("STAT", t))
      }
      bos.toString("UTF-8")
    }
    val out = statOut()
    val line = out.linesIterator.find(_.startsWith("STAT liveness"))
      .getOrElse(fail(s"no liveness line in:\n$out"))
    assert(line.contains("mutationLockTtlMs=") &&
      line.contains("vacuumGraceMs=") && line.contains("tombstoneGraceMs=") &&
      line.contains("validation=OK"), line)
    // a grace below the lock TTL must print the refusal, not crash STAT
    // (set via the Hadoop surface — the same one Cli.run hands the
    // format layer, so the test does not depend on thread-local
    // active-session state)
    sp.sparkContext.hadoopConfiguration.set("graft.gpx.vacuumGraceMs", "1")
    try {
      val bad = statOut().linesIterator.find(_.startsWith("STAT liveness")).get
      assert(bad.contains("INVALID") && bad.contains("validation=INVALID"), bad)
    } finally sp.sparkContext.hadoopConfiguration.unset("graft.gpx.vacuumGraceMs")
  }
}
