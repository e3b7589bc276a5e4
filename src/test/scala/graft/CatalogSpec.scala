package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

class CatalogSpec extends GraftSpec {
  private val sp = TestSpark.spark

  test("CREATE TABLE / INSERT / SELECT / ANALYZE / DROP through SQL") {
    val wh = Files.createTempDirectory("gpx_wh").toString
    sp.conf.set("spark.sql.catalog.graft", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.graft.warehouse", wh)

    sp.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sp.sql("""CREATE TABLE graft.db.items (
             |  id BIGINT, name STRING, price DOUBLE, day DATE
             |) USING gpx""".stripMargin)
    assert(sp.sql("SHOW TABLES IN graft.db").count() == 1)

    sp.sql("""INSERT INTO graft.db.items VALUES
             |  (1, 'a', 1.5, DATE '2024-01-01'),
             |  (2, 'b', 2.5, DATE '2024-01-02'),
             |  (3, NULL, NULL, NULL)""".stripMargin)
    val rows = sp.sql("SELECT * FROM graft.db.items ORDER BY id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "a" && rows(2).isNullAt(1))

    // second insert appends
    sp.sql("INSERT INTO graft.db.items VALUES (4, 'd', 4.0, DATE '2024-01-04')")
    assert(sp.sql("SELECT count(*) FROM graft.db.items").head.getLong(0) == 4)

    // v2 CBO stats come from SupportsReportStatistics (footer-derived),
    // not ANALYZE TABLE (v1-only command)
    val stats = sp.table("graft.db.items").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong == 4L), stats)

    // rename + drop
    sp.sql("ALTER TABLE graft.db.items RENAME TO db.items2")
    assert(sp.sql("SELECT count(*) FROM graft.db.items2").head.getLong(0) == 4)
    sp.sql("DROP TABLE graft.db.items2")
    assert(sp.sql("SHOW TABLES IN graft.db").count() == 0)
  }

  test("storage-partitioned join: bucketed gpx tables join with zero Exchange") {
    val wh = Files.createTempDirectory("gpx_spj").toString
    sp.conf.set("spark.sql.catalog.gspj", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gspj.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gspj.db")
    sp.sql("CREATE TABLE gspj.db.t1 (k BIGINT, v BIGINT) USING gpx")
    sp.sql("CREATE TABLE gspj.db.t2 (k BIGINT, w BIGINT) USING gpx")
    import sp.implicits._
    // write the bucketed layout directly into the catalog table dirs
    (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v")
      .write.format("gpx").mode("append")
      .option("bucketBy", "k").option("numBuckets", "4").save(s"$wh/db/t1")
    (0L until 1000L).map(i => (i % 89, i * 3)).toDF("k", "w")
      .write.format("gpx").mode("append")
      .option("bucketBy", "k").option("numBuckets", "4").save(s"$wh/db/t2")

    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = keys.map { case (k, _) => k -> sp.conf.getOption(k) }
    keys.foreach { case (k, v) => sp.conf.set(k, v) }
    try {
      val j = sp.table("gspj.db.t1").join(sp.table("gspj.db.t2"), "k")
      val agg = j.agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      val plan = agg.queryExecution.executedPlan
      val exchangesBelowJoin = plan.collect {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          (smj.left.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e } ++
            smj.right.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }).size
      }
      assert(exchangesBelowJoin.nonEmpty, s"no SMJ found:\n$plan")
      assert(exchangesBelowJoin.forall(_ == 0),
        s"join inputs still shuffle:\n$plan")
      // correctness vs a plain (shuffled) computation
      val t1 = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v")
      val t2 = (0L until 1000L).map(i => (i % 89, i * 3)).toDF("k", "w")
      val want = t1.join(t2, "k").agg(count(lit(1)), sum($"v" + $"w")).head.toSeq
      assert(agg.head.toSeq == want)
    } finally saved.foreach {
      case (k, Some(v)) => sp.conf.set(k, v)
      case (k, None) => sp.conf.unset(k)
    }
  }

  test("CREATE TABLE ... PARTITIONED BY (bucket(n, col)): SQL-declared bucketed layout") {
    val wh = Files.createTempDirectory("gpx_ddlb").toString
    sp.conf.set("spark.sql.catalog.gddl", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gddl.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gddl.db")
    sp.sql("""CREATE TABLE gddl.db.b1 (k BIGINT, v BIGINT) USING gpx
             |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sp.sql("""CREATE TABLE gddl.db.b2 (k BIGINT, w BIGINT) USING gpx
             |PARTITIONED BY (bucket(4, k))""".stripMargin)
    // the layout is table metadata: plain INSERTs route rows by bucket
    sp.sql("""INSERT INTO gddl.db.b1
             |SELECT id % 97 AS k, id AS v FROM range(2000)""".stripMargin)
    sp.sql("""INSERT INTO gddl.db.b2
             |SELECT id % 89 AS k, id * 3 AS w FROM range(1000)""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    val spec = graft.format.GpxTable.readBucketSpec(s"$wh/db/b1", conf)
    assert(spec.contains(graft.format.GpxTable.BucketSpec("k", 4)))
    assert(graft.format.GpxTable.listFiles(Seq(s"$wh/db/b1"), conf)
      .forall(f => graft.format.GpxTable.bucketOfFile(f).isDefined),
      "INSERT into a DDL-bucketed table must write bucketed files")

    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = keys.map { case (k, _) => k -> sp.conf.getOption(k) }
    keys.foreach { case (k, v) => sp.conf.set(k, v) }
    try {
      import sp.implicits._
      val j = sp.table("gddl.db.b1").join(sp.table("gddl.db.b2"), "k")
      val agg = j.agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      val plan = agg.queryExecution.executedPlan
      val exchangesBelowJoin = plan.collect {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          (smj.left.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e } ++
            smj.right.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }).size
      }
      assert(exchangesBelowJoin.nonEmpty, s"no SMJ found:\n$plan")
      assert(exchangesBelowJoin.forall(_ == 0),
        s"join inputs still shuffle:\n$plan")
      val t1 = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v")
      val t2 = (0L until 1000L).map(i => (i % 89, i * 3)).toDF("k", "w")
      val want = t1.join(t2, "k").agg(count(lit(1)), sum($"v" + $"w")).head.toSeq
      assert(agg.head.toSeq == want)
    } finally saved.foreach {
      case (k, Some(v)) => sp.conf.set(k, v)
      case (k, None) => sp.conf.unset(k)
    }
    // non-bucket transforms are rejected with a clear error
    val e = intercept[Exception](
      sp.sql("CREATE TABLE gddl.db.bad (k BIGINT, d DATE) USING gpx PARTITIONED BY (d)"))
    assert(e.getMessage.contains("bucket"))
  }

  test("TBLPROPERTIES sort_by: SQL-declared ordered layout clusters INSERTs") {
    val wh = Files.createTempDirectory("gpx_ddls").toString
    sp.conf.set("spark.sql.catalog.gsrt", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gsrt.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gsrt.db")
    sp.sql("""CREATE TABLE gsrt.db.t (id BIGINT, v STRING) USING gpx
             |TBLPROPERTIES ('sort_by' = 'id')""".stripMargin)
    // INSERT deliberately scrambled input; the table's ordered layout
    // must sort it before the writer sees rows
    sp.sql("""INSERT INTO gsrt.db.t
             |SELECT (id * 48271) % 20011 AS id, CAST(id AS STRING) AS v
             |FROM range(20011)""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    assert(graft.format.GpxTable.readSortSpec(s"$wh/db/t", conf) == Seq("id"))
    val files = graft.format.GpxTable.listFiles(Seq(s"$wh/db/t"), conf)
    // every file is internally ordered: row-group min/max ranges on the
    // sort column must not overlap within a file
    files.foreach { f =>
      val footer = graft.format.GpxFileReader.readFooter(f, conf)
      val i = footer.schema.fieldIndex("id")
      val ranges = footer.rowGroups.toSeq.map { rg =>
        val st = rg.chunks(i).stats
        (st.minLong, st.maxLong)
      }
      ranges.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) =>
          assert(aMax <= bMin, s"row groups out of order in $f: $ranges")
        case _ => ()
      }
    }
    assert(sp.table("gsrt.db.t").count() == 20011)

    // ALTER ... SET TBLPROPERTIES turns the layout on for existing tables
    sp.sql("""CREATE TABLE gsrt.db.u (id BIGINT, v STRING) USING gpx""")
    sp.sql("ALTER TABLE gsrt.db.u SET TBLPROPERTIES ('sort_by' = 'id')")
    assert(graft.format.GpxTable.readSortSpec(s"$wh/db/u", conf) == Seq("id"))
    sp.sql("""INSERT INTO gsrt.db.u
             |SELECT (id * 48271) % 4999 AS id, CAST(id AS STRING) AS v
             |FROM range(4999)""".stripMargin)
    val uf = graft.format.GpxTable.listFiles(Seq(s"$wh/db/u"), conf)
    uf.foreach { f =>
      val footer = graft.format.GpxFileReader.readFooter(f, conf)
      val i = footer.schema.fieldIndex("id")
      val rs = footer.rowGroups.toSeq.map(rg =>
        (rg.chunks(i).stats.minLong, rg.chunks(i).stats.maxLong))
      rs.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin, s"$f: $rs")
        case _ => ()
      }
    }
    sp.sql("ALTER TABLE gsrt.db.u UNSET TBLPROPERTIES ('sort_by')")
    assert(graft.format.GpxTable.readSortSpec(s"$wh/db/u", conf).isEmpty)
  }

  test("INSERT OVERWRITE keeps the catalog record and the bucket layout") {
    val wh = Files.createTempDirectory("gpx_ovw").toString
    sp.conf.set("spark.sql.catalog.govw", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.govw.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS govw.db")
    sp.sql("""CREATE TABLE govw.db.t (k BIGINT, v BIGINT) USING gpx
             |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sp.sql("INSERT INTO govw.db.t SELECT id, id FROM range(100)")
    sp.sql("INSERT OVERWRITE govw.db.t SELECT id, id * 2 FROM range(50)")
    assert(sp.sql("SELECT count(*) FROM govw.db.t").head.getLong(0) == 50)
    val conf = new org.apache.hadoop.conf.Configuration()
    assert(graft.format.GpxTable.readBucketSpec(s"$wh/db/t", conf).isDefined,
      "bucket layout must survive INSERT OVERWRITE")
    assert(graft.format.GpxTable.listFiles(Seq(s"$wh/db/t"), conf)
      .forall(f => graft.format.GpxTable.bucketOfFile(f).isDefined))
  }

  test("SQL time travel: FOR TIMESTAMP/VERSION AS OF on catalog tables") {
    val wh = Files.createTempDirectory("gpx_tt").toString
    sp.conf.set("spark.sql.catalog.gtt", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gtt.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gtt.db")
    sp.sql("CREATE TABLE gtt.db.t (id BIGINT, v STRING) USING gpx")
    sp.sql("INSERT INTO gtt.db.t VALUES (1, 'one'), (2, 'two')")
    // catalog INSERTs stamp epoch-micros commitTs
    Thread.sleep(5)
    val cut = java.time.Instant.now()
    Thread.sleep(5)
    sp.sql("INSERT INTO gtt.db.t VALUES (3, 'three')")
    assert(sp.sql("SELECT count(*) FROM gtt.db.t").head.getLong(0) == 3)
    // session TZ is UTC: format the literal in UTC, not the JVM default
    val cutLit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC).format(cut)
    assert(sp.sql(
      s"SELECT count(*) FROM gtt.db.t FOR TIMESTAMP AS OF '$cutLit'")
      .head.getLong(0) == 2)
    // VERSION AS OF takes a raw commitTs long
    val cutMicros = cut.getEpochSecond * 1000000L + cut.getNano / 1000
    assert(sp.sql(
      s"SELECT count(*) FROM gtt.db.t FOR VERSION AS OF $cutMicros")
      .head.getLong(0) == 2)
  }

  test("FOR VERSION AS OF rejects non-numeric versions with a clear error") {
    val wh = Files.createTempDirectory("gpx_ttv").toString
    sp.conf.set("spark.sql.catalog.gttv", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gttv.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gttv.db")
    sp.sql("CREATE TABLE gttv.db.t (id BIGINT) USING gpx")
    val e = intercept[Exception] {
      sp.sql("SELECT * FROM gttv.db.t FOR VERSION AS OF 'not-a-ts'").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not-a-ts")), msgs(e))
  }

  test("DELETE preserves surviving rows' commitTs for pre-delete time travel") {
    val wh = Files.createTempDirectory("gpx_ttd").toString
    sp.conf.set("spark.sql.catalog.gttd", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gttd.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gttd.db")
    sp.sql("CREATE TABLE gttd.db.t (id BIGINT, v STRING) USING gpx")
    sp.sql("INSERT INTO gttd.db.t SELECT id, concat('a', id) FROM range(0, 10)")
    Thread.sleep(5)
    val cut = java.time.Instant.now()
    val cutMicros = cut.getEpochSecond * 1000000L + cut.getNano / 1000
    Thread.sleep(5)
    sp.sql("INSERT INTO gttd.db.t SELECT id, concat('b', id) FROM range(100, 110)")
    // the delete touches only the first file; its SURVIVORS must stay
    // visible at the pre-delete snapshot with their original commitTs
    sp.sql("DELETE FROM gttd.db.t WHERE id = 5")
    assert(sp.sql("SELECT count(*) FROM gttd.db.t").head.getLong(0) == 19)
    val atCut = sp.sql(
      s"SELECT id FROM gttd.db.t FOR VERSION AS OF $cutMicros ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    // 9 survivors of batch 1; the deleted row is gone from history (the
    // documented copy-on-write stance); batch 2 is after the cut
    assert(atCut == (0L until 10L).filterNot(_ == 5L), atCut)
  }

  test("UPDATE/MERGE preserve scanned rows' commitTs for pre-op time travel") {
    val wh = Files.createTempDirectory("gpx_ttu").toString
    sp.conf.set("spark.sql.catalog.gttu", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gttu.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gttu.db")
    sp.sql("CREATE TABLE gttu.db.t (id BIGINT, v STRING) USING gpx")
    sp.sql("INSERT INTO gttu.db.t SELECT id, concat('a', id) FROM range(0, 10)")
    Thread.sleep(5)
    val cutMicros = {
      val i = java.time.Instant.now()
      i.getEpochSecond * 1000000L + i.getNano / 1000
    }
    Thread.sleep(5)
    // copy-on-write rewrite of the whole file: pass-through rows (and the
    // updated row, with its CURRENT value — the documented approximation)
    // must keep their original commitTs
    sp.sql("UPDATE gttu.db.t SET v = 'x' WHERE id = 5")
    assert(sp.sql(
      s"SELECT count(*) FROM gttu.db.t FOR VERSION AS OF $cutMicros")
      .head.getLong(0) == 10)
    // MERGE: matched update + unmatched insert; the INSERTED row gets a
    // fresh ts (invisible pre-op), every scanned row keeps its ts
    sp.sql("CREATE TABLE gttu.db.src (id BIGINT, v STRING) USING gpx")
    sp.sql("INSERT INTO gttu.db.src VALUES (3, 'm3'), (200, 'new')")
    sp.sql(
      """MERGE INTO gttu.db.t t USING gttu.db.src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(sp.sql("SELECT count(*) FROM gttu.db.t").head.getLong(0) == 11)
    val atCut = sp.sql(
      s"SELECT id FROM gttu.db.t FOR VERSION AS OF $cutMicros ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(atCut == (0L until 10L), atCut)
    val insertedTs = sp.sql(
      "SELECT _commit_ts FROM gttu.db.t WHERE id = 200").head.getLong(0)
    assert(insertedTs > cutMicros)
  }

  test("_commit_ts resolves as a metadata column in SQL") {
    val wh = Files.createTempDirectory("gpx_mc").toString
    sp.conf.set("spark.sql.catalog.gmc", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gmc.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gmc.db")
    sp.sql("CREATE TABLE gmc.db.t (id BIGINT) USING gpx")
    sp.sql("INSERT INTO gmc.db.t VALUES (1), (2)")
    Thread.sleep(5)
    sp.sql("INSERT INTO gmc.db.t VALUES (3)")
    val rows = sp.sql(
      "SELECT id, _commit_ts FROM gmc.db.t ORDER BY id").collect()
    assert(rows.length == 3)
    val ts = rows.map(_.getLong(1))
    assert(ts.forall(_ > 0L))
    assert(ts(0) == ts(1) && ts(2) > ts(0), ts.toSeq)
    // SELECT * must NOT include the metadata column
    assert(sp.sql("SELECT * FROM gmc.db.t").schema.fieldNames.toSeq == Seq("id"))
  }

  test("SQL DELETE rewrites only zone-map-affected files") {
    val wh = Files.createTempDirectory("gpx_del").toString
    sp.conf.set("spark.sql.catalog.gdel", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gdel.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gdel.db")
    sp.sql("CREATE TABLE gdel.db.t (id BIGINT, v STRING) USING gpx")
    // two disjoint-id files (separate INSERTs -> separate gpx files)
    sp.sql("INSERT INTO gdel.db.t SELECT id, concat('a', id) FROM range(0, 100)")
    sp.sql("INSERT INTO gdel.db.t SELECT id, concat('b', id) FROM range(1000, 1100)")
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = s"$wh/db/t"
    val before = graft.format.GpxTable.listFiles(Seq(dir), conf)
      .map(f => f -> graft.format.GpxFs.stat(f, conf).get.mtime).toMap
    assert(before.size >= 2)
    sp.sql("DELETE FROM gdel.db.t WHERE id >= 1050 AND id < 1060")
    assert(sp.sql("SELECT count(*) FROM gdel.db.t").head.getLong(0) == 190)
    assert(sp.sql("SELECT count(*) FROM gdel.db.t WHERE id >= 1000").head.getLong(0) == 90)
    // the low-id file's zone maps exclude the predicate: bytes untouched
    val after = graft.format.GpxTable.listFiles(Seq(dir), conf)
      .map(f => f -> graft.format.GpxFs.stat(f, conf).get.mtime).toMap
    val untouched = before.keys.filter(after.contains).filter(f =>
      before(f) == after(f))
    assert(untouched.nonEmpty, "low-id file should not be rewritten")
    // delete-all on a file: it disappears instead of becoming empty
    sp.sql("DELETE FROM gdel.db.t WHERE id < 100")
    assert(sp.sql("SELECT count(*) FROM gdel.db.t").head.getLong(0) == 90)
    // null-predicate rows survive (SQL DELETE removes only TRUE rows)
    sp.sql("INSERT INTO gdel.db.t VALUES (5000, NULL)")
    sp.sql("DELETE FROM gdel.db.t WHERE v LIKE 'b%'")
    assert(sp.sql("SELECT count(*) FROM gdel.db.t").head.getLong(0) == 1)
    assert(sp.sql("SELECT id FROM gdel.db.t").head.getLong(0) == 5000L)
  }

  test("SQL UPDATE rewrites only affected files (copy-on-write)") {
    val wh = Files.createTempDirectory("gpx_upd").toString
    sp.conf.set("spark.sql.catalog.gupd", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gupd.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gupd.db")
    sp.sql("CREATE TABLE gupd.db.t (id BIGINT, v STRING, n BIGINT) USING gpx")
    sp.sql("INSERT INTO gupd.db.t SELECT id, concat('a', id), id FROM range(0, 100)")
    sp.sql("INSERT INTO gupd.db.t SELECT id, concat('b', id), id FROM range(1000, 1100)")
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = s"$wh/db/t"
    val before = graft.format.GpxTable.listFiles(Seq(dir), conf)
      .map(f => f -> graft.format.GpxFs.stat(f, conf).get.mtime).toMap
    sp.sql("UPDATE gupd.db.t SET v = 'patched', n = n * 10 WHERE id >= 1050 AND id < 1060")
    assert(sp.sql("SELECT count(*) FROM gupd.db.t").head.getLong(0) == 200)
    assert(sp.sql("SELECT count(*) FROM gupd.db.t WHERE v = 'patched'")
      .head.getLong(0) == 10)
    assert(sp.sql("SELECT sum(n) FROM gupd.db.t WHERE id >= 1050 AND id < 1060")
      .head.getLong(0) == (1050L until 1060L).map(_ * 10).sum)
    // unchanged rows of the rewritten file survive intact
    assert(sp.sql("SELECT count(*) FROM gupd.db.t WHERE v LIKE 'b%'")
      .head.getLong(0) == 90)
    // the low-id file's zone maps exclude the predicate: bytes untouched
    val after = graft.format.GpxTable.listFiles(Seq(dir), conf)
      .map(f => f -> graft.format.GpxFs.stat(f, conf).get.mtime).toMap
    assert(before.keys.exists(f => after.get(f).contains(before(f))),
      "unaffected file must keep its bytes")
    assert(before.keys.exists(f => !after.contains(f)),
      "affected file must be superseded")
  }

  test("UPDATE on a bucketed table keeps the storage-partitioned layout") {
    val wh = Files.createTempDirectory("gpx_updb").toString
    sp.conf.set("spark.sql.catalog.gub", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gub.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gub.db")
    sp.sql("""CREATE TABLE gub.db.t (k BIGINT, v BIGINT) USING gpx
             |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sp.sql("INSERT INTO gub.db.t SELECT id % 97, id FROM range(2000)")
    sp.sql("UPDATE gub.db.t SET v = v + 1000000 WHERE k = 13")
    // every file (original AND rewritten) still carries a bucket suffix
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = graft.format.GpxTable.listFiles(Seq(s"$wh/db/t"), conf)
    assert(files.nonEmpty &&
      files.forall(f => graft.format.GpxTable.bucketOfFile(f).isDefined),
      files.mkString("\n"))
    // values correct after the rewrite
    assert(sp.sql("SELECT count(*) FROM gub.db.t WHERE v >= 1000000")
      .head.getLong(0) ==
      (0L until 2000L).count(_ % 97 == 13))
    assert(sp.sql("SELECT count(*) FROM gub.db.t").head.getLong(0) == 2000)
    // self-join on the bucket key still plans with zero Exchange below it
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = keys.map { case (k, _) => k -> sp.conf.getOption(k) }
    keys.foreach { case (k, v) => sp.conf.set(k, v) }
    try {
      val j = sp.table("gub.db.t").as("a")
        .join(sp.table("gub.db.t").as("b"), "k")
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan
      val ex = plan.collect {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          (smj.left.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e } ++
            smj.right.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }).size
      }
      assert(ex.nonEmpty && ex.forall(_ == 0), s"shuffle reappeared:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => sp.conf.set(k, v)
      case (k, None) => sp.conf.unset(k)
    }
  }

  test("SQL MERGE INTO upserts through the row-level operation") {
    val wh = Files.createTempDirectory("gpx_mrg").toString
    sp.conf.set("spark.sql.catalog.gmrg", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gmrg.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gmrg.db")
    sp.sql("CREATE TABLE gmrg.db.t (id BIGINT, v STRING) USING gpx")
    sp.sql("INSERT INTO gmrg.db.t VALUES (1, 'one'), (2, 'two'), (3, 'three')")
    sp.sql("""MERGE INTO gmrg.db.t t
             |USING (SELECT * FROM VALUES (2, 'TWO'), (4, 'FOUR') AS s(id, v)) s
             |ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET t.v = s.v
             |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    val rows = sp.sql("SELECT id, v FROM gmrg.db.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (4L, "FOUR")))
    // MERGE with a DELETE action
    sp.sql("""MERGE INTO gmrg.db.t t
             |USING (SELECT * FROM VALUES (1, 'x') AS s(id, v)) s
             |ON t.id = s.id
             |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(sp.sql("SELECT count(*) FROM gmrg.db.t").head.getLong(0) == 3)
  }

  test("_file metadata column resolves and names the source file") {
    val wh = Files.createTempDirectory("gpx_fc").toString
    sp.conf.set("spark.sql.catalog.gfc", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gfc.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gfc.db")
    sp.sql("CREATE TABLE gfc.db.t (id BIGINT) USING gpx")
    sp.sql("INSERT INTO gfc.db.t VALUES (1)")
    sp.sql("INSERT INTO gfc.db.t VALUES (2)")
    val rows = sp.sql("SELECT id, _file FROM gfc.db.t ORDER BY id").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(1).endsWith(".gpx")))
    // two inserts -> two distinct source files
    assert(rows.map(_.getString(1)).distinct.length == 2)
  }

  test("MERGE runtime group filter: untouched files keep their bytes") {
    val wh = Files.createTempDirectory("gpx_mgf").toString
    sp.conf.set("spark.sql.catalog.gmgf", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gmgf.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gmgf.db")
    sp.sql("CREATE TABLE gmgf.db.t (id BIGINT, v BIGINT) USING gpx")
    // two disjoint-id files; the MERGE source touches only the second
    sp.sql("INSERT INTO gmgf.db.t SELECT id, id FROM range(0, 100)")
    sp.sql("INSERT INTO gmgf.db.t SELECT id, id FROM range(1000, 1100)")
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = s"$wh/db/t"
    val before = graft.format.GpxTable.listFiles(Seq(dir), conf)
      .map(f => f -> graft.format.GpxFs.stat(f, conf).get.mtime).toMap
    // MERGE has NO static filter on the target: without runtime group
    // filtering on _file, BOTH files would be rewritten
    sp.sql("""MERGE INTO gmgf.db.t t
             |USING (SELECT * FROM VALUES (1050L, 1L), (2000L, 2L) AS s(id, v)) s
             |ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET t.v = s.v
             |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(sp.sql("SELECT count(*) FROM gmgf.db.t").head.getLong(0) == 201)
    assert(sp.sql("SELECT v FROM gmgf.db.t WHERE id = 1050").head.getLong(0) == 1L)
    assert(sp.sql("SELECT v FROM gmgf.db.t WHERE id = 2000").head.getLong(0) == 2L)
    assert(sp.sql("SELECT sum(v) FROM gmgf.db.t WHERE id < 100").head.getLong(0)
      == (0L until 100L).sum)
    val after = graft.format.GpxTable.listFiles(Seq(dir), conf)
      .map(f => f -> graft.format.GpxFs.stat(f, conf).get.mtime).toMap
    // the low-id file had no matches: its bytes must be untouched
    assert(before.keys.exists(f => after.get(f).contains(before(f))),
      s"low-id file was rewritten:\nbefore=$before\nafter=$after")
    // the high-id file had the match: it must be superseded
    assert(before.keys.exists(f => !after.contains(f)))
  }

  test("DELETE with a subquery predicate routes through the row-level path") {
    val wh = Files.createTempDirectory("gpx_dsq").toString
    sp.conf.set("spark.sql.catalog.gdsq", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gdsq.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gdsq.db")
    sp.sql("CREATE TABLE gdsq.db.t (id BIGINT, v STRING) USING gpx")
    sp.sql("CREATE TABLE gdsq.db.bad (id BIGINT) USING gpx")
    sp.sql("INSERT INTO gdsq.db.t SELECT id, concat('v', id) FROM range(0, 50)")
    sp.sql("INSERT INTO gdsq.db.bad VALUES (7), (13), (42)")
    sp.sql("DELETE FROM gdsq.db.t WHERE id IN (SELECT id FROM gdsq.db.bad)")
    assert(sp.sql("SELECT count(*) FROM gdsq.db.t").head.getLong(0) == 47)
    assert(sp.sql("SELECT count(*) FROM gdsq.db.t WHERE id IN (7, 13, 42)")
      .head.getLong(0) == 0)
  }

  test("DELETE by _file metadata column routes through the row-level path") {
    val wh = Files.createTempDirectory("gpx_delf").toString
    sp.conf.set("spark.sql.catalog.gdf", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gdf.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gdf.db")
    sp.sql("CREATE TABLE gdf.db.t (id BIGINT) USING gpx")
    sp.sql("INSERT INTO gdf.db.t SELECT id FROM range(0, 50)")
    sp.sql("INSERT INTO gdf.db.t SELECT id FROM range(100, 150)")
    val victim = sp.sql("SELECT _file FROM gdf.db.t WHERE id = 120")
      .head.getString(0)
    val inVictim = sp.sql(
      s"SELECT count(*) FROM gdf.db.t WHERE _file = '$victim'").head.getLong(0)
    assert(inVictim > 0)
    sp.sql(s"DELETE FROM gdf.db.t WHERE _file = '$victim'")
    assert(sp.sql("SELECT count(*) FROM gdf.db.t").head.getLong(0) ==
      100 - inVictim)
    assert(sp.sql("SELECT count(*) FROM gdf.db.t WHERE id = 120")
      .head.getLong(0) == 0)
  }

  test("schema evolution: DROP COLUMN and RENAME COLUMN across existing files") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val wh = Files.createTempDirectory("gpx_whse").toString
    sp.conf.set("spark.sql.catalog.gse", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gse.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gse.db")
    sp.sql("CREATE TABLE gse.db.t (id BIGINT, v BIGINT, junk STRING) USING gpx")
    sp.sql("INSERT INTO gse.db.t VALUES (1, 10, 'x'), (2, 20, 'y')")

    // RENAME: files written BEFORE the rename serve the new name through
    // the alias chain; files written AFTER carry the new physical name
    sp.sql("ALTER TABLE gse.db.t RENAME COLUMN v TO val")
    sp.sql("INSERT INTO gse.db.t VALUES (3, 30, 'z')")
    val rows = sp.sql("SELECT id, val FROM gse.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      s"renamed column must read across old and new files: ${rows.toSeq}")
    // filters on the renamed column stay correct over old files (zone
    // maps are conservatively bypassed there, never wrong)
    assert(sp.sql("SELECT count(*) FROM gse.db.t WHERE val >= 20")
      .head.getLong(0) == 2)

    // chained rename: a second rename still reaches the ORIGINAL files
    sp.sql("ALTER TABLE gse.db.t RENAME COLUMN val TO amount")
    assert(sp.sql("SELECT sum(amount) FROM gse.db.t").head.getLong(0) == 60)

    // DROP: the column disappears from reads; old files keep their bytes
    sp.sql("ALTER TABLE gse.db.t DROP COLUMN junk")
    assert(!sp.table("gse.db.t").columns.contains("junk"))
    assert(sp.sql("SELECT * FROM gse.db.t").columns.toSeq ==
      Seq("id", "amount"))

    // re-adding a dropped name is refused: pre-drop files would serve the
    // stale bytes under the resurrected name
    val e1 = intercept[Exception](
      sp.sql("ALTER TABLE gse.db.t ADD COLUMN junk STRING"))
    assert(e1.getMessage.contains("previously dropped"), e1.getMessage)
    // renaming TO a historical physical name is refused for the same reason
    val e2 = intercept[Exception](
      sp.sql("ALTER TABLE gse.db.t RENAME COLUMN amount TO v"))
    assert(e2.getMessage.contains("used before"), e2.getMessage)
    // a genuinely fresh name is fine, and old files null-fill it
    sp.sql("ALTER TABLE gse.db.t ADD COLUMN note STRING")
    assert(sp.sql("SELECT count(*) FROM gse.db.t WHERE note IS NULL")
      .head.getLong(0) == 3)

    // layout protection: dropping/renaming a layout column is refused
    sp.sql("CREATE TABLE gse.db.s (k BIGINT, v BIGINT) USING gpx " +
      "TBLPROPERTIES ('sort_by' = 'k')")
    val e3 = intercept[Exception](sp.sql("ALTER TABLE gse.db.s DROP COLUMN k"))
    assert(e3.getMessage.contains("layout"), e3.getMessage)
    // renaming a sort column rewrites the spec so later INSERTs still sort
    sp.sql("ALTER TABLE gse.db.s RENAME COLUMN k TO key")
    sp.sql("INSERT INTO gse.db.s VALUES (5, 1), (3, 2), (4, 3)")
    assert(graft.format.GpxTable.readSortSpec(s"$wh/db/s", conf) == Seq("key"))
    assert(sp.sql("SELECT sum(key) FROM gse.db.s").head.getLong(0) == 12)
  }

  test("saveAsTable / spark.table round-trip via catalog") {
    val wh = Files.createTempDirectory("gpx_wh2").toString
    sp.conf.set("spark.sql.catalog.graft2", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.graft2.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS graft2.db")
    Tables.part(sp, sf).writeTo("graft2.db.part").using("gpx").create()
    val back = sp.table("graft2.db.part")
    assert(back.count() == Tables.part(sp, sf).count())
    assert(back.exceptAll(Tables.part(sp, sf)).count() == 0)
  }
}

class ExtensionsSpec extends GraftSpec {
  test("GraftExtensions registers cos_sim / sorted_jaccard as SQL functions") {
    val old = TestSpark.spark // keep the shared session alive
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      try {
        val cos = s2.sql(
          "SELECT cos_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head.getDouble(0)
        assert(math.abs(cos - 1.0) < 1e-12)
        val j = s2.sql(
          "SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j").head.getDouble(0)
        assert(j == 0.5)
        // orthogonal vectors
        assert(s2.sql("SELECT cos_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
          .head.getDouble(0) == 0.0)
      } finally {
        // do NOT s2.stop(): it would stop the JVM-shared SparkContext
        // out from under every other suite
      }
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(old)
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
    }
  }

  test("TBLPROPERTIES index: DDL-managed point index builds, serves, drops") {
    val sp = spark
    val wh = java.nio.file.Files.createTempDirectory("gpxidx").toString
    sp.conf.set("spark.sql.catalog.gidx", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gidx.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gidx.db")
    sp.sql("CREATE TABLE gidx.db.t (k BIGINT, g BIGINT, v STRING) USING gpx")
    sp.sql("""INSERT INTO gidx.db.t
             |SELECT id AS k, id % 7 AS g, CONCAT('v', id) AS v
             |FROM range(5000)""".stripMargin)
    val dir = s"$wh/db/t"
    val conf = new org.apache.hadoop.conf.Configuration()
    // single-column index via DDL
    sp.sql("ALTER TABLE gidx.db.t SET TBLPROPERTIES('index'='k')")
    assert(graft.format.GpxPointIndex.valid(dir, "k", conf),
      "DDL-built index must be valid for the current listing")
    assert(sp.sql("SELECT v FROM gidx.db.t WHERE k = 4321").head.getString(0)
      == "v4321")
    // compound index via DDL
    sp.sql("ALTER TABLE gidx.db.t SET TBLPROPERTIES('index'='g,k')")
    assert(sp.sql("SELECT v FROM gidx.db.t WHERE g = 3 AND k = 3006")
      .head.getString(0) == "v3006") // 3006 % 7 == 3: the tuple exists
    // unknown column is rejected
    val e = intercept[Exception](
      sp.sql("ALTER TABLE gidx.db.t SET TBLPROPERTIES('index'='nope')"))
    assert(e.getMessage.contains("not in schema"))
    // UNSET drops every index
    sp.sql("ALTER TABLE gidx.db.t UNSET TBLPROPERTIES('index')")
    assert(!graft.format.GpxPointIndex.valid(dir, "k", conf))
    assert(sp.sql("SELECT count(*) FROM gidx.db.t WHERE k = 77").head.getLong(0)
      == 1L, "dropped index must fall back to the scan, not lose rows")
  }

  test("historical physical names can never be re-added (rename and rename-then-drop)") {
    val sp = spark
    val wh = java.nio.file.Files.createTempDirectory("gpx_wh_hist").toString
    sp.conf.set("spark.sql.catalog.ghist", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.ghist.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS ghist.db")
    sp.sql("CREATE TABLE ghist.db.t (id BIGINT, a BIGINT) USING gpx")
    sp.sql("INSERT INTO ghist.db.t VALUES (1, 100), (2, 200)")
    sp.sql("ALTER TABLE ghist.db.t RENAME COLUMN a TO b")
    // pre-rename files physically carry 'a' (the old bytes of b):
    // re-adding 'a' would serve b's stale data under the new name
    val e1 = intercept[Exception](
      sp.sql("ALTER TABLE ghist.db.t ADD COLUMN a BIGINT"))
    assert(e1.getMessage.contains("renamed-away"), e1.getMessage)
    // rename-then-drop: the tombstone must cover the ALIAS too
    sp.sql("ALTER TABLE ghist.db.t DROP COLUMN b")
    val e2 = intercept[Exception](
      sp.sql("ALTER TABLE ghist.db.t ADD COLUMN a BIGINT"))
    assert(e2.getMessage != null, "re-adding the dropped column's old " +
      "physical alias must refuse")
    // a genuinely fresh name is fine, and reads null over old files
    sp.sql("ALTER TABLE ghist.db.t ADD COLUMN c BIGINT")
    val rows = sp.sql("SELECT id, c FROM ghist.db.t ORDER BY id").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(1)))
  }

  test("DROP COLUMN drops projections that stored the column") {
    val sp = spark
    val wh = java.nio.file.Files.createTempDirectory("gpx_wh_dropproj").toString
    sp.conf.set("spark.sql.catalog.gdpj", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gdpj.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gdpj.db")
    sp.sql("CREATE TABLE gdpj.db.t (a BIGINT, b BIGINT, c BIGINT) USING gpx")
    sp.sql("INSERT INTO gdpj.db.t VALUES (1, 10, 100), (2, 20, 200)")
    sp.sql("ALTER TABLE gdpj.db.t SET TBLPROPERTIES('projection.p'='a,c')")
    val dir = s"$wh/db/t"
    val conf = new org.apache.hadoop.conf.Configuration()
    assert(graft.format.GpxProjection
      .listProjections(dir, conf).contains("p"))
    sp.sql("ALTER TABLE gdpj.db.t DROP COLUMN c")
    assert(!graft.format.GpxProjection.listProjections(dir, conf)
      .contains("p"),
      "a projection storing the dropped column can never rebuild — it " +
        "must be dropped, not leak as a permanently-stale copy")
    assert(sp.sql("SELECT sum(a) FROM gdpj.db.t").head.getLong(0) == 3L)
  }

  test("a failed CREATE TABLE leaves no half-created table behind") {
    val sp = spark
    val wh = java.nio.file.Files.createTempDirectory("gpx_wh_halfct").toString
    sp.conf.set("spark.sql.catalog.ghalf", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.ghalf.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS ghalf.db")
    // range_by + bucket are mutually exclusive: this CREATE must fail ...
    intercept[Exception](sp.sql(
      """CREATE TABLE ghalf.db.t (k BIGINT, v BIGINT) USING gpx
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES('range_by'='k:10,20')""".stripMargin))
    // ... WITHOUT persisting _schema.ddl first — the corrected retry
    // must succeed, not die on TableAlreadyExists
    sp.sql(
      """CREATE TABLE ghalf.db.t (k BIGINT, v BIGINT) USING gpx
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sp.sql("INSERT INTO ghalf.db.t VALUES (1, 10)")
    assert(sp.sql("SELECT count(*) FROM ghalf.db.t").head.getLong(0) == 1L)
  }
}
