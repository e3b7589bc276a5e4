package graft

import graft.format.{GpxCommitLog, GpxFileReader}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

/** The conditional-put commit log on a well-behaved (local) filesystem:
  * append/overwrite/COW semantics, manifest-gated visibility, file-level
  * manifest pruning, conflict refusal, vacuum. The hostile-store half of
  * the contract lives in [[HostileStoreSpec]]. */
class ManifestSpec extends GraftSpec {
  private val conf = new Configuration()

  private def gpxFilesOnDisk(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    d.listFiles().toSeq.map(_.getName).filter(n =>
      n.endsWith(".gpx") && !n.startsWith("_") && !n.startsWith("."))
  }

  test("append and overwrite commit through the log; retired bytes live until vacuum") {
    val dir = tempDir("gpx_log_aov")
    spark.range(0, 100).selectExpr("id", "id * 2 as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))
    assert(spark.read.format("gpx").load(dir).count() == 100)

    // second append: rebased manifest version, both batches visible
    spark.range(100, 150).selectExpr("id", "id * 2 as v")
      .write.format("gpx").mode("append").save(dir)
    val afterAppend = spark.read.format("gpx").load(dir)
    assert(afterAppend.count() == 150)
    assert(afterAppend.agg(sum("v")).head.getLong(0) == (0L until 150).map(_ * 2).sum)

    // overwrite: only the new rows visible, but the OLD bytes still exist
    // on disk (retired, reclaimable) — manifest-gated visibility
    val liveBefore = gpxFilesOnDisk(dir).size
    spark.range(0, 10).selectExpr("id", "id as v")
      .write.format("gpx").mode("overwrite").save(dir)
    assert(spark.read.format("gpx").load(dir).count() == 10)
    assert(gpxFilesOnDisk(dir).size > liveBefore,
      "retired files must remain on disk until vacuum (old set + new files)")
    val headLive = GpxCommitLog.head(dir, conf).get.live.size
    assert(gpxFilesOnDisk(dir).size > headLive)

    // vacuum to the head only: disk converges to the live set, reads intact
    val (dataGone, mfGone) = GpxCommitLog.vacuum(dir, conf, keepVersions = 1, minAgeMs = 0)
    assert(dataGone > 0)
    assert(mfGone > 0)
    assert(gpxFilesOnDisk(dir).size == headLive)
    assert(spark.read.format("gpx").load(dir).count() == 10)

    // swept manifest slots become 0-byte TOMBSTONES, never deletions: a
    // deleted slot file would reopen the slot for putIfAbsent, and a
    // committer with a stale resolved base could then WIN it and commit
    // into a version no reader materializes — a silently lost commit
    // (the CrossProcessSpec append+vacuum fuzz caught exactly this)
    val commits = new java.io.File(s"$dir/_commits").listFiles()
      .filter(_.getName.endsWith(".mf"))
    val tombs = commits.filter(_.length == 0)
    assert(tombs.nonEmpty, "vacuum must leave tombstones for swept slots")
    // a tombstoned version reads as vacuumed away
    val tv = tombs.map(_.getName.replaceAll("[^0-9]", "").toLong).min
    assert(GpxCommitLog.snapshotAt(dir, tv, conf).isEmpty)
    // a second vacuum is idempotent: tombstones are not re-counted (and,
    // inside the grace window, not reclaimed)
    val (_, mfGone2) = GpxCommitLog.vacuum(dir, conf, keepVersions = 1, minAgeMs = 0)
    assert(mfGone2 == 0, s"tombstones recounted: $mfGone2")
    assert(new java.io.File(s"$dir/_commits").listFiles()
      .count(_.length == 0) == tombs.length)
    // and commits still land normally after sweeps
    spark.range(150, 160).selectExpr("id", "id as v")
      .write.format("gpx").mode("append").save(dir)
    assert(spark.read.format("gpx").load(dir).count() == 20)
  }

  test("schema rides in the manifest: inferSchema without any footer read") {
    val dir = tempDir("gpx_log_schema")
    spark.range(0, 50).selectExpr("id", "cast(id as int) as small", "'x' as s")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    // evolved append: small widens to long, extra column appears
    spark.range(50, 60)
      .selectExpr("id", "id as small", "'y' as s", "id * 1.5 as extra")
      .write.format("gpx").mode("append").save(dir)
    GpxFileReader.FooterCache.clear()
    val before = GpxFileReader.footerReads.get()
    val df = spark.read.format("gpx").load(dir)
    val fields = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("small") == "bigint", s"widened union schema, got $fields")
    assert(fields.contains("extra"))
    assert(GpxFileReader.footerReads.get() == before,
      "log-table schema resolution must not open footers")
    // extra is null for the first batch (nullable union)
    assert(df.filter("extra is null").count() == 50)
  }

  test("manifest file-level zone maps prune files before any footer access") {
    val dir = tempDir("gpx_log_prune")
    (0 until 20).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L)
        .selectExpr("id", "id as v", s"'b$i' as tag")
        .coalesce(1).write.format("gpx").mode("append")
        .option("commitProtocol", "manifest").save(dir)
    }
    GpxFileReader.FooterCache.clear()
    val before = GpxFileReader.footerReads.get()
    val got = spark.read.format("gpx").load(dir)
      .filter("v >= 5200 and v < 5300").agg(count("*"), sum("id")).head
    assert(got.getLong(0) == 100)
    assert(got.getLong(1) == (5200L until 5300L).sum)
    val delta = GpxFileReader.footerReads.get() - before
    // one matching file of 20: only its footer opens (the manifest prunes
    // the rest file-level). Small slack for incidental planning reads.
    assert(delta <= 3, s"expected ~1 footer read for 1 matching file, got $delta")
  }

  test("1000+ files: selective planning costs O(matching files) metadata reads, not O(table)") {
    val dir = tempDir("gpx_log_1k")
    // one commit, 1024 range-routed files with disjoint id spans
    spark.range(0, 102400)
      .repartitionByRange(1024, col("id"))
      .selectExpr("id", "id as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    val conf = new Configuration()
    val h = GpxCommitLog.head(dir, conf).get
    assert(h.live.size >= 1024, s"expected 1024+ files, got ${h.live.size}")
    // cold planner state: no cached footers, no parsed manifests
    GpxFileReader.FooterCache.clear()
    val footersBefore = GpxFileReader.footerReads.get()
    val n = spark.read.format("gpx").load(dir)
      .filter("v >= 50000 and v < 50050").count()
    assert(n == 50)
    val footerDelta = GpxFileReader.footerReads.get() - footersBefore
    // ~1 matching file of 1024: the manifest's file-level zone maps prune
    // the rest before ANY footer is opened. Slack covers a span straddling
    // a range boundary.
    assert(footerDelta <= 4,
      s"selective plan over 1024 files opened $footerDelta footers " +
        "(manifest pruning regressed to an O(table) walk)")
    // warm re-plan: zero footer reads at all
    val footersWarm = GpxFileReader.footerReads.get()
    assert(spark.read.format("gpx").load(dir)
      .filter("v >= 50000 and v < 50050").count() == 50)
    assert(GpxFileReader.footerReads.get() == footersWarm,
      "warm planning must serve footers from cache")
  }

  test("atVersion: manifest-version time travel reads exactly the pinned file set") {
    val dir = tempDir("gpx_log_tt")
    spark.range(0, 50).selectExpr("id", "id as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir) // v2 (v1 = enable seed)
    spark.range(50, 80).selectExpr("id", "id as v")
      .write.format("gpx").mode("append").save(dir) // v3
    spark.range(0, 5).selectExpr("id", "id as v")
      .write.format("gpx").mode("overwrite").save(dir) // v4
    val head = GpxCommitLog.head(dir, conf).get.version
    def countAt(v: Long): Long = spark.read.format("gpx")
      .option("atVersion", v.toString).load(dir).count()
    assert(countAt(head) == 5)
    assert(countAt(head - 1) == 80, "pre-overwrite version must read both appends")
    assert(countAt(head - 2) == 50)
    // unknown version: loud, names the table
    val e = intercept[Exception] {
      spark.read.format("gpx").option("atVersion", "99").load(dir).count()
    }
    assert(e.getMessage != null)
    // vacuum to the head retires old manifests; the pinned read then fails
    // loudly rather than returning a torn state
    GpxCommitLog.vacuum(dir, conf, keepVersions = 1, minAgeMs = 0)
    intercept[Exception] {
      spark.read.format("gpx").option("atVersion", (head - 1).toString)
        .load(dir).count()
    }
    assert(spark.read.format("gpx").load(dir).count() == 5)
  }

  test("a replace whose consumed files were rewritten refuses loudly") {
    val dir = tempDir("gpx_log_conflict")
    spark.range(0, 100).selectExpr("id", "id as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    val h = GpxCommitLog.head(dir, conf).get
    val victim = h.live.head.relPath
    // a concurrent mutation retires the file first...
    GpxCommitLog.commit(dir, conf, GpxCommitLog.Replace(Seq.empty, Set(victim)))
    // ...so a rewrite that consumed it must refuse, not duplicate/lose
    intercept[java.util.ConcurrentModificationException] {
      GpxCommitLog.commit(dir, conf,
        GpxCommitLog.Replace(Seq.empty, Set(victim)))
    }
  }

  test("catalog table with commit_protocol=manifest: INSERT/UPDATE/DELETE/MERGE match a model") {
    val wh = tempDir("gpx_log_cat")
    val cat = "glog"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING gpx " +
      "TBLPROPERTIES('commit_protocol'='manifest')")
    assert(GpxCommitLog.isLogTable(s"$wh/db/t", conf))

    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 10 FROM range(0, 50)")
    spark.sql(s"UPDATE $cat.db.t SET v = v + 1 WHERE id < 10")
    spark.sql(s"DELETE FROM $cat.db.t WHERE id BETWEEN 40 AND 44")
    spark.sql(
      s"""MERGE INTO $cat.db.t t
         |USING (SELECT id, id AS v FROM range(45, 55)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val model = ((0L until 10L).map(i => i -> (i * 10 + 1)) ++
      (10L until 40L).map(i => i -> i * 10) ++
      (45L until 55L).map(i => i -> i)).toMap
    val got = spark.table(s"$cat.db.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == model, s"diff: ${(got.toSet diff model.toSet).take(5)} / " +
      s"${(model.toSet diff got.toSet).take(5)}")

    // merge-on-read requests route to COW on log tables (no sidecars ever)
    spark.conf.set("spark.graft.gpx.rowLevelMode", "mor")
    spark.conf.set("spark.graft.gpx.deleteMode", "mor")
    try {
      spark.sql(s"UPDATE $cat.db.t SET v = 0 WHERE id = 20")
      spark.sql(s"DELETE FROM $cat.db.t WHERE id = 21")
    } finally {
      spark.conf.unset("spark.graft.gpx.rowLevelMode")
      spark.conf.unset("spark.graft.gpx.deleteMode")
    }
    assert(spark.table(s"$cat.db.t").filter("id = 20").head.getLong(1) == 0L)
    assert(spark.table(s"$cat.db.t").filter("id = 21").count() == 0)
    val delDirs = new java.io.File(s"$wh/db/t").listFiles()
      .filter(f => f.isDirectory && f.getName == "_del")
    assert(delDirs.isEmpty, "log tables must never grow MOR sidecars")
  }

  test("streaming sink into a commit-log table: one manifest commit per epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val dir = tempDir("gpx_log_stream")
    GpxCommitLog.enable(dir, conf)
    val v0 = GpxCommitLog.head(dir, conf).get.version
    val ckpt = tempDir("gpx_log_stream_ckpt")
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("id", "s")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("gpx").start(dir)
    source.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    source.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    // every epoch advanced the manifest; reads resolve the log, not the
    // listing (an orphan file planted in the dir stays invisible)
    assert(GpxCommitLog.head(dir, conf).get.version >= v0 + 2)
    assert(spark.read.format("gpx").load(dir).count() == 3)
    val orphan = new java.io.File(dir, "part-e999-0.gpx")
    java.nio.file.Files.copy(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gpx"))
        .head.toPath, orphan.toPath)
    // listing-visible but manifest-unknown: must not be read
    assert(spark.read.format("gpx").load(dir).count() == 3)
    GpxCommitLog.vacuum(dir, conf, keepVersions = 1, minAgeMs = 0)
    assert(!orphan.exists(), "vacuum must reclaim the orphan")
    assert(spark.read.format("gpx").load(dir).count() == 3)
  }

  test("streaming epoch replay on a log table never deletes or rewrites manifest-live files in place") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    val dir = tempDir("gpx_log_replay")
    GpxCommitLog.enable(dir, conf)
    val schema = StructType(Seq(StructField("id", LongType)))
    def stage(name: String, lo: Long, hi: Long): String = {
      val f = s"$dir/_streaming/$name"
      val w = new graft.format.GpxFileWriter(f, schema, conf, 1024, 256, -1L)
      (lo until hi).foreach(i => w.addRow(InternalRow(i)))
      w.close()
      f
    }
    val sw = new graft.format.GpxStreamingWrite(schema, dir, 1024, 256, -1L)
    sw.commit(5, Array[WriterCommitMessage](
      graft.format.GpxStreamCommit(stage("e5-p0-t1.gpx", 0, 10), 0)))
    val firstAttempt = GpxCommitLog.head(dir, conf).get.live.map(_.relPath)
    assert(firstAttempt.nonEmpty)
    // crash window: the manifest Replace committed but the idempotency
    // marker did not — the engine then REPLAYS the epoch (possibly with a
    // different partition count/attempt)
    assert(new java.io.File(dir, "_e5.committed").delete())
    sw.commit(5, Array[WriterCommitMessage](
      graft.format.GpxStreamCommit(stage("e5-p0-t2.gpx", 0, 10), 0)))
    // the prior attempt's files were NEVER deleted or rewritten in place:
    // a reader pinned to the pre-replay manifest still finds its bytes
    firstAttempt.foreach(rel => assert(new java.io.File(dir, rel).exists(),
      s"$rel was deleted in place during epoch replay"))
    // names are attempt-unique and the replay's Replace retired the old set
    val secondAttempt = GpxCommitLog.head(dir, conf).get.live.map(_.relPath)
    assert(secondAttempt.nonEmpty)
    assert(secondAttempt.toSet.intersect(firstAttempt.toSet).isEmpty,
      "replay must publish fresh names, not reuse the prior attempt's")
    // exactly one attempt's rows visible (replay converged, no duplication)
    assert(spark.read.format("gpx").load(dir).count() == 10)
    GpxCommitLog.vacuum(dir, conf, keepVersions = 1, minAgeMs = 0)
    assert(spark.read.format("gpx").load(dir).count() == 10)
  }

  test("in-place compaction skips masked files instead of resurrecting their deleted rows") {
    val dir = tempDir("gpx_log_compact_mask")
    // a rename-protocol table accumulates a merge-on-read sidecar...
    spark.range(0, 300).selectExpr("id", "id * 2 as v")
      .coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    spark.range(300, 600).selectExpr("id", "id * 2 as v")
      .coalesce(1).write.format("gpx").mode("append").save(dir)
    val prev = spark.conf.getOption("spark.graft.gpx.deleteMode")
    spark.conf.set("spark.graft.gpx.deleteMode", "mor")
    try graft.format.GpxDelete.run(
      spark.read.format("gpx").load(dir).schema, Seq(dir),
      Array(org.apache.spark.sql.sources.EqualTo("id", 7L)))
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.gpx.deleteMode", v)
      case None => spark.conf.unset("spark.graft.gpx.deleteMode")
    }
    assert(spark.read.format("gpx").load(dir).count() == 599)
    // ...then converts to the commit-log protocol with the sidecar live
    GpxCommitLog.enable(dir, conf)
    val r = graft.format.GpxCompactor.compactInPlace(dir, conf)
    // the masked file was skipped (stays live and masked); the clean file
    // compacted; and the deleted row MUST NOT come back
    assert(r.inputFiles == 1, s"only the unmasked file may byte-copy: $r")
    val after = spark.read.format("gpx").load(dir)
    assert(after.count() == 599, "compactInPlace resurrected a masked row")
    assert(after.filter(col("id") === 7L).count() == 0)
    assert(GpxCommitLog.head(dir, conf).get.live.size == 1 + r.outputFiles)
  }

  test("in-place compaction merges schema-evolved files by column shape") {
    // a table that gained a column mid-life holds files with DIFFERENT
    // column sets; byte-copy cannot merge those under one footer, so
    // compaction must partition by shape — not crash, and not skip the
    // whole table
    val dir = tempDir("gpx_log_evo_compact")
    (0 until 3).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).selectExpr("id")
        .coalesce(1).write.format("gpx").mode("append")
        .option("commitProtocol", "manifest").save(dir)
    }
    (0 until 3).foreach { i =>
      spark.range(300L + i * 100L, 300L + (i + 1) * 100L)
        .selectExpr("id", "id * 2 as v")
        .coalesce(1).write.format("gpx").mode("append").save(dir)
    }
    val r = graft.format.GpxCompactor.compactInPlace(dir, conf)
    assert(r.inputFiles == 6 && r.rows == 600, s"$r")
    assert(r.outputFiles == 2,
      s"expected one output per column shape, got $r")
    val df = spark.read.format("gpx").load(dir)
    assert(df.count() == 600)
    // old-shape rows null-fill the evolved column; new-shape rows keep it
    assert(df.filter(col("v").isNull).count() == 300)
    assert(df.filter(col("v") === col("id") * 2).count() == 300)
    // a LONE evolved file among many old-shape files stays live untouched
    val dir2 = tempDir("gpx_log_evo_single")
    (0 until 3).foreach { i =>
      spark.range(i * 10L, (i + 1) * 10L).selectExpr("id")
        .coalesce(1).write.format("gpx").mode("append")
        .option("commitProtocol", "manifest").save(dir2)
    }
    spark.range(30L, 40L).selectExpr("id", "id * 2 as v")
      .coalesce(1).write.format("gpx").mode("append").save(dir2)
    val r2 = graft.format.GpxCompactor.compactInPlace(dir2, conf)
    assert(r2.inputFiles == 3 && r2.outputFiles == 1,
      s"singleton shape group must stay live untouched: $r2")
    assert(spark.read.format("gpx").load(dir2).count() == 40)
  }

  test("rewrite compaction converges a 3-shape evolved table to one file") {
    val dir = tempDir("gpx_log_rewrite")
    // three historical column shapes, two files each: byte-copy caps
    // convergence at 3 files (one per shape) forever
    (0 until 2).foreach { i =>
      spark.range(i * 50L, (i + 1) * 50L).selectExpr("id")
        .coalesce(1).write.format("gpx").mode("append")
        .option("commitProtocol", "manifest").save(dir)
    }
    (0 until 2).foreach { i =>
      spark.range(100L + i * 50L, 100L + (i + 1) * 50L)
        .selectExpr("id", "id * 2 as v")
        .coalesce(1).write.format("gpx").mode("append").save(dir)
    }
    (0 until 2).foreach { i =>
      spark.range(200L + i * 50L, 200L + (i + 1) * 50L)
        .selectExpr("id", "id * 2 as v", "id * 3 as w")
        .coalesce(1).write.format("gpx").mode("append").save(dir)
    }
    val rb = graft.format.GpxCompactor.compactInPlace(dir, conf)
    assert(rb.outputFiles == 3, s"byte-copy is shape-bounded: $rb")
    def rows() = spark.read.format("gpx").load(dir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    val before = rows()
    val headV = GpxCommitLog.head(dir, conf).get.version

    val r = graft.format.GpxCompactor.compactRewrite(spark, dir, conf)
    assert(r.inputFiles == 3 && r.outputFiles == 1 && r.rows == 300, s"$r")
    assert(GpxCommitLog.head(dir, conf).get.live.size == 1,
      "the union-schema rewrite must converge the live set to one file")
    // oracle: the rewritten table reads IDENTICALLY, null-fills included
    assert(rows() == before)
    val df = spark.read.format("gpx").load(dir)
    assert(df.filter(col("v").isNull).count() == 100)
    assert(df.filter(col("w").isNull).count() == 200)
    assert(df.filter(col("w") === col("id") * 3).count() == 100)
    // projection through the single-shape file stays exact
    assert(df.select(sum(col("v"))).head.getLong(0) ==
      (100L until 300L).map(_ * 2).sum)
    // version travel to the pre-rewrite manifest still serves old files
    assert(spark.read.format("gpx").option("atVersion", headV.toString)
      .load(dir).count() == 300)

    // a delete landing while the rewrite runs makes the swap REFUSE
    // (the masks the scan folded in are stale) and leaves no staged leak
    // (retired pre-rewrite files legitimately remain until vacuum, so
    // compare the whole disk set, not a count)
    val diskBefore = gpxFilesOnDisk(dir).toSet
    val e = intercept[java.util.ConcurrentModificationException] {
      graft.format.GpxCompactor.compactRewrite(spark, dir, conf,
        beforeSwap = () => {
          val live = GpxCommitLog.liveFiles(dir, conf)
          val bits = new java.util.BitSet(); (0 until 10).foreach(bits.set)
          graft.format.GpxVersion.markDeletes(dir, conf)
          graft.format.GpxDeleteBitmap.write(
            new org.apache.hadoop.fs.Path(live.head),
            graft.format.GpxTxn.stamp(dir, conf), bits, 300L, conf)
          ()
        })
    }
    assert(e.getMessage.contains("sidecars changed"), e.getMessage)
    assert(spark.read.format("gpx").load(dir).count() == 290,
      "the refused rewrite must leave the masked table intact")
    assert(gpxFilesOnDisk(dir).toSet == diskBefore,
      "a refused rewrite must clean its published-but-unreferenced files")
    // the masked table now rewrites cleanly: the fold applies the mask
    val r2 = graft.format.GpxCompactor.compactRewrite(spark, dir, conf)
    assert(r2.outputFiles == 1 && r2.rows == 290, s"$r2")
    assert(spark.read.format("gpx").load(dir).count() == 290)
  }

  test("rewrite compaction preserves the bucket routing tag") {
    val dir = tempDir("gpx_log_rwb")
    (0 until 3).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).selectExpr("id", "id * 2 as v")
        .write.format("gpx").mode("append")
        .option("commitProtocol", "manifest")
        .option("bucketBy", "id").option("numBuckets", "4").save(dir)
    }
    val r = graft.format.GpxCompactor.compactRewrite(spark, dir, conf)
    assert(r.rows == 300, s"$r")
    val live = GpxCommitLog.liveFiles(dir, conf)
    // without the -bN tag on the published names, bucketOfFile returns
    // None and every bucket-pruned scan degrades to a full scan
    assert(live.nonEmpty && live.forall(f =>
      graft.format.GpxTable.bucketOfFile(f).isDefined),
      s"rewrite dropped the bucket tag: ${live.map(_.split('/').last)}")
    assert(live.flatMap(f => graft.format.GpxTable.bucketOfFile(f))
      .toSet.size > 1, "bucket routing must spread the rewrite outputs")
    val df = spark.read.format("gpx").load(dir)
    assert(df.count() == 300)
    assert(df.filter(col("id") === 42L).head.getLong(1) == 84L)
  }

  test("in-place compaction: one atomic manifest swap, MVCC stamps survive the byte-copy") {
    val dir = tempDir("gpx_log_compact")
    // many small commits with distinct commitTs (MVCC history to preserve)
    (0 until 6).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).selectExpr("id", "id * 2 as v")
        .coalesce(1).write.format("gpx").mode("append")
        .option("commitProtocol", "manifest")
        .option("commitTs", ((i + 1) * 1000L).toString).save(dir)
    }
    val liveBefore = GpxCommitLog.head(dir, conf).get.live.size
    assert(liveBefore >= 6)
    val r = graft.format.GpxCompactor.compactInPlace(dir, conf)
    assert(r.inputFiles == liveBefore && r.outputFiles < liveBefore)
    val liveAfter = GpxCommitLog.head(dir, conf).get.live
    assert(liveAfter.size == r.outputFiles)
    // data intact through the swap
    val df = spark.read.format("gpx").load(dir)
    assert(df.count() == 600)
    assert(df.agg(sum("v")).head.getLong(0) == (0L until 600).map(_ * 2).sum)
    // row-group commitTs survived the byte-copy: time travel still works
    assert(spark.read.format("gpx").option("snapshotTs", "3000").load(dir)
      .count() == 300)
    // superseded originals retire (still on disk) until vacuum
    assert(gpxFilesOnDisk(dir).size > liveAfter.size)
    GpxCommitLog.vacuum(dir, conf, keepVersions = 1, minAgeMs = 0)
    assert(gpxFilesOnDisk(dir).size == liveAfter.size)
    assert(spark.read.format("gpx").load(dir).count() == 600)
  }

  test("a dead half-written slot claim: reads fall back, commits refuse with the repair path") {
    val dir = tempDir("gpx_log_dead")
    spark.range(0, 30).selectExpr("id", "id as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    val head = GpxCommitLog.head(dir, conf).get
    // simulate a writer that claimed the next slot and died mid-write
    val dead = new java.io.File(
      s"$dir/${GpxCommitLog.LogDir}/v${"%019d".format(head.version + 1)}.mf")
    val w = new java.io.FileWriter(dead)
    w.write("gpxlog1\nv 999\ntrunca"); w.close()
    // reads fall back to the last parseable version — never a torn state
    assert(spark.read.format("gpx").load(dir).count() == 30)
    assert(GpxCommitLog.head(dir, conf).get.version == head.version)
    // a commit must NOT build past the claimed slot (the claimant could
    // still complete it on an exclusive-create store): refuse loudly,
    // naming the slot to repair
    val e = intercept[java.io.IOException] {
      GpxCommitLog.commit(dir, conf, GpxCommitLog.Append(Seq.empty))
    }
    assert(e.getMessage.contains("claimed but unreadable"), e.getMessage)
    // operator repairs (deletes the dead claim) -> commits flow again
    assert(dead.delete())
    spark.range(30, 40).selectExpr("id", "id as v")
      .write.format("gpx").mode("append").save(dir)
    assert(spark.read.format("gpx").load(dir).count() == 40)
  }

  test("token-gated artifacts stamp against the manifest version on log tables") {
    val dir = tempDir("gpx_log_stats")
    spark.range(0, 500).selectExpr("id", "id % 37 as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    // manifest-derived version token: exact, atomic, no token-file rename
    val tok = graft.format.GpxVersion.current(dir, conf)
    assert(tok.exists(_.startsWith("mf:")), s"got $tok")
    // ANALYZE publishes NDV stamped with it; served while valid
    val ndv = graft.format.GpxMaintenance.analyze(spark, dir, conf)
    assert(ndv("v") == 37)
    assert(graft.format.GpxTable.readColStats(dir, conf)("v") == 37)
    // any commit advances the manifest version -> stats stop serving
    spark.range(500, 600).selectExpr("id", "id % 37 as v")
      .write.format("gpx").mode("append").save(dir)
    assert(graft.format.GpxVersion.current(dir, conf) != tok)
    assert(graft.format.GpxTable.readColStats(dir, conf).isEmpty,
      "stale NDV must not be served after a manifest commit")
  }

  test("commits cost O(commit size) manifest bytes at a 10k-file table; checkpoints bound cold resolution") {
    import graft.format.GpxFormat.ChunkStats
    val dir = tempDir("gpx_log_bytes")
    def entry(i: Int): GpxCommitLog.FileEntry =
      GpxCommitLog.FileEntry(s"part-x$i.gpx", 4096L, 1000L, -1L, -1L,
        Map(
          "id" -> ChunkStats(true, i * 1000L, i * 1000L + 999L, 0.0, 0.0, "", "", 0L, true),
          "v" -> ChunkStats(true, 0L, 999L, 0.0, 999.0, "", "", 0L, true),
          "s" -> ChunkStats(true, 0L, 0L, 0.0, 0.0, s"a$i", s"z$i", 3L, true)))
    GpxCommitLog.enable(dir, conf) // v1
    // seed a 10k-file live set in one overwrite (synthetic entries — the
    // log layer never opens data files on commit)
    GpxCommitLog.commit(dir, conf, GpxCommitLog.Overwrite(
      (0 until 10000).map(entry), None, Nil, None, None)) // v2, full
    assert(GpxCommitLog.head(dir, conf).get.live.size == 10000)

    // small appends at non-checkpoint versions: bytes written must track
    // the COMMIT size, not the 10k-file live set (a full snapshot of this
    // table is ~1.5 MB; an append delta must stay in the low KBs)
    (0 until 5).foreach { k =>
      val before = GpxCommitLog.manifestBytesWritten.get()
      val v = GpxCommitLog.commit(dir, conf,
        GpxCommitLog.Append(Seq(entry(20000 + k))))
      val written = GpxCommitLog.manifestBytesWritten.get() - before
      assert(v % GpxCommitLog.CheckpointInterval != 0,
        s"test landed on a checkpoint version $v — adjust the seed count")
      assert(written < 10 * 1024,
        s"append at a 10k-file table wrote $written manifest bytes " +
          "(O(live set) snapshot rewrite regressed the commit path)")
    }
    // the streaming-epoch shape (replace: add 1, retire 1) is O(commit) too
    val beforeR = GpxCommitLog.manifestBytesWritten.get()
    GpxCommitLog.commit(dir, conf, GpxCommitLog.Replace(
      Seq(entry(30000)), Set("part-x20000.gpx")))
    assert(GpxCommitLog.manifestBytesWritten.get() - beforeR < 10 * 1024)

    // drive past the next checkpoint boundary: exactly one commit in the
    // window writes the full snapshot (> 1 MB at 10k files)
    val byteSizes = (0 until GpxCommitLog.CheckpointInterval).map { k =>
      val before = GpxCommitLog.manifestBytesWritten.get()
      GpxCommitLog.commit(dir, conf, GpxCommitLog.Append(Seq(entry(40000 + k))))
      GpxCommitLog.manifestBytesWritten.get() - before
    }
    assert(byteSizes.count(_ > 1024 * 1024) == 1,
      s"expected exactly one checkpoint in a $${GpxCommitLog.CheckpointInterval}-commit window, sizes=$byteSizes")

    // cold head resolution: one checkpoint + <= K-1 deltas, never O(versions)
    GpxCommitLog.invalidateCaches(dir)
    val parsesBefore = GpxCommitLog.manifestParses.get()
    val h = GpxCommitLog.head(dir, conf).get
    val parses = GpxCommitLog.manifestParses.get() - parsesBefore
    assert(parses <= GpxCommitLog.CheckpointInterval.toLong,
      s"cold head resolution parsed $parses manifests")
    // and the incremental state materializes exactly
    assert(h.live.size == 10000 + 5 + 1 - 1 + GpxCommitLog.CheckpointInterval)
    assert(!h.relPaths.contains("part-x20000.gpx"), "replace must retire")
    assert(h.relPaths.contains("part-x30000.gpx"))
    assert(h.relPaths.contains("part-x0.gpx"))
  }

  test("enable() migrates an existing rename-mode table in place") {
    val dir = tempDir("gpx_log_migrate")
    spark.range(0, 80).selectExpr("id", "id % 7 as v")
      .write.format("gpx").mode("append").save(dir)
    assert(!GpxCommitLog.isLogTable(dir, conf))
    GpxCommitLog.enable(dir, conf)
    assert(GpxCommitLog.isLogTable(dir, conf))
    assert(spark.read.format("gpx").load(dir).count() == 80)
    // post-migration writes commit through the log
    spark.range(80, 90).selectExpr("id", "id % 7 as v")
      .write.format("gpx").mode("append").save(dir)
    assert(GpxCommitLog.head(dir, conf).get.version >= 2)
    assert(spark.read.format("gpx").load(dir).count() == 90)
  }

  test("a bare empty _commits dir (crashed first commit) does not flip the protocol; next log write heals it") {
    val dir = tempDir("gpx_log_halfenable")
    // a rename-protocol table with data
    spark.range(0, 50).selectExpr("id", "id * 3 as v")
      .write.format("gpx").mode("append").save(dir)
    // simulate a writer that created the log dir and died before winning
    // its first version slot
    new java.io.File(dir, "_commits").mkdirs()
    GpxCommitLog.invalidateCaches(dir)
    // the empty dir must NOT count as a log: the head would be empty and
    // every pre-existing file invisible + vacuum-eligible
    assert(!GpxCommitLog.isLogTable(dir, conf))
    assert(spark.read.format("gpx").load(dir).count() == 50,
      "pre-existing files must stay visible through the listing path")
    // the next log-routed write seeds v1 from the listing and carries
    // the existing files over
    spark.range(50, 60).selectExpr("id", "id * 3 as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))
    val df = spark.read.format("gpx").load(dir)
    assert(df.count() == 60)
    assert(df.agg(sum("v")).head.getLong(0) == (0L until 60).map(_ * 3).sum)
  }

  test("explicit commitProtocol=rename on an existing log table refuses loudly") {
    val dir = tempDir("gpx_log_demote")
    spark.range(0, 20).selectExpr("id")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))
    val e = intercept[Exception] {
      spark.range(20, 30).selectExpr("id")
        .write.format("gpx").mode("append")
        .option("commitProtocol", "rename").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no demotion path")),
      s"refusal must explain the demotion hazard, got: ${msgs(e)}")
    // nothing was published outside the log's control
    assert(spark.read.format("gpx").load(dir).count() == 20)
  }

  test("pushed aggregates on a log table answer from the manifest: zero footer reads, evolution-exact") {
    val dir = tempDir("gpx_log_mfagg")
    spark.range(0, 100).selectExpr("id", "id * 2 as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    // evolved append: new column w appears (older file lacks it)
    spark.range(100, 150).selectExpr("id", "id * 2 as v", "id + 7 as w")
      .write.format("gpx").mode("append").save(dir)
    val agg = spark.read.format("gpx").load(dir)
      .agg(count(lit(1)).as("n"), count(col("w")).as("nw"),
        min("v").as("minv"), max("w").as("maxw"))
    // the plan must carry the manifest-stats scan (single pre-merged
    // partial row), not the footer-stats scan
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("GpxManifestStatsScan"),
      s"expected the manifest-stats scan in:\n$plan")
    GpxFileReader.FooterCache.clear()
    val before = GpxFileReader.footerReads.get()
    val row = agg.head
    assert(GpxFileReader.footerReads.get() == before,
      "a manifest-answered aggregate must read zero footers")
    assert(row.getLong(0) == 150)
    assert(row.getLong(1) == 50, "count(w) counts only files carrying w")
    assert(row.getLong(2) == 0L)
    assert(row.getLong(3) == 149L + 7L)
    // correctness cross-check against the unpushed plan
    val full = spark.read.format("gpx").load(dir)
      .selectExpr("count(1) n", "count(w) nw", "min(v) minv", "max(w) maxw").head
    assert(row == full)
  }

  test("streaming sink honors explicit commitProtocol=manifest on a rename-atomic filesystem") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val dir = tempDir("gpx_log_stream_opt")
    val ckpt = tempDir("gpx_log_stream_opt_ckpt")
    val source = MemoryStream[(Long, String)]
    // NO pre-enabled log, local path (rename-atomic): only the explicit
    // option routes this sink to the manifest protocol
    val q = source.toDF().toDF("id", "s")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .option("commitProtocol", "manifest")
      .format("gpx").start(dir)
    source.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    q.stop()
    assert(GpxCommitLog.isLogTable(dir, conf),
      "the sink must commit through the manifest the user asked for")
    assert(GpxCommitLog.head(dir, conf).exists(_.live.nonEmpty))
    assert(spark.read.format("gpx").load(dir).count() == 2)
  }

  test("grace knobs: one config surface, cross-validated against the lock TTL") {
    val dir = tempDir("gpx_log_grace")
    spark.range(0, 10).selectExpr("id", "id as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    val ttl = graft.format.GpxMutationLock.ttlMs

    // a grace below the lock TTL is a liveness-boundary contradiction:
    // vacuum could reclaim artifacts of a writer the lock layer still
    // considers alive — refuse loudly, with no state changed
    val low = new Configuration(conf)
    low.set("graft.gpx.vacuumGraceMs", (ttl - 1).toString)
    val e1 = intercept[IllegalArgumentException] {
      GpxCommitLog.vacuum(dir, low)
    }
    assert(e1.getMessage.contains("mutation-lock"))
    val lowTomb = new Configuration(conf)
    lowTomb.set("graft.gpx.tombstoneGraceMs", "1000")
    intercept[IllegalArgumentException] { GpxCommitLog.vacuum(dir, lowTomb) }

    // malformed values fail loudly, never silently fall back to defaults
    val bad = new Configuration(conf)
    bad.set("graft.gpx.tombstoneGraceMs", "soon")
    intercept[IllegalArgumentException] { GpxCommitLog.vacuum(dir, bad) }

    // valid configured graces are honored (>= TTL passes validation);
    // nothing young enough is reclaimed, reads intact
    val ok = new Configuration(conf)
    ok.set("graft.gpx.vacuumGraceMs", (ttl * 2).toString)
    ok.set("graft.gpx.tombstoneGraceMs", (ttl * 2).toString)
    val (dataGone, _) = GpxCommitLog.vacuum(dir, ok, keepVersions = 1)
    assert(dataGone == 0, "fresh files are inside the staging grace")
    assert(spark.read.format("gpx").load(dir).count() == 10)

    // explicit minAgeMs bypasses the surface — the caller's own liveness
    // claim (tests/fuzz deliberately race below the boundary)
    spark.range(10, 20).selectExpr("id", "id as v")
      .write.format("gpx").mode("overwrite").save(dir)
    val (gone2, _) = GpxCommitLog.vacuum(dir, conf, keepVersions = 1,
      minAgeMs = 0)
    assert(gone2 > 0)
    assert(spark.read.format("gpx").load(dir).count() == 10)
  }
}
