package graft

import graft.format.GpxCommitLog
import graft.streaming.{ExchangeChannel, ExchangeServer, PipelinedExchange}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-PROCESS proofs: the commit protocol's O_EXCL slot claims and
  * conditional puts, and the exchange's transport seam, exercised by real
  * forked JVMs — the primitives whose cross-process semantics in-JVM
  * thread fuzz (HostileStoreSpec / MultiTableTxnSpec / ExchangeSpec)
  * cannot reach. The reference's equivalents are daemon-mediated
  * (proto/transaction.proto:33-48) or HTTP streams (proto/stream.proto);
  * ours must hold on the filesystem/socket primitives alone. */
class CrossProcessSpec extends GraftSpec {
  private val conf = new Configuration()

  test("racing appends from three processes (plus a vacuum process): zero lost commits") {
    val dir = tempDir("xproc_append")
    // seed the log table from the parent process
    spark.sql("SELECT CAST(-1 AS BIGINT) AS amount")
      .coalesce(1).write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))
    val v0 = GpxCommitLog.head(dir, conf).get.version

    val writers = (0 until 3).map { id =>
      ForkedJvm.start("graft.CrossProcessMain",
        Seq("append", dir, id.toString, "15"))
    }
    // 8 s staging grace, NOT 3 s: the grace is the product's hard
    // guarantee against sweeping an in-flight writer's staged file on a
    // FIRST-attempt commit (the liveness recheck only defends retries —
    // the documented stat-to-put window). Under a full-suite 32-thread
    // load a child writer's stage-to-commit latency measurably exceeded
    // 3 s once (round 14: reader FNF on a vacuumed-then-committed file);
    // the sweeper still reclaims everything retired earlier in the
    // minute-long fuzz, so the vacuum paths stay fully exercised.
    val sweeper = ForkedJvm.start("graft.CrossProcessMain",
      Seq("vacuum", dir, "80", "8000"))
    writers.foreach(_.awaitOk())
    sweeper.awaitOk()

    // zero lost commits: every version slot was claimed by exactly one
    // committer — the head advanced by AT LEAST the number of appends
    // (vacuum's head checkpoints may claim extra slots of their own)
    val head = GpxCommitLog.head(dir, conf).get
    assert(head.version >= v0 + 45,
      s"head at v${head.version}, expected >= v${v0 + 45} — a commit was lost")
    // preserve evidence on ANY failure (mismatch OR a read exception —
    // e.g. a dangling manifest reference tripping FileNotFound): the
    // table dir and every child's log survive the tempdir cleanup, so a
    // rare fuzz failure is diagnosable post-hoc (graft.LogDump dumps
    // the copied chain)
    def preserve(why: String): Unit = {
      val dest = s"/tmp/xproc_evidence_${System.currentTimeMillis()}"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(dir), new java.io.File(dest))
      (writers.zipWithIndex.map { case (w, i) => s"writer$i" -> w } :+
        ("sweeper" -> sweeper)).foreach { case (n, h) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dest/_childlog_$n.txt"), h.logText)
      }
      System.err.println(s"[evidence] copied $dir -> $dest; $why")
    }
    // every appended row visible exactly once
    val got = try spark.read.format("gpx").load(dir)
      .select("amount").collect().map(_.getLong(0)).sorted.toSeq
    catch { case t: Throwable => preserve(s"read failed: $t"); throw t }
    val want = (-1L +: (for {
      id <- 0 until 3; i <- 0 until 15
    } yield id * 100000L + i)).sorted
    if (got != want)
      preserve(s"missing=${want.diff(got)} extra=${got.diff(want)}")
    assert(got == want)
  }

  test("in-place compaction racing appends and a vacuum across processes: no lost or duplicated rows") {
    val dir = tempDir("xproc_compact")
    spark.sql("SELECT CAST(-1 AS BIGINT) AS amount")
      .coalesce(1).write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))

    val writers = (0 until 2).map { id =>
      ForkedJvm.start("graft.CrossProcessMain",
        Seq("append", dir, id.toString, "15"))
    }
    val compactor = ForkedJvm.start("graft.CrossProcessMain",
      Seq("compact", dir, "12"))
    val sweeper = ForkedJvm.start("graft.CrossProcessMain",
      Seq("vacuum", dir, "60", "8000"))
    writers.foreach(_.awaitOk())
    compactor.awaitOk()
    sweeper.awaitOk()

    // the byte-copy Replace must never lose an appended row (its inputs
    // retire only when the swap commits) nor resurrect a retired one
    // (a concurrent rewrite of its inputs refuses the commit)
    val got = spark.read.format("gpx").load(dir)
      .select("amount").collect().map(_.getLong(0)).sorted.toSeq
    val want = (-1L +: (for {
      id <- 0 until 2; i <- 0 until 15
    } yield id * 100000L + i)).sorted
    if (got != want) { // preserve evidence (see the racing-appends test)
      val dest = s"/tmp/xproc_compact_evidence_${System.currentTimeMillis()}"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(dir), new java.io.File(dest))
      (writers.zipWithIndex.map { case (w, i) => s"writer$i" -> w } :+
        ("compactor" -> compactor) :+ ("sweeper" -> sweeper)).foreach {
        case (n, h) => java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dest/_childlog_$n.txt"), h.logText)
      }
      System.err.println(s"[evidence] copied $dir -> $dest; " +
        s"missing=${want.diff(got)} extra=${got.diff(want)}")
    }
    assert(got == want)
    // and a final quiet-state compaction converges to few files
    val r = graft.format.GpxCompactor.compactInPlace(dir, conf)
    assert(r.rows == want.length,
      s"final compaction saw ${r.rows} rows, expected ${want.length}")
    assert(spark.read.format("gpx").load(dir)
      .select("amount").collect().map(_.getLong(0)).sorted.toSeq == want)
  }

  test("point lookups stay exact while other processes append and compact (stale index falls back)") {
    pointLookupFuzz("xproc_ptidx", memoryScheme = false)
  }

  test("memory-scheme point lookups stay exact under cross-process mutation (mirror never serves stale)") {
    // same contract, served through the process-local mirror: the mirror
    // may only answer while its load fingerprint matches the table's
    // manifest, so every cross-process commit must flip it to fallback
    // (or to a reload over the rebuilt index) — never a stale hash-map
    // hit. Mid-race rebuilds force reloads WHILE mutators run, covering
    // the load-vs-rebuild races (fp tagged before the file walk, read
    // errors refuse cleanly).
    graft.format.GpxPointIndex.MemoryMirror.reset()
    spark.conf.set("spark.graft.index.scheme", "memory")
    try pointLookupFuzz("xproc_ptidx_mem", memoryScheme = true)
    finally spark.conf.unset("spark.graft.index.scheme")
  }

  private def pointLookupFuzz(tag: String, memoryScheme: Boolean): Unit = {
    val dir = tempDir(tag)
    val sp2 = spark
    import sp2.implicits._
    (0L until 500L).map(i => Tuple1(i)).toDF("amount")
      .coalesce(2).write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    graft.format.GpxPointIndex.build(spark, dir, "amount")
    // warm lookup against the fresh index
    assert(graft.format.GpxPointIndex.lookup(spark, dir, "amount",
      Set(42L), Seq("amount")).count() == 1)

    // another PROCESS appends keyed rows and compacts: the parent's index
    // is immediately stale (its manifest token was read pre-append), and
    // compaction even retires the files its entries point at — every
    // lookup from here must either fall back or refresh, NEVER serve the
    // stale pruning (a miss on a committed key, or a vanished old key,
    // is silent wrong data)
    val writer = ForkedJvm.start("graft.CrossProcessMain",
      Seq("append", dir, "7", "15")) // amounts 700000..700014
    val compactor = ForkedJvm.start("graft.CrossProcessMain",
      Seq("compact", dir, "6"))
    val newKeys = (0 until 15).map(i => 700000L + i)
    var found = Set.empty[Long]
    var rounds = 0
    while ((writer.process.isAlive || found.size < newKeys.size) &&
        rounds < 500) {
      rounds += 1
      if (memoryScheme && rounds % 25 == 0) {
        // rebuild WHILE mutators run: the next lookup must reload the
        // mirror (or refuse if the rebuild raced a commit) — a racing
        // file retirement may fail the build itself, which is fine; it
        // must only never publish a manifest that validates stale
        try graft.format.GpxPointIndex.build(spark, dir, "amount")
        catch { case scala.util.control.NonFatal(_) => () }
      }
      newKeys.filterNot(found.contains).foreach { k =>
        val rows = graft.format.GpxPointIndex.lookup(spark, dir, "amount",
          Set(k), Seq("amount")).collect()
        if (rows.nonEmpty) {
          assert(rows.length == 1 && rows.head.getLong(0) == k)
          found += k
        }
      }
      // keys found once must stay found (no regression to a stale prune)
      found.foreach { k =>
        assert(graft.format.GpxPointIndex.lookup(spark, dir, "amount",
          Set(k), Seq("amount")).count() == 1,
          s"committed key $k vanished from lookups")
      }
      // a pre-existing key survives every interleave
      assert(graft.format.GpxPointIndex.lookup(spark, dir, "amount",
        Set(42L), Seq("amount")).count() == 1)
    }
    writer.awaitOk(); compactor.awaitOk()
    assert(found == newKeys.toSet,
      s"committed keys never became visible: ${newKeys.toSet -- found}")
    // rebuild over the settled table: index-served lookups exact again
    graft.format.GpxPointIndex.build(spark, dir, "amount")
    newKeys.foreach { k =>
      assert(graft.format.GpxPointIndex.lookup(spark, dir, "amount",
        Set(k), Seq("amount")).count() == 1)
    }
    if (memoryScheme) {
      // the settled-table lookups above went through the mirror
      assert(graft.format.GpxPointIndex.MemoryMirror.loads.get >= 1,
        "memory scheme was never actually exercised")
    }
  }

  test("projection-routed scans stay exact while other processes append and compact") {
    // same silent-wrong-data class as the point-index fuzz, on the OTHER
    // derived-artifact serving path: a narrow projection covers the read
    // while valid and must fall back to the base the instant a sibling
    // process commits — a stale projection serves missing/resurrected
    // rows with no error anywhere
    val dir = tempDir("xproc_proj")
    val sp2 = spark
    import sp2.implicits._
    (0L until 500L).map(i => (i, s"pad-$i-${"x" * 32}")).toDF("amount", "pad")
      .coalesce(2).write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    graft.format.GpxProjection.build(spark, dir, "narrow", Seq("amount"))
    val conf2 = new Configuration()
    assert(graft.format.GpxProjection
      .covering(dir, Set("amount"), conf2).isDefined,
      "the fresh projection must cover the narrow read")
    def amounts(): Set[Long] = spark.read.format("gpx").load(dir)
      .select("amount").collect().map(_.getLong(0)).toSet
    assert(amounts().size == 500)

    val writer = ForkedJvm.start("graft.CrossProcessMain",
      Seq("append", dir, "8", "15")) // amounts 800000..800014
    val compactor = ForkedJvm.start("graft.CrossProcessMain",
      Seq("compact", dir, "6"))
    val newKeys = (0 until 15).map(i => 800000L + i).toSet
    var found = Set.empty[Long]
    var rounds = 0
    while ((writer.process.isAlive || found.size < newKeys.size) &&
        rounds < 500) {
      rounds += 1
      val got = amounts()
      // pre-existing rows survive every interleave
      assert(got.contains(42L), "pre-existing row vanished mid-race")
      // rows seen once must stay visible (no regression to a stale copy)
      found.foreach(k => assert(got.contains(k),
        s"committed amount $k vanished from projection-era reads"))
      found ++= newKeys.filter(got.contains)
    }
    writer.awaitOk(); compactor.awaitOk()
    assert(found == newKeys,
      s"committed amounts never became visible: ${newKeys -- found}")
    // refresh over the settled table: the projection covers again AND
    // the routed read is exact
    graft.format.GpxProjection.refresh(spark, dir, "narrow")
    assert(graft.format.GpxProjection
      .covering(dir, Set("amount"), conf2).isDefined,
      "refresh must re-validate the projection over the settled table")
    val after = amounts()
    assert(after == ((0L until 500L).toSet ++ newKeys),
      s"settled projection read wrong: missing=${((0L until 500L).toSet ++ newKeys) -- after}")
  }

  test("IMPORT races appends, compaction, and vacuum across processes: every registration lands exactly once") {
    val dir = tempDir("xproc_import")
    spark.sql("SELECT CAST(-1 AS BIGINT) AS amount")
      .coalesce(1).write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))
    // two importers adopt externally-staged files while an appender, an
    // in-place compactor, and a vacuum churn the same manifest chain:
    // IMPORT's copy-then-Append must neither lose a registration (sweep
    // or Replace eating the copy) nor double one (a retried commit
    // re-adopting)
    val importers = (0 until 2).map { k =>
      ForkedJvm.start("graft.CrossProcessMain",
        Seq("import", dir, (3 + k).toString, "10"))
    }
    val appender = ForkedJvm.start("graft.CrossProcessMain",
      Seq("append", dir, "7", "10"))
    val compactor = ForkedJvm.start("graft.CrossProcessMain",
      Seq("compact", dir, "6"))
    val sweeper = ForkedJvm.start("graft.CrossProcessMain",
      Seq("vacuum", dir, "40", "8000"))
    importers.foreach(_.awaitOk())
    appender.awaitOk(); compactor.awaitOk(); sweeper.awaitOk()
    val want = (-1L +: (for {
      id <- Seq(3, 4, 7); i <- 0 until 10
    } yield id * 100000L + i)).sorted
    val got = spark.read.format("gpx").load(dir)
      .select("amount").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want,
      s"IMPORT fuzz mismatch: missing=${want.toSet -- got.toSet} " +
        s"extra=${got.toSet -- want.toSet}")
  }

  test("merge-on-read deletes racing in-place compaction across processes never resurrect rows") {
    val dir = tempDir("xproc_mordel")
    spark.range(0, 1000).selectExpr("id", "id * 3 AS v").repartition(8)
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    val schema = spark.read.format("gpx").load(dir).schema
    val compactor = ForkedJvm.start("graft.CrossProcessMain",
      Seq("compact", dir, "10"))
    val sweeper = ForkedJvm.start("graft.CrossProcessMain",
      Seq("vacuum", dir, "40", "8000"))
    val prev = spark.conf.getOption("spark.graft.gpx.deleteMode")
    spark.conf.set("spark.graft.gpx.deleteMode", "mor")
    try {
      (0 until 10).foreach { k =>
        val lo = k * 50L; val hi = lo + 25L
        var done = false; var tries = 0
        while (!done) {
          try {
            graft.format.GpxDelete.run(schema, Seq(dir), Array(
              org.apache.spark.sql.sources.And(
                org.apache.spark.sql.sources.GreaterThanOrEqual("id", lo),
                org.apache.spark.sql.sources.LessThan("id", hi))
                : org.apache.spark.sql.sources.Filter))
            done = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              // lost to the compactor's locked swap (or its Replace
              // consumed a file this delete planned against): retry
              tries += 1
              if (tries > 200)
                throw new IllegalStateException("mor delete starved")
              Thread.sleep(20)
          }
        }
        // THE gate: a compaction swap that byte-copied past a racing
        // sidecar would resurrect the masked rows under compact-* names
        val n = spark.read.format("gpx").load(dir).count()
        assert(n == 1000 - 25 * (k + 1),
          s"after deleting [$lo,$hi): count $n, expected ${1000 - 25 * (k + 1)}" +
            " — deleted rows resurrected by a concurrent compaction swap")
        Thread.sleep(30)
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.gpx.deleteMode", v)
      case None => spark.conf.unset("spark.graft.gpx.deleteMode")
    }
    compactor.awaitOk()
    sweeper.awaitOk()
    val ids = spark.read.format("gpx").load(dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = (0L until 1000L).filterNot(id => id < 500 && id % 50 < 25)
    assert(ids == want)
  }

  test("racing atomic transfers from two processes conserve the cross-table sum") {
    val a = tempDir("xproc_txn_a"); val b = tempDir("xproc_txn_b")
    def seed(dir: String, amount: Long): Unit = {
      spark.sql(s"SELECT CAST($amount AS BIGINT) AS amount")
        .coalesce(1).write.format("gpx").mode("append")
        .option("commitProtocol", "manifest").save(dir)
    }
    seed(a, 1000); seed(b, 0)

    val t1 = ForkedJvm.start("graft.CrossProcessMain",
      Seq("transfer", a, b, "5", "10"))   // a->b: 10..14 (60 total)
    val t2 = ForkedJvm.start("graft.CrossProcessMain",
      Seq("transfer", b, a, "5", "100"))  // b->a: 100..104 (510 total)

    // parent-side snapshot readers during the run: the pinned-pair sum
    // must hold in every observable state (double-read-of-A protocol,
    // same as MultiTableTxnSpec.stablePair)
    def sumAt(dir: String, v: Long): Long =
      spark.read.format("gpx").option("atVersion", v.toString)
        .load(dir).agg(sum("amount")).head.getLong(0)
    var checks = 0
    while (t1.process.isAlive || t2.process.isAlive) {
      var pinned: Option[(GpxCommitLog.Snapshot, GpxCommitLog.Snapshot)] = None
      var guard = 0
      while (pinned.isEmpty && guard < 1000) {
        guard += 1
        val ha = GpxCommitLog.head(a, conf).get
        val hb = GpxCommitLog.head(b, conf).get
        val ha2 = GpxCommitLog.head(a, conf).get
        if (ha2.version == ha.version) pinned = Some((ha, hb))
      }
      pinned.foreach { case (ha, hb) =>
        val s = sumAt(a, ha.version) + sumAt(b, hb.version)
        assert(s == 1000,
          s"conservation violated: $s at (a v${ha.version}, b v${hb.version})")
        checks += 1
      }
    }
    t1.awaitOk(); t2.awaitOk()
    assert(checks > 0, "no mid-run snapshot was ever checked")

    val sa = spark.read.format("gpx").load(a).agg(sum("amount")).head.getLong(0)
    val sb = spark.read.format("gpx").load(b).agg(sum("amount")).head.getLong(0)
    assert(sa + sb == 1000)
    assert(sa == 1000L - 60 + 510, s"a=$sa")
    assert(sb == 60L - 510, s"b=$sb")
  }

  test("cross-JVM pipelined exchange: forked producer JVM streams into this JVM's consumer") {
    val name = ExchangeChannel.freshName("xjvm")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    ExchangeChannel.open(name, schema, capacity = 4)
    val server = ExchangeServer.start()
    try {
      val nGroups = 20; val rowsPerGroup = 500
      val producer = ForkedJvm.start("graft.CrossProcessMain", Seq(
        "exproduce", "127.0.0.1", server.port.toString, name,
        nGroups.toString, rowsPerGroup.toString))
      // capacity 4 < 20 row groups: the remote producer MUST be
      // backpressured over the socket while the consumer drains
      val out = PipelinedExchange.consume(spark, name,
        df => df.groupBy().agg(count(lit(1)).as("n"), sum("v").as("s")),
        producerStallSec = 120L)
      producer.awaitOk()
      val row = out.head()
      val total = nGroups.toLong * rowsPerGroup
      assert(row.getLong(0) == total)
      assert(row.getLong(1) == (0L until total).map(_ * 2).sum)
    } finally {
      server.stop()
      ExchangeChannel.remove(name)
    }
  }

  test("a producer JVM that crashes mid-stream fails the consumer loudly") {
    val name = ExchangeChannel.freshName("xjvmcrash")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    ExchangeChannel.open(name, schema, capacity = 8)
    val server = ExchangeServer.start()
    try {
      val producer = ForkedJvm.start("graft.CrossProcessMain", Seq(
        "excrash", "127.0.0.1", server.port.toString, name, "3", "100"))
      val e = intercept[Exception] {
        PipelinedExchange.consume(spark, name,
          df => df.groupBy().agg(count(lit(1)).as("n")),
          producerStallSec = 60L)
      }
      producer.process.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("dropped") || msg.contains("failed"),
        s"expected a dropped-producer failure, got: $e")
    } finally {
      server.stop()
      ExchangeChannel.remove(name)
    }
  }
}
