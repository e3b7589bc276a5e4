package graft

import graft.format.{GpxCommitLog, HostileFileSystem}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.sum

/** Multi-table ATOMIC commits: N tables flip together under one
  * conditional-put fate file (the analog of the reference's central
  * commit timestamp for cross-table writes, proto/transaction.proto:
  * 33-48). The money test: concurrent transfers between two tables with
  * racing snapshot readers — the cross-table sum must hold in every
  * observable state, including after a committer crash between the two
  * table commits. */
class MultiTableTxnSpec extends GraftSpec {
  private val conf = new Configuration()

  private def hostileDir(prefix: String): String =
    "hostile://" + tempDir(prefix)

  /** seed a one-file log table holding a single (amount) row */
  private def seed(dir: String, amount: Long): Unit = {
    spark.sql(s"SELECT CAST($amount AS BIGINT) AS amount")
      .coalesce(1).write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))
  }

  /** write a replacement single-row file INVISIBLY (deferred commit) and
    * return its manifest entries */
  private def stageAmount(dir: String, amount: Long): Seq[GpxCommitLog.FileEntry] = {
    val token = java.util.UUID.randomUUID().toString
    spark.sql(s"SELECT CAST($amount AS BIGINT) AS amount")
      .coalesce(1).write.format("gpx").mode("append")
      .option("logDefer", token).save(dir)
    val files = GpxCommitLog.drainDeferred(token)
    assert(files.nonEmpty)
    files.map(GpxCommitLog.entryFor(dir, _, conf))
  }

  private def sumAt(dir: String, version: Long): Long =
    spark.read.format("gpx").option("atVersion", version.toString)
      .load(dir).agg(sum("amount")).head.getLong(0)

  /** the cross-table snapshot protocol: pin (headA, headB) with a
    * double-read of A — if A's head is unchanged after reading B's, any
    * txn applied in the B snapshot had sealed its fate before A's
    * re-read, so its A member is already in the A snapshot (or the pair
    * retries). Readers then query both tables pinned via atVersion. */
  private def stablePair(a: String, b: String)
      : (GpxCommitLog.Snapshot, GpxCommitLog.Snapshot) = {
    var out: Option[(GpxCommitLog.Snapshot, GpxCommitLog.Snapshot)] = None
    var guard = 0
    while (out.isEmpty) {
      guard += 1
      assert(guard < 1000, "stable pair never converged")
      val ha = GpxCommitLog.head(a, conf).get
      val hb = GpxCommitLog.head(b, conf).get
      val ha2 = GpxCommitLog.head(a, conf).get
      if (ha2.version == ha.version) out = Some((ha, hb))
    }
    out.get
  }

  test("commitAtomic happy path: both tables flip together") {
    val a = tempDir("gpx_txn_a"); val b = tempDir("gpx_txn_b")
    seedLocal(a, 70); seedLocal(b, 30)
    val la = GpxCommitLog.head(a, conf).get.relPaths
    val lb = GpxCommitLog.head(b, conf).get.relPaths
    val ea = stageAmount(a, 50); val eb = stageAmount(b, 50)
    GpxCommitLog.commitAtomic(conf, Seq(
      a -> GpxCommitLog.Replace(ea, la),
      b -> GpxCommitLog.Replace(eb, lb)))
    assert(spark.read.format("gpx").load(a).agg(sum("amount")).head.getLong(0) == 50)
    assert(spark.read.format("gpx").load(b).agg(sum("amount")).head.getLong(0) == 50)
  }

  private def seedLocal(dir: String, amount: Long): Unit = {
    spark.sql(s"SELECT CAST($amount AS BIGINT) AS amount")
      .coalesce(1).write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(dir)
  }

  test("dropping or renaming the fate-hosting table cannot flip a committed txn") {
    val a = hostileDir("gpx_txn_dr_a"); val b = hostileDir("gpx_txn_dr_b")
    seed(a, 100); seed(b, 0)
    val la = GpxCommitLog.head(a, conf).get.relPaths
    val lb = GpxCommitLog.head(b, conf).get.relPaths
    val ea = stageAmount(a, 60); val eb = stageAmount(b, 40)
    // the fate file lives in the FIRST member's (a's) log dir
    GpxCommitLog.commitAtomic(conf, Seq(
      a -> GpxCommitLog.Replace(ea, la),
      b -> GpxCommitLog.Replace(eb, lb)))
    // table lifecycle: re-home hosted fates (what dropTable/renameTable
    // do), then destroy a's dir entirely
    GpxCommitLog.sealHostedFates(a, conf)
    val ap = new Path(a)
    ap.getFileSystem(conf).delete(ap, true)
    // cold JVM: every cached decision for both tables is gone
    GpxCommitLog.invalidateCaches(a)
    GpxCommitLog.invalidateCaches(b)
    // b must still read 40 — with the fate gone, only b's local seal can
    // prove the txn committed; abort-claiming it would flip history
    val prevWait = GpxCommitLog.TxnResolveWaitMs
    GpxCommitLog.TxnResolveWaitMs = 500 // an abort claim would be quick
    try assert(spark.read.format("gpx").load(b)
      .agg(sum("amount")).head.getLong(0) == 40L)
    finally GpxCommitLog.TxnResolveWaitMs = prevWait
  }

  test("committer seals members eagerly: the fate decision survives even before any read") {
    val a = hostileDir("gpx_txn_seal_a"); val b = hostileDir("gpx_txn_seal_b")
    seed(a, 10); seed(b, 0)
    val ea = stageAmount(a, 5); val eb = stageAmount(b, 5)
    GpxCommitLog.commitAtomic(conf, Seq(
      a -> GpxCommitLog.Replace(ea, GpxCommitLog.head(a, conf).get.relPaths),
      b -> GpxCommitLog.Replace(eb, GpxCommitLog.head(b, conf).get.relPaths)))
    // both members carry a local seal immediately after commitAtomic
    for (d <- Seq(a, b)) {
      val lp = new Path(new Path(d), "_commits")
      val fs = lp.getFileSystem(conf)
      val seals = fs.listStatus(lp)
        .filter(_.getPath.getName.endsWith(".seal"))
      assert(seals.nonEmpty, s"no local seal under $d")
    }
  }

  test("concurrent LOCAL committers never lose a commit (exclusive slot claims)") {
    // RawLocalFileSystem.create(overwrite=false) is check-then-act; the
    // log claims local slots via an O_EXCL create instead. 8 threads
    // racing appends must land 8 distinct versions with all 8 files live.
    val dir = tempDir("gpx_conc_commit")
    seedLocal(dir, 0)
    val staged = (0 until 8).map(i => stageAmount(dir, 100L + i))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val base = GpxCommitLog.head(dir, conf).get.version
      val futs = staged.map { entries =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            GpxCommitLog.commit(dir, conf, GpxCommitLog.Append(entries))
        })
      }
      val versions = futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.distinct.size == 8, s"duplicate slots: $versions")
      val h = GpxCommitLog.head(dir, conf).get
      assert(h.version == base + 8)
      val expected = staged.flatten.map(_.relPath).toSet
      assert(expected.subsetOf(h.relPaths),
        s"lost commit: ${expected -- h.relPaths}")
      // every staged row is served exactly once
      assert(spark.read.format("gpx").load(dir)
        .agg(sum("amount")).head.getLong(0) == (0 until 8).map(100L + _).sum)
    } finally pool.shutdown()
  }

  test("a txn-only workload keeps cold head resolution bounded by the checkpoint interval") {
    val a = tempDir("gpx_txn_ck_a"); val b = tempDir("gpx_txn_ck_b")
    seedLocal(a, 1000); seedLocal(b, 0)
    // 40 transactions: without txn-aware checkpointing the delta chain
    // would be 40+ manifests deep and cold resolution O(chain)
    (1 to 40).foreach { i =>
      val (ha, hb) = (GpxCommitLog.head(a, conf).get, GpxCommitLog.head(b, conf).get)
      val sa = sumAt(a, ha.version); val sb = sumAt(b, hb.version)
      val ea = stageAmount(a, sa - 1); val eb = stageAmount(b, sb + 1)
      GpxCommitLog.commitAtomic(conf, Seq(
        a -> GpxCommitLog.Replace(ea, ha.relPaths),
        b -> GpxCommitLog.Replace(eb, hb.relPaths)))
    }
    for (d <- Seq(a, b)) {
      GpxCommitLog.invalidateCaches(d)
      val parses0 = GpxCommitLog.manifestParses.get()
      val h = GpxCommitLog.head(d, conf)
      assert(h.isDefined)
      val parses = GpxCommitLog.manifestParses.get() - parses0
      assert(parses <= GpxCommitLog.CheckpointInterval + 4,
        s"cold head resolution of $d read $parses manifests — " +
          "the txn delta chain is not being checkpointed")
    }
    assert(spark.read.format("gpx").load(a).agg(sum("amount")).head.getLong(0) == 960L)
    assert(spark.read.format("gpx").load(b).agg(sum("amount")).head.getLong(0) == 40L)
  }

  test("transfer fuzz on the hostile store: cross-table sum conserved under racing txns and readers") {
    val a = hostileDir("gpx_txn_fz_a"); val b = hostileDir("gpx_txn_fz_b")
    seed(a, 1000); seed(b, 0)
    val prevWait = GpxCommitLog.TxnResolveWaitMs
    GpxCommitLog.TxnResolveWaitMs = 3000
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val readers = (0 until 1).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit =
            while (!stop.get()) {
              val (ha, hb) = stablePair(a, b)
              val s = sumAt(a, ha.version) + sumAt(b, hb.version)
              if (s != 1000)
                violations.add(s"sum $s at (a v${ha.version}, b v${hb.version})")
            }
        })
      }
      val writers = (0 until 3).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = (0 until 4).foreach { k =>
            val x = 10L + t * 7 + k // distinct-ish transfer amounts
            var done = false
            var tries = 0
            while (!done) {
              try {
                val (ha, hb) = stablePair(a, b)
                val sa = sumAt(a, ha.version); val sb = sumAt(b, hb.version)
                val ea = stageAmount(a, sa - x); val eb = stageAmount(b, sb + x)
                GpxCommitLog.commitAtomic(conf, Seq(
                  a -> GpxCommitLog.Replace(ea, ha.relPaths),
                  b -> GpxCommitLog.Replace(eb, hb.relPaths)))
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  tries += 1
                  if (tries > 60) throw new IllegalStateException("txn starved")
                  Thread.sleep(20)
              }
            }
          }
        })
      }
      writers.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      stop.set(true)
      readers.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally {
      stop.set(true)
      pool.shutdown()
      GpxCommitLog.TxnResolveWaitMs = prevWait
    }
    assert(violations.isEmpty, s"conservation violated: ${violations.peek()}")
    // all 12 transfers landed exactly once
    val moved = (0 until 3).flatMap(t => (0 until 4).map(k => 10L + t * 7 + k)).sum
    assert(spark.read.format("gpx").load(a).agg(sum("amount")).head.getLong(0) == 1000 - moved)
    assert(spark.read.format("gpx").load(b).agg(sum("amount")).head.getLong(0) == moved.toLong)
  }

  test("a committer crash between the two table commits is never observable") {
    val a = hostileDir("gpx_txn_cr_a"); val b = hostileDir("gpx_txn_cr_b")
    seed(a, 100); seed(b, 0)
    val prevWait = GpxCommitLog.TxnResolveWaitMs
    GpxCommitLog.TxnResolveWaitMs = 300
    try {
      val ha = GpxCommitLog.head(a, conf).get
      val ea = stageAmount(a, 60) // the crashed transfer: A -> 60, B -> 40
      // "crash": commit ONLY table A's member, never B's, never the fate
      val fateP = new Path(s"$a/${GpxCommitLog.LogDir}/_txn_crash.fate")
      val ffs = fateP.getFileSystem(conf)
      val fateUri = ffs.makeQualified(fateP).toString
      GpxCommitLog.commit(a, conf,
        GpxCommitLog.Replace(ea, ha.relPaths), txn = Some(("crash", fateUri)))
      // first observer forces the in-doubt txn's fate (abort) and sees
      // the PRE-txn state; the cross-table sum holds
      assert(spark.read.format("gpx").load(a)
        .agg(sum("amount")).head.getLong(0) == 100)
      assert(spark.read.format("gpx").load(b)
        .agg(sum("amount")).head.getLong(0) == 0)
      // the fate is sealed aborted: a resurrected committer cannot flip it
      assert(!ffs.asInstanceOf[HostileFileSystem].putIfAbsent(
        fateP, "committed".getBytes("UTF-8")))
      // and later commits build past the dead member as a no-op version
      seedAppend(a, 5)
      assert(spark.read.format("gpx").load(a)
        .agg(sum("amount")).head.getLong(0) == 105)
    } finally GpxCommitLog.TxnResolveWaitMs = prevWait
  }

  private def seedAppend(dir: String, amount: Long): Unit =
    spark.sql(s"SELECT CAST($amount AS BIGINT) AS amount")
      .coalesce(1).write.format("gpx").mode("append").save(dir)

  test("a member conflict mid-transaction aborts every member") {
    val a = tempDir("gpx_txn_ab_a"); val b = tempDir("gpx_txn_ab_b")
    seedLocal(a, 10); seedLocal(b, 20)
    val ha = GpxCommitLog.head(a, conf).get
    val hb = GpxCommitLog.head(b, conf).get
    val ea = stageAmount(a, 7)
    val eb = stageAmount(b, 23)
    // concurrent mutation retires B's file before the txn commits B
    GpxCommitLog.commit(b, conf,
      GpxCommitLog.Replace(stageAmount(b, 20), hb.relPaths))
    val prevWait = GpxCommitLog.TxnResolveWaitMs
    GpxCommitLog.TxnResolveWaitMs = 300
    try {
      intercept[java.util.ConcurrentModificationException] {
        GpxCommitLog.commitAtomic(conf, Seq(
          a -> GpxCommitLog.Replace(ea, ha.relPaths),
          b -> GpxCommitLog.Replace(eb, hb.relPaths)))
      }
      // table A's already-committed member died with the txn
      assert(spark.read.format("gpx").load(a)
        .agg(sum("amount")).head.getLong(0) == 10)
      assert(spark.read.format("gpx").load(b)
        .agg(sum("amount")).head.getLong(0) == 20)
    } finally GpxCommitLog.TxnResolveWaitMs = prevWait
  }
}
