package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.collection.mutable
import scala.util.Random

/** Differential fuzzing of the DML surface: a seeded random sequence of
  * INSERT / DELETE / UPDATE / MERGE against a gpx catalog table, mirrored
  * op-for-op on an in-memory model. After every op the table must equal
  * the model. At the end, FOR VERSION AS OF each recorded checkpoint is
  * held to the engine's DOCUMENTED time-travel contract: gpx keeps ONE
  * storage copy (COW rewrites supersede files — rows a later op deleted
  * or updated are not retained as old versions), but every row a later
  * op did NOT touch must read back exactly as of the checkpoint — that
  * untouched-rows guarantee is what the original-commitTs carry on
  * rewritten survivors exists to protect, and it must hold even for rows
  * that were merely CO-LOCATED in a file some later op rewrote.
  */
class DmlFuzzSpec extends GraftSpec {
  private val sp = TestSpark.spark

  test("random INSERT/DELETE/UPDATE/MERGE sequence matches a model, incl. time travel") {
    runFuzz(seed = 42, nOps = 16, cat = "gfz")
  }

  test("second seed, longer soak (MOR x COW interleavings)") {
    runFuzz(seed = 1337, nOps = 24, cat = "gfz2")
  }

  private def runFuzz(seed: Int, nOps: Int, cat: String): Unit = {
    val wh = Files.createTempDirectory(s"gpx_dmlfuzz_$cat").toString
    sp.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    sp.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    sp.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    sp.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT, s STRING) USING gpx")

    val rnd = new Random(seed)
    val model = mutable.Map.empty[Long, (Long, String)]
    var nextId = 0L
    // (micros timestamp AFTER the op, model state AFTER the op)
    val checkpoints = mutable.ArrayBuffer.empty[(Long, Map[Long, (Long, String)])]
    // ids each op touched (inserted/deleted/updated/merged), op-ordered
    val touchedByOp = mutable.ArrayBuffer.empty[Set[Long]]

    def tableState(): Map[Long, (Long, String)] =
      sp.table(s"$cat.db.t").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    def lit(s: String) = s"'${s}'"

    for (op <- 0 until nOps) {
      val touched: Set[Long] = rnd.nextInt(4) match {
        case 0 => // INSERT a batch of brand-new ids
          val ids = (0 until 1 + rnd.nextInt(40)).map { _ =>
            val id = nextId; nextId += 1
            val v = rnd.nextInt(1000).toLong
            val s = s"s${rnd.nextInt(5)}"
            model(id) = (v, s)
            id
          }
          val rows = ids.map(id =>
            s"($id, ${model(id)._1}, ${lit(model(id)._2)})")
          sp.sql(s"INSERT INTO $cat.db.t VALUES ${rows.mkString(", ")}")
          ids.toSet
        case 1 if model.nonEmpty => // predicate DELETE under a random mode
          // (mor/cow/auto): current-state semantics are identical across
          // modes, and the untouched-rows time-travel contract below holds
          // for all three (mor retains MORE history than it requires).
          // Translatable predicates (BETWEEN) exercise GpxDelete.run's
          // bitmap/rewrite split; the modulo shape is untranslatable and
          // exercises the row-level COW fallback over possibly-masked files.
          val mode = Seq("cow", "mor", "auto")(rnd.nextInt(3))
          sp.conf.set("spark.graft.gpx.deleteMode", mode)
          try {
            if (rnd.nextBoolean()) {
              val lo = rnd.nextLong(math.max(1L, nextId))
              val hi = lo + rnd.nextInt(40)
              val hit = model.keys.filter(id => id >= lo && id <= hi).toSet
              sp.sql(s"DELETE FROM $cat.db.t WHERE id BETWEEN $lo AND $hi")
              model.filterInPlace((id, _) => id < lo || id > hi)
              hit
            } else {
              val m = 2 + rnd.nextInt(5)
              val r = rnd.nextInt(m)
              val hit = model.keys.filter(_ % m == r).toSet
              sp.sql(s"DELETE FROM $cat.db.t WHERE id % $m = $r")
              model.filterInPlace((id, _) => id % m != r)
              hit
            }
          } finally sp.conf.unset("spark.graft.gpx.deleteMode")
        case 2 if model.nonEmpty => // range UPDATE under a random row-level
          // mode: group-based COW rewrite or the delta (bitmap + append)
          // path — identical current-state semantics, and the delta path
          // preserves strictly MORE history than the contract requires
          val lo = rnd.nextLong(math.max(1L, nextId))
          val hi = lo + rnd.nextInt(30)
          val c = 1 + rnd.nextInt(9)
          sp.conf.set("spark.graft.gpx.rowLevelMode",
            if (rnd.nextBoolean()) "mor" else "cow")
          try sp.sql(s"UPDATE $cat.db.t SET v = v + $c WHERE id BETWEEN $lo AND $hi")
          finally sp.conf.unset("spark.graft.gpx.rowLevelMode")
          model.mapValuesInPlace { case (id, (v, s)) =>
            if (id >= lo && id <= hi) (v + c, s) else (v, s)
          }
          model.keys.filter(id => id >= lo && id <= hi).toSet
        case _ => // MERGE: upsert a mix of existing and new ids
          val ids = (0 until 1 + rnd.nextInt(20)).map { _ =>
            if (model.nonEmpty && rnd.nextBoolean())
              model.keys.toSeq(rnd.nextInt(model.size))
            else { val id = nextId; nextId += 1; id }
          }.distinct
          val src = ids.map { id =>
            val v = rnd.nextInt(1000).toLong
            val s = s"m${rnd.nextInt(5)}"
            if (model.contains(id)) model(id) = (v, model(id)._2)
            else model(id) = (v, s)
            s"($id, $v, ${lit(s)})"
          }
          sp.conf.set("spark.graft.gpx.rowLevelMode",
            if (rnd.nextBoolean()) "mor" else "cow")
          try sp.sql(
            s"""MERGE INTO $cat.db.t t
               |USING (SELECT * FROM (VALUES ${src.mkString(", ")})
               |       AS x(id, v, s)) s
               |ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET t.v = s.v
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          finally sp.conf.unset("spark.graft.gpx.rowLevelMode")
          ids.toSet
      }
      touchedByOp += touched
      val got = tableState()
      assert(got == model.toMap,
        s"op $op diverged: table=${got.size} rows model=${model.size}; " +
          s"diff=${(got.toSet diff model.toSet).take(3)} / " +
          s"${(model.toSet diff got.toSet).take(3)}")
      Thread.sleep(2) // commitTs are epoch micros: keep checkpoints distinct
      checkpoints += ((System.currentTimeMillis() * 1000L, model.toMap))
      Thread.sleep(2)
    }

    // Time travel, per the single-storage-copy contract: restricted to
    // ids NO LATER OP TOUCHED, each checkpoint must reproduce its
    // recorded state exactly — presence, values, and absence. (Rows
    // later ops deleted/updated are physically superseded and may
    // legitimately be missing; inserted-later rows must not leak in,
    // which the untouched restriction also asserts.)
    checkpoints.zipWithIndex.foreach { case ((ts, want), i) =>
      val touchedAfter: Set[Long] =
        touchedByOp.drop(i + 1).foldLeft(Set.empty[Long])(_ union _)
      val got = sp.sql(s"SELECT * FROM $cat.db.t FOR VERSION AS OF $ts")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      val gotU = got.filterNot { case (id, _) => touchedAfter(id) }
      val wantU = want.filterNot { case (id, _) => touchedAfter(id) }
      assert(gotU == wantU,
        s"checkpoint $i (ts=$ts) diverged on untouched rows: " +
          s"${(gotU.toSet diff wantU.toSet).take(3)} / " +
          s"${(wantU.toSet diff gotU.toSet).take(3)}")
    }
  }

  test("rename evolution fuzz: random INSERT/UPDATE/DELETE/RENAME sequence matches a model") {
    val wh = Files.createTempDirectory("gpx_renfuzz").toString
    val cat = "grf"
    sp.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    sp.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    sp.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    sp.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING gpx")
    val rnd = new Random(99)
    val model = mutable.Map.empty[Long, Long]
    var nextId = 0L
    var vCol = "v" // current name of the value column
    var gen = 0
    for (op <- 0 until 18) {
      rnd.nextInt(5) match {
        case 0 | 1 => // INSERT through the CURRENT schema
          val rows = (0 until 1 + rnd.nextInt(12)).map { _ =>
            val id = nextId; nextId += 1
            val v = rnd.nextInt(1000).toLong
            model(id) = v
            s"($id, $v)"
          }
          sp.sql(s"INSERT INTO $cat.db.t VALUES ${rows.mkString(", ")}")
        case 2 if model.nonEmpty => // UPDATE referencing the renamed column
          val lo = rnd.nextLong(math.max(1L, nextId)); val hi = lo + rnd.nextInt(20)
          val c = 1 + rnd.nextInt(9)
          sp.sql(s"UPDATE $cat.db.t SET $vCol = $vCol + $c WHERE id BETWEEN $lo AND $hi")
          model.mapValuesInPlace { case (id, v) =>
            if (id >= lo && id <= hi) v + c else v }
        case 3 if model.nonEmpty => // DELETE filtering on the renamed column
          val cut = rnd.nextInt(1000)
          sp.sql(s"DELETE FROM $cat.db.t WHERE $vCol < $cut AND $vCol % 2 = 0")
          model.filterInPlace((_, v) => !(v < cut && v % 2 == 0))
        case _ => // RENAME the value column (files so far keep the old name)
          gen += 1
          val next = s"v$gen"
          sp.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN $vCol TO $next")
          vCol = next
      }
      val got = sp.table(s"$cat.db.t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model.toMap,
        s"op $op (${vCol}) diverged: ${(got.toSet diff model.toSet).take(3)} / " +
          s"${(model.toSet diff got.toSet).take(3)}")
      assert(sp.table(s"$cat.db.t").columns.toSeq == Seq("id", vCol))
    }
    assert(gen >= 1, "seed must have exercised at least one rename")
  }

  test("GpxTxn.allocate: concurrent allocations are unique, monotone, and wall-clock-tracking") {
    import graft.format.GpxTxn
    val conf = sp.sparkContext.hadoopConfiguration
    val wh = Files.createTempDirectory("gpx_txnalloc").toString
    val n = 6; val per = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val wallBefore = System.currentTimeMillis() * 1000L
    val results = try {
      val futures = (0 until n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
          override def call(): Seq[Long] =
            (0 until per).map(_ => GpxTxn.allocate(wh, conf))
        })
      }
      futures.flatMap(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // every allocation unique (the counter never hands out a ts twice,
    // even under contention — the queue-retry path, not the refuse path)
    assert(results.distinct.size == n * per,
      s"duplicate commit timestamps issued: ${results.sorted}")
    // wall-clock tracking: all at or after the clock when we started
    assert(results.min >= wallBefore)
    // the persisted high-water mark is the max issued
    assert(GpxTxn.currentToken(wh, conf) == results.max)
  }

  test("GpxTxn counter is readable at every instant: lockless tokens never regress under racing allocates") {
    import graft.format.GpxTxn
    val conf = sp.sparkContext.hadoopConfiguration
    val wh = Files.createTempDirectory("gpx_txnread").toString
    val first = GpxTxn.allocate(wh, conf)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val floor = new java.util.concurrent.atomic.AtomicLong(first)
    val regressions = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      // two lockless readers race the writer: a token below an already-
      // RETURNED allocation violates "everything committed so far is
      // visible at the token" (the old delete-then-rename publish had a
      // missing-file window where exactly that happened)
      val readers = (0 until 2).map(_ => pool.submit(new Runnable {
        override def run(): Unit =
          while (!stop.get()) {
            val f = floor.get() // read the floor BEFORE the token
            if (GpxTxn.currentToken(wh, conf) < f) {
              regressions.incrementAndGet(); ()
            }
          }
      }))
      (0 until 300).foreach { _ =>
        floor.set(GpxTxn.allocate(wh, conf))
      }
      stop.set(true)
      readers.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(regressions.get() == 0,
      s"${regressions.get()} token reads fell below the allocated floor")
  }

  test("GpxTxn legacy single-file counter migrates in place; a crash mid-publish never regresses") {
    import graft.format.GpxTxn
    import org.apache.hadoop.fs.Path
    val conf = sp.sparkContext.hadoopConfiguration
    val wh = Files.createTempDirectory("gpx_txnlegacy").toString
    // a counter written by an older build: one `_txn` file with the value
    val legacyVal = System.currentTimeMillis() * 1000L + 5_000_000L // ahead of wall
    val p = new Path(wh, "_txn")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(legacyVal.toString.getBytes("UTF-8")) finally out.close()
    assert(GpxTxn.currentToken(wh, conf) == legacyVal)
    // the next allocation continues ABOVE the legacy high-water mark and
    // migrates to the value-named scheme
    val next = GpxTxn.allocate(wh, conf)
    assert(next > legacyVal, s"$next must exceed legacy $legacyVal")
    assert(GpxTxn.currentToken(wh, conf) == next)
    // crash-mid-cleanup simulation: plant a STALE smaller value-named file
    // alongside — readers take the max, no regression
    val cd = new Path(wh, GpxTxn.CounterDir)
    fs.create(new Path(cd, f"${next - 1000L}%020d"), true).close()
    assert(GpxTxn.currentToken(wh, conf) == next)
    val after = GpxTxn.allocate(wh, conf)
    assert(after > next)
  }

  test("unbound tables auto-bind on first stamp: commitTs monotone with no explicit bind") {
    import graft.format.GpxTxn
    val conf = sp.sparkContext.hadoopConfiguration
    val dir = Files.createTempDirectory("gpx_autobind").toString
    assert(GpxTxn.warehouseOf(dir, conf).isEmpty)
    // stamps on a never-bound dir must still be strictly monotone (the
    // first one binds the table to itself as its counter scope)
    val stamps = (0 until 5).map(_ => GpxTxn.stamp(dir, conf))
    assert(stamps == stamps.sorted && stamps.distinct.size == stamps.size,
      s"auto-bound stamps must strictly increase: $stamps")
    assert(GpxTxn.warehouseOf(dir, conf).contains(dir),
      "first stamp must bind the table to itself")
    // opt-out restores wall-clock stamping and never binds
    val dir2 = Files.createTempDirectory("gpx_autobind_off").toString
    sp.conf.set("spark.graft.gpx.autoBindWarehouse", "false")
    try {
      GpxTxn.stamp(dir2, conf)
      assert(GpxTxn.warehouseOf(dir2, conf).isEmpty)
    } finally sp.conf.unset("spark.graft.gpx.autoBindWarehouse")
  }

  test("cross-table snapshot tokens: one GpxTxn token freezes BOTH tables consistently") {
    import graft.format.GpxTxn
    val conf = sp.sparkContext.hadoopConfiguration
    val wh = Files.createTempDirectory("gpx_txnfuzz").toString
    val cat = "gtx"
    sp.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    sp.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    sp.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    sp.sql(s"CREATE TABLE $cat.db.a (id BIGINT, v BIGINT) USING gpx")
    sp.sql(s"CREATE TABLE $cat.db.b (id BIGINT, v BIGINT) USING gpx")
    val whA = s"$wh/db/a"; val whB = s"$wh/db/b"
    assert(GpxTxn.warehouseOf(whA, conf).contains(wh),
      "catalog tables must bind to the warehouse txn counter")

    val rnd = new Random(7)
    val modelA = mutable.Map.empty[Long, Long]
    val modelB = mutable.Map.empty[Long, Long]
    var nextId = 0L
    // (token AFTER the op, state of A, state of B) — history-preserving
    // ops only (INSERT + merge-on-read DELETE), so every snapshot is
    // exactly reproducible, not just on untouched rows
    val snaps = mutable.ArrayBuffer.empty[(Long, Map[Long, Long], Map[Long, Long])]
    for (_ <- 0 until 10) {
      val (t, model) =
        if (rnd.nextBoolean()) ("a", modelA) else ("b", modelB)
      if (model.nonEmpty && rnd.nextInt(4) == 0) {
        // translatable predicate -> GpxDelete.run's merge-on-read sidecar
        // path, which RETAINS history (the sidecar applies only at
        // snapshots >= its deleteTs); a non-translatable predicate would
        // fall back to the COW row-level rewrite, whose documented
        // contract destroys superseded history
        val lo = rnd.nextLong(math.max(1L, nextId))
        val hi = lo + rnd.nextInt(20)
        sp.conf.set("spark.graft.gpx.deleteMode", "mor")
        try sp.sql(s"DELETE FROM $cat.db.$t WHERE id BETWEEN $lo AND $hi")
        finally sp.conf.unset("spark.graft.gpx.deleteMode")
        model.filterInPlace((id, _) => id < lo || id > hi)
      } else {
        val rows = (0 until 1 + rnd.nextInt(15)).map { _ =>
          val id = nextId; nextId += 1
          val v = rnd.nextInt(1000).toLong
          model(id) = v
          s"($id, $v)"
        }
        sp.sql(s"INSERT INTO $cat.db.$t VALUES ${rows.mkString(", ")}")
      }
      snaps += ((GpxTxn.currentToken(wh, conf), modelA.toMap, modelB.toMap))
    }
    // issued timestamps must be strictly monotone across BOTH tables
    assert(snaps.map(_._1).toSeq == snaps.map(_._1).toSeq.sorted.distinct ||
      snaps.map(_._1).toSeq.sliding(2).forall(p => p.head <= p.last),
      s"tokens must be non-decreasing: ${snaps.map(_._1)}")
    // every token reproduces the exact two-table state it froze, through
    // the SESSION pin (the per-query form: one conf covers all gpx scans)
    snaps.zipWithIndex.foreach { case ((tok, wa, wb), i) =>
      sp.conf.set("spark.graft.gpx.asOfToken", tok.toString)
      try {
        val ga = sp.table(s"$cat.db.a").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val gb = sp.table(s"$cat.db.b").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(ga == wa, s"snap $i: table a diverged at token $tok: " +
          s"${(ga.toSet diff wa.toSet).take(3)} / ${(wa.toSet diff ga.toSet).take(3)}")
        assert(gb == wb, s"snap $i: table b diverged at token $tok")
        // and the cross-table JOIN at the token is the joined frozen state
        val j = sp.sql(
          s"SELECT a.id FROM $cat.db.a a JOIN $cat.db.b b ON a.id % 5 = b.id % 5")
          .count()
        val wantJ = wa.keys.toSeq.map(_ % 5)
          .map(k => wb.keys.count(_ % 5 == k).toLong).sum
        assert(j == wantJ, s"snap $i: cross-table join diverged at token $tok")
      } finally sp.conf.unset("spark.graft.gpx.asOfToken")
    }
  }

  /** the exception Spark surfaces for a refused V2 commit wraps the
    * connector's — walk the cause chain for the conflict refusal */
  private def findCme(t: Throwable): Option[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .find(_.isInstanceOf[java.util.ConcurrentModificationException])

  test("deterministic COW race: concurrent rewrite of candidate files refuses, never a silent empty Replace") {
    val wh = Files.createTempDirectory("gpx_cowrace").toString
    val cat = "gcr"
    sp.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    sp.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    sp.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    sp.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING gpx " +
      "TBLPROPERTIES('commit_protocol'='manifest')")
    // EVEN ids only: file zone maps span [0,198], but id=51 matches no
    // row — so the outer UPDATE's runtime group filter comes back empty
    // and the replace commits with an EMPTY remove set, the exact
    // signature of the r14 lost-update race (remove-set liveness is
    // structurally blind to it; only the cross-snapshot check can refuse)
    sp.sql(s"INSERT INTO $cat.db.t SELECT id * 2, 0 FROM range(0, 100)")
    val hookHost = graft.format.GpxReplaceBatchWrite
    try {
      // the barrier: fires after the outer UPDATE's scans all executed,
      // before it publishes — one-shot, so the inner rewrite it runs
      // commits through an unhooked path
      hookHost.beforeCommitHook = () => {
        hookHost.beforeCommitHook = () => ()
        sp.sql(s"UPDATE $cat.db.t SET v = v + 10 WHERE id < 200")
        ()
      }
      val e = intercept[Throwable] {
        sp.sql(s"UPDATE $cat.db.t SET v = v + 1 WHERE id = 51")
      }
      val cme = findCme(e).getOrElse(
        fail(s"expected a ConcurrentModificationException cause, got $e"))
      assert(cme.getMessage.contains("rewritten concurrently"), cme.getMessage)
    } finally hookHost.beforeCommitHook = () => ()
    // the inner rewrite held, in full; the refused outer op had no effect
    val got = sp.table(s"$cat.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 100, s"row count changed: ${got.size}")
    assert(got.forall { case (id, v) => id % 2 == 0 && v == 10L },
      s"state must be exactly the inner rewrite's: ${got.take(3)}")
  }

  test("COW conflict check is scoped: a concurrent rewrite of provably-unrelated files does not abort") {
    val wh = Files.createTempDirectory("gpx_cowscope").toString
    val cat = "gcs"
    sp.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    sp.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    sp.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    sp.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING gpx " +
      "TBLPROPERTIES('commit_protocol'='manifest')")
    // two disjoint key ranges in separate commits -> separate files with
    // non-overlapping id zone maps in the manifest
    sp.sql(s"INSERT INTO $cat.db.t SELECT id, 0 FROM range(0, 100)")
    sp.sql(s"INSERT INTO $cat.db.t SELECT id + 1000, 0 FROM range(0, 100)")
    val hookHost = graft.format.GpxReplaceBatchWrite
    try {
      // at the barrier, rewrite ONLY the high-range files — their
      // plan-time zone maps prove `id < 100` could never match them, so
      // the scoped conflict check must let the outer UPDATE commit
      // (before round 15 this aborted: the check diffed the whole table)
      hookHost.beforeCommitHook = () => {
        hookHost.beforeCommitHook = () => ()
        sp.sql(s"UPDATE $cat.db.t SET v = v + 10 WHERE id >= 1000")
        ()
      }
      sp.sql(s"UPDATE $cat.db.t SET v = v + 1 WHERE id < 100")
    } finally hookHost.beforeCommitHook = () => ()
    // both effects present: nothing lost, nothing duplicated
    val got = sp.table(s"$cat.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 200, s"row count: ${got.length}")
    assert(got.filter(_._1 < 100).forall(_._2 == 1L), "low-range update lost")
    assert(got.filter(_._1 >= 1000).forall(_._2 == 10L), "high-range rewrite lost")
  }
}
