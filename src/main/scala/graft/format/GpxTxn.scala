package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Warehouse-scoped commit-timestamp oracle — the cross-table MVCC
  * primitive (reference: one global transaction timestamp per query,
  * pixels-common transaction domain, proto/transaction.proto:33-48; there
  * a daemon issues timestamps, here the warehouse's `_txn` counter file
  * plays the oracle).
  *
  * Two problems it closes at once:
  *
  *  1. MONOTONICITY. Stamping commits from the wall clock lets clock skew
  *     between two drivers produce out-of-order commitTs, making
  *     `FOR TIMESTAMP AS OF` boundary-ambiguous. `allocate` issues
  *     `max(wallClockMicros, last + 1)` under a lock and persists the high
  *     water mark, so issued timestamps strictly increase across every
  *     writer of the warehouse while still tracking real time (so
  *     time-travel by human timestamps keeps working).
  *
  *  2. CROSS-TABLE SNAPSHOTS. A per-table snapshotTs cannot freeze a
  *     multi-table query: each table pins independently and a commit
  *     landing between two scans tears the snapshot. Because ALL tables of
  *     a warehouse stamp from the same counter, one `currentToken` value
  *     is a consistent "AS OF" for every table at once: any later commit —
  *     to any table — allocates a strictly larger ts and is invisible at
  *     the token. Pin per read (`option("asOfToken", t)`) or per session
  *     (`spark.graft.gpx.asOfToken`), which covers every gpx table in the
  *     query without touching each scan.
  *
  * Tables opt in by carrying a `_warehouse` marker (written by GpxCatalog
  * at CREATE TABLE, or by [[bind]] for path-based tables); unbound tables
  * keep the wall-clock stamping they had.
  */
object GpxTxn {

  val CounterFile = "_txn"
  val WarehouseMark = "_warehouse"

  /** bind a table dir to a warehouse counter (idempotent) */
  def bind(tableDir: String, warehouse: String, conf: Configuration): Unit = {
    val p = new Path(tableDir, WarehouseMark)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(new Path(tableDir))
    val out = fs.create(p, true)
    try out.write(warehouse.getBytes("UTF-8")) finally out.close()
  }

  /** the warehouse a table is bound to, if any */
  def warehouseOf(tableDir: String, conf: Configuration): Option[String] = {
    val p = new Path(tableDir, WarehouseMark)
    try {
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        if (s.nonEmpty) Some(s) else None
      }
    } catch { case _: Throwable => None }
  }

  /** issue the next commit timestamp for the warehouse: strictly greater
    * than every previously issued one AND >= the current wall clock
    * (epoch micros). Serialized by the warehouse's `_txnlock` mutation
    * lock — commit-rate, not row-rate, so the lock is not a throughput
    * concern; the reference pays the same round trip to its transaction
    * service per commit. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def allocate(warehouse: String, conf: Configuration): Long = {
    // Two exclusion layers: a per-warehouse JVM monitor serializes the
    // threads of ONE driver (the create-if-absent file lock is not atomic
    // on local filesystems, and same-JVM contention is the common case —
    // many concurrent commits of one Spark app), and the advisory file
    // lock excludes OTHER drivers. The table mutation lock REFUSES on
    // contention (conflicting rewrites should fail loudly); timestamp
    // allocation must instead QUEUE — two concurrent commits are not a
    // conflict — hence the bounded retry with backoff on the file lock.
    val mon = jvmLocks.computeIfAbsent(warehouse, _ => new Object)
    mon.synchronized {
      var attempts = 200
      while (true) {
        try {
          return GpxMutationLock.withLock(txnScope(warehouse), conf, "txn allocate") {
            val next =
              math.max(System.currentTimeMillis() * 1000L, read(warehouse, conf) + 1L)
            write(warehouse, next, conf)
            next
          }
        } catch {
          case e: java.util.ConcurrentModificationException =>
            attempts -= 1
            if (attempts <= 0) throw e
            Thread.sleep(10 + scala.util.Random.nextInt(40))
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** a consistent cross-table snapshot token: everything committed so far
    * (in ANY table of the warehouse) is visible at it, every later commit
    * is not. Read-only — no lock, one tiny file read. */
  def currentToken(warehouse: String, conf: Configuration): Long = {
    val hwm = read(warehouse, conf)
    if (hwm > 0) hwm else System.currentTimeMillis() * 1000L
  }

  /** commit stamp for a catalog-managed table: warehouse-monotone when the
    * table is bound. An UNBOUND table (legacy, or external location) binds
    * to ITSELF on first stamp — its own dir becomes its counter scope —
    * so monotone commitTs is the default and clock skew between two
    * drivers can no longer issue out-of-order stamps whose `FOR TIMESTAMP
    * AS OF` boundaries are ambiguous. Opt out (restoring raw wall-clock
    * stamping) with spark.graft.gpx.autoBindWarehouse=false.
    *
    * Only a failed BIND falls back to the wall clock (a read-only or
    * foreign location genuinely cannot host a counter, and no prior stamp
    * of this table went through one). Once a table IS bound — here or in
    * any earlier commit — an allocate failure must propagate: silently
    * stamping raw wall clock on a bound table can issue a timestamp the
    * counter never saw, so a later allocate could re-issue a smaller one
    * and invert commitTs order across the two commits. */
  def stamp(tableDir: String, conf: Configuration): Long =
    warehouseOf(tableDir, conf) match {
      case Some(w) => allocate(w, conf)
      case None =>
        val autoBind = try org.apache.spark.sql.SparkSession.active.conf
          .getOption("spark.graft.gpx.autoBindWarehouse").forall(_ != "false")
        catch { case _: Throwable => true }
        if (autoBind) {
          val bound =
            try { bind(tableDir, tableDir, conf); true }
            catch { case scala.util.control.NonFatal(_) => false }
          if (bound) allocate(tableDir, conf)
          else System.currentTimeMillis() * 1000L
        } else System.currentTimeMillis() * 1000L
    }

  // the counter gets its own lock scope so table mutation locks (taken on
  // the table dir) and txn allocation never contend
  private def txnScope(warehouse: String): String =
    new Path(warehouse, "_txnscope").toString

  /** The high-water mark is published as VALUE-NAMED files
    * (`_txncounter/<zero-padded value>`): write() creates the new value's
    * file FIRST, then deletes smaller ones; read() lists the counter dir
    * and takes the max. At no instant is the counter unreadable, so the
    * lockless currentToken/read path can never observe a missing-file
    * window and fall back below the high-water mark (the previous
    * delete-then-rename publish of one `_txn` file had exactly that
    * window, and a crash inside it permanently regressed the counter). A
    * crash between create and cleanup leaves two files — max wins, no
    * regression. The counter dir holds 1–2 entries, so the read stays one
    * listing of a tiny dir (never the table root). The legacy single
    * `_txn` file is still read (max'd in) for tables written by older
    * builds. */
  val CounterDir = "_txncounter"

  private def read(warehouse: String, conf: Configuration): Long = {
    val d = new Path(warehouse)
    try {
      val fs = d.getFileSystem(conf)
      val cd = new Path(d, CounterDir)
      // legacy FIRST, then the counter dir: the migrating writer creates
      // the value-named file before deleting the legacy file, so a reader
      // that misses the legacy file is guaranteed to see the new one
      val legacy: Long = try {
        val p = new Path(d, CounterFile)
        if (!fs.exists(p)) 0L
        else {
          val in = fs.open(p)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
          s.toLong
        }
      } catch { case _: Throwable => 0L }
      val named: Long =
        (try fs.listStatus(cd)
         catch { case _: Throwable => Array.empty[org.apache.hadoop.fs.FileStatus] })
          .iterator.map(_.getPath.getName)
          .flatMap(n => scala.util.Try(n.toLong).toOption)
          .foldLeft(0L)(math.max)
      math.max(named, legacy)
    } catch { case _: Throwable => 0L }
  }

  private def write(warehouse: String, v: Long, conf: Configuration): Unit = {
    val cd = new Path(new Path(warehouse), CounterDir)
    val fs = cd.getFileSystem(conf)
    fs.mkdirs(cd)
    val p = new Path(cd, f"$v%020d")
    val out = fs.create(p, true)
    try out.write(Array.empty[Byte]) finally out.close()
    if (!fs.exists(p))
      throw new java.io.IOException(s"txn counter publish failed: $p")
    // cleanup strictly AFTER the new value is visible (all under the
    // allocate lock — only readers race, and they take the max)
    try {
      fs.listStatus(cd).foreach { st =>
        scala.util.Try(st.getPath.getName.toLong).toOption
          .filter(_ < v).foreach(_ => fs.delete(st.getPath, false))
      }
      val legacy = new Path(new Path(warehouse), CounterFile)
      if (fs.exists(legacy)) fs.delete(legacy, false)
    } catch { case _: Throwable => () } // stale smaller files are harmless
  }
}
