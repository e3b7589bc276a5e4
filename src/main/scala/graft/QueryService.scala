package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** SLA-tiered query front-end — the Spark-native analog of the
  * reference's query manager (pixels-server/.../controller/
  * QueryManager.java:53-220 and ExecutionHint.java:28-30): pending
  * queues per SLA class, admission by slot availability, execution-hint
  * routing, trace-token status tracking, and result collection with
  * pop semantics.
  *
  * Hint semantics (matching the reference's contract):
  *  - IMMEDIATE: submitted for execution right away, never queued behind
  *    slot checks (the reference enables its cloud-function burst for
  *    these; the Spark analog routes them to a dedicated high-weight
  *    scheduler pool so FAIR scheduling preempts capacity for them).
  *  - RELAXED: may be postponed while the cluster is busy (no free MPP
  *    slots in the reference; here: running-query count at the slot
  *    cap), but never beyond maxPostponeMs — a query about to exceed it
  *    is submitted regardless (the reference's 2nd pending queue +
  *    forced submit, QueryManager.java:191-220).
  *  - BEST_EFFORT: runs only when NOTHING else is running
  *    (QueryManager.java:225-250's mppConcurrency == 0 check).
  *
  * Every query executes under its own Spark job group (the trace
  * token), so cancel(token) aborts its running jobs; worker threads tag
  * themselves with a per-hint scheduler pool, which a deployment with
  * spark.scheduler.mode=FAIR maps to weighted pools (local test
  * sessions run FIFO; the tag is still set and asserted). Results are
  * retained until popped or until resultTtlMs expires (the reference's
  * queryResultClearService), so an abandoned client cannot leak the
  * driver's memory. */
object QueryService {

  sealed trait ExecutionHint { def pool: String }
  case object Immediate extends ExecutionHint { val pool = "graft-immediate" }
  case object Relaxed extends ExecutionHint { val pool = "graft-relaxed" }
  case object BestEffort extends ExecutionHint { val pool = "graft-besteffort" }

  /** a query whose result exceeded the manager's maxResultRows budget —
    * surfaces as Failed("ResultTooLargeException: ...") so transports can
    * map it to a 413-class rejection (QueryHttp does) */
  final class ResultTooLargeException(msg: String) extends RuntimeException(msg)

  sealed trait Status
  case object Pending extends Status
  case object Running extends Status
  case object Finished extends Status
  final case class Failed(reason: String) extends Status
  case object Cancelled extends Status

  final case class QueryResult(token: String, rows: Array[Row],
      columns: Array[String], pendingMs: Long, execMs: Long)

  /** a paged result's spill descriptor: page `i` is an independent
    * serialization segment of `pageRows(i)` rows occupying file bytes
    * [offsets(i), offsets(i+1)). Always >= 1 page — an empty result has
    * one zero-row page so clients can still fetch columns/metadata. */
  final case class Spill(file: java.io.File, offsets: Array[Long],
      pageRows: Array[Int], columns: Array[String], rowCount: Long,
      bytes: Long, pendingMs: Long, execMs: Long) {
    def pages: Int = offsets.length - 1
  }

  /** one page of a paged result (re-readable until released/expired) */
  final case class Page(token: String, page: Int, pages: Int,
      rows: Array[Row], columns: Array[String], rowCount: Long,
      pendingMs: Long, execMs: Long)

  /** soft per-page byte bound: a page closes once it crosses this, so
    * page READS are memory-bounded too (one page ≈ this + one row) */
  private val PageSoftBytes: Long = 4L << 20

  /** hard per-page ceiling: a page deserializes through ONE byte array,
    * so a single row serialized past this cannot be served and is
    * rejected at write time (only reachable with maxSpillBytes raised
    * past ~1.6 GiB — the soft bound closes multi-row pages at ~4 MB) */
  private val MaxPageServeBytes: Long = (Int.MaxValue.toLong * 3) / 4

  private final class CountingOutputStream(u: java.io.OutputStream)
    extends java.io.FilterOutputStream(u) {
    var count = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
  }

  /** process-wide spill directory with ONE shutdown hook reclaiming it —
    * per-file deleteOnExit would grow the JVM's delete-on-exit set by one
    * path per paged query for the process lifetime */
  private[graft] lazy val spillRoot: java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_qspill_").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      Option(d.listFiles()).foreach(_.foreach { f => f.delete(); () })
      d.delete()
      ()
    }, "graft-qspill-cleanup"))
    d
  }

  private final class Entry(
      val token: String, val sql: String, val hint: ExecutionHint,
      val receivedMs: Long, val paged: Boolean) {
    @volatile var status: Status = Pending
    @volatile var result: QueryResult = null
    /** paged results live here instead of `result` (disk, not heap) */
    @volatile var spill: Spill = null
    /** terminal timestamp (Finished/Failed/Cancelled) — result TTL and
      * entry eviction are measured from completion, never submission: a
      * query that queued or ran long must still be poppable for the full
      * TTL after it produced its rows. */
    @volatile var finishedMs: Long = 0L
    /** a cancel that lands while no Spark job is active (analysis, between
      * AQE stages) has nothing to kill — the worker re-checks this flag
      * after the action and discards the result instead of reporting
      * Finished for a query the caller was told was cancelled. */
    @volatile var cancelRequested: Boolean = false
    /** exactly-once pendingCount release for queued entries, whoever
      * dequeues first (scheduler poll vs cancel's queue removal). */
    val dequeued = new java.util.concurrent.atomic.AtomicBoolean(false)
    val done = new CountDownLatch(1)
  }

  /** One manager per SparkSession. `slots` bounds how many queries may
    * run at once before RELAXED submissions start queueing; `queueCap`
    * bounds the pending queues (submissions beyond it are REJECTED
    * loudly — admission control, not silent unbounded buffering). */
  final class Manager(spark: SparkSession, slots: Int = 4,
      queueCap: Int = 64, maxPostponeMs: Long = 60000L,
      resultTtlMs: Long = 10 * 60 * 1000L,
      maxResultRows: Int = 1 << 20,
      pageRows: Int = 10000,
      maxSpillBytes: Long = 1L << 30,
      maxTotalSpillBytes: Long = 8L << 30) extends AutoCloseable {

    require(slots >= 1 && queueCap >= 1 && maxResultRows >= 1 &&
      pageRows >= 1 && maxSpillBytes >= 1 && maxTotalSpillBytes >= 1)

    /** spill bytes currently RETAINED by finished paged results PLUS
      * bytes reserved by in-flight paged writes — `maxSpillBytes` bounds
      * one query, this bounds the service: without it, N clients each
      * just under the per-query cap hold N GiB of tmpdir (RAM again when
      * /tmp is tmpfs) until their TTLs. In-flight writers reserve their
      * counted bytes incrementally as they write (released on failure),
      * so `slots` concurrent paged writers cannot each pass an
      * admission check and then write maxSpillBytes of unaccounted disk:
      * the ledger IS the disk bound, overshoot at most one flush
      * interval per writer. A write that would exceed it aborts exactly
      * like an oversize result. */
    private val retainedSpill = new AtomicLong(0)

    /** every spill-deletion path goes through here so the ledger can
      * never drift from the files actually on disk. A delete refused by
      * the OS (a page read holding the file open on Windows; POSIX
      * deletes open files fine) is handed to deleteOnExit — a rare,
      * bounded fallback, unlike the per-file registration the spill dir
      * replaced — and still leaves the ledger, because the budget's job
      * is bounding what NEW spills may assume is free. */
    private def freeSpill(s: Spill): Unit = {
      if (!s.file.delete() && s.file.exists()) s.file.deleteOnExit()
      retainedSpill.addAndGet(-s.bytes)
      ()
    }

    /** spill bytes currently retained by finished paged results
      * (observability + the service-budget gate's test surface) */
    def retainedSpillBytes: Long = retainedSpill.get
    private val seq = new AtomicLong(0)
    private val queries = new ConcurrentHashMap[String, Entry]()
    private val pendingRelaxed = new ConcurrentLinkedQueue[Entry]()
    private val pendingBestEffort = new ConcurrentLinkedQueue[Entry]()
    private val pendingCount = new AtomicInteger(0)
    private val runningCount = new AtomicInteger(0)
    @volatile private var running = true

    // one executor for query bodies (each blocks a thread for its
    // duration, like the reference's cached executeService) + one
    // scheduler draining the SLA queues
    private val exec = java.util.concurrent.Executors.newCachedThreadPool()
    private val scheduler = new Thread(() => {
      while (running) {
        try {
          drainOnce()
          Thread.sleep(10)
        } catch {
          case _: InterruptedException => ()
          // anything else (a submit racing close, an unexpected state)
          // must not kill the scheduler thread: that would strand every
          // queued query Pending forever while submissions still succeed
          case scala.util.control.NonFatal(t) =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"query scheduler: drain failed, continuing", t)
        }
      }
    }, "graft-query-scheduler")
    scheduler.setDaemon(true)
    scheduler.start()

    /** serializes submit's admit-and-enqueue against close's sweep: a
      * submit that passed the `running` check while close() swept the
      * pending entries could otherwise insert AFTER the sweep — its done
      * latch never counts down (await rides the full timeout), its
      * pendingCount slot leaks, and the token/SQL are retained forever. */
    private val closeLock = new Object

    /** Submit a query under an SLA hint; returns the trace token.
      * Throws IllegalStateException when the pending queues are full.
      *
      * `paged = true` opts into the SPILL-BACKED result path for large
      * results: the worker streams the rows through `toLocalIterator`
      * into a local spill file (driver memory bounded by one partition +
      * one page), and the result is then served page by page via
      * [[resultPage]] — re-readable until [[releaseResult]] or the TTL,
      * bounded by `maxSpillBytes` on disk instead of `maxResultRows` on
      * heap. [[popResult]] returns None for paged queries. This is the
      * page-or-sink side of the admission contract the in-heap path
      * rejects oversize results toward (the reference buffers results
      * driver-side unconditionally, QueryManager.java:120-144 — at scale
      * that is the availability hazard the budget + spill split avoids). */
    def submit(sql: String, hint: ExecutionHint,
        paged: Boolean = false): String = closeLock.synchronized {
      require(running, "query service is closed")
      val token = s"q${seq.incrementAndGet()}-${Integer.toHexString(sql.hashCode)}"
      val e = new Entry(token, sql, hint, System.currentTimeMillis(), paged)
      queries.put(token, e)
      hint match {
        case Immediate =>
          // never queued: immediate queries get capacity now (FAIR pool
          // weighting at deployment; locally they just start)
          e.dequeued.set(true) // holds no queue capacity to release
          execute(e)
        case Relaxed =>
          if (pendingCount.incrementAndGet() > queueCap) {
            pendingCount.decrementAndGet()
            queries.remove(token)
            throw new IllegalStateException(
              s"query service: relaxed pending queue full ($queueCap) — rejected")
          }
          pendingRelaxed.add(e)
        case BestEffort =>
          if (pendingCount.incrementAndGet() > queueCap) {
            pendingCount.decrementAndGet()
            queries.remove(token)
            throw new IllegalStateException(
              s"query service: best-effort pending queue full ($queueCap) — rejected")
          }
          pendingBestEffort.add(e)
      }
      token
    }

    /** status of a known token; None = unknown/expired */
    def status(token: String): Option[Status] =
      Option(queries.get(token)).map(_.status)

    /** block until the query finishes, then return its status */
    def await(token: String, timeoutMs: Long = 300000L): Option[Status] =
      Option(queries.get(token)).map { e =>
        e.done.await(timeoutMs, TimeUnit.MILLISECONDS)
        e.status
      }

    /** POP the result: returns it and frees the retained rows (the
      * reference's popQueryResult). None until finished, or after an
      * earlier pop. Atomic: concurrent pops get at most one winner. */
    def popResult(token: String): Option[QueryResult] =
      Option(queries.get(token)).flatMap { e =>
        e.synchronized {
          val r = e.result
          if (r != null) { e.result = null; Some(r) } else None
        }
      }

    /** page count of a finished PAGED result; None = unknown token, not
      * finished, not paged, or already released */
    def pageCount(token: String): Option[Int] =
      Option(queries.get(token)).flatMap(e => Option(e.spill)).map(_.pages)

    /** Read one page of a paged result (NOT pop-once: pages stay
      * re-readable until [[releaseResult]] or the result TTL, so a
      * client can retry a lost page). None = unknown/unfinished/
      * released token or out-of-range page. The disk read runs OUTSIDE
      * the entry monitor (only the Spill ref is captured under it), so
      * page fetches never block cancel/status/the scheduler sweep; a
      * release racing the read surfaces as the file vanishing -> None,
      * same answer the client would have gotten a moment later. */
    def resultPage(token: String, page: Int): Option[Page] =
      Option(queries.get(token)).flatMap { e =>
        val s = e.synchronized(e.spill)
        if (s == null || page < 0 || page >= s.pages) None
        else try {
          val raf = new java.io.RandomAccessFile(s.file, "r")
          try {
            raf.seek(s.offsets(page))
            val len = (s.offsets(page + 1) - s.offsets(page)).toInt
            val bytes = new Array[Byte](len)
            raf.readFully(bytes)
            val ois = new java.io.ObjectInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val rows = Array.fill(s.pageRows(page))(
              ois.readObject().asInstanceOf[Row])
            Some(Page(token, page, s.pages, rows, s.columns,
              s.rowCount, s.pendingMs, s.execMs))
          } finally raf.close()
        } catch {
          case _: java.io.FileNotFoundException => None
        }
      }

    /** free a paged result's spill file early (the paged analog of the
      * pop); idempotent — returns false once released */
    def releaseResult(token: String): Boolean =
      Option(queries.get(token)).exists { e =>
        e.synchronized {
          val s = e.spill
          if (s == null) false
          else { e.spill = null; freeSpill(s); true }
        }
      }

    /** cancel a pending or running query: pending entries never start
      * (and immediately release their admission-queue capacity); running
      * entries get their Spark job group killed, and a cancel that lands
      * between jobs still wins — the worker discards the result. */
    def cancel(token: String): Boolean =
      Option(queries.get(token)).exists { e =>
        e.synchronized {
          e.status match {
            case Pending =>
              e.status = Cancelled
              e.finishedMs = System.currentTimeMillis()
              e.done.countDown()
              pendingRelaxed.remove(e)
              pendingBestEffort.remove(e)
              if (e.dequeued.compareAndSet(false, true))
                pendingCount.decrementAndGet()
              true
            case Running =>
              e.cancelRequested = true
              spark.sparkContext.cancelJobGroup(token); true
            case _ => false
          }
        }
      }

    private def drainOnce(): Unit = {
      // RELAXED: submit while slots are free; force-submit anything
      // that would exceed its postpone budget even when saturated
      var continue = true
      while (continue) {
        val head = pendingRelaxed.peek()
        continue = head != null && {
          val overdue =
            System.currentTimeMillis() - head.receivedMs >= maxPostponeMs
          if (runningCount.get() < slots || overdue) {
            val e = pendingRelaxed.poll()
            if (e != null) {
              if (e.dequeued.compareAndSet(false, true))
                pendingCount.decrementAndGet()
              execute(e)
            }
            e != null
          } else false
        }
      }
      // BEST_EFFORT: only when nothing at all is running
      if (runningCount.get() == 0) {
        val e = pendingBestEffort.poll()
        if (e != null) {
          if (e.dequeued.compareAndSet(false, true))
            pendingCount.decrementAndGet()
          execute(e)
        }
      }
      // result retention: expire rows an abandoned client never popped —
      // TTL runs from COMPLETION; once expired the whole entry is evicted
      // (token/SQL strings must not accumulate for the manager's lifetime)
      val cutoff = System.currentTimeMillis() - resultTtlMs
      queries.forEach { (token, e) =>
        if (e.finishedMs > 0 && e.finishedMs < cutoff &&
            e.done.getCount == 0) {
          e.synchronized {
            e.result = null
            // paged results hold a spill FILE — TTL expiry must free the
            // disk too, or abandoned paged clients leak the tmpdir
            if (e.spill != null) { freeSpill(e.spill); e.spill = null }
          }
          queries.remove(token)
        }
      }
    }

    private def execute(e: Entry): Unit = {
      e.synchronized {
        if (e.status != Pending) return // cancelled while queued
        e.status = Running
      }
      runningCount.incrementAndGet()
      try exec.submit(new Runnable {
        override def run(): Unit = {
          val started = System.currentTimeMillis()
          try {
            // job group = trace token (cancellation handle); pool tag =
            // the hint's scheduler pool (FAIR-weighted at deployment)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", e.hint.pool)
            spark.sparkContext.setJobGroup(e.token,
              s"graft query ${e.token} (${e.hint.pool})", interruptOnCancel = true)
            if (e.cancelRequested) throw new InterruptedException("cancelled")
            val df: DataFrame = spark.sql(e.sql)
            if (e.paged) {
              // spill path: toLocalIterator pulls partitions one at a
              // time (driver holds one partition + one page buffer, not
              // the result), each page serialized as one independent
              // block so serving reads exactly one block per request
              // service-wide budget: reserved INCREMENTALLY inside
              // spillWrite as bytes are written (the ledger covers
              // in-flight writers, so `slots` concurrent spills are
              // bounded collectively); at success the reservation equals
              // spill.bytes, which every failure path below returns via
              // freeSpill — nothing left to admit here.
              val spill = spillWrite(e, df)
              val finished = System.currentTimeMillis()
              var keep = false
              e.synchronized {
                keep = !e.cancelRequested && running
                if (keep) {
                  e.spill = spill.copy(
                    pendingMs = started - e.receivedMs,
                    execMs = finished - started)
                  e.status = Finished
                } else e.status = Cancelled
              }
              if (!keep) freeSpill(spill)
            } else {
            // result-size admission control: the pop-once contract
            // buffers the full result on the driver, so an unbounded
            // collect is the service's availability hazard — one
            // SELECT * over a big table would OOM the driver and take
            // every tenant with it. Collect at most max+1 rows
            // (CollectLimitExec pulls partitions incrementally, so the
            // executors never even ship the excess) and REJECT above
            // the budget rather than silently truncate: a client that
            // wants big results pages with LIMIT/OFFSET or writes to a
            // sink, as with the reference's JDBC-buffered result path.
            // saturating +1: maxResultRows = Int.MaxValue is the natural
            // opt-out and must not wrap to a negative limit
            val lim =
              if (maxResultRows >= Int.MaxValue) Int.MaxValue
              else maxResultRows + 1
            val rows = df.limit(lim).collect()
            val finished = System.currentTimeMillis()
            if (rows.length > maxResultRows)
              throw new ResultTooLargeException(
                s"result exceeds maxResultRows=$maxResultRows — rejected; " +
                  "page with LIMIT/OFFSET or write to a sink")
            // a cancel that landed while no job was active (analysis,
            // between AQE jobs) found nothing to kill: honor it here —
            // the caller was told the query was cancelled. The re-check
            // and the publication are ONE critical section: without the
            // monitor, cancel() could return true between this check and
            // the status write and the query would still finish poppable.
            e.synchronized {
              if (e.cancelRequested) { e.status = Cancelled }
              else {
                e.result = QueryResult(e.token, rows, df.columns,
                  pendingMs = started - e.receivedMs, execMs = finished - started)
                e.status = Finished
              }
            }
            }
          } catch {
            case t: Throwable => e.synchronized {
              val cancelled = e.cancelRequested || e.status == Cancelled ||
                causeChain(t).exists { c =>
                  c.isInstanceOf[InterruptedException] ||
                    Option(c.getMessage).exists(_.contains("cancelled"))
                }
              e.status = if (cancelled) Cancelled
                else Failed(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}")
            }
          } finally {
            spark.sparkContext.clearJobGroup()
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
            e.finishedMs = System.currentTimeMillis()
            runningCount.decrementAndGet()
            e.done.countDown()
          }
        }
      })
      catch {
        // close() shut the executor down between our admission and here
        // (an Immediate submit racing close): terminate the entry so the
        // latch counts down and the running slot is released
        case _: java.util.concurrent.RejectedExecutionException =>
          runningCount.decrementAndGet()
          e.synchronized {
            e.status = Cancelled
            e.finishedMs = System.currentTimeMillis()
          }
          e.done.countDown()
      }
      ()
    }

    /** Stream the result into a spill file of independently-readable
      * serialization segments (one per page). Rows serialize STRAIGHT to
      * the file — the driver never holds a page in heap, so wide rows
      * cannot defeat the bounded-memory contract (a page closes at
      * `pageRows` rows OR ~[[PageSoftBytes]], whichever first). Disk is
      * bounded by `maxSpillBytes`, checked per row against the counted
      * bytes (overflow rejects with ResultTooLargeException, same
      * contract/transport mapping as the heap budget; overshoot is at
      * most one flush interval). The spill file is deleted on ANY
      * failure; orphans are reclaimed by the process-wide [[spillRoot]]
      * shutdown hook. */
    private def spillWrite(e: Entry, df: DataFrame): Spill = {
      val file = java.io.File.createTempFile("spill_", ".bin", spillRoot)
      val counting = new CountingOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(file)))
      // each page is its own ObjectOutputStream (own header + reference
      // table) over a close/flush-absorbing view, so pages deserialize
      // independently by byte range. flush() deliberately does NOT
      // propagate: counting sits ABOVE the 8 KB file buffer, so the
      // logical count (offsets, budget checks) is exact the moment
      // ObjectOutputStream drains its 1 KB blocks, while the buffered
      // stream keeps batching syscalls — per-page closes and the
      // periodic count-refresh flushes cost no I/O
      val noClose = new java.io.FilterOutputStream(counting) {
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          counting.write(b, off, len)
        override def flush(): Unit = ()
        override def close(): Unit = ()
      }
      // incremental service-budget reservation: this writer's counted
      // bytes sit in the retainedSpill ledger WHILE it writes, so
      // concurrent paged writers are bounded collectively — reserving
      // only at publication would let `slots` writers each pass an
      // admission check and write up to maxSpillBytes of unaccounted
      // (and possibly doomed) disk first. Overshoot is at most one
      // flush interval per writer; released on any failure; at success
      // the reservation equals Spill.bytes, which freeSpill returns.
      var reserved = 0L
      def reserve(upTo: Long): Unit = {
        val delta = upTo - reserved
        if (delta > 0) {
          var ok = false
          var cur = retainedSpill.get()
          while (!ok && cur + delta <= maxTotalSpillBytes) {
            if (retainedSpill.compareAndSet(cur, cur + delta)) ok = true
            else cur = retainedSpill.get()
          }
          if (!ok)
            throw new ResultTooLargeException(
              s"service spill budget exceeded (maxTotalSpillBytes=" +
                s"$maxTotalSpillBytes) — pop/release earlier paged " +
                "results or write to a sink")
          reserved = upTo
        }
      }
      try {
        val offsets = scala.collection.mutable.ArrayBuffer(0L)
        val perPage = scala.collection.mutable.ArrayBuffer.empty[Int]
        var rowCount = 0L
        var oos: java.io.ObjectOutputStream = null
        var rowsInPage = 0
        def endPage(): Unit = if (oos != null) {
          oos.close() // flushes through noClose; file stays open
          perPage += rowsInPage
          offsets += counting.count
          oos = null
          rowsInPage = 0
        }
        val it = df.toLocalIterator()
        while (it.hasNext) {
          if (e.cancelRequested) throw new InterruptedException("cancelled")
          if (oos == null) oos = new java.io.ObjectOutputStream(noClose)
          oos.writeObject(it.next())
          rowsInPage += 1
          rowCount += 1
          // periodic drain keeps the byte count honest between the
          // stream's internal 1 KB blocks; no syscall (flush is absorbed)
          if (rowsInPage % 32 == 0) oos.flush()
          // a single row serialized past the servable-page bound can
          // never be read back through a byte array — reject it here
          // rather than 500 on the fetch
          if (counting.count - offsets.last > MaxPageServeBytes)
            throw new ResultTooLargeException(
              "one row serialized past the servable page bound " +
                s"($MaxPageServeBytes bytes) — write to a sink")
          if (rowsInPage >= pageRows ||
              counting.count - offsets.last >= PageSoftBytes) endPage()
          if (counting.count > maxSpillBytes)
            throw new ResultTooLargeException(
              s"paged result spill exceeds maxSpillBytes=$maxSpillBytes " +
                "— rejected; add a LIMIT or write to a sink")
          // reserve what's been counted so far — this is the binding
          // service-budget check, and it aborts a spill that cannot be
          // admitted NOW, not after maxSpillBytes of doomed disk I/O
          reserve(counting.count)
        }
        // an empty result still gets one zero-row page: clients can
        // fetch page 0 for columns/rowCount/timings instead of a dead end
        if (offsets.length == 1 && oos == null)
          oos = new java.io.ObjectOutputStream(noClose)
        endPage()
        counting.close()
        // settle the reservation to the exact final byte count so
        // freeSpill's -bytes later balances the ledger to zero
        reserve(counting.count)
        Spill(file, offsets.toArray, perPage.toArray, df.columns, rowCount,
          counting.count, 0L, 0L)
      } catch {
        case t: Throwable =>
          try counting.close() catch { case _: Throwable => () }
          retainedSpill.addAndGet(-reserved)
          file.delete()
          throw t
      }
    }

    private def causeChain(t: Throwable): Seq[Throwable] = {
      val b = Seq.newBuilder[Throwable]
      var cur = t; var depth = 0
      while (cur != null && depth < 20) { b += cur; cur = cur.getCause; depth += 1 }
      b.result()
    }

    override def close(): Unit = {
      running = false
      scheduler.interrupt()
      exec.shutdownNow()
      // fail every still-pending entry NOW: their done latches would
      // otherwise never count down — clients blocked in await() would
      // ride out their full timeout and the entries (plus SQL strings)
      // would be retained for the JVM's lifetime. Under closeLock so a
      // concurrent submit cannot slip an entry in AFTER this sweep.
      closeLock.synchronized {
        queries.forEach { (_, e) =>
          e.synchronized {
            if (e.status == Pending) {
              e.status = Cancelled
              e.finishedMs = System.currentTimeMillis()
              e.done.countDown()
            }
            // the TTL sweep dies with the scheduler: free paged spills
            // now (a worker publishing after this sweep deletes its own
            // file via the !running check; the spillRoot shutdown hook
            // backstops)
            if (e.spill != null) { freeSpill(e.spill); e.spill = null }
          }
        }
        pendingRelaxed.clear()
        pendingBestEffort.clear()
        pendingCount.set(0)
      }
      ()
    }
  }
}
