package graft

import graft.QueryService._

/** The SLA front-end contract (reference QueryManager.java:53-220):
  * hint routing, slot-gated postponement, forced submit at the postpone
  * budget, best-effort idleness, admission control, cancellation, and
  * pop-once result collection. */
class QueryServiceSpec extends GraftSpec {

  private def slowSql(rows: Long): String =
    // CPU-bound, overflow-free (sum(id) over large ranges trips ANSI
    // ARITHMETIC_OVERFLOW): a modulo filter-count over the range
    s"SELECT count(*) AS s FROM range($rows) WHERE id % 1000000007 = 3"

  test("immediate: executes now, status lifecycle, result pops exactly once") {
    val m = new Manager(spark, slots = 2)
    try {
      val t = m.submit("SELECT 21 * 2 AS v", Immediate)
      assert(m.await(t).contains(Finished))
      val r = m.popResult(t)
      assert(r.isDefined)
      assert(r.get.columns.sameElements(Array("v")))
      assert(r.get.rows.map(_.getInt(0)).toSeq == Seq(42))
      assert(m.popResult(t).isEmpty, "pop must free the retained result")
      // a broken query fails loudly with the reason, not silently
      val bad = m.submit("SELECT * FROM no_such_table_xyz", Immediate)
      assert(m.await(bad).exists(_.isInstanceOf[Failed]))
    } finally m.close()
  }

  test("relaxed: postponed while slots are saturated, submitted when capacity frees") {
    val m = new Manager(spark, slots = 1, maxPostponeMs = 120000L)
    try {
      val hog = m.submit(slowSql(40000000000L), Immediate) // ~seconds
      Thread.sleep(300) // let the hog reach Running
      assert(m.status(hog).contains(Running))
      val t = m.submit("SELECT 1 AS one", Relaxed)
      Thread.sleep(600)
      assert(m.status(t).contains(Pending),
        "relaxed must queue while the slot cap is reached")
      assert(m.await(hog).contains(Finished))
      assert(m.await(t).contains(Finished),
        "relaxed must run once capacity frees")
      assert(m.popResult(t).get.rows.head.getInt(0) == 1)
    } finally m.close()
  }

  test("relaxed: the postpone budget forces submission even while saturated") {
    val m = new Manager(spark, slots = 1, maxPostponeMs = 300L)
    try {
      val hog = m.submit(slowSql(40000000000L), Immediate)
      Thread.sleep(200)
      val t = m.submit("SELECT 2 AS two", Relaxed)
      // the budget (300 ms) expires long before the hog finishes: the
      // query must be force-submitted alongside it (QueryManager's
      // 2nd-queue max-postpone contract)
      assert(m.await(t, 20000).contains(Finished),
        s"overdue relaxed query must not starve (hog=${m.status(hog)})")
      assert(m.status(hog).exists(s => s == Running || s == Finished))
      m.await(hog)
    } finally m.close()
  }

  test("best-effort: runs only when nothing else is running") {
    val m = new Manager(spark, slots = 4)
    try {
      val hog = m.submit(slowSql(40000000000L), Immediate)
      Thread.sleep(300)
      val t = m.submit("SELECT 3 AS three", BestEffort)
      Thread.sleep(600)
      assert(m.status(t).contains(Pending),
        "best-effort must wait for an idle service even with free slots")
      assert(m.await(hog).contains(Finished))
      assert(m.await(t).contains(Finished))
    } finally m.close()
  }

  test("admission control: pending queues reject beyond their cap, loudly") {
    val m = new Manager(spark, slots = 1, queueCap = 2, maxPostponeMs = 120000L)
    try {
      val hog = m.submit(slowSql(40000000000L), Immediate)
      Thread.sleep(300)
      m.submit("SELECT 1", Relaxed)
      m.submit("SELECT 2", Relaxed)
      val e = intercept[IllegalStateException] {
        m.submit("SELECT 3", Relaxed)
      }
      assert(e.getMessage.contains("rejected"))
      m.await(hog)
    } finally m.close()
  }

  test("cancel: a pending query never starts; a running query's jobs abort") {
    val m = new Manager(spark, slots = 1, maxPostponeMs = 120000L)
    try {
      val hog = m.submit(slowSql(200000000000L), Immediate) // ~tens of s
      Thread.sleep(400)
      assert(m.status(hog).contains(Running))
      val queued = m.submit("SELECT 9", Relaxed)
      assert(m.cancel(queued))
      assert(m.status(queued).contains(Cancelled))
      // cancel the running hog: its job group dies well before it could
      // finish naturally
      val t0 = System.currentTimeMillis()
      assert(m.cancel(hog))
      val s = m.await(hog, 30000)
      assert(s.contains(Cancelled) || s.exists(_.isInstanceOf[Failed]),
        s"cancelled hog ended as $s")
      assert(System.currentTimeMillis() - t0 < 20000,
        "cancellation must abort the running jobs, not wait them out")
      // the service stays healthy after a cancellation
      val ok = m.submit("SELECT 7 AS seven", Immediate)
      assert(m.await(ok).contains(Finished))
      assert(m.popResult(ok).get.rows.head.getInt(0) == 7)
    } finally m.close()
  }

  test("cancel of a pending query releases its admission-queue capacity immediately") {
    val m = new Manager(spark, slots = 1, queueCap = 2, maxPostponeMs = 120000L)
    try {
      val hog = m.submit(slowSql(40000000000L), Immediate)
      Thread.sleep(300)
      val q1 = m.submit("SELECT 1", Relaxed)
      val q2 = m.submit("SELECT 2", Relaxed)
      intercept[IllegalStateException] { m.submit("SELECT 3", Relaxed) }
      // cancelling the queued entries must free their capacity NOW, not
      // when the scheduler would have reached them behind the hog
      assert(m.cancel(q1) && m.cancel(q2))
      val q3 = m.submit("SELECT 3 AS v", Relaxed)
      val q4 = m.submit("SELECT 4 AS v", Relaxed)
      assert(m.await(hog).contains(Finished))
      assert(m.await(q3).contains(Finished) && m.await(q4).contains(Finished))
      assert(m.status(q1).contains(Cancelled) && m.status(q2).contains(Cancelled))
    } finally m.close()
  }

  test("maxResultRows: an over-budget result is rejected, at-budget passes") {
    val m = new Manager(spark, slots = 2, maxResultRows = 10)
    try {
      // exactly at the budget: fine
      val ok = m.submit("SELECT id FROM range(10)", Immediate)
      assert(m.await(ok).contains(Finished))
      assert(m.popResult(ok).get.rows.length == 10)
      // one over: REJECTED loudly (never buffered) — the driver only ever
      // collects max+1 rows, so a SELECT * over a huge table cannot OOM
      // the service
      val big = m.submit("SELECT id FROM range(100000000)", Immediate)
      m.await(big) match {
        case Some(Failed(reason)) =>
          assert(reason.startsWith("ResultTooLargeException"), reason)
          assert(reason.contains("maxResultRows=10"), reason)
        case other => fail(s"expected Failed(ResultTooLarge...), got $other")
      }
      assert(m.popResult(big).isEmpty, "a rejected result must not be poppable")
    } finally m.close()
  }

  test("result TTL runs from completion and expiry evicts the whole entry") {
    val m = new Manager(spark, slots = 2, resultTtlMs = 400L)
    try {
      // a query that takes longer than the TTL to produce its result must
      // still be poppable right after it finishes (TTL from completion,
      // not submission)
      val slow = m.submit(slowSql(3000000000L), Immediate) // ~hundreds of ms
      assert(m.await(slow, 60000).contains(Finished))
      assert(m.popResult(slow).isDefined,
        "a result must be poppable immediately after finishing, however " +
          "long the query queued or ran")
      // an abandoned result expires AND its entry is evicted (no
      // unbounded token/sql accumulation for the manager's lifetime)
      val gone = m.submit("SELECT 5 AS v", Immediate)
      assert(m.await(gone).contains(Finished))
      Thread.sleep(900)
      assert(m.popResult(gone).isEmpty, "expired result must be dropped")
      assert(m.status(gone).isEmpty, "expired entry must be evicted")
    } finally m.close()
  }

  test("paged results: spill-served pages concatenate exactly, re-readable, released") {
    val m = new Manager(spark, slots = 2, pageRows = 7)
    try {
      val t = m.submit("SELECT id, id * 2 AS v FROM range(40) ORDER BY id",
        Immediate, paged = true)
      assert(m.await(t).contains(Finished))
      assert(m.popResult(t).isEmpty,
        "paged results must not serve through the pop path")
      assert(m.pageCount(t).contains(6)) // ceil(40 / 7)
      val got = (0 until 6).flatMap(i => m.resultPage(t, i).get.rows)
      assert(got.map(_.getLong(0)) == (0L until 40L))
      assert(got.map(_.getLong(1)) == (0L until 40L).map(_ * 2))
      val p0 = m.resultPage(t, 0).get
      assert(p0.pages == 6 && p0.rowCount == 40 &&
        p0.columns.sameElements(Array("id", "v")))
      // re-readable (a client can retry a lost page), bounds are None
      assert(m.resultPage(t, 0).get.rows.length == 7)
      assert(m.resultPage(t, 5).get.rows.length == 5)
      assert(m.resultPage(t, 6).isEmpty && m.resultPage(t, -1).isEmpty)
      // release frees the spill exactly once; pages stop serving; the
      // service-wide retention ledger returns to zero
      assert(m.retainedSpillBytes > 0)
      assert(m.releaseResult(t))
      assert(!m.releaseResult(t))
      assert(m.resultPage(t, 0).isEmpty && m.pageCount(t).isEmpty)
      assert(m.retainedSpillBytes == 0)
    } finally m.close()
  }

  test("paged results: pages close by bytes, and the service spill budget rejects") {
    // pageRows effectively unbounded: the ~4 MB soft byte bound must
    // split the pages, so page READS stay memory-bounded on wide results
    val m = new Manager(spark, slots = 2, pageRows = Int.MaxValue)
    try {
      val t = m.submit("SELECT id, repeat('x', 64) AS pad FROM range(200000)",
        Immediate, paged = true)
      assert(m.await(t, 120000).contains(Finished))
      val pages = m.pageCount(t).get
      assert(pages > 1, s"a multi-MB result must split by bytes, got $pages")
      val total = (0 until pages).map(i => m.resultPage(t, i).get.rows.length)
      assert(total.sum == 200000, s"pages lost rows: $total")
    } finally m.close()
    // service-wide budget: a finish that would exceed it is rejected like
    // an oversize result, and the transient ledger add is reverted
    val m2 = new Manager(spark, slots = 2, pageRows = 100,
      maxTotalSpillBytes = 10)
    try {
      val r = m2.submit("SELECT id FROM range(50)", Immediate, paged = true)
      m2.await(r) match {
        case Some(Failed(reason)) =>
          assert(reason.startsWith("ResultTooLargeException") &&
            reason.contains("service spill budget"), reason)
        case other => fail(s"expected service-budget rejection, got $other")
      }
      assert(m2.retainedSpillBytes == 0,
        "a rejected spill must not stay in the ledger")
    } finally m2.close()
  }

  test("in-flight spills are ledger-reserved: concurrent writers are collectively bounded") {
    val sql = "SELECT id, repeat('x', 64) AS pad FROM range(2000)"
    // calibrate one spill's byte size with an unconstrained manager
    val m0 = new Manager(spark, slots = 1, pageRows = 500)
    val one = try {
      val t = m0.submit(sql, Immediate, paged = true)
      assert(m0.await(t, 60000).contains(Finished))
      m0.retainedSpillBytes
    } finally m0.close()
    assert(one > 0)
    // budget admits ONE such spill but not two: without in-flight
    // reservation, 3 concurrent writers would each pass an
    // admission-at-publication check and write 3x the budget to disk
    val budget = (one * 1.6).toLong
    val m = new Manager(spark, slots = 4, pageRows = 500,
      maxTotalSpillBytes = budget)
    try {
      @volatile var sampling = true
      var maxSeen = 0L
      val sampler = new Thread(() => {
        while (sampling) {
          maxSeen = math.max(maxSeen, m.retainedSpillBytes)
          Thread.sleep(1)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val tokens = (1 to 3).map(_ => m.submit(sql, Immediate, paged = true))
      val outcomes = tokens.map(t => m.await(t, 120000).get)
      sampling = false
      sampler.join(2000)
      maxSeen = math.max(maxSeen, m.retainedSpillBytes)
      assert(maxSeen <= budget,
        s"ledger exceeded the budget under concurrency: $maxSeen > $budget")
      val finished = outcomes.count(_ == Finished)
      assert(finished <= 1, s"two spills can't both fit: $outcomes")
      outcomes.filterNot(_ == Finished).foreach {
        case Failed(reason) =>
          assert(reason.contains("service spill budget"), reason)
        case other => fail(s"expected a budget rejection, got $other")
      }
      // aborted writers must have released their reservations: only the
      // finished result (if any) is still retained
      tokens.foreach(t => m.releaseResult(t))
      assert(m.retainedSpillBytes == 0,
        s"ledger did not drain: ${m.retainedSpillBytes}")
    } finally m.close()
  }

  test("paged results: spill cap rejects, empty pages once, TTL/cancel free the file") {
    def spillFiles: Set[String] =
      Option(QueryService.spillRoot.listFiles()).getOrElse(Array.empty)
        .map(_.getName).toSet
    val m = new Manager(spark, slots = 2, pageRows = 100,
      maxSpillBytes = 2048, resultTtlMs = 500L)
    try {
      // disk overflow rejects with the transport-mappable failure (413)
      val big = m.submit("SELECT id, uuid() AS u FROM range(100000)",
        Immediate, paged = true)
      m.await(big) match {
        case Some(Failed(reason)) =>
          assert(reason.startsWith("ResultTooLargeException"), reason)
        case other => fail(s"expected spill overflow rejection, got $other")
      }
      // empty result: Finished with ONE zero-row page (columns/metadata
      // stay fetchable — a zero-page result would be an HTTP dead end)
      val empty = m.submit("SELECT id FROM range(10) WHERE id < 0",
        Immediate, paged = true)
      assert(m.await(empty).contains(Finished))
      assert(m.pageCount(empty).contains(1))
      val ep = m.resultPage(empty, 0).get
      assert(ep.rows.isEmpty && ep.rowCount == 0 &&
        ep.columns.sameElements(Array("id")))
      assert(m.resultPage(empty, 1).isEmpty)
      // TTL expiry evicts the entry AND deletes the spill file
      val before = spillFiles
      val t = m.submit("SELECT id FROM range(5)", Immediate, paged = true)
      assert(m.await(t).contains(Finished))
      val added = spillFiles -- before
      assert(added.size == 1, s"expected one new spill file, got $added")
      Thread.sleep(1100)
      assert(m.pageCount(t).isEmpty, "expired paged entry must be evicted")
      assert(!spillFiles.contains(added.head),
        "TTL expiry must delete the spill file")
      // cancel mid-spill: the partial file is cleaned up
      val pre = spillFiles
      val c = m.submit(
        "SELECT id, java_method('java.lang.Thread','sleep',100L) AS s " +
          "FROM range(100)", Immediate, paged = true)
      Thread.sleep(400)
      m.cancel(c)
      assert(m.await(c, 60000).contains(Cancelled))
      Thread.sleep(200) // let the worker's cleanup land
      assert((spillFiles -- pre).isEmpty,
        "a cancelled paged query must leave no spill file behind")
    } finally m.close()
  }

  test("paged results under concurrent submit/read/release/cancel drain the ledger to zero") {
    val m = new Manager(spark, slots = 4, pageRows = 50)
    try {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 6).map { tid =>
        new Thread(() => try {
          (0 until 8).foreach { i =>
            val mode = (tid + i) % 4
            val paged = mode <= 1
            val t = m.submit(
              s"SELECT id, id * 2 AS v FROM range(${100 + i * 37})",
              Immediate, paged)
            assert(m.await(t, 60000).contains(Finished))
            mode match {
              case 0 =>
                // read page 0 then release explicitly
                assert(m.resultPage(t, 0).isDefined)
                assert(m.releaseResult(t))
              case 1 =>
                // read every page, then ABANDON (close() must sweep it)
                val n = m.pageCount(t).getOrElse(0)
                assert(n >= 1)
                (0 until n).foreach(p => assert(m.resultPage(t, p).isDefined))
              case _ => assert(m.popResult(t).isDefined)
            }
          }
        } catch { case x: Throwable => errs.add(x); () },
          s"spill-fuzz-$tid")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"fuzz thread failed: ${errs.peek()}")
    } finally m.close()
    // abandoned spills were freed by close's sweep; the CAS admissions,
    // releases, and sweeps must balance exactly
    assert(m.retainedSpillBytes == 0,
      s"ledger did not drain: ${m.retainedSpillBytes} bytes retained")
  }

  test("paged results round-trip every common SQL type exactly") {
    val m = new Manager(spark, slots = 2, pageRows = 3)
    try {
      val sql =
        """SELECT id,
          |  CAST(id AS TINYINT) AS i8, CAST(id AS SMALLINT) AS i16,
          |  CAST(id AS INT) AS i32, CAST(id * 1.5 AS DOUBLE) AS d,
          |  CAST(id * 0.25 AS FLOAT) AS f,
          |  CAST(id AS DECIMAL(20, 4)) / 7 AS dec,
          |  id % 2 = 0 AS b,
          |  CASE WHEN id % 3 = 0 THEN NULL ELSE concat('s', id) END AS s,
          |  CAST(concat('b', id) AS BINARY) AS bin,
          |  DATE '2026-01-01' + make_interval(0, 0, 0, CAST(id AS INT)) AS dt,
          |  TIMESTAMP '2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,
          |  array(id, id + 1) AS arr,
          |  named_struct('a', id, 'b', concat('x', id)) AS st,
          |  map(concat('k', id), id) AS mp
          |FROM range(10) ORDER BY id""".stripMargin
      val t = m.submit(sql, Immediate, paged = true)
      assert(m.await(t).contains(Finished))
      val pages = m.pageCount(t).get
      val viaPages = (0 until pages).flatMap(p => m.resultPage(t, p).get.rows)
      val direct = spark.sql(sql).collect()
      assert(viaPages.length == direct.length)
      viaPages.zip(direct).foreach { case (a, b) =>
        assert(a.length == b.length)
        (0 until a.length).foreach { i =>
          (a.get(i), b.get(i)) match {
            case (x: Array[Byte], y: Array[Byte]) =>
              assert(x.sameElements(y), s"col $i binary mismatch")
            case (x, y) => assert(x == y, s"col $i: $x != $y")
          }
        }
      }
      m.releaseResult(t)
      ()
    } finally m.close()
  }

  test("pop-once holds under concurrent pops: exactly one winner") {
    val m = new Manager(spark, slots = 2)
    try {
      (0 until 5).foreach { i =>
        val t = m.submit(s"SELECT $i AS v", Immediate)
        assert(m.await(t).contains(Finished))
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        val hits = new java.util.concurrent.atomic.AtomicInteger(0)
        val start = new java.util.concurrent.CountDownLatch(1)
        val futs = (0 until 8).map { _ =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              start.await()
              if (m.popResult(t).isDefined) hits.incrementAndGet()
              ()
            }
          })
        }
        start.countDown()
        futs.foreach(_.get())
        pool.shutdown()
        assert(hits.get() == 1, s"pop-once violated: ${hits.get()} winners")
      }
    } finally m.close()
  }

  test("a cancel that lands while no Spark job is active still wins") {
    val m = new Manager(spark, slots = 2)
    try {
      // cancel immediately after submit: the worker may not have started
      // any job yet (analysis), so cancelJobGroup alone would be a no-op —
      // the flag must still carry the cancellation through
      var sawCancel = false
      var attempts = 0
      while (!sawCancel && attempts < 20) {
        attempts += 1
        val t = m.submit(slowSql(2000000000L), Immediate)
        if (m.cancel(t)) {
          val s = m.await(t, 60000)
          if (s.contains(Cancelled)) sawCancel = true
          else assert(s.contains(Cancelled) || s.contains(Finished) ||
            s.exists(_.isInstanceOf[Failed]), s"unexpected terminal $s")
        }
        m.popResult(t)
      }
      assert(sawCancel,
        "cancel-before-first-job never produced a Cancelled terminal in 20 tries")
      // the flagged entry must not expose its rows even if collect finished
      val t2 = m.submit("SELECT 11 AS v", Immediate)
      assert(m.await(t2).contains(Finished))
      assert(m.popResult(t2).isDefined)
    } finally m.close()
  }

  test("close() fails every still-pending entry: awaiters unblock, nothing leaks") {
    import graft.QueryService._
    val m = new Manager(spark, slots = 1)
    // saturate the one slot so the relaxed submissions stay queued
    val blocker = m.submit(
      "SELECT count(*) FROM (SELECT java_method('java.lang.Thread','sleep',2000L))",
      Immediate)
    Thread.sleep(100)
    val queued = (1 to 5).map(_ => m.submit("SELECT 1", Relaxed))
    m.close()
    // a client blocked in await must return promptly with a terminal
    // status, not ride out its full timeout stuck at Pending
    queued.foreach { t =>
      val st = m.await(t, timeoutMs = 2000)
      assert(st.contains(Cancelled),
        s"pending entry after close must be Cancelled, got $st")
    }
    assert(blocker != null)
  }
}
