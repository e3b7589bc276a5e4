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
}
