package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The HTTP facade contract (reference QueryController surface): route
  * mapping, hint parsing, pop-once result rendering, cancellation, and
  * the error statuses (400 bad input / 404 unknown / 429 queue full).
  * The SLA semantics themselves are QueryServiceSpec's job — here each
  * route must faithfully relay them over a real loopback socket. */
class QueryHttpSpec extends GraftSpec {

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5)).build()

  private def post(url: String, body: String = ""): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .timeout(Duration.ofSeconds(30)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET()
      .timeout(Duration.ofSeconds(30)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def field(json: String, name: String): Option[String] =
    (s""""$name":"([^"]*)"""".r.findFirstMatchIn(json)).map(_.group(1))

  test("submit/status/result round-trip over a real socket") {
    val m = new QueryService.Manager(spark, slots = 2)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val sub = post(s"$base/query?hint=immediate",
        "SELECT 21 * 2 AS v, 'a\"b' AS s, CAST(NULL AS INT) AS n")
      assert(sub.statusCode() == 200, sub.body())
      val token = field(sub.body(), "token").get

      // await via the manager (the facade is stateless), then status
      assert(m.await(token).contains(QueryService.Finished))
      val st = get(s"$base/query/status?token=$token")
      assert(st.statusCode() == 200)
      assert(field(st.body(), "status").contains("finished"))

      // pop renders columns + typed cells (number, escaped string, null)
      val res = get(s"$base/query/result?token=$token")
      assert(res.statusCode() == 200, res.body())
      assert(res.body().contains(""""columns":["v","s","n"]"""))
      assert(res.body().contains("""[42,"a\"b",null]"""), res.body())
      // pop-once: a second fetch 404s
      assert(get(s"$base/query/result?token=$token").statusCode() == 404)
    } finally { http.close(); m.close() }
  }

  test("error statuses: bad hint, empty body, unknown token, failed query") {
    val m = new QueryService.Manager(spark)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      assert(post(s"$base/query?hint=bogus", "SELECT 1").statusCode() == 400)
      assert(post(s"$base/query", "  ").statusCode() == 400)
      assert(get(s"$base/query/status?token=zzz").statusCode() == 404)
      assert(get(s"$base/query/result?token=zzz").statusCode() == 404)
      assert(post(s"$base/query/cancel").statusCode() == 400)
      assert(get(s"$base/nope").statusCode() == 404)

      // a failing query reports failed + reason through the facade
      val bad = field(post(s"$base/query?hint=immediate",
        "SELECT * FROM no_such_table_xyz").body(), "token").get
      m.await(bad)
      val st = get(s"$base/query/status?token=$bad")
      assert(field(st.body(), "status").contains("failed"))
      assert(st.body().contains("reason"))
    } finally { http.close(); m.close() }
  }

  test("over-budget result maps to 413, not a generic 404") {
    val m = new QueryService.Manager(spark, slots = 2, maxResultRows = 10)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val t = field(post(s"$base/query?hint=immediate",
        "SELECT id FROM range(100000000)").body(), "token").get
      m.await(t)
      val st = get(s"$base/query/status?token=$t")
      assert(field(st.body(), "status").contains("failed"), st.body())
      val res = get(s"$base/query/result?token=$t")
      assert(res.statusCode() == 413, s"${res.statusCode()} ${res.body()}")
      assert(res.body().contains("maxResultRows"), res.body())
      // an unknown token still 404s (413 is reserved for the rejection)
      assert(get(s"$base/query/result?token=zzz").statusCode() == 404)
    } finally { http.close(); m.close() }
  }

  test("cancel over http: a queued query never runs") {
    // slots=1 with a hog keeps a relaxed submission Pending long enough
    // to cancel it deterministically
    val m = new QueryService.Manager(spark, slots = 1,
      maxPostponeMs = 120000L)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val hog = field(post(s"$base/query?hint=immediate",
        "SELECT count(*) AS s FROM range(40000000000) WHERE id % 1000000007 = 3")
        .body(), "token").get
      Thread.sleep(300)
      val t = field(post(s"$base/query?hint=relaxed", "SELECT 1").body(),
        "token").get
      val c = post(s"$base/query/cancel?token=$t")
      assert(c.statusCode() == 200 && c.body().contains("true"), c.body())
      assert(field(get(s"$base/query/status?token=$t").body(), "status")
        .contains("cancelled"))
      post(s"$base/query/cancel?token=$hog")
      m.await(hog)
    } finally { http.close(); m.close() }
  }

  test("queue-full admission maps to 429") {
    val m = new QueryService.Manager(spark, slots = 1, queueCap = 1,
      maxPostponeMs = 120000L)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val hog = field(post(s"$base/query?hint=immediate",
        "SELECT count(*) AS s FROM range(40000000000) WHERE id % 1000000007 = 3")
        .body(), "token").get
      Thread.sleep(300)
      assert(post(s"$base/query?hint=relaxed", "SELECT 1").statusCode() == 200)
      val full = post(s"$base/query?hint=relaxed", "SELECT 2")
      assert(full.statusCode() == 429, s"${full.statusCode()} ${full.body()}")
      post(s"$base/query/cancel?token=$hog")
      m.await(hog)
    } finally { http.close(); m.close() }
  }

  test("paged results over http: page fetch, bounds, hint-to-page, release") {
    val m = new QueryService.Manager(spark, slots = 2, pageRows = 7)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val sub = post(s"$base/query?hint=immediate&paged=true",
        "SELECT id FROM range(20) ORDER BY id")
      assert(sub.statusCode() == 200, sub.body())
      val token = field(sub.body(), "token").get
      assert(m.await(token).contains(QueryService.Finished))

      // page 0: rows + paging metadata
      val p0 = get(s"$base/query/result?token=$token&page=0")
      assert(p0.statusCode() == 200, p0.body())
      assert(p0.body().contains(""""page":0"""), p0.body())
      assert(p0.body().contains(""""pages":3"""), p0.body())
      assert(p0.body().contains(""""rowCount":20"""), p0.body())
      assert(p0.body().contains(""""rows":[[0],[1],[2],[3],[4],[5],[6]]"""),
        p0.body())
      // last page is short; pages are RE-readable (retry-safe)
      val p2 = get(s"$base/query/result?token=$token&page=2")
      assert(p2.body().contains(""""rows":[[14],[15],[16],[17],[18],[19]]"""),
        p2.body())
      assert(get(s"$base/query/result?token=$token&page=2").statusCode() == 200)
      // bounds and bad input
      val oob = get(s"$base/query/result?token=$token&page=3")
      assert(oob.statusCode() == 404 && oob.body().contains(""""pages":3"""),
        s"${oob.statusCode()} ${oob.body()}")
      assert(get(s"$base/query/result?token=$token&page=x").statusCode() == 400)
      // a paged result fetched without page=N is told how to page
      val noPage = get(s"$base/query/result?token=$token")
      assert(noPage.statusCode() == 400 &&
        noPage.body().contains(""""pages":3"""), noPage.body())
      // release frees the spill; later pages 404, release is idempotent
      val rel = post(s"$base/query/release?token=$token")
      assert(rel.statusCode() == 200 && rel.body().contains("true"))
      assert(get(s"$base/query/result?token=$token&page=0").statusCode() == 404)
      assert(post(s"$base/query/release?token=$token").body().contains("false"))
      // page=N against a NON-paged result: 404 with the no-paged error
      val plain = field(post(s"$base/query?hint=immediate",
        "SELECT 1 AS v").body(), "token").get
      m.await(plain)
      assert(get(s"$base/query/result?token=$plain&page=0").statusCode() == 404)
      assert(get(s"$base/query/result?token=$plain").statusCode() == 200)
    } finally { http.close(); m.close() }
  }

  test("a spill-overflow rejection surfaces as 413 on the page fetch too") {
    val m = new QueryService.Manager(spark, slots = 2, pageRows = 100,
      maxSpillBytes = 1024)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val token = field(post(s"$base/query?hint=immediate&paged=true",
        "SELECT id, uuid() AS u FROM range(100000)").body(), "token").get
      m.await(token)
      // the natural paged-client fetch (page=0) must explain the
      // rejection, not 404 as if the result expired
      val p0 = get(s"$base/query/result?token=$token&page=0")
      assert(p0.statusCode() == 413, s"${p0.statusCode()} ${p0.body()}")
      assert(get(s"$base/query/result?token=$token").statusCode() == 413)
      // the stats route explains 413s: nothing retained after a rejection
      val st = get(s"$base/query/stats")
      assert(st.statusCode() == 200 &&
        st.body().contains(""""retainedSpillBytes":0"""), st.body())
    } finally { http.close(); m.close() }
  }

  test("4 concurrent paged clients: hash-exact reassembly, no cross-token bleed, ledger drains, TTL evicts") {
    // VERDICT r13 #6: h01 proves the paged loop single-client; the spill
    // ledger is spec'd under concurrent writers; this gate drives the
    // FULL http surface concurrently — 4 clients x 3 paged queries over
    // 2 slots with out-of-order fetches, mid-stream re-reads, releases,
    // and one deliberately abandoned result per client left to the TTL
    // sweep. Every client's rows carry a client-specific multiplier, so
    // one page served to the wrong token fails the value check, not
    // just a count.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = new QueryService.Manager(spark, slots = 2, pageRows = 5,
      resultTtlMs = 1500L)
    val http = new QueryHttp(m)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val failures = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val abandoned = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      def client(c: Int): Unit = try {
        (0 until 3).foreach { q =>
          val n = 23 + 7 * c + q // 5..8 pages at pageRows=5, per-client
          val mult = 1000 * (c + 1) + q
          val sub = post(s"$base/query?hint=immediate&paged=true",
            s"SELECT id, id * $mult AS v FROM range($n) ORDER BY id")
          assert(sub.statusCode() == 200, sub.body())
          val token = field(sub.body(), "token").get
          var st = ""
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (st != "finished") {
            assert(System.nanoTime() < deadline, s"client $c poll timeout")
            val r = get(s"$base/query/status?token=$token")
            assert(r.statusCode() == 200, r.body())
            st = field(r.body(), "status").get
            assert(st != "failed" && st != "cancelled", r.body())
            if (st != "finished") Thread.sleep(10)
          }
          def page(i: Int) = {
            val r = get(s"$base/query/result?token=$token&page=$i")
            assert(r.statusCode() == 200, s"page $i: ${r.body()}")
            om.readTree(r.body())
          }
          val p0 = page(0)
          val pages = p0.get("pages").asInt()
          assert(p0.get("rowCount").asLong() == n, p0.toString)
          // fetch OUT OF ORDER (descending), re-read page 0 at the end
          val byPage = ((pages - 1) to 0 by -1)
            .map(i => i -> (if (i == 0) page(0) else page(i))).toMap
          assert(page(0).get("rows").toString ==
            byPage(0).get("rows").toString, "page 0 re-read drifted")
          var id = 0L
          (0 until pages).foreach { i =>
            val pg = byPage(i)
            assert(pg.get("page").asInt() == i && pg.get("pages").asInt() == pages)
            val rows = pg.get("rows")
            (0 until rows.size()).foreach { r =>
              val row = rows.get(r)
              assert(row.get(0).asLong() == id &&
                row.get(1).asLong() == id * mult,
                s"client $c token $token row $id bled: $row (mult $mult)")
              id += 1
            }
          }
          assert(id == n, s"client $c reassembled $id of $n rows")
          if (q == 2) abandoned.add(token) // leave the last one to the TTL
          else {
            val rel = post(s"$base/query/release?token=$token")
            assert(rel.statusCode() == 200 && rel.body().contains("true"))
            assert(get(s"$base/query/result?token=$token&page=0")
              .statusCode() == 404, "released result still serves")
          }
        }
      } catch {
        case t: Throwable => failures.add(s"client $c: ${t.getMessage}")
      }
      val threads = (0 until 4).map(c => new Thread(() => client(c)))
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(failures.isEmpty, failures.toString)
      // the 4 abandoned results still retain spill — then the TTL sweep
      // (nudged by fresh submissions) must drain the ledger to ZERO and
      // expire their tokens
      def retained(): Long = {
        val b = get(s"$base/query/stats").body()
        """"retainedSpillBytes":(\d+)""".r.findFirstMatchIn(b)
          .map(_.group(1).toLong).getOrElse(fail(s"no ledger in $b"))
      }
      assert(retained() > 0, "abandoned paged results should retain spill")
      Thread.sleep(1600)
      val drainDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (retained() > 0 && System.nanoTime() < drainDeadline) {
        val t = field(post(s"$base/query?hint=immediate", "SELECT 1").body(),
          "token").get
        m.await(t); get(s"$base/query/result?token=$t")
        Thread.sleep(200)
      }
      assert(retained() == 0, "TTL sweep never drained the spill ledger")
      abandoned.forEach { tok =>
        assert(get(s"$base/query/result?token=$tok&page=0").statusCode() == 404,
          s"expired token $tok still serves pages")
      }
    } finally { http.close(); m.close() }
  }
}
