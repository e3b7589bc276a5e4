package graft.operators

import graft.{GQuery, QueryHttp, QueryService, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** End-to-end oracle coverage for the SLA query service's PAGED result
  * path THROUGH the HTTP facade — the reference buffers results in its
  * REST query manager (pixels-server/.../controller/QueryManager.java:
  * 120-144); this engine spills paged results to disk and serves them
  * page by page, and h01 proves the full loop against DuckDB:
  *
  *   submit(paged=true) -> status poll -> fetch EVERY page -> re-read a
  *   page (re-readability) -> reassemble -> release (ledger drains) ->
  *   hash-compare the reassembled rows against the oracle.
  *
  * The submitted SQL carries a TOTAL order and the reassembled result
  * carries a client-side arrival index (`seq`): a page served out of
  * order, dropped, truncated or duplicated shifts `seq` against the
  * oracle's ROW_NUMBER and fails the hash — ordering bugs cannot hide
  * behind the driver's row-sorted compare. In-query assertions guard the
  * transport contract itself (page count, re-read equality, 404 after
  * release, spill ledger back to zero).
  */
object ServiceOps {

  /** one page fetch, parsed with Spark's bundled Jackson */
  private def httpGet(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body =
      if (is == null) ""
      else try new String(is.readAllBytes(), "UTF-8") finally is.close()
    (code, body)
  }

  private def httpPost(url: String, body: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    val os = conn.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out =
      if (is == null) ""
      else try new String(is.readAllBytes(), "UTF-8") finally is.close()
    (code, out)
  }

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** drives one paged query through the HTTP facade and reassembles the
    * pages into a DataFrame stamped with the client-side arrival index */
  def httpPaged(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("h01_lineitem")
    val sql =
      """SELECT l_orderkey, l_linenumber, l_partkey
        |FROM h01_lineitem WHERE l_orderkey % 31 = 0
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // l_partkey completes the total order, or ROW_NUMBER tie-breaks diverge.
    // ADAPTIVE page size: aim for ~8 pages at any sf — a fixed small page
    // spans pages at sf0.001 but turns sf1 into thousands of HTTP round
    // trips (measured 136 s), while a fixed large one collapses the tiny
    // corpus to one page and fails the multi-page gate. The sizing count
    // is metadata-only (parquet row count, no scan).
    val slice = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 31 === 0).count()
    // floor of 1 (not 64): a 64-row floor collapsed any <=64-row slice to
    // ONE page and tripped the multi-page require below — the gate must
    // hold at ANY corpus size, not just the shipped sf dirs. slice/8
    // keeps ~8 pages everywhere; only a 0-or-1-row slice genuinely
    // cannot be multi-page, and that case skips the gate with a note.
    val pageRows = math.max(1L, math.min(4096L, slice / 8)).toInt
    val mgr = new QueryService.Manager(s, slots = 2, pageRows = pageRows)
    val http = new QueryHttp(mgr)
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      val (sc, sBody) = httpPost(s"$base/query?hint=immediate&paged=true", sql)
      require(sc == 200, s"submit failed: $sc $sBody")
      val token = om.readTree(sBody).get("token").asText()
      val tEnc = java.net.URLEncoder.encode(token, "UTF-8")
      // status poll through the facade (not mgr.await): the transport is
      // what h01 exists to exercise
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      var st = ""
      while (st != "finished") {
        val (c, b) = httpGet(s"$base/query/status?token=$tEnc")
        require(c == 200, s"status failed: $c $b")
        st = om.readTree(b).get("status").asText()
        require(st != "failed" && st != "cancelled",
          s"query did not finish: $b")
        require(System.nanoTime() < deadline, "h01 status poll timed out")
        if (st != "finished") Thread.sleep(20)
      }
      def page(i: Int): com.fasterxml.jackson.databind.JsonNode = {
        val (c, b) = httpGet(s"$base/query/result?token=$tEnc&page=$i")
        require(c == 200, s"page $i failed: $c $b")
        om.readTree(b)
      }
      val p0 = page(0)
      val pages = p0.get("pages").asInt()
      val rowCount = p0.get("rowCount").asLong()
      if (slice >= 2)
        require(pages > 1, s"h01 must exercise a MULTI-page spill, got $pages")
      else System.err.println(
        s"h01: slice has $slice row(s) — multi-page gate skipped")
      val cols = (0 until p0.get("columns").size())
        .map(p0.get("columns").get(_).asText())
      require(cols == Seq("l_orderkey", "l_linenumber", "l_partkey"),
        s"unexpected columns: $cols")
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      var seq = 0L
      (0 until pages).foreach { i =>
        val pg = if (i == 0) p0 else page(i)
        require(pg.get("page").asInt() == i && pg.get("pages").asInt() == pages,
          s"page header drifted at $i: $pg")
        val rows = pg.get("rows")
        (0 until rows.size()).foreach { r =>
          val row = rows.get(r)
          buf += Row(seq, row.get(0).asLong(), row.get(1).asInt(),
            row.get(2).asLong())
          seq += 1
        }
      }
      require(seq == rowCount,
        s"pages dropped rows: reassembled $seq of $rowCount")
      // re-readability: a client retrying a lost page must get the same
      // bytes back (page reads are not pops)
      require(page(0).get("rows").toString == p0.get("rows").toString,
        "page 0 re-read returned different rows")
      // ledger: retained while pages serve, drained by release, 404 after
      val retained = om.readTree(httpGet(s"$base/query/stats")._2)
        .get("retainedSpillBytes").asLong()
      require(retained > 0, "spill ledger empty while pages are live")
      val (rc, rBody) = httpPost(s"$base/query/release?token=$tEnc", "")
      require(rc == 200 && om.readTree(rBody).get("released").asBoolean(),
        s"release failed: $rc $rBody")
      require(om.readTree(httpGet(s"$base/query/stats")._2)
        .get("retainedSpillBytes").asLong() == 0,
        "release did not drain the spill ledger")
      require(httpGet(s"$base/query/result?token=$tEnc&page=0")._1 == 404,
        "released result must stop serving pages")
      val schema = StructType(Seq(
        StructField("seq", LongType),
        StructField("l_orderkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("l_partkey", LongType)))
      s.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.BufferHasAsJava(buf).asJava),
        schema)
    } finally {
      http.close()
      mgr.close()
    }
  }

  def queries: Seq[GQuery] = Seq(
    GQuery("h01_http_paged_result", (s, d) => httpPaged(s, d),
      Some("""SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey) - 1 AS seq,
             |       l_orderkey, l_linenumber, l_partkey
             |FROM lineitem WHERE l_orderkey % 31 = 0""".stripMargin)))
}
