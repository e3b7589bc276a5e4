package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Minimal HTTP facade over [[QueryService.Manager]] — the transport the
  * reference serves from pixels-server's REST controller
  * (pixels-server/.../controller/QueryController surface over
  * QueryManager.java:53-220). Deliberately thin: the SLA semantics all
  * live in the Manager; this layer only maps routes to its four calls
  * and renders JSON. Built on the JDK's com.sun.net.httpserver (a Java
  * SE public API) so the library adds no dependency for a facade most
  * Spark deployments will front with their own gateway anyway.
  *
  * Routes (token is the Manager's trace token):
  *   POST /query?hint=immediate|relaxed|besteffort[&paged=true]
  *     body = SQL text
  *     -> 200 {"token":"..."} | 429 queue full | 503 closed
  *     paged=true routes the result through the Manager's spill file
  *     (driver memory stays bounded however big the result): fetch with
  *     page=N below, free early with /query/release.
  *   GET  /query/status?token=T
  *     -> 200 {"token":T,"status":"pending|running|finished|cancelled"}
  *        or {"status":"failed","reason":"..."} | 404 unknown/expired
  *   GET  /query/result?token=T    (POP semantics: second call 404s)
  *     -> 200 {"token":T,"columns":[...],"rows":[[...],...],
  *             "pendingMs":n,"execMs":n} | 404 not finished / popped
  *        | 413 result exceeded the Manager's maxResultRows budget
  *        | 400 the result is PAGED (body carries "pages" — use page=N)
  *   GET  /query/result?token=T&page=N   (paged results; re-readable;
  *     an empty result has ONE zero-row page so metadata stays fetchable)
  *     -> 200 {"token":T,"page":N,"pages":P,"rowCount":n,
  *             "columns":[...],"rows":[[...],...],"pendingMs":n,"execMs":n}
  *        | 404 unknown/unfinished/released token or page out of range
  *        | 413 the spill exceeded maxSpillBytes/maxTotalSpillBytes
  *   GET  /query/stats
  *     -> 200 {"retainedSpillBytes":n}   (service spill-retention ledger)
  *   POST /query/release?token=T   (free a paged result's spill early)
  *     -> 200 {"released":true|false}
  *   POST /query/cancel?token=T
  *     -> 200 {"cancelled":true|false}
  *
  * The SQL body arrives raw (not JSON-wrapped): a submit endpoint whose
  * payload IS a SQL string needs no envelope, and it keeps the facade
  * free of a JSON *parser* (the responses are written by a ~20-line
  * escaper below). Row cells render as JSON numbers/booleans/null for
  * those types and as escaped strings for everything else — a transport
  * for humans and tests, not a wire protocol for BI tools.
  */
final class QueryHttp(mgr: QueryService.Manager, port: Int = 0,
    bindAddr: java.net.InetAddress = java.net.InetAddress.getLoopbackAddress)
  extends AutoCloseable {

  import QueryHttp._

  // loopback by default (matching ExchangeServer.start): this endpoint
  // executes arbitrary SQL on the session — a wildcard bind would expose
  // that, unauthenticated, to the whole network. Deployments that front
  // it with their own auth pass an explicit bindAddr.
  private val server =
    HttpServer.create(new InetSocketAddress(bindAddr, port), 0)
  server.createContext("/query", new HttpHandler {
    override def handle(x: HttpExchange): Unit = route(x)
  })
  // a handful of serving threads: handlers only call Manager methods
  // (submit/status/pop/cancel are all non-blocking; execution runs on
  // the Manager's own pool), so a tiny pool serves many clients
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)
  server.start()

  /** the bound port (useful with port=0 ephemeral binds) */
  def boundPort: Int = server.getAddress.getPort

  private def route(x: HttpExchange): Unit = {
    try {
      val path = x.getRequestURI.getPath
      val method = x.getRequestMethod.toUpperCase
      (method, path) match {
        case ("POST", "/query") => submit(x)
        case ("GET", "/query/status") => status(x)
        case ("GET", "/query/result") => result(x)
        case ("GET", "/query/stats") =>
          // service observability (the STAT analog for the transport):
          // the one number an operator needs to reason about 413s
          send(x, 200,
            s"""{"retainedSpillBytes":${mgr.retainedSpillBytes}}""")
        case ("POST", "/query/release") => release(x)
        case ("POST", "/query/cancel") => cancel(x)
        case _ => send(x, 404, """{"error":"not found"}""")
      }
    } catch {
      case scala.util.control.NonFatal(t) =>
        // a handler bug must answer 500, not leak the exchange (the
        // client would hang until ITS timeout)
        send(x, 500, s"""{"error":${jstr(t.toString)}}""")
    } finally x.close()
  }

  private def submit(x: HttpExchange): Unit = {
    val sql = new String(x.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8).trim
    if (sql.isEmpty) { send(x, 400, """{"error":"empty sql body"}"""); return }
    val hint = param(x, "hint").getOrElse("relaxed") match {
      case "immediate" => QueryService.Immediate
      case "besteffort" => QueryService.BestEffort
      case "relaxed" => QueryService.Relaxed
      case other =>
        send(x, 400, s"""{"error":${jstr(s"unknown hint: $other")}}""")
        return
    }
    val paged = param(x, "paged").contains("true")
    try send(x, 200, s"""{"token":${jstr(mgr.submit(sql, hint, paged))}}""")
    catch {
      case e: IllegalStateException if e.getMessage != null &&
          e.getMessage.contains("queue full") =>
        send(x, 429, s"""{"error":${jstr(e.getMessage)}}""")
      case e: IllegalArgumentException => // service closed (require fails)
        send(x, 503, s"""{"error":${jstr(e.getMessage)}}""")
    }
  }

  private def status(x: HttpExchange): Unit =
    param(x, "token").flatMap(t => mgr.status(t).map(t -> _)) match {
      case None => send(x, 404, """{"error":"unknown token"}""")
      case Some((t, s)) =>
        val body = s match {
          case QueryService.Failed(reason) =>
            s"""{"token":${jstr(t)},"status":"failed","reason":${jstr(reason)}}"""
          case other =>
            s"""{"token":${jstr(t)},"status":"${other.toString.toLowerCase}"}"""
        }
        send(x, 200, body)
    }

  private def result(x: HttpExchange): Unit =
    (param(x, "token"), param(x, "page")) match {
      case (None, _) => send(x, 404, """{"error":"no poppable result"}""")
      case (Some(t), Some(pStr)) =>
        pStr.toIntOption match {
          case None =>
            send(x, 400, """{"error":"page must be an integer"}""")
          case Some(p) => mgr.resultPage(t, p) match {
            case Some(pg) =>
              val cols = pg.columns.map(jstr).mkString("[", ",", "]")
              val rows = pg.rows.map(row =>
                (0 until row.length).map(i => jval(row.get(i)))
                  .mkString("[", ",", "]")).mkString("[", ",", "]")
              send(x, 200,
                s"""{"token":${jstr(pg.token)},"page":${pg.page},""" +
                s""""pages":${pg.pages},"rowCount":${pg.rowCount},""" +
                s""""columns":$cols,"rows":$rows,""" +
                s""""pendingMs":${pg.pendingMs},"execMs":${pg.execMs}}""")
            case None => mgr.pageCount(t) match {
              case Some(n) => send(x, 404,
                s"""{"error":"page out of range","pages":$n}""")
              // a paged client naturally retries page=0 after a failure:
              // a spill-overflow rejection must surface as 413 here too,
              // not a 404 that reads as "expired/popped"
              case None =>
                rejectedOr404(x, t, """{"error":"no paged result for token"}""")
            }
          }
        }
      case (Some(t), None) => mgr.popResult(t) match {
        case Some(r) =>
          val cols = r.columns.map(jstr).mkString("[", ",", "]")
          val rows = r.rows.map(row =>
            (0 until row.length).map(i => jval(row.get(i)))
              .mkString("[", ",", "]")).mkString("[", ",", "]")
          send(x, 200, s"""{"token":${jstr(r.token)},"columns":$cols,""" +
            s""""rows":$rows,"pendingMs":${r.pendingMs},"execMs":${r.execMs}}""")
        case None => mgr.pageCount(t) match {
          // paged result addressed without page=N: tell the client how
          // to fetch it instead of a misleading "expired/popped" 404
          case Some(n) => send(x, 400,
            s"""{"error":"result is paged: pass page=N","pages":$n}""")
          case None =>
            rejectedOr404(x, t, """{"error":"no poppable result"}""")
        }
      }
    }

  /** the one failure a RESULT request should explain with its own HTTP
    * class: the query ran fine but its result blew a budget (heap
    * maxResultRows or spill maxSpillBytes/maxTotalSpillBytes) — 413
    * tells the client to page or write to a sink, where a generic 404
    * would read as "expired/popped". ONE implementation so the pop and
    * page routes can never drift (a drift already bit once: 413 was
    * unreachable from page fetches). */
  private def rejectedOr404(x: HttpExchange, token: String,
      notFound: String): Unit =
    mgr.status(token) match {
      case Some(QueryService.Failed(reason))
          if reason.startsWith("ResultTooLargeException") =>
        send(x, 413, s"""{"error":${jstr(reason)}}""")
      case _ => send(x, 404, notFound)
    }

  private def release(x: HttpExchange): Unit =
    param(x, "token") match {
      case None => send(x, 400, """{"error":"token required"}""")
      case Some(t) => send(x, 200, s"""{"released":${mgr.releaseResult(t)}}""")
    }

  private def cancel(x: HttpExchange): Unit =
    param(x, "token") match {
      case None => send(x, 400, """{"error":"token required"}""")
      case Some(t) => send(x, 200, s"""{"cancelled":${mgr.cancel(t)}}""")
    }

  private def param(x: HttpExchange, name: String): Option[String] =
    Option(x.getRequestURI.getRawQuery).flatMap(_.split('&').collectFirst {
      case kv if kv.takeWhile(_ != '=') == name =>
        java.net.URLDecoder.decode(kv.dropWhile(_ != '=').drop(1), "UTF-8")
    })

  private def send(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    x.sendResponseHeaders(code, bytes.length.toLong)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Stops accepting connections; in-flight exchanges get one second.
    * Does NOT close the Manager — lifecycle of the engine outlives the
    * transport (a deployment may rebind). */
  override def close(): Unit = {
    server.stop(1)
    pool.shutdownNow()
    ()
  }
}

object QueryHttp {
  /** JSON string literal with full control-character escaping */
  private[graft] def jstr(s: String): String = {
    val b = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** one result cell: native JSON for null/boolean/finite numbers,
    * escaped string for everything else (dates, decimals render via
    * toString — readable and round-trippable enough for a facade) */
  private[graft] def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float if !n.isNaN && !n.isInfinite => n.toString
    case n: Double if !n.isNaN && !n.isInfinite => n.toString
    case other => jstr(other.toString)
  }
}
