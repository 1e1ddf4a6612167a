package graft.sources.v2

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback Companies House stub: a REAL HTTP server inside the test
  * JVM (zero egress — binds 127.0.0.1) speaking the advanced-search
  * parameter grammar [[ChHttpTableProvider]] consumes
  * (api_clients.py:231-280): GET `/advanced-search/companies` with
  * `incorporated_from/to`, `sic_codes`, `company_status`, `location`,
  * `size`, `start_index`; responds `{"items": [...]}` pages in
  * company_number order; a short page ends the cursor. Every request
  * URI is logged WITH ITS ARRIVAL TIME so tests can assert both the
  * pushed params and the client's pacing from the server's own view;
  * a deterministic 429 injector (every Nth request, optional
  * Retry-After) exercises the retry loop over the socket.
  *
  * `companies`: field → value (strings; sic_codes comma-joined). */
class ChHttpStub(companies: Seq[Map[String, String]],
    reject429Every: Int = 0, retryAfterSec: Option[Int] = None,
    // (company_number, resource) -> items, e.g. ("001","officers") -> […]
    sub: Map[(String, String), Seq[Map[String, String]]] = Map.empty) {

  /** (uri, server-clock ms) per request, in arrival order. */
  val requestLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  val rejected429 = new java.util.concurrent.atomic.AtomicInteger(0)
  val sawAuth = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val reqCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private val ordered = companies.sortBy(_("company_number"))

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  server.createContext("/advanced-search/companies", (ex: HttpExchange) => {
    val uri = ex.getRequestURI.toString
    requestLog.add((uri, System.currentTimeMillis()))
    if (Option(ex.getRequestHeaders.getFirst("Authorization"))
        .exists(_.startsWith("Basic "))) sawAuth.set(true)
    if (reject429Every > 0 &&
        reqCount.incrementAndGet() % reject429Every == 0) {
      rejected429.incrementAndGet()
      retryAfterSec.foreach(s =>
        ex.getResponseHeaders.add("Retry-After", s.toString))
      respond(ex, 429, """{"error":"rate_limited"}""")
    } else {
      val q = params(uri)
      val kept = ordered.filter { c =>
        q.get("incorporated_from").forall(c("date_of_creation") >= _) &&
        q.get("incorporated_to").forall(c("date_of_creation") <= _) &&
        q.get("company_status").forall(c("company_status") == _) &&
        q.get("location").forall(c("locality") == _) &&
        q.get("sic_codes").forall(code => // CH list membership
          c("sic_codes").split(",").contains(code))
      }
      val size = q.getOrElse("size", "100").toInt
      val start = q.getOrElse("start_index", "0").toInt
      val page = kept.slice(start, start + size)
      val items = page.map(c => c.map { case (k, v) =>
        s""""$k":"$v"""" }.mkString("{", ",", "}")).mkString("[", ",", "]")
      respond(ex, 200, s"""{"items":$items,"hits":${kept.size}}""")
    }
  })

  // the reference's per-company sub-resources (api_clients.py:179-203):
  // GET /company/{number}/{officers|charges|filing-history}. 404 when
  // the stub has no items for that (company, resource) — the real CH
  // answers 404 for e.g. a company with no charges. Shares the request
  // log, auth flag, and 429 injector with the search context so tests
  // can assert ONE paced stream across endpoints.
  server.createContext("/company/", (ex: HttpExchange) => {
    val uri = ex.getRequestURI.toString
    requestLog.add((uri, System.currentTimeMillis()))
    if (Option(ex.getRequestHeaders.getFirst("Authorization"))
        .exists(_.startsWith("Basic "))) sawAuth.set(true)
    if (reject429Every > 0 &&
        reqCount.incrementAndGet() % reject429Every == 0) {
      rejected429.incrementAndGet()
      retryAfterSec.foreach(s =>
        ex.getResponseHeaders.add("Retry-After", s.toString))
      respond(ex, 429, """{"error":"rate_limited"}""")
    } else {
      val path = uri.split('?').head.split('/').filter(_.nonEmpty)
      // path = ["company", number, resource]
      val key = if (path.length >= 3)
        Some((java.net.URLDecoder.decode(path(1), "UTF-8"), path(2)))
      else None
      key.flatMap(sub.get) match {
        case None => respond(ex, 404, """{"error":"not-found"}""")
        case Some(items) =>
          // real CH sub-resources paginate: honor start_index and
          // state total_results so clients can exhaust the cursor
          val q = params(uri)
          val perPage = q.getOrElse("items_per_page", "100").toInt
          val start = q.getOrElse("start_index", "0").toInt
          val page = items.slice(start, start + perPage)
          val body = page.map(c => c.map { case (k, v) =>
            s""""$k":"$v"""" }.mkString("{", ",", "}"))
            .mkString("[", ",", "]")
          respond(ex, 200,
            s"""{"items":$body,"total_results":${items.size}}""")
      }
    }
  })

  private def params(uri: String): Map[String, String] =
    uri.split('?') match {
      case Array(_, qs) => qs.split('&').map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      case _ => Map.empty
    }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val o = ex.getResponseBody
    o.write(bytes); o.close()
    ex.close()
  }

  def start(): String = {
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }
  def stop(): Unit = server.stop(0)
}
