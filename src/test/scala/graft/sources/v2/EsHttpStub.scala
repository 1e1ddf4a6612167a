package graft.sources.v2

import java.net.InetSocketAddress
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.sources

/** Loopback ES-dialect stub: a REAL HTTP server inside the test JVM
  * (zero egress — it binds 127.0.0.1) speaking the minimal search
  * protocol [[EsHttpTableProvider]] consumes. The stub parses each
  * incoming bool-query DSL back into Catalyst `sources.Filter`s and
  * evaluates them with [[EsFileSource.eval]] — the SAME semantics the
  * file-backed twin's "server side" uses, so the two sources are
  * equivalence-testable. Every request body is logged for pushdown
  * assertions, and a deterministic 429 injector (every Nth search
  * request, `Retry-After: 0`) exercises the client's retry loop over
  * the real socket.
  *
  * `rows`: field → value maps (Long / Double / String / Boolean /
  * null); `types`: field → es type for the mapping endpoint. */
class EsHttpStub(index: String, types: Seq[(String, String)],
    rows: Seq[Map[String, Any]], reject429Every: Int = 0) {

  private val mapper = new ObjectMapper()
  val searchLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val rejected429 = new java.util.concurrent.atomic.AtomicInteger(0)
  private val reqCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  server.createContext(s"/$index/_mapping", (ex: HttpExchange) => {
    val props = types.map { case (f, t) => s""""$f":{"type":"$t"}""" }
      .mkString("{\"properties\":{", ",", "}}")
    respond(ex, 200, props)
  })

  server.createContext(s"/$index/_search", (ex: HttpExchange) => {
    val body = scala.io.Source
      .fromInputStream(ex.getRequestBody, "UTF-8").mkString
    searchLog.add(body)
    if (reject429Every > 0 &&
        reqCount.incrementAndGet() % reject429Every == 0) {
      rejected429.incrementAndGet()
      ex.getResponseHeaders.add("Retry-After", "0")
      respond(ex, 429, """{"error":"too_many_requests"}""")
    } else {
      val req = mapper.readTree(body)
      val q = req.get("query")
      val filter: Option[sources.Filter] =
        if (q.fieldNames.asScala.next() == "match_all") None
        else Some(parseQuery(q))
      val sliceId = req.get("slice").get("id").asInt()
      val sliceMax = req.get("slice").get("max").asInt()
      val from = req.get("from").asInt()
      val size = req.get("size").asInt()
      val cols = (0 until req.get("_source").size())
        .map(i => req.get("_source").get(i).asText())
      val kept = rows.filter(r => filter.forall(f =>
        EsFileSource.eval(f, name => r.getOrElse(name, null))))
      val sliced = kept.zipWithIndex
        .collect { case (r, i) if i % sliceMax == sliceId => r }
      val page = sliced.slice(from, from + size)
      val hits = page.map(r => cols.map(c => jsonVal(c, r.getOrElse(c, null)))
        .mkString("{", ",", "}")).mkString("[", ",", "]")
      respond(ex, 200, s"""{"hits":$hits}""")
    }
  })

  private def jsonVal(c: String, v: Any): String = v match {
    case null => s""""$c":null"""
    case s: String => s""""$c":${mapper.writeValueAsString(s)}"""
    case b: Boolean => s""""$c":$b"""
    case n => s""""$c":$n"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val o = ex.getResponseBody
    o.write(bytes); o.close()
    ex.close()
  }

  /** ES DSL → Catalyst Filter — the inverse of [[EsHttp.toDsl]]. */
  private def parseQuery(q: JsonNode): sources.Filter = {
    def value(n: JsonNode): Any =
      if (n.isIntegralNumber) n.asLong()
      else if (n.isNumber) n.asDouble()
      else if (n.isBoolean) n.asBoolean()
      else n.asText()
    val kind = q.fieldNames.asScala.next()
    val inner = q.get(kind)
    kind match {
      case "term" =>
        val f = inner.fieldNames.asScala.next()
        sources.EqualTo(f, value(inner.get(f)))
      case "terms" =>
        val f = inner.fieldNames.asScala.next()
        val vs = (0 until inner.get(f).size())
          .map(i => value(inner.get(f).get(i)))
        sources.In(f, vs.toArray)
      case "range" =>
        val f = inner.fieldNames.asScala.next()
        val r = inner.get(f)
        val op = r.fieldNames.asScala.next()
        val v = value(r.get(op))
        op match {
          case "gt" => sources.GreaterThan(f, v)
          case "gte" => sources.GreaterThanOrEqual(f, v)
          case "lt" => sources.LessThan(f, v)
          case "lte" => sources.LessThanOrEqual(f, v)
        }
      case "wildcard" =>
        val f = inner.fieldNames.asScala.next()
        sources.StringContains(f,
          inner.get(f).asText().stripPrefix("*").stripSuffix("*"))
      case "exists" =>
        sources.IsNotNull(inner.get("field").asText())
      case "bool" =>
        if (inner.has("filter")) {
          val cs = (0 until inner.get("filter").size())
            .map(i => parseQuery(inner.get("filter").get(i)))
          cs.reduce(sources.And(_, _))
        } else if (inner.has("should")) {
          val cs = (0 until inner.get("should").size())
            .map(i => parseQuery(inner.get("should").get(i)))
          cs.reduce(sources.Or(_, _))
        } else {
          val cs = (0 until inner.get("must_not").size())
            .map(i => parseQuery(inner.get("must_not").get(i)))
          sources.Not(cs.reduce(sources.And(_, _)))
        }
    }
  }

  def start(): String = {
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }
  def stop(): Unit = server.stop(0)
}
