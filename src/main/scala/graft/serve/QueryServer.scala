package graft.serve

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame

import graft.operators.{ObservationStore, Tools}

/** The serving layer (SURVEY.md §2.4 Q1/Q7/Q11/Q12 and §3.1/§3.3): the
  * reference's GraphQL `entries` resolver and CIRCL-compatible REST
  * endpoint over a long-lived SparkSession.
  *
  * Endpoints:
  *  - `POST /query` with `{"rrname"?, "rdata"?, "rrtype"?, "sensor_id"?,
  *    "limit"?}` — the `entries` query surface (conjunctive equality
  *    filters, ≥1 of rrname/rdata required → 400 otherwise, default limit
  *    1000 like `query_graphql.go:179`); NDJSON response.
  *  - `GET /pdns/query/<subject>[?limit=]` — CIRCL passive-DNS: subject
  *    tried as rrname THEN as rdata, results concatenated, 404 when both
  *    empty, NDJSON with unix-seconds ints (`query_rest.go:41-82`).
  *  - `GET /stats` — `{"total_count": N}` (Q11).
  *
  * Result streaming (Q12): rows are written through `toLocalIterator`
  * straight to the chunked response stream — no driver-side buffering of
  * the result set, the Spark analogue of the reference's
  * start/data.../end wire protocol. Concurrent queries: run the session
  * with `spark.scheduler.mode=FAIR` (the analogue of the backend's
  * 64-thread connection pool) and `spark.sql.adaptive.enabled=false` —
  * AQE buys nothing for single-stage pre-pruned point scans but costs
  * per-query driver planning (~1.5× qps when disabled, see BenchPoints).
  */
final class QueryServer(store: ObservationStore, port: Int = 0,
    statsIntervalMillis: Long = 10000L,
    statsSink: String => Unit = s => System.err.println(s)) {

  // HTTP slow-client hardening to reference parity
  // (`query/query_graphql.go:410-412`: 5 s read / 10 s write): the JDK
  // server reads these ONCE at ServerConfig class-init, so they must be
  // set before the first HttpServer is created in this JVM — hence the
  // companion-object init below runs first.
  QueryServer.ensureTimeouts()

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  /** Rolling serving stats (engine.c:480-514 cadence). */
  val stats = new ServeStats("query-http", statsIntervalMillis, statsSink)
  // kept for stop(): HttpServer.stop does NOT shut down a caller-supplied
  // executor, and 8 leaked non-daemon threads would pin the JVM
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = { register(); stats.start(); server.start() }
  def stop(): Unit = { stats.stop(); server.stop(0); pool.shutdown(); () }

  /** ONE limit policy for every HTTP surface: absent → the reference's
    * default 1000; a parseable value ≥ 1 → itself; anything else → None,
    * which every endpoint turns into a 400 (a malformed or zero limit is
    * a client error — not a silent empty 200, not limit(-1)'s 500). */
  private def parseLimit(raw: Option[String]): Option[Int] = raw match {
    case None => Some(1000)
    case Some(s) => s.toIntOption.filter(_ >= 1)
  }

  private def queryParam(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").collectFirst {
        case q if q.startsWith(s"$name=") => q.drop(name.length + 1)
      })

  private def register(): Unit = {
    server.createContext("/query", (ex: HttpExchange) => handle(ex) {
      // com.sun HttpServer matches contexts by PREFIX: without this,
      // /queryanything would be served as /query instead of 404ing
      if (ex.getRequestURI.getPath != "/query") respond(ex, 404, "not found\n")
      else if (ex.getRequestMethod != "POST")
        respond(ex, 405, "method not allowed\n")
      else {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val node = mapper.readTree(if (body.isEmpty) "{}" else body)
        def opt(f: String): Option[String] =
          Option(node.get(f)).filterNot(_.isNull).map(_.asText)
        val (rrname, rdata) = (opt("rrname"), opt("rdata"))
        val prefix = opt("rrname_prefix")
        val limit = parseLimit(
          Option(node.get("limit")).filterNot(_.isNull).map(_.asText))
        if (limit.isEmpty)
          respond(ex, 400, "invalid limit\n")
        else if (prefix.isDefined) {
          if (rrname.isDefined || rdata.isDefined || prefix.get.isEmpty)
            respond(ex, 400,
              "rrname_prefix must be non-empty and alone\n")
          else
            // prefix range scan (extension; the reference's forward
            // scan shape) — fast path with plan fallback, like points;
            // rrtype/sensor_id apply as residual equality filters on
            // BOTH paths (silently ignoring them would serve a
            // superset as if it were the answer)
            store.servePrefix(prefix.get, limit.get, opt("rrtype"),
              opt("sensor_id")) match {
              case Some(obs) =>
                streamNdjsonObs(ex, obs, notFoundOnEmpty = false)
              case None => streamNdjson(ex,
                store.entriesPrefix(prefix.get, limit.get, opt("rrtype"),
                  opt("sensor_id")),
                notFoundOnEmpty = false)
            }
        }
        else if (rrname.isEmpty && rdata.isEmpty)
          respond(ex, 400, "one of rrname or rdata is required\n")
        else store.servePoint(rrname, rdata, opt("rrtype"),
          opt("sensor_id"), limit.get) match {
          // serving fast path (driver-local pruned parquet read)
          case Some(obs) => streamNdjsonObs(ex, obs, notFoundOnEmpty = false)
          case None =>
            val df = store.entries(rrname, rdata, opt("rrtype"),
              opt("sensor_id"), limit.get)
            streamNdjson(ex, df, notFoundOnEmpty = false)
        }
      }
    })

    server.createContext("/pdns/query/", (ex: HttpExchange) => handle(ex) {
      val subject = ex.getRequestURI.getPath.stripPrefix("/pdns/query/")
      if (subject.isEmpty) respond(ex, 404, "not found\n")
      else parseLimit(queryParam(ex, "limit")) match {
        case None => respond(ex, 400, "invalid limit\n")
        case Some(l) =>
          // CIRCL bag semantics on the fast path: subject as rrname THEN
          // as rdata, concatenated (duplicates kept — query_rest.go:58-70)
          (store.servePoint(rrname = Some(subject), limit = l),
            store.servePoint(rdata = Some(subject), limit = l)) match {
            case (Some(asName), Some(asData)) =>
              streamNdjsonObs(ex, asName ++ asData, notFoundOnEmpty = true)
            case _ =>
              streamNdjson(ex, store.restQuery(subject, l),
                notFoundOnEmpty = true)
          }
      }
    })

    // Server-side CIDR range query (Q9 as an HTTP surface — the reference
    // can only expand client-side): `GET /pdns/cidr/<block>[?limit=]`,
    // v4 or v6, NDJSON like /pdns/query. The block's '/' arrives as a
    // path segment, so everything after the prefix is the CIDR.
    server.createContext("/pdns/cidr/", (ex: HttpExchange) => handle(ex) {
      val cidr = ex.getRequestURI.getPath.stripPrefix("/pdns/cidr/")
      val limit = parseLimit(queryParam(ex, "limit"))
      if (cidr.isEmpty) respond(ex, 404, "not found\n")
      else if (limit.isEmpty) respond(ex, 400, "invalid limit\n")
      else {
        // parse errors (bad prefix length, malformed address) are client
        // errors; the filter itself is validated before any Spark work
        val parsed =
          try Right(store.cidrQuery(cidr, limit.get))
          catch {
            // NumberFormatException is an IllegalArgumentException (bad
            // prefix digits); MatchError = missing '/'
            case e: IllegalArgumentException => Left(e.getMessage)
            case e: MatchError => Left(e.getMessage)
          }
        parsed match {
          case Left(msg) => respond(ex, 400, s"bad cidr: $msg\n")
          case Right(df) => streamNdjson(ex, df, notFoundOnEmpty = true)
        }
      }
    })

    server.createContext("/stats", (ex: HttpExchange) => handle(ex) {
      if (ex.getRequestURI.getPath != "/stats") respond(ex, 404, "not found\n")
      else {
        // num_goroutines: the JVM stand-in for runtime.NumGoroutine()
        // (`query_graphql.go:307-311`) is the live thread count; the
        // serving totals are the engine-stats counters (engine.c:480-514)
        // as cumulative values
        val t = stats.totals
        respond(ex, 200,
          s"""{"total_count":${store.totalCount()},"num_goroutines":${Thread.activeCount()},"queries":${t("queries")},"errors":${t("errors")},"bytes_out":${t("bytes_out")}}""" + "\n")
      }
    })

    // Q1 — the reference's GraphQL surface (README.md:250-283): the
    // `entries` query with field selection, enum-or-string rrtype,
    // unix-seconds + rfc3339 timestamp fields, and the nested `aliases`
    // virtual self-join. Covers the reference's published query shape
    // (one root field, scalar args) without a full GraphQL engine.
    server.createContext("/graphql", (ex: HttpExchange) => handle(ex) {
      if (ex.getRequestURI.getPath != "/graphql")
        respond(ex, 404, "not found\n")
      else if (ex.getRequestMethod != "POST")
        respond(ex, 405, "method not allowed\n")
      else {
        val raw = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        // accept both bare GraphQL and {"query": "...", "variables": {...}}
        // JSON envelopes; the envelope is detected by PARSING, not by
        // sniffing the first characters — `{ "query": ... }` with inner
        // whitespace is still an envelope, while a bare GraphQL body
        // starting with '{' fails JSON parsing and falls through untouched
        val (gql, vars) = parseEnvelope(raw).getOrElse((raw, None))
        Graphql.execute(gql, vars, store) match {
          case Left(err) => respond(ex, 400, errorJson(err))
          case Right(json) => respond(ex, 200, json)
        }
      }
    })
  }

  /** GraphQL-shaped error object, built with the JSON mapper so messages
    * containing quotes/backslashes stay valid JSON. */
  private def errorJson(message: String): String = {
    val root = mapper.createObjectNode()
    root.putArray("errors").addObject().put("message", message)
    mapper.writeValueAsString(root)
  }

  /** Some((query, variables)) iff the body is a valid JSON object envelope
    * with a string `query` member; `variables` is its optional object
    * member (the standard GraphQL-over-HTTP envelope). */
  private def parseEnvelope(raw: String)
      : Option[(String, Option[com.fasterxml.jackson.databind.JsonNode])] =
    if (!raw.trim.startsWith("{")) None
    else
      try {
        val n = mapper.readTree(raw)
        Option(n.get("query")).filter(_.isTextual).map { q =>
          (q.asText,
            Option(n.get("variables")).filter(_.isObject))
        }
      } catch { case _: Exception => None }

  private def handle(ex: HttpExchange)(body: => Unit): Unit = {
    stats.queries.incrementAndGet()
    try body
    catch {
      case e: Exception =>
        stats.errors.incrementAndGet()
        try respond(ex, 500, s"internal error: ${e.getMessage}\n")
        catch { case _: Exception => () }
    }
    finally ex.close()
  }

  /** Stream rows as NDJSON without materializing the result set on the
    * driver: unix-seconds rendering via [[Tools.jsonize]], rows pulled
    * partition-by-partition with `toLocalIterator`. */
  private def streamNdjson(ex: HttpExchange, df: DataFrame,
      notFoundOnEmpty: Boolean): Unit = {
    val it = Tools.jsonizeAuto(df).toLocalIterator()
    if (!it.hasNext && notFoundOnEmpty) { respond(ex, 404, "not found\n"); return }
    ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
    ex.sendResponseHeaders(200, 0) // chunked
    val out: OutputStream = ex.getResponseBody
    while (it.hasNext) {
      val line = it.next().getString(0).getBytes(UTF_8)
      out.write(line)
      out.write('\n')
      stats.bytesOut.addAndGet(line.length + 1L)
    }
    out.close()
  }

  /** Fast-path NDJSON: same shape (field order, unix-seconds ints) as
    * [[Tools.jsonize]], rendered on the serving thread. */
  private def streamNdjsonObs(ex: HttpExchange,
      obs: Seq[graft.model.Observation], notFoundOnEmpty: Boolean): Unit = {
    if (obs.isEmpty && notFoundOnEmpty) { respond(ex, 404, "not found\n"); return }
    ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
    ex.sendResponseHeaders(200, 0) // chunked
    val out: OutputStream = ex.getResponseBody
    obs.foreach { o =>
      val n = mapper.createObjectNode()
      n.put("rrname", o.rrname); n.put("rdata", o.rdata)
      n.put("rrtype", o.rrtype); n.put("sensor_id", o.sensor_id)
      n.put("count", o.count)
      n.put("time_first", Math.floorDiv(o.first_seen.getTime, 1000L))
      n.put("time_last", Math.floorDiv(o.last_seen.getTime, 1000L))
      val line = mapper.writeValueAsString(n).getBytes(UTF_8)
      out.write(line)
      out.write('\n')
      stats.bytesOut.addAndGet(line.length + 1L)
    }
    out.close()
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    if (code >= 400) stats.errors.incrementAndGet(): Unit
    ex.getResponseHeaders.set("Content-Type",
      if (body.startsWith("{")) "application/json" else "text/plain")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    stats.bytesOut.addAndGet(bytes.length.toLong)
    ex.getResponseBody.close()
  }
}

object QueryServer {
  /** JDK HttpServer slow-client limits, the reference's 5 s read / 10 s
    * write (`query_graphql.go:410-412`). `sun.net.httpserver.maxReqTime`
    * bounds request receipt, `maxRspTime` bounds response delivery; both
    * are read ONCE at ServerConfig class-init, so they are set here —
    * before any HttpServer exists — and only if the operator has not
    * already configured them on the JVM command line. */
  private[serve] lazy val ensureTimeouts: () => Unit = {
    if (System.getProperty("sun.net.httpserver.maxReqTime") == null)
      System.setProperty("sun.net.httpserver.maxReqTime", "5"): Unit
    if (System.getProperty("sun.net.httpserver.maxRspTime") == null)
      System.setProperty("sun.net.httpserver.maxRspTime", "10"): Unit
    () => ()
  }
}
