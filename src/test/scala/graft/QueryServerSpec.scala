package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ObservationStore
import graft.serve.QueryServer

/** End-to-end HTTP tests mirroring the reference's frontend tests
  * (`query/query_graphql_test.go:148-198`, `query/query_rest_test.go:
  * 124-174`): seed the 3-observation fixture, start the real server on an
  * ephemeral port, issue real HTTP requests. */
class QueryServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val store = {
    import spark.implicits._
    val ts = Timestamp.valueOf("2018-01-01 00:00:00")
    val input = Seq(
      ("foo", "abc", "A", "1.2.3.4", 10L, ts, ts),
      ("bar", "abc", "A", "1.2.3.5", 10L, ts, ts),
      ("baz", "abc", "A", "1.2.3.4", 1L, ts, ts)
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count",
      "timestamp_start", "timestamp_end")
    ObservationStore.inMemory(ObservationStore.aggregate(input))
  }

  private lazy val server = { val s = new QueryServer(store); s.start(); s }
  private lazy val client = HttpClient.newHttpClient()
  private def base = s"http://localhost:${server.boundPort}"

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /query by rrname -> 1 entry with aggregate fields") {
    val r = post("/query", """{"rrname": "foo"}""")
    assert(r.statusCode() == 200)
    val lines = r.body().trim.split("\n")
    assert(lines.length == 1)
    assert(lines.head.contains("\"rrname\":\"foo\""))
    assert(lines.head.contains("\"count\":10"))
    assert(lines.head.contains("\"time_first\":1514764800"))
  }

  test("POST /query by rdata -> 2 entries; residual filter narrows") {
    assert(post("/query", """{"rdata": "1.2.3.4"}""").body().trim
      .split("\n").length == 2)
    val narrowed = post("/query",
      """{"rdata": "1.2.3.4", "rrname": "baz"}""").body().trim.split("\n")
    assert(narrowed.length == 1 && narrowed.head.contains("\"baz\""))
  }

  test("POST /query without rrname/rdata -> 400; wrong method -> 405") {
    assert(post("/query", """{"rrtype": "A"}""").statusCode() == 400)
    assert(get("/query").statusCode() == 405)
  }

  test("POST /query rrname_prefix: range scan, validation, fallback path") {
    // in-memory store → plan-path fallback (entriesPrefix)
    val r = post("/query", """{"rrname_prefix": "ba"}""")
    assert(r.statusCode() == 200)
    val names = r.body().trim.split("\n")
      .map(l => "\"rrname\":\"([a-z]+)\"".r.findFirstMatchIn(l).get.group(1))
      .sorted.toSeq
    assert(names == Seq("bar", "baz"))
    // prefix is exclusive with point params; empty prefix rejected
    assert(post("/query",
      """{"rrname_prefix": "ba", "rrname": "foo"}""").statusCode() == 400)
    assert(post("/query", """{"rrname_prefix": ""}""").statusCode() == 400)
    // disk-backed store → fast path (servePrefix), same rows
    import spark.implicits._
    val ts = Timestamp.valueOf("2018-01-01 00:00:00")
    val input = Seq(
      ("foo", "abc", "A", "1.2.3.4", 10L, ts, ts),
      ("bar", "abc", "A", "1.2.3.5", 10L, ts, ts),
      ("baz", "abc", "AAAA", "::1", 1L, ts, ts)
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count",
      "timestamp_start", "timestamp_end")
    val dir = java.nio.file.Files.createTempDirectory("graft-qs-pfx").toString
    ObservationStore.writeDual(ObservationStore.aggregate(input), dir,
      numBuckets = 4)
    val diskSrv = new QueryServer(ObservationStore.load(spark, dir))
    diskSrv.start()
    try {
      val rf = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:${diskSrv.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"rrname_prefix": "ba"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(rf.statusCode() == 200)
      val fastNames = rf.body().trim.split("\n")
        .map(l => "\"rrname\":\"([a-z]+)\"".r.findFirstMatchIn(l).get.group(1))
        .sorted.toSeq
      assert(fastNames == names)
      // rrtype/sensor_id are residual filters on the prefix scan, not
      // silently ignored (bar is A, baz is AAAA)
      def prefixWith(extra: String): Seq[String] = {
        val resp = client.send(
          HttpRequest.newBuilder(
            URI.create(s"http://localhost:${diskSrv.boundPort}/query"))
            .POST(HttpRequest.BodyPublishers.ofString(
              s"""{"rrname_prefix": "ba"$extra}""")).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200)
        resp.body().trim.split("\n").filter(_.nonEmpty)
          .map(l => "\"rrname\":\"([a-z]+)\"".r
            .findFirstMatchIn(l).get.group(1)).sorted.toSeq
      }
      assert(prefixWith(""","rrtype": "A"""") == Seq("bar"))
      assert(prefixWith(""","rrtype": "AAAA"""") == Seq("baz"))
      assert(prefixWith(""","sensor_id": "abc"""") == Seq("bar", "baz"))
      assert(prefixWith(""","sensor_id": "nope"""") == Seq.empty)
    } finally diskSrv.stop()
  }

  test("GET /pdns/query/<subject>: rrname-or-rdata union, 404 on empty") {
    val r = get("/pdns/query/1.2.3.4")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").orElse("")
      .contains("ndjson"))
    assert(r.body().trim.split("\n").length == 2) // foo + baz via rdata
    assert(get("/pdns/query/foo").body().trim.split("\n").length == 1)
    assert(get("/pdns/query/doesnotexist").statusCode() == 404)
    assert(get("/pdns/query/1.2.3.4?limit=1").body().trim.split("\n").length <= 2)
  }

  test("GET /pdns/cidr/<block>: server-side v4+v6 range query over rdata") {
    val r = get("/pdns/cidr/1.2.3.0/24")
    assert(r.statusCode() == 200, r.body())
    // foo and baz rdata fall in 1.2.3.0/24 (1.2.3.4, 1.2.3.5 = 3 entries)
    assert(r.body().trim.split("\n").length == 3, r.body())
    assert(get("/pdns/cidr/1.2.3.4/32").body().trim.split("\n").length == 2)
    assert(get("/pdns/cidr/9.9.9.0/24").statusCode() == 404) // empty
    assert(get("/pdns/cidr/2001:db8::/64").statusCode() == 404) // no v6 rdata
    assert(get("/pdns/cidr/nonsense").statusCode() == 400)
    assert(get("/pdns/cidr/1.2.3.0/33").statusCode() == 400)
    assert(get("/pdns/cidr/1.2.3.0/24?limit=0").statusCode() == 400)
    assert(get("/pdns/cidr/1.2.3.0/24?limit=1").body().trim
      .split("\n").length == 1)
  }

  test("GET /stats -> total_count + goroutines + serving counters") {
    val body = get("/stats").body().trim
    assert(body.matches("""\{"total_count":3,"num_goroutines":\d+,""" +
      """"queries":\d+,"errors":\d+,"bytes_out":\d+\}"""), body)
  }

  test("POST /graphql: the reference's canonical entries query") {
    val q = """query {
      |  entries(rrname: "foo", sensor_id: "abc", limit: 1) {
      |    rrname rrtype rdata time_first time_last sensor_id count
      |  }
      |}""".stripMargin
    val r = post("/graphql", q)
    assert(r.statusCode() == 200)
    val body = r.body()
    assert(body.contains(""""data":{"entries":[{"""), body)
    assert(body.contains(""""rrname":"foo""""), body)
    assert(body.contains(""""count":10"""), body)
    assert(body.contains(""""time_first":1514764800"""), body)
    // JSON envelope form works too
    val env = post("/graphql",
      """{"query": "query { entries(rdata: \"1.2.3.4\") { rrname } }"}""")
    assert(env.body().split("\"rrname\"").length - 1 == 2)
  }

  test("POST /graphql: field selection, rfc3339, enum rrtype, aliases") {
    val r = post("/graphql",
      """query { entries(rrname: "foo", rrtype: A) {
        | rrname time_first_rfc3339 aliases { rrname rrtype } } }""".stripMargin)
    assert(r.statusCode() == 200)
    val body = r.body()
    assert(body.contains(""""time_first_rfc3339":"2018-01-01T00:00:00Z""""), body)
    assert(!body.contains(""""count""""), body) // unselected field omitted
    // foo(1.2.3.4) aliases to baz (same rdata+sensor, different name)
    assert(body.contains(""""aliases":[{"rrname":"baz","rrtype":"A"}]"""), body)
  }

  test("POST /graphql: aliases limit argument caps the per-entry fan-out") {
    val r = post("/graphql",
      """query { entries(rrname: "foo") { rrname aliases(limit: 0) { rrname } } }""")
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""aliases":[]"""), r.body())
    // default-limit form still returns the alias
    val r2 = post("/graphql",
      """query { entries(rrname: "foo") { rrname aliases { rrname } } }""")
    assert(r2.body().contains(""""aliases":[{"rrname":"baz"}]"""), r2.body())
  }

  test("POST /graphql: errors — no rrname/rdata, unsupported query") {
    assert(post("/graphql", "query { entries(rrtype: A) { rrname } }")
      .statusCode() == 400)
    assert(post("/graphql", "query { stats { total } }").statusCode() == 400)
    // a limit beyond Int range is a client error (400), not a 500
    assert(post("/graphql",
      "query { entries(rrname: \"foo\", limit: 99999999999) { rrname } }")
      .statusCode() == 400)
    assert(post("/graphql",
      """query { entries(rrname: "foo") { rrname aliases(limit: 99999999999) { rrname } } }""")
      .statusCode() == 400)
  }

  test("POST /graphql: introspection probe returns the schema document") {
    val r = post("/graphql",
      "query IntrospectionQuery { __schema { queryType { name } types { name kind } } }")
    assert(r.statusCode() == 200)
    val schema = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(r.body()).path("data").path("__schema")
    assert(schema.path("queryType").path("name").asText() == "Query")
    val typeNames = (0 until schema.path("types").size())
      .map(i => schema.path("types").get(i).path("name").asText()).toSet
    assert(Set("Query", "Entry", "LeafEntry", "Stats", "RRType")
      .subsetOf(typeNames), typeNames)
    // the enum carries all 46 reference values
    val rrtype = (0 until schema.path("types").size())
      .map(schema.path("types").get(_))
      .find(_.path("name").asText() == "RRType").get
    assert(rrtype.path("enumValues").size() == 46)
  }

  test("POST /graphql: stats root field (query_graphql.go:166-172)") {
    val r = post("/graphql", "query { stats { total_count num_goroutines } }")
    assert(r.statusCode() == 200)
    assert(r.body().matches(
      """\{"data":\{"stats":\{"total_count":3,"num_goroutines":\d+\}\}\}"""),
      r.body())
    // selection is honored: only the asked-for field comes back
    val only = post("/graphql", "query { stats { total_count } }")
    assert(only.body() == """{"data":{"stats":{"total_count":3}}}""")
  }

  test("POST /graphql: rrtype outside the RRType enum is a schema error") {
    val r = post("/graphql",
      "query { entries(rrname: \"foo\", rrtype: BOGUS) { rrname } }")
    assert(r.statusCode() == 400)
    // GraphQL-shaped error object with a VALID JSON message (the message
    // itself contains quotes — must be escaped, not interpolated raw)
    val errs = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(r.body()).get("errors")
    assert(errs != null && errs.size() == 1, r.body())
    assert(errs.get(0).get("message").asText().contains("RRType"), r.body())
    // all 46 reference enum values are accepted
    assert(graft.serve.Graphql.RRTypes.size == 46)
    assert(post("/graphql",
      "query { entries(rrname: \"foo\", rrtype: NSEC3PARAM) { rrname } }")
      .statusCode() == 200)
  }

  test("POST /graphql: JSON envelope with inner whitespace still unwraps") {
    val env = post("/graphql",
      """{ "query": "query { entries(rdata: \"1.2.3.4\") { rrname } }" }""")
    assert(env.statusCode() == 200)
    assert(env.body().split("\"rrname\"").length - 1 == 2)
  }

  test("POST /graphql: variables — same rows as the inline form") {
    val inline = post("/graphql",
      """query { entries(rdata: "1.2.3.4", limit: 10) { rrname rdata } }""")
    val varred = post("/graphql",
      """{"query": "query($d: String!, $l: Int) { entries(rdata: $d, limit: $l) { rrname rdata } }",
        | "variables": {"d": "1.2.3.4", "l": 10}}""".stripMargin)
    assert(varred.statusCode() == 200, varred.body())
    assert(varred.body() == inline.body(), varred.body())
    // declared default kicks in when the variable is not supplied
    val defaulted = post("/graphql",
      """{"query": "query($d: String = \"1.2.3.4\") { entries(rdata: $d) { rrname } }"}""")
    assert(defaulted.statusCode() == 200, defaulted.body())
    assert(defaulted.body().split("\"rrname\"").length - 1 == 2)
    // enum through a variable validates against RRType like an inline enum
    val enumVar = post("/graphql",
      """{"query": "query($t: RRType) { entries(rrname: \"foo\", rrtype: $t) { rrname } }",
        | "variables": {"t": "A"}}""".stripMargin)
    assert(enumVar.statusCode() == 200, enumVar.body())
    val badEnum = post("/graphql",
      """{"query": "query($t: RRType) { entries(rrname: \"foo\", rrtype: $t) { rrname } }",
        | "variables": {"t": "BOGUS"}}""".stripMargin)
    assert(badEnum.statusCode() == 400, badEnum.body())
  }

  test("POST /graphql: variables — undefined variable is a 400, not a 500") {
    val r = post("/graphql",
      """{"query": "query($d: String!) { entries(rdata: $d) { rrname } }"}""")
    assert(r.statusCode() == 400, r.body())
    assert(r.body().contains("not defined"), r.body())
    // a quote inside a variable value stays INSIDE its argument (no
    // breakout into the surrounding document)
    val quoted = post("/graphql",
      """{"query": "query($d: String) { entries(rdata: $d) { rrname } }",
        | "variables": {"d": "x\") { rdata } } query { entries(rdata: \"1.2.3.4"}}""".stripMargin)
    assert(quoted.statusCode() == 200, quoted.body())
    assert(quoted.body().contains(""""entries":[]"""), quoted.body())
  }

  test("POST /graphql: multiple root fields and field aliases in one document") {
    val r = post("/graphql",
      """query {
        |  byName: entries(rrname: "foo") { rrname count }
        |  byAddr: entries(rdata: "1.2.3.4") { rrname }
        |  stats { total_count }
        |}""".stripMargin)
    assert(r.statusCode() == 200, r.body())
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(r.body()).path("data")
    assert(n.path("byName").size() == 1, r.body())
    assert(n.path("byName").get(0).path("count").asLong() == 10L)
    assert(n.path("byAddr").size() == 2, r.body())
    assert(n.path("stats").path("total_count").asLong() == 3L)
    // un-aliased single field keeps the classic response key
    val single = post("/graphql", """query { entries(rrname: "foo") { rrname } }""")
    assert(single.body().contains(""""data":{"entries":["""), single.body())
    // duplicate response keys are a client error, and unknown root
    // fields name the Query type like graphql-go does
    assert(post("/graphql",
      """query { entries(rrname: "a") { rrname } entries(rdata: "b") { rrname } }""")
      .statusCode() == 400)
    val bad = post("/graphql", "query { nope { x } }")
    assert(bad.statusCode() == 400)
    assert(bad.body().contains("on type \\\"Query\\\"") ||
      bad.body().contains("""on type "Query""""), bad.body())
  }

  test("POST /graphql: named and inline fragments expand into selections") {
    val r = post("/graphql",
      """query {
        |  entries(rrname: "foo") { ...core aliases { ...core } }
        |}
        |fragment core on Entry { rrname rrtype }""".stripMargin)
    assert(r.statusCode() == 200, r.body())
    assert(r.body().contains(""""rrname":"foo""""), r.body())
    assert(r.body().contains(""""aliases":[{"rrname":"baz","rrtype":"A"}]"""),
      r.body())
    // nested fragments expand transitively
    val nested = post("/graphql",
      """fragment a on Entry { ...b count }
        |fragment b on Entry { rrname }
        |query { entries(rrname: "foo") { ...a } }""".stripMargin)
    assert(nested.statusCode() == 200, nested.body())
    assert(nested.body().contains(""""rrname":"foo""""), nested.body())
    assert(nested.body().contains(""""count":10"""), nested.body())
    // inline fragment
    val inline = post("/graphql",
      """query { entries(rrname: "foo") { ... on Entry { rrname } } }""")
    assert(inline.statusCode() == 200, inline.body())
    assert(inline.body().contains(""""rrname":"foo""""), inline.body())
    // unknown fragment and cycles are client errors, not 500s
    assert(post("/graphql",
      """query { entries(rrname: "foo") { ...nope } }""").statusCode() == 400)
    assert(post("/graphql",
      """fragment a on Entry { ...b }
        |fragment b on Entry { ...a }
        |query { entries(rrname: "foo") { ...a } }""".stripMargin)
      .statusCode() == 400)
  }

  test("POST /graphql: @skip/@include directives, literal and variable-driven") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // literal @skip on a field drops it; the sibling stays
    val r1 = post("/graphql",
      """query { entries(rrname: "foo") { rrname count @skip(if: true) } }""")
    assert(r1.statusCode() == 200, r1.body())
    val e1 = mapper.readTree(r1.body()).path("data").path("entries").get(0)
    assert(e1.has("rrname") && !e1.has("count"), r1.body())
    // @include(if: false) on a root field drops the whole field
    val r2 = post("/graphql",
      """query {
        |  entries(rrname: "foo") @include(if: false) { rrname }
        |  stats { total_count }
        |}""".stripMargin)
    assert(r2.statusCode() == 200, r2.body())
    val d2 = mapper.readTree(r2.body()).path("data")
    assert(!d2.has("entries") && d2.path("stats").path("total_count").asLong() == 3L)
    // variable-driven, through the JSON envelope
    val r3 = post("/graphql", mapper.writeValueAsString {
      val o = mapper.createObjectNode()
      o.put("query",
        "query Q($f: Boolean!) { entries(rrname: \"foo\") { rrname count @skip(if: $f) } }")
      o.putObject("variables").put("f", true)
      o
    })
    assert(r3.statusCode() == 200, r3.body())
    val e3 = mapper.readTree(r3.body()).path("data").path("entries").get(0)
    assert(e3.has("rrname") && !e3.has("count"), r3.body())
    // directive on a fragment spread drops the spread, keeps literals
    val r4 = post("/graphql",
      """query { entries(rrname: "foo") { count ...core @skip(if: true) } }
        |fragment core on Entry { rrname }""".stripMargin)
    assert(r4.statusCode() == 200, r4.body())
    val e4 = mapper.readTree(r4.body()).path("data").path("entries").get(0)
    assert(e4.has("count") && !e4.has("rrname"), r4.body())
    // every root field skipped = empty data, not an error
    val r5 = post("/graphql",
      """query { entries(rrname: "foo") @skip(if: true) { rrname } }""")
    assert(r5.statusCode() == 200, r5.body())
    assert(mapper.readTree(r5.body()).path("data").size() == 0, r5.body())
    // unknown directive and missing if: are client errors, not 500s
    assert(post("/graphql",
      """query { entries(rrname: "foo") { rrname @nope(if: true) } }""")
      .statusCode() == 400)
    assert(post("/graphql",
      """query { entries(rrname: "foo") { rrname @skip } }""").statusCode() == 400)
    // a NESTED selection emptied by @skip is an error for that field —
    // it must never mask un-skipped sibling roots into empty data
    val r6 = post("/graphql",
      """query {
        |  stats { total_count }
        |  entries(rrname: "foo") { count @skip(if: true) }
        |}""".stripMargin)
    assert(r6.statusCode() == 400, r6.body())
  }

  test("graphql string args: escaped quotes keep full value fidelity") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2018-01-01 00:00:00")
    val txtStore = ObservationStore.inMemory(ObservationStore.aggregate(Seq(
      ("quoted.example", "s1", "TXT", """say "hi" ok""", 2L, ts, ts),
      ("quoted.example", "s1", "TXT", """say""", 1L, ts, ts)
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count",
      "timestamp_start", "timestamp_end")))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // inline literal with escaped quotes must match the full TXT value —
    // a parser that stops at the escaped quote would match "say\" = no row
    val inline = graft.serve.Graphql.execute(
      """query { entries(rdata: "say \"hi\" ok") { rrname count } }""",
      txtStore)
    assert(inline.isRight, inline)
    val n1 = mapper.readTree(inline.toOption.get).path("data").path("entries")
    assert(n1.size() == 1 && n1.get(0).path("count").asLong() == 2L, inline)
    // same value supplied as a variable (mapper-escaped on splice)
    val vars = mapper.createObjectNode()
    vars.put("r", """say "hi" ok""")
    val viaVar = graft.serve.Graphql.execute(
      """query Q($r: String!) { entries(rdata: $r) { rrname count } }""",
      Some(vars), txtStore)
    assert(viaVar == inline, viaVar)
    // the unescaped PREFIX of the quoted value is a different key and
    // must keep matching its own row (no cross-talk from unescaping)
    val vars2 = mapper.createObjectNode()
    vars2.put("r", "say")
    val plain = graft.serve.Graphql.execute(
      """query Q($r: String!) { entries(rdata: $r) { count } }""",
      Some(vars2), txtStore)
    assert(plain.toOption.get.contains("\"count\":1"), plain)
  }

  test("graphql id: distinct key tuples never collide across field boundaries") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2018-01-01 00:00:00")
    val ambiguous = Seq(
      ("ab", "c", "A", "x", 1L, ts, ts),
      ("a", "bc", "A", "x", 1L, ts, ts)
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count",
      "timestamp_start", "timestamp_end")
    val st = ObservationStore.inMemory(ObservationStore.aggregate(ambiguous))
    def idsOf(rrname: String): Seq[String] = {
      val body = graft.serve.Graphql.execute(
        s"""query { entries(rrname: "$rrname") { id } }""", st)
        .fold(e => fail(e), identity)
      """"id":"([0-9a-f-]+)"""".r.findAllMatchIn(body).map(_.group(1)).toSeq
    }
    val (idAb, idA) = (idsOf("ab"), idsOf("a"))
    assert(idAb.size == 1 && idA.size == 1)
    assert(idAb.head != idA.head, "concatenation-ambiguous keys must differ")
  }

  test("disk-backed store serves GraphQL/REST through the fast path") {
    import spark.implicits._
    // a DISK store makes servePoint available, so every endpoint below
    // exercises the PointReader branch (the in-memory fixture above
    // covers the plan-path fallback); responses must be shape-identical
    val ts = Timestamp.valueOf("2018-01-01 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-qs-disk").toString
    ObservationStore.writeDual(ObservationStore.aggregate(Seq(
      ("foo", "abc", "A", "1.2.3.4", 10L, ts, ts),
      ("bar", "abc", "A", "1.2.3.4", 2L, ts, ts)
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count",
      "timestamp_start", "timestamp_end")), dir, numBuckets = 4)
    val disk = ObservationStore.load(spark, dir)
    assert(disk.servePoint(rrname = Some("foo")).isDefined) // fast path on
    val srv = new QueryServer(disk)
    srv.start()
    try {
      def g(path: String) = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:${srv.boundPort}$path")).GET()
          .build(), HttpResponse.BodyHandlers.ofString())
      def p(path: String, body: String) = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:${srv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      // REST: CIRCL bag union via two fast lookups; unix-seconds ints
      val rest = g("/pdns/query/1.2.3.4").body().trim.split("\n")
      assert(rest.length == 2)
      assert(rest.forall(_.contains("\"time_first\":1514764800")))
      // POST /query with residual filter
      val q = p("/query", """{"rdata":"1.2.3.4","rrname":null}""")
        .body().trim.split("\n")
      assert(q.length == 2 && q.exists(_.contains("\"rrname\":\"foo\"")))
      // GraphQL with aliases: fast rows + LocalRelation aliases join
      val gql = p("/graphql",
        """{ entries(rrname: "foo") { rrname rdata count time_first
          |  aliases { rrname } } }""".stripMargin).body()
      assert(gql.contains("\"count\":10"), gql)
      assert(gql.contains("\"aliases\":[{\"rrname\":\"bar\"}]"), gql)
      // miss → 404 on REST
      assert(g("/pdns/query/absent").statusCode() == 404)
    } finally srv.stop()
  }

  test("slow-client timeouts configured to reference parity (5s/10s)") {
    server.boundPort: Unit // force server construction first
    // query_graphql.go:410-412 — the JDK server reads these once at
    // class-init; QueryServer sets them before creating any HttpServer
    assert(System.getProperty("sun.net.httpserver.maxReqTime") == "5")
    assert(System.getProperty("sun.net.httpserver.maxRspTime") == "10")
  }

  test("rolling stats: queries/errors/bytes counted, delta line emitted") {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val srv = new QueryServer(store, statsIntervalMillis = 50L,
      statsSink = s => { lines.add(s); () })
    srv.start()
    try {
      val uri = java.net.URI.create(
        s"http://localhost:${srv.boundPort}/stats")
      val client = java.net.http.HttpClient.newHttpClient()
      val ok = client.send(
        java.net.http.HttpRequest.newBuilder(uri).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(ok.statusCode() == 200)
      val bad = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://localhost:${srv.boundPort}/pdns/query/")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 404)
      assert(srv.stats.queries.get() >= 2L)
      assert(srv.stats.errors.get() >= 1L)
      assert(srv.stats.bytesOut.get() > 0L)
      val deadline = System.currentTimeMillis() + 5000
      while (lines.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val line = lines.poll()
      assert(line != null && line.contains("[query-http] queries="), line)
    } finally srv.stop()
  }
}
