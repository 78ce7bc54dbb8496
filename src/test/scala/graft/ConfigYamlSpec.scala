package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Selectors
import graft.sources.{ConfigYaml, FeederConfig}

/** YAML config loading against the reference's three config shapes
  * (`feeders.yaml`, `selectors.yaml`, `backend.yaml`) — field names and
  * validation behavior per `feeder/feeder_config.go:40-88`,
  * `selector/selector_regex.go:36-79`, `db/db_remote.go:15-28`. */
class ConfigYamlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val feedersYaml =
    """feeder:
      |    - name: Web Json Input
      |      type: http
      |      listen_host: 127.0.0.1
      |      listen_port: 9911
      |      input_format: fever_aggregate
      |    - name: Sensor Feed
      |      type: nmsg_socket
      |      bind_address: 0.0.0.0:5353
      |      mtu: 1480
      |      input_format: nmsg
      |""".stripMargin

  test("feeders.yaml: reference field names load, formats aliased") {
    val setup = ConfigYaml.loadFeederSetup(feedersYaml, "/tmp/spools")
    assert(setup.feeders.map(_.name) == Seq("Web Json Input", "Sensor Feed"))
    val http = setup.feeders.head
    assert(http.kind == FeederConfig.Http)
    assert(http.format == "fever") // fever_aggregate -> repo decoder key
    assert(http.options("listen_port") == "9911")
    // spool dir derives from the name like the reference's queue names
    assert(http.options("dir") == "/tmp/spools/web_json_input")
    val udp = setup.feeders(1)
    assert(udp.kind == FeederConfig.Udp)
    assert(udp.options("bind_address") == "0.0.0.0:5353")
    assert(udp.options("mtu") == "1480")
  }

  test("feeders.yaml: the reference's validation errors") {
    def load(y: String) = ConfigYaml.loadFeederSetup(y, "/tmp/s")
    intercept[IllegalArgumentException](load(
      "feeder:\n  - type: http\n    input_format: nmsg\n")) // name missing
    intercept[IllegalArgumentException](load(
      "feeder:\n  - name: x\n    input_format: nmsg\n")) // type missing
    intercept[IllegalArgumentException](load(
      "feeder:\n  - name: x\n    type: http\n")) // input format missing
    intercept[IllegalArgumentException](load( // http without listen_*
      "feeder:\n  - name: x\n    type: http\n    input_format: nmsg\n"))
    intercept[IllegalArgumentException](load( // amqp without url/exchange
      "feeder:\n  - name: x\n    type: amqp\n    input_format: nmsg\n"))
    intercept[IllegalArgumentException](load( // duplicate names
      """feeder:
        |  - name: x
        |    type: nmsg_socket
        |    input_format: nmsg
        |  - name: x
        |    type: nmsg_socket
        |    input_format: nmsg
        |""".stripMargin))
  }

  test("selectors.yaml: regex selectors drive the engine end-to-end") {
    val yaml =
      """selectors:
        |  - name: Drop Noise TLDs
        |    type: regex
        |    mode: filter
        |    regexp:
        |      - noise.txt
        |    tags:
        |      - clean
        |  - name: Watchlist
        |    type: regex
        |    mode: select
        |    regexp:
        |      - watch.txt
        |    ingest:
        |      - clean
        |    tags:
        |      - watched
        |""".stripMargin
    val files = Map(
      "noise.txt" -> Seq("\\.zzz$"),
      "watch.txt" -> Seq("^evil\\."))
    val selectors = ConfigYaml.loadSelectors(yaml, files)
    assert(selectors.length == 2)

    val df = Seq("evil.example.com", "fine.example.zzz", "plain.org")
      .toDF("rrname")
    val tagged = Selectors.engine(df, selectors)
      .select(col("rrname"), col("tags")).as[(String, Seq[String])]
      .collect().toMap
    // filter mode: tag set when NO pattern matches
    assert(tagged("fine.example.zzz").isEmpty)
    assert(tagged("plain.org") == Seq("clean"))
    // second selector triggers off the first one's tag (fixed point)
    assert(tagged("evil.example.com") == Seq("clean", "watched"))
  }

  test("regexp pattern files: one per line, comments and blanks skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-regex").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "tlds.txt"),
      "# noise TLDs\n\\.zzz$\n\n\\.yyy$\n".getBytes("UTF-8"))
    val read = ConfigYaml.patternsFromFiles(spark, dir)
    assert(read("tlds.txt") == Seq("\\.zzz$", "\\.yyy$"))
  }

  test("selectors.yaml: lua entries bind to registered hook substitutes") {
    val yaml =
      """selectors:
        |  - name: Custom Logic
        |    type: lua
        |    script: selector.lua
        |    tags:
        |      - custom
        |""".stripMargin
    val hook = Selectors.HookSelector(
      df => length(col("rrname")) > 10, tags = Seq.empty)
    val loaded = ConfigYaml.loadSelectors(yaml, _ => Seq.empty,
      hooks = Map("selector.lua" -> hook))
    assert(loaded.head.tags == Seq("custom")) // tags come from the YAML
    // unregistered script is a config error
    intercept[IllegalArgumentException](
      ConfigYaml.loadSelectors(yaml, _ => Seq.empty))
  }

  test("backend.yaml: named tag-routed sinks, any-tag semantics") {
    val yaml =
      """- name: primary
        |  host: "localhost:7777"
        |- name: watchlist sink
        |  host: "localhost:7778"
        |  tags:
        |    - watched
        |    - custom
        |""".stripMargin
    val backends = ConfigYaml.loadBackends(yaml)
    assert(backends.map(_.name) == Seq("primary", "watchlist sink"))
    assert(backends.head.tags.isEmpty)
    assert(backends(1).tags == Seq("watched", "custom"))

    val df = Seq(
      ("a.com", Seq("watched")),
      ("b.com", Seq("custom", "other")),
      ("c.com", Seq("other"))
    ).toDF("rrname", "tags")
    // tagless backend receives everything; tagged receives ANY overlap
    assert(Selectors.routeToAny(df, backends.head.tags).count() == 3)
    val routed = Selectors.routeToAny(df, backends(1).tags)
    assert(routed.select("rrname").as[String].collect().toSet ==
      Set("a.com", "b.com"))
    assert(!routed.columns.contains("tags")) // stripped before the write
  }
}
