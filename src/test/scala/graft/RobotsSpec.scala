package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Robots

/** RFC 9309 semantics of the robots operators beyond the gate's happy
  * path: group selection by agent name, empty-path rules, precedence
  * ties, URL normalization and hosts with no rules. */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val body =
    """# comment only line
      |User-agent: GoodBot
      |Disallow: /only-goodbot
      |
      |User-agent: *
      |Disallow:
      |Disallow: /a
      |Allow: /a/b
      |""".stripMargin

  private def rules(agent: String) =
    Robots.parseRules(Seq(("h.example", body)).toDF("host", "body"),
      "host", "body", agent)

  test("groups select by exact agent name or *; empty Disallow dropped") {
    val star = rules("*").as[(String, String, String)].collect().toSet
    assert(star == Set(("h.example", "disallow", "/a"),
      ("h.example", "allow", "/a/b")))
    // GoodBot gets ITS group plus the * group; agent NAMES match
    // case-insensitively but rule PATHS keep their case
    val good = rules("goodbot").as[(String, String, String)].collect().toSet
    assert(good == Set(("h.example", "disallow", "/only-goodbot"),
      ("h.example", "disallow", "/a"), ("h.example", "allow", "/a/b")))
    val cased = Robots.parseRules(
      Seq(("c.example", "USER-AGENT: *\nDISALLOW: /CaseSensitive\n"))
        .toDF("host", "body"), "host", "body")
      .as[(String, String, String)].collect().toSet
    assert(cased == Set(("c.example", "disallow", "/CaseSensitive")))
    val v = Robots.filterUrls(
      Seq("http://c.example/CaseSensitive/x",
        "http://c.example/casesensitive/x").toDF("url"), "url",
      Robots.parseRules(
        Seq(("c.example", "USER-AGENT: *\nDISALLOW: /CaseSensitive\n"))
          .toDF("host", "body"), "host", "body"))
      .select("url", "is_allowed").as[(String, Long)].collect().toMap
    assert(v("http://c.example/CaseSensitive/x") == 0L)
    assert(v("http://c.example/casesensitive/x") == 1L)
  }

  test("verdicts: longest prefix wins, allow wins ties, no match allows") {
    val urls = Seq(
      "http://h.example/a/x",        // disallow /a
      "http://h.example/a/b/x",      // allow /a/b (longer)
      "http://h.example/ok",         // no rule
      "http://h.example",            // bare host -> path '/'
      "http://other.example/a/x"     // host without rules
    ).toDF("url")
    val out = Robots.filterUrls(urls, "url", rules("*"))
      .select("url", "is_allowed").as[(String, Long)].collect().toMap
    assert(out("http://h.example/a/x") == 0L)
    assert(out("http://h.example/a/b/x") == 1L)
    assert(out("http://h.example/ok") == 1L)
    assert(out("http://h.example") == 1L)
    assert(out("http://other.example/a/x") == 1L)
    // equal-length tie: Allow beats Disallow
    val tie = Seq(("t.example",
      "User-agent: *\nDisallow: /p\nAllow: /q\n")).toDF("host", "body")
    val tieRules = Robots.parseRules(tie, "host", "body")
      .unionAll(Seq(("t.example", "allow", "/p")).toDF("host", "rule", "path"))
    val v = Robots.filterUrls(Seq("http://t.example/p/z").toDF("url"),
      "url", tieRules).select("is_allowed").head.getLong(0)
    assert(v == 1L)
  }

  test("crawlSchedule: per-host priority rank gives the interleave") {
    val urls = Seq(
      ("http://a.x/1", 5L), ("http://a.x/2", 9L), ("http://a.x/3", 9L),
      ("http://b.x/1", 1L)).toDF("url", "prio")
    val out = Robots.crawlSchedule(urls, "url", "prio")
      .select("url", "host", "visit")
      .as[(String, String, Long)].collect().toSet
    // priority desc, url asc on ties; hosts independent
    assert(out == Set(
      ("http://a.x/2", "a.x", 1L), ("http://a.x/3", "a.x", 2L),
      ("http://a.x/1", "a.x", 3L), ("http://b.x/1", "b.x", 1L)))
    // (visit, host) order separates consecutive same-host fetches by
    // every other host that still has a visit-n URL
    val order = out.toSeq.sortBy { case (_, h, v) => (v, h) }.map(_._1)
    assert(order == Seq("http://a.x/2", "http://b.x/1",
      "http://a.x/3", "http://a.x/1"))
  }

  test("url parsing: host and path normalization") {
    val df = Seq("https://x.y/p/q?r=1", "http://x.y", "not-a-url")
      .toDF("u")
      .select(Robots.urlHost(col("u")).as("h"),
        Robots.urlPath(col("u")).as("p"))
      .as[(String, String)].collect()
    assert(df(0) == ("x.y", "/p/q?r=1"))
    assert(df(1) == ("x.y", "/"))
    assert(df(2) == ("", "/")) // non-URL: no host, path normalizes
  }
}
