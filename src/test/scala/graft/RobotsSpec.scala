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

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.select("host", "rule", "path")
      .as[(String, String, String)].collect().toSet

  test("groups select the most specific match; empty Disallow dropped") {
    val star = triples(rules("*"))
    assert(star == Set(("h.example", "disallow", "/a"),
      ("h.example", "allow", "/a/b")))
    // RFC 9309 §2.2.1: GoodBot obeys ONLY its own group — the * group's
    // rules must NOT merge in; agent NAMES match case-insensitively but
    // rule PATHS keep their case
    val good = triples(rules("goodbot"))
    assert(good == Set(("h.example", "disallow", "/only-goodbot")))
    // an agent with no named group falls back to the * group
    val other = triples(rules("otherbot"))
    assert(other == star)
    val cased = triples(Robots.parseRules(
      Seq(("c.example", "USER-AGENT: *\nDISALLOW: /CaseSensitive\n"))
        .toDF("host", "body"), "host", "body"))
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
      "User-agent: *\nDisallow: /p\nAllow: /p\n")).toDF("host", "body")
    val v = Robots.filterUrls(Seq("http://t.example/p/z").toDF("url"),
      "url", Robots.parseRules(tie, "host", "body"))
      .select("is_allowed").head().getLong(0)
    assert(v == 1L)
  }

  test("RFC 9309 §2.2.3 wildcards: mid-pattern *, $ anchor, precedence") {
    val body =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /a/*/secret
        |Allow: /a/open/secret-not
        |Disallow: /lit$eral
        |""".stripMargin
    val r = Robots.parseRules(Seq(("w.example", body)).toDF("host", "body"),
      "host", "body")
    val out = Robots.filterUrls(Seq(
      "http://w.example/x/doc.pdf",       // $ anchor hits the suffix
      "http://w.example/x/doc.pdfx",      // anchor means NO match
      "http://w.example/x/doc.pdf/y",     // anchor means NO match
      "http://w.example/a/b/secret/z",    // mid-pattern * spans /b/
      "http://w.example/a/secretless",    // no /secret segment after * — no match
      "http://w.example/a/open/secret-not/q", // longer Allow (20) beats Disallow /a/*/secret (11)
      "http://w.example/lit$eralx"        // mid-path $ is literal
    ).toDF("url"), "url", r)
      .select("url", "is_allowed").as[(String, Long)].collect().toMap
    assert(out("http://w.example/x/doc.pdf") == 0L)
    assert(out("http://w.example/x/doc.pdfx") == 1L)
    assert(out("http://w.example/x/doc.pdf/y") == 1L)
    assert(out("http://w.example/a/b/secret/z") == 0L)
    assert(out("http://w.example/a/secretless") == 1L)
    assert(out("http://w.example/a/open/secret-not/q") == 1L)
    assert(out("http://w.example/lit$eralx") == 0L)
    // regex metacharacters in WILDCARD rule paths stay literal (the
    // compiled pattern escapes everything except the * span)
    val meta = Robots.parseRules(
      Seq(("m.example", "User-agent: *\nDisallow: /p(1)+[2]*z\n"))
        .toDF("host", "body"), "host", "body")
    val mv = Robots.filterUrls(
      Seq("http://m.example/p(1)+[2]qz/x", "http://m.example/p111z")
        .toDF("url"),
      "url", meta).select("url", "is_allowed")
      .as[(String, Long)].collect().toMap
    assert(mv("http://m.example/p(1)+[2]qz/x") == 0L)
    assert(mv("http://m.example/p111z") == 1L)
  }

  test("sitemaps: any line, outside groups, comment-stripped") {
    val body =
      """# top
        |Sitemap: https://h/s1.xml # note
        |User-agent: bot
        |Disallow: /
        |sitemap:https://h/s2.xml
        |Sitemap: # empty value drops
        |""".stripMargin
    val out = Robots.sitemaps(Seq(("h", body)).toDF("host", "body"),
        "host", "body")
      .as[(String, Long, String)].collect().toSet
    // visible to every agent, even with only a non-matching group present
    assert(out == Set(("h", 1L, "https://h/s1.xml"),
      ("h", 4L, "https://h/s2.xml")))
  }

  test("crawlDelays: group specificity, min wins, junk values drop") {
    val body =
      """User-agent: crawler
        |Crawl-delay: 5
        |Crawl-delay: 3
        |
        |User-agent: *
        |Crawl-delay: 10
        |
        |User-agent: other
        |Crawl-delay: soon
        |Crawl-delay: -1
        |""".stripMargin
    def delays(agent: String) = Robots.crawlDelays(
      Seq(("h", body)).toDF("host", "body"), "host", "body", agent)
      .as[(String, Double)].collect().toMap
    assert(delays("crawler") == Map("h" -> 3.0)) // own group only, min
    assert(delays("nobody") == Map("h" -> 10.0)) // falls back to *
    assert(delays("other").isEmpty) // junk + negative values drop
    // schedule integration: due_sec = (visit - 1) * delay; hosts
    // without a directive take the default
    val urls = Seq(("http://h/1", 2L), ("http://h/2", 1L),
      ("http://x/1", 9L)).toDF("url", "prio")
    val sched = Robots.crawlScheduleWithDelays(urls, "url", "prio",
        Robots.crawlDelays(Seq(("h", body)).toDF("host", "body"),
          "host", "body", "crawler"), defaultDelay = 7.0)
      .select("url", "visit", "due_sec")
      .as[(String, Long, Double)].collect().toSet
    assert(sched == Set(("http://h/1", 1L, 0.0), ("http://h/2", 2L, 3.0),
      ("http://x/1", 1L, 0.0)))
  }

  test("parseSitemap: urlset + index, sparse lastmod stays aligned") {
    val urlset =
      """<?xml version="1.0"?><urlset>
        |<url><loc> http://h/a </loc><lastmod>2024-01-01</lastmod></url>
        |<url><loc>http://h/b</loc></url>
        |<url><lastmod>2024-09-09</lastmod></url>
        |</urlset>""".stripMargin
    val index = "<sitemapindex><sitemap><loc>http://h/sm2.xml</loc>" +
      "</sitemap></sitemapindex>"
    val out = Robots.parseSitemap(
        Seq(("sm1", urlset), ("sm2", index), ("sm3", "not xml"))
          .toDF("u", "b"), "u", "b")
      .as[(String, Long, String, String, Long)].collect().toSet
    assert(out == Set(
      ("sm1", 0L, "http://h/a", "2024-01-01", 0L),
      ("sm1", 1L, "http://h/b", "", 0L), // no lastmod: empty, aligned
      // the loc-less third block drops; sm3 has no blocks at all
      ("sm2", 0L, "http://h/sm2.xml", "", 1L)))
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
  test("metaDirectiveColumns: orders, case, none, token-exact") {
    import org.apache.spark.sql.functions.col
    val pages = Seq(
      (0L, "<meta charset=\"utf-8\"><p>plain"),
      (1L, "<meta name=\"robots\" content=\"noindex\"><p>x"),
      (2L, "<meta name=\"ROBOTS\" content=\"NoFollow, noarchive\">"),
      (3L, "<meta content=\"none\" name=\"robots\">"),
      (4L, "<meta name=\"viewport\" content=\"noindex\">"),
      (5L, "<meta name='robots' content='noindexing, follow'>"),
      (6L, "<title>t</title><meta name=robots content=nofollow>")
    ).toDF("id", "page")
    val out = pages.select(
        col("id") +: Robots.metaDirectiveColumns(col("page")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("meta_noindex"), r.getAs[Long]("meta_nofollow"),
          r.getAs[Long]("index_ok"), r.getAs[Long]("follow_ok"))).toMap
    assert(out(0L) == ((0L, 0L, 1L, 1L)))       // no robots meta
    assert(out(1L) == ((1L, 0L, 0L, 1L)))       // noindex only
    assert(out(2L) == ((0L, 1L, 1L, 0L)))       // cased NoFollow
    assert(out(3L) == ((1L, 1L, 0L, 0L)))       // content-first 'none'
    assert(out(4L) == ((0L, 0L, 1L, 1L)))       // wrong meta name
    assert(out(5L) == ((0L, 0L, 1L, 1L)))       // 'noindexing' != noindex
    assert(out(6L) == ((0L, 1L, 1L, 0L)))       // unquoted attrs
    // NULL html: no robots meta exists — indexable AND followable, not
    // the inconsistent all-zeros a bare SQL-NULL flag would produce
    // (the Suricata null-guard class)
    val nullOut = Seq((9L, Option.empty[String])).toDF("id", "page")
      .select(col("id") +: Robots.metaDirectiveColumns(col("page")): _*)
      .collect().head
    assert((nullOut.getAs[Long]("meta_noindex"),
      nullOut.getAs[Long]("meta_nofollow"),
      nullOut.getAs[Long]("index_ok"),
      nullOut.getAs[Long]("follow_ok")) == ((0L, 0L, 1L, 1L)))
  }

  test("detectTraps: runs, depth, params, reasons — crafted verdicts") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val urls = Seq(
      "https://h/a/a/a/p",              // run 3 → loop
      "https://h/a/b/a/b",              // alternating → run 1, depth 4
      "https://h/x?k=1&k=2&k=3",        // 3 params > 2
      "https://h/one",                  // benign single segment
      "https://h/a/b/c/d/e",            // depth 5 > 4
      "https://h/").toDF("url")
    val out = graft.operators.Robots.detectTraps(urls, "url",
        maxDepth = 4, maxSegmentRun = 2, maxParams = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5),
          r.getString(6))).toMap
    assert(out("https://h/a/a/a/p") == ((4L, 3L, 0L, 1L, "loop")))
    assert(out("https://h/a/b/a/b") == ((4L, 1L, 0L, 0L, "")))
    assert(out("https://h/x?k=1&k=2&k=3") == ((1L, 1L, 3L, 1L, "params")))
    assert(out("https://h/one") == ((1L, 1L, 0L, 0L, "")))
    assert(out("https://h/a/b/c/d/e") == ((5L, 1L, 0L, 1L, "depth")))
    assert(out("https://h/") == ((0L, 0L, 0L, 0L, "")))
    // imperfectly normalized frontiers: protocol-relative and relative
    // URLs still expose their loops instead of scoring depth 0
    val messy = Seq("//host/cal/cal/cal/x", "/cal/cal/cal/x")
      .toDF("url")
    val m = graft.operators.Robots.detectTraps(messy, "url",
        maxDepth = 10, maxSegmentRun = 2, maxParams = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(6))).toMap
    assert(m("//host/cal/cal/cal/x") == ((4L, 3L, "loop")))
    assert(m("/cal/cal/cal/x") == ((4L, 3L, "loop")))
  }
}
