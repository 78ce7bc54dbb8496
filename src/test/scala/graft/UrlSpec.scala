package graft

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Url

/** URL canonicalization rules, case by case. */
class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Url.normalize(col("u"))).as[String]
      .collect().head

  test("host/scheme lowercase; path case preserved") {
    assert(norm("HTTP://WWW.Example.COM/Docs/A") ==
      "http://www.example.com/Docs/A")
  }

  test("default ports stripped only for the matching scheme") {
    assert(norm("http://a.com:80/x") == "http://a.com/x")
    assert(norm("https://a.com:443/x") == "https://a.com/x")
    assert(norm("https://a.com:80/x") == "https://a.com:80/x")
    assert(norm("ftp://a.com:80/x") == "ftp://a.com:80/x")
    assert(norm("http://a.com:8080/x") == "http://a.com:8080/x")
  }

  test("fragment dropped; query sorted; empty query elided") {
    assert(norm("http://a.com/x?b=2&a=1#frag") == "http://a.com/x?a=1&b=2")
    assert(norm("http://a.com/x#frag") == "http://a.com/x")
    assert(norm("http://a.com/x?") == "http://a.com/x")
  }

  test("slashes: collapse duplicates, strip one trailing, root kept") {
    assert(norm("http://a.com//x///y/") == "http://a.com/x/y")
    assert(norm("http://a.com/") == "http://a.com/")
    assert(norm("http://a.com") == "http://a.com/")
  }

  test("no scheme: only fragment/query rules apply") {
    assert(norm("foo/Bar?b=1&a=2#x") == "foo/Bar?a=2&b=1")
    assert(norm("plain") == "plain")
  }

  test("userinfo: case preserved, host after it still normalized") {
    assert(norm("http://SessionToken@A.COM:80/x") ==
      "http://SessionToken@a.com/x")
    assert(norm("http://SessionToken@a.com/x") !=
      norm("http://sessiontoken@a.com/x")) // distinct credentials stay distinct
  }

  test("domainOf: last two host labels; userinfo and port ignored") {
    val d = Seq("http://www.a.Example.COM:80/x", "https://example.com/",
        "http://u.x@Example.com:8080/y")
      .toDF("u").select(Url.domainOf(col("u"))).as[String].collect().toSeq
    assert(d == Seq("example.com", "example.com", "example.com"))
  }

  test("domainOf: single-label and IP-literal hosts keep the full host") {
    val d = Seq("http://localhost/x", "http://u@LocalHost:8080/y",
        "http://10.1.2.3/x", "http://10.1.2.3:8080/x",
        "https://[2001:DB8::7]:443/p", "http://intranet/")
      .toDF("u").select(Url.domainOf(col("u"))).as[String].collect().toSeq
    assert(d == Seq("localhost", "localhost", "10.1.2.3", "10.1.2.3",
      "[2001:db8::7]", "intranet"))
  }

  test("resolve: RFC 3986 reference resolution, null on junk, codegen") {
    val base = "http://h.example/a/b/page.html"
    def r(href: String): Option[String] =
      Seq((base, href)).toDF("b", "h")
        .select(Url.resolve(col("b"), col("h")))
        .collect().headOption.flatMap(row =>
          if (row.isNullAt(0)) None else Some(row.getString(0)))
    assert(r("c.html").contains("http://h.example/a/b/c.html"))
    assert(r("../../up.html").contains("http://h.example/up.html"))
    assert(r("/root").contains("http://h.example/root"))
    assert(r("//m.example/x").contains("http://m.example/x"))
    assert(r("https://abs/y").contains("https://abs/y"))
    // fragments drop from the RESULT (a frontier never keys on them)
    assert(r("c.html#sec").contains("http://h.example/a/b/c.html"))
    assert(r("#sec").contains(base))
    // unparsable href -> null, not an exception
    assert(r("with space").isEmpty)
    assert(r("http://[broken").isEmpty)
    // stays inside whole-stage codegen
    val plan = spark.range(1)
      .select(Url.resolve(lit(base), col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  private def reg(h: String): Option[String] =
    Seq(h).toDF("h").select(Url.registeredDomain(col("h")))
      .collect().headOption.flatMap(row =>
        if (row.isNullAt(0)) None else Some(row.getString(0)))

  test("registeredDomain: PSL exact, wildcard, exception branches") {
    assert(reg("example.com").contains("example.com"))
    assert(reg("a.b.example.com").contains("example.com"))
    assert(reg("x.example.co.uk").contains("example.co.uk"))
    // wildcard *.ck: the * consumes one real label
    assert(reg("foo.bar.ck").contains("foo.bar.ck"))
    assert(reg("bar.ck").isEmpty) // bar.ck IS the public suffix
    // exception !www.ck carves the registrable back out
    assert(reg("www.ck").contains("www.ck"))
    assert(reg("deep.x.www.ck").contains("www.ck"))
    // unlisted TLD falls under the implicit * rule
    assert(reg("example.zz").contains("example.zz"))
    assert(reg("zz").isEmpty)
    // a public suffix itself has nothing registrable
    assert(reg("co.uk").isEmpty)
    assert(reg("uk").isEmpty)
    // *.kobe.jp wildcard vs its !city.kobe.jp exception
    assert(reg("a.b.kobe.jp").contains("a.b.kobe.jp"))
    assert(reg("kobe.jp").contains("kobe.jp")) // * needs a label
    assert(reg("x.city.kobe.jp").contains("city.kobe.jp"))
    // tolerance: case, one trailing dot; malformed -> null
    assert(reg("A.Example.COM.").contains("example.com"))
    assert(reg("a..com").isEmpty)
    assert(reg(".com").isEmpty)
  }

  test("registeredDomain codegen + domainKey fallbacks") {
    val plan = spark.range(1)
      .select(Url.registeredDomain(col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    def key(u: String): String =
      Seq(u).toDF("u").select(Url.domainKey(col("u"))).as[String]
        .collect().head
    assert(key("http://a.b.example.co.uk/x") == "example.co.uk")
    // IP literals, single-label and suffix-only hosts keep the host
    assert(key("http://10.1.2.3/x") == "10.1.2.3")
    assert(key("http://localhost/x") == "localhost")
    assert(key("https://co.uk/x") == "co.uk")
  }

  private def surt(u: String): Option[String] =
    Seq(u).toDF("u").select(Url.surt(col("u")))
      .collect().headOption.flatMap(row =>
        if (row.isNullAt(0)) None else Some(row.getString(0)))

  test("surt: reversed labels, ports, query sort, null without scheme") {
    assert(surt("HTTPS://User@WWW.Example.COM:443//A//b/?z=2&a=1#f")
      .contains("com,example,www)/A/b?a=1&z=2"))
    assert(surt("http://x.y:8080/p").contains("y,x:8080)/p"))
    assert(surt("https://a.b").contains("b,a)/"))
    assert(surt("http://10.1.2.3/x").contains("3,2,1,10)/x"))
    assert(surt("no scheme here").isEmpty)
    // keys under one domain are a contiguous sorted range: every
    // subdomain key has the parent's reversed labels as its prefix
    val ks = Seq("http://example.com/", "http://a.example.com/",
      "http://b.a.example.com/").flatMap(surt)
    assert(ks.forall(_.startsWith("com,example")))
  }
}
