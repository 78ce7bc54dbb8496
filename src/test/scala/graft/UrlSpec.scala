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
}
