package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.serve.Graphql

/** The GraphQL parser must map ANY input to a parse result or a client
  * error — never an exception (which the HTTP layer would surface as a
  * 500). Fuzzed over random strings plus structured near-miss queries. */
class GraphqlFuzzSpec extends AnyFunSuite {

  private def neverThrows(q: String): Boolean =
    try { Graphql.parse(q); true }
    catch { case _: Throwable => false }

  private def substitutionNeverThrows(q: String): Boolean =
    try {
      Graphql.substituteVariables(q,
        Some(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree("""{"n": "x\")breakout", "l": 7, "b": true}""")))
        .foreach(s => Graphql.parse(s))
      true
    } catch { case _: Throwable => false }

  test("parser never throws on arbitrary input") {
    val structured = for {
      field <- Gen.oneOf("entries", "stats", "entriesX", "", "__schema")
      arg <- Gen.oneOf("rrname: \"a\"", "rrtype: FOO", "limit: 99999999999999",
        "limit: -1", "rdata:", "{{{", "rrname: \"unterminated")
      sel <- Gen.oneOf("{ rrname }", "{ aliases { rrname } }", "{}", "{",
        "", "{ aliases(limit: x) { a } }")
    } yield s"{ $field($arg) $sel }"
    val garbage = Gen.oneOf(Gen.asciiPrintableStr, Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf('{', '}', '(', ')', '"', '\\', '\n'))
        .map(_.mkString))
    val p = Prop.forAll(Gen.oneOf(structured, garbage))(q => neverThrows(q))
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("the round-4 grammar (variables, fragments, multi-root) never throws") {
    val structured = for {
      header <- Gen.oneOf("", "query", "query Q($n: String!, $l: Int = 5)",
        "query ($n:", "query Q($n String)")
      frag <- Gen.oneOf("", "fragment f on Entry { rrname }",
        "fragment f on Entry { ...g } fragment g on Entry { ...f }",
        "fragment f on", "fragment f on Entry {")
      body <- Gen.oneOf(
        "{ entries(rrname: $n, limit: $l) { ...f } }",
        "{ a: entries(rrname: $n) { rrname } b: stats { total_count } }",
        "{ entries(rrname: \"x\") { ... on Entry { rrname } } }",
        "{ ...f }", "{ entries(rrname: $missing) { rrname } }",
        "{ a: a: entries(rrname: \"x\") { rrname } }",
        "{ entries(rrname: \"$n\") { rrname } }", // $ inside string stays
        "{ ... }", "{ ...  on { } }")
    } yield s"$header $body $frag"
    val p = Prop.forAll(structured)(q =>
      neverThrows(q) && substitutionNeverThrows(q))
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("documents with random directives never throw") {
    val dir = Gen.oneOf("@skip(if: true)", "@skip(if: false)",
      "@include(if: true)", "@include(if: false)", "@skip", "@skip(if:)",
      "@skip(if: $b)", "@nope(if: true)", "@", "@skip(", "@include(if true)")
    val structured = for {
      d1 <- dir; d2 <- dir; d3 <- dir
      body <- Gen.oneOf(
        s"{ entries(rrname: \"x\") $d1 { rrname $d2 count } }",
        s"{ entries(rrname: \"x\") { ...f $d1 } } fragment f on Entry { rrname $d2 }",
        s"{ entries(rrname: \"x\") { ... on Entry $d1 { rrname } } }",
        s"{ entries(rrname: \"@skip(if: true)\") { rrname $d1 } }", // @ in string = data
        s"{ stats $d1 { total_count $d2 } entries(rrname: \"x\") $d3 { rrname } }",
        s"{ entries(rrname: \"x\") { aliases $d1 { rrname } rrname } }",
        s"$d1 { entries(rrname: \"x\") { rrname } }")
    } yield body
    val p = Prop.forAll(structured)(q =>
      neverThrows(q) && substitutionNeverThrows(q))
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }
}
