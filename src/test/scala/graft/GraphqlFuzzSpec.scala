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
}
