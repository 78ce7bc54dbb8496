package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for graft's native expressions, so `spark.sql` users
  * get the same codegen'd functions the Scala API uses:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT ip_to_long(rdata) FROM obs")
  * spark.sql("SELECT simhash64(text), minhash_sig(shingles, 16) FROM docs")
  * }}}
  */
object GraftFunctions {

  // arity is validated here: a wrong argument count must surface as an
  // analysis-time error naming the function, not a raw
  // IndexOutOfBoundsException — and extra arguments must never be
  // silently ignored (a `winnow_fp(text, 7, 9)` that quietly used the
  // defaults would compute wrong fingerprints with no signal)
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    e =>
      if (e.length == n) build(e)
      else throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${e.length}")

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ip_to_long" -> arity("ip_to_long", 1)(e => IpToLong(e.head)),
    "ipv6_to_hex" -> arity("ipv6_to_hex", 1)(e => Ipv6ToHex(e.head)),
    "simhash64" -> arity("simhash64", 1)(e => SimHash64(e.head)),
    "minhash_sig" -> arity("minhash_sig", 2)(e => MinHashSig(e.head, e(1))),
    "dot_d" -> arity("dot_d", 2)(e => DotProductD(e.head, e(1))),
    "winnow_fp" -> arity("winnow_fp", 1)(e => WinnowFingerprints(e.head)),
    // aggregate: the analyzer wraps a bare AggregateFunction in an
    // AggregateExpression like it does for built-in registrations
    "kmv_distinct" -> arity("kmv_distinct", 2)(e => KmvDistinct(e.head,
      e(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"kmv_distinct: k must be an integer literal, got $other")
      }))
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
