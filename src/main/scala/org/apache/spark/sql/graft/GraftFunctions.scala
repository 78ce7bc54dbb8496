package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** SQL registration for graft's custom expressions and aggregates — the
  * `spark.sql(...)` face of the Scala API, so a SQL-only user reaches
  * the same native operators:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT kmv_distinct(rdata, 256) FROM obs")
  * spark.sql("SELECT multi_pattern_counts(text, array('leak','breach'))")
  * spark.sql("SELECT top_k_pairs(score, id, 10) FROM t GROUP BY k")
  * }}}
  *
  * Registered per-session (temp functions) rather than via
  * `spark.sql.extensions` alone so an EXISTING session — a notebook, a
  * thriftserver session — can opt in without a rebuild; the
  * [[graft.GraftSparkExtensions]] config path registers the same set at
  * build time. Literal arguments (k, pattern lists, largest) must be
  * foldable — they parameterize operator STATE, not per-row input. */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def litBool(e: Expression, what: String): Boolean = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Boolean]
  }

  private def litStrings(e: Expression, what: String): Seq[String] = {
    require(e.foldable, s"$what must be a literal array of strings")
    e.eval() match {
      case a: ArrayData =>
        a.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq
      case other =>
        throw new IllegalArgumentException(
          s"$what: expected an array literal, got $other")
    }
  }

  /** (name, builder) for every SQL-exposed graft function. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ip_to_long" -> (e => IpToLong(e.head)),
    "ipv6_to_hex" -> (e => Ipv6ToHex(e.head)),
    "simhash64" -> (e => SimHash64(e.head)),
    "multi_pattern_counts" -> (e =>
      MultiPatternCounts(e.head, litStrings(e(1), "patterns"))),
    "kmv_distinct" -> (e => KmvDistinct(e.head,
      if (e.size > 1) litInt(e(1), "k") else 256)),
    "kmv_sketch" -> (e => KmvSketch(e.head,
      if (e.size > 1) litInt(e(1), "k") else 256)),
    "top_k_pairs" -> (e => TopKPairs(e.head, e(1), litInt(e(2), "k"),
      if (e.size > 3) litBool(e(3), "largest") else true)),
    "cm_sketch" -> (e => CmSketch(e.head,
      if (e.size > 1) litInt(e(1), "d") else 4,
      if (e.size > 2) litInt(e(2), "w") else 512)))

  /** Register every graft function into an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder)
    }

  /** The same set for `SparkSessionExtensions.injectFunction`. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    builders.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
    }
}
