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
  * spark.sql("SELECT ip_to_long(rdata) FROM obs")
  * spark.sql("SELECT simhash64(text), minhash_sig(shingles, 16) FROM docs")
  * spark.sql("SELECT kmv_distinct(rdata, 256) FROM obs")
  * spark.sql("SELECT multi_pattern_counts(text, array('leak','breach'))")
  * spark.sql("SELECT top_k_pairs(score, id, 10) FROM t GROUP BY k")
  * }}}
  *
  * Registered per-session so an EXISTING session — a notebook, a
  * thriftserver session — can opt in without a rebuild; the
  * `spark.sql.extensions` config path ([[graft.GraftSparkExtensions]])
  * injects the same set at build time. STATE parameters (k, d/w,
  * pattern lists, largest) must be foldable literals — they size
  * operator state, not per-row input. */
object GraftFunctions {

  // arity is validated here: a wrong argument count must surface as an
  // analysis-time error naming the function, not a raw
  // IndexOutOfBoundsException — and extra arguments must never be
  // silently ignored (a `winnow_fp(text, 7, 9)` that quietly used the
  // defaults would compute wrong fingerprints with no signal)
  private def arity(name: String, min: Int, max: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    e =>
      if (e.length >= min && e.length <= max) build(e)
      else throw new IllegalArgumentException(
        s"$name expects $min${if (max > min) s"..$max" else ""} " +
          s"argument(s), got ${e.length}")

  // eval() results are null-checked: a foldable NULL (e.g.
  // `kmv_distinct(x, CAST(NULL AS INT))`) passes the foldable require
  // and must surface as the same clear analysis error as a wrong type,
  // not a raw NullPointerException from the cast.
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a non-null integer literal, got $other")
    }
  }

  private def litBool(e: Expression, what: String): Boolean = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a non-null boolean literal, got $other")
    }
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

  /** (name, builder) for every SQL-exposed graft function; aggregates
    * register like built-ins (the analyzer wraps the bare
    * AggregateFunction in an AggregateExpression). */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ip_to_long" -> arity("ip_to_long", 1, 1)(e => IpToLong(e.head)),
    "ipv6_to_hex" -> arity("ipv6_to_hex", 1, 1)(e => Ipv6ToHex(e.head)),
    "simhash64" -> arity("simhash64", 1, 1)(e => SimHash64(e.head)),
    "nfc_normalize" -> arity("nfc_normalize", 1, 1)(e =>
      NfcNormalize(e.head)),
    "fix_mojibake" -> arity("fix_mojibake", 1, 1)(e =>
      FixMojibake(e.head)),
    "resolve_url" -> arity("resolve_url", 2, 2)(e =>
      ResolveUrl(e.head, e(1))),
    "minhash_sig" -> arity("minhash_sig", 2, 2)(e =>
      MinHashSig(e.head, e(1))),
    "dot_d" -> arity("dot_d", 2, 2)(e => DotProductD(e.head, e(1))),
    "winnow_fp" -> arity("winnow_fp", 1, 1)(e =>
      WinnowFingerprints(e.head)),
    "multi_pattern_counts" -> arity("multi_pattern_counts", 2, 2)(e =>
      MultiPatternCounts(e.head, litStrings(e(1), "patterns"))),
    "multi_pattern_redact" -> arity("multi_pattern_redact", 2, 2)(e =>
      MultiPatternRedact(e.head, litStrings(e(1), "patterns"))),
    "kmv_distinct" -> arity("kmv_distinct", 1, 2)(e => KmvDistinct(e.head,
      if (e.size > 1) litInt(e(1), "k") else 256)),
    "kmv_sketch" -> arity("kmv_sketch", 1, 2)(e => KmvSketch(e.head,
      if (e.size > 1) litInt(e(1), "k") else 256)),
    "top_k_pairs" -> arity("top_k_pairs", 3, 4)(e =>
      TopKPairs(e.head, e(1), litInt(e(2), "k"),
        if (e.size > 3) litBool(e(3), "largest") else true)),
    "cm_sketch" -> arity("cm_sketch", 1, 3)(e => CmSketch(e.head,
      if (e.size > 1) litInt(e(1), "d") else 4,
      if (e.size > 2) litInt(e(2), "w") else 512)),
    // COMPOSED functions (round 9): built from stock expressions via the
    // public Column API, registered so the SQL face covers the whole
    // text-ingest chain — the GraftShims round-trip turns the Column
    // composition into the Expression tree the registry needs.
    "html_extract" -> arity("html_extract", 1, 1)(e => composed(e.head,
      c => graft.operators.TextAnalysis.htmlExtract(c))),
    "html_title" -> arity("html_title", 1, 1)(e => composed(e.head,
      c => graft.operators.TextAnalysis.htmlTitle(c))),
    "url_host" -> arity("url_host", 1, 1)(e => composed(e.head,
      c => graft.operators.Robots.urlHost(c))),
    "url_path" -> arity("url_path", 1, 1)(e => composed(e.head,
      c => graft.operators.Robots.urlPath(c))),
    "double_sortable_bits" -> arity("double_sortable_bits", 1, 1)(e =>
      DoubleSortableBits(e.head)),
    "sortable_bits_to_double" -> arity("sortable_bits_to_double", 1, 1)(e =>
      SortableBitsToDouble(e.head)))

  /** Column-composition → Expression bridge for registry builders. */
  private def composed(e: Expression,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.GraftShims.expression(
      f(org.apache.spark.sql.GraftShims.column(e)))

  /** Register every graft function into an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** The same set for `SparkSessionExtensions.injectFunction`. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    builders.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
    }
}
