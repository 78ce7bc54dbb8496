package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) Catalyst expressions shipped by graft.
  *
  * These live under `org.apache.spark.sql` so they can use the
  * `private[sql]` pieces of the expression API (`AbstractDataType`,
  * `ExpectsInputTypes`) — the same access pattern any in-tree expression
  * uses. Only expressions on hot scan paths get this treatment; everything
  * else in graft is plain `org.apache.spark.sql.functions` composition.
  */

/** `ip_to_long(str)` — dotted-quad IPv4 → unsigned 32-bit value in a Long;
  * null for non-IPv4 input. Generated code calls the same static parser the
  * interpreted path uses, so the expression stays inside whole-stage
  * codegen (no UDF boxing) on the scan hot path.
  */
case class IpToLong(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_to_long"

  override def nullSafeEval(input: Any): Any = {
    val v = graft.functions.Net.ipv4ToLong(input.asInstanceOf[UTF8String])
    if (v < 0) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Net.ipv4ToLong($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): IpToLong =
    copy(child = newChild)
}

/** `simhash64(text)` — 64-bit SimHash of a whitespace-tokenized string,
  * rendered as a 64-char '0'/'1' string (portable across engines — no
  * int64/hex conversions needed for an oracle).
  *
  * Definition (content-derived, no RNG, reproducible anywhere with md5):
  * for each token, take md5 hex; nibble i = hexval(hex[i]), i = 0..15;
  * token bit b = (nibble[b/4] >> (b%4)) & 1; each token votes +1/-1 per
  * bit; fingerprint bit b = 1 iff the vote sum is > 0.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SimHash64.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graft.SimHash64.compute($c.toString()));
    """)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(text: String): String = {
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    val n = text.length
    while (start <= n) {
      val end0 = text.indexOf(' ', start)
      val end = if (end0 < 0) n else end0
      // split-on-space semantics incl. empty tokens, matching
      // split(text, ' ') in SQL engines
      val token = text.substring(start, end)
      val digest = md.digest(token.getBytes("UTF-8"))
      md.reset()
      var b = 0
      while (b < 64) {
        // nibble i corresponds to hex char i of the md5 string:
        // even i -> high nibble of byte i/2, odd i -> low nibble
        val byteV = digest(b / 8) & 0xff
        val nibble = if ((b / 4) % 2 == 0) byteV >> 4 else byteV & 0xf
        val bit = (nibble >> (b % 4)) & 1
        votes(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      if (end0 < 0) start = n + 1 else start = end + 1
    }
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < 64) {
      sb.append(if (votes(b) > 0) '1' else '0')
      b += 1
    }
    sb.toString
  }
}
