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
