package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

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

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ip_to_long" -> (e => IpToLong(e.head)),
    "simhash64" -> (e => SimHash64(e.head)),
    "minhash_sig" -> (e => MinHashSig(e.head, e(1))),
    "dot_d" -> (e => DotProductD(e.head, e(1))),
    "winnow_fp" -> (e => WinnowFingerprints(e.head))
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
