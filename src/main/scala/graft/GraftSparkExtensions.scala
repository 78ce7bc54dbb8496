package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.IndexRouting

/** `spark.sql.extensions`-style registration of graft's Catalyst rules:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftSparkExtensions")
  *   ...
  * IndexRouting.install(spark, "/path/to/store")  // register stores
  * }}}
  *
  * (The rule is also auto-attached by `IndexRouting.install` via
  * `experimental.extraOptimizations` for sessions built without the
  * config.)
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(IndexRouting(_))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("ip_to_long"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[org.apache.spark.sql.graft.IpToLong].getName, "ip_to_long"),
        (e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          org.apache.spark.sql.graft.IpToLong(e.head)))
  }
}
