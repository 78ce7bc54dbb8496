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
    // the full SQL function surface (scalars + typed aggregates) —
    // same set GraftFunctions.register() puts on an existing session
    org.apache.spark.sql.graft.GraftFunctions.injectable
      .foreach(ext.injectFunction)
  }
}
