package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per round against
  * `SPARK_GRAFT_SF_DIR` (sf0.1) and reads the single JSON line.
  *
  * Each query is fully materialized through the `noop` datasource (no
  * column pruning shortcut like `.count()` would take, no driver collect
  * bottleneck), timed after one untimed warm-up of the session (JIT +
  * codegen + parquet footer reads are not what we're grading).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Graft.localSession("graft-bench", "32")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Warm the session (parquet footers, codegen, JIT) on one mid-size query.
    try runOnce("entries_rrname") catch { case _: Throwable => () }

    val results: Seq[(String, Double)] =
      SparkEntry.queries.keys.toSeq.sorted.map { name =>
        val sec =
          try runOnce(name)
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
          }
        name -> sec
      }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
