package graft

import org.apache.spark.sql.functions._

/** Scale-stress lab (not part of the driver contract): multiplies the
  * sf0.1 observation stream `xN` with key perturbation (so cardinality
  * grows with volume, like real sensor data) and measures store build,
  * incremental merge and point-lookup latency at the larger size — the
  * local evidence for "does the bucketed-dual-store design degrade
  * linearly or fall off a cliff".
  *
  *   SPARK_GRAFT_SCALE_X=10 sbt "runMain graft.BenchScale"
  *
  * Expected shape (and what round-3 measured at x10 / 6M observations):
  * build scales ~linearly with volume (shuffle + sort dominated), merge
  * stays touched-buckets-only, and point-lookup latency is FLAT — the
  * whole point of bucket pruning: a query scans one bucket directory
  * whose size grows 10×, but row-group min/max skipping keeps the read
  * bounded by the matching rows, not the bucket. */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.localSession("graft-bench-scale", "32")
    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString

    val base = Graft.observations(spark, sfDir)
      .withColumnRenamed("ts", "timestamp_start")
      .withColumn("timestamp_end", col("timestamp_start"))
    val scaled = base.crossJoin(
        spark.range(mult).select(col("id").as("rep")))
      .select(
        concat(col("rrname"), lit("."), col("rep")).as("rrname"),
        col("sensor_id"),
        col("rrtype"),
        concat(col("rdata"), lit("-"), col("rep")).as("rdata"),
        col("count"),
        col("timestamp_start"), col("timestamp_end"))
    val nRows = scaled.count()

    val t0 = System.nanoTime()
    operators.ObservationStore.writeDual(
      operators.ObservationStore.aggregate(scaled), s"$dir/store")
    val buildSec = (System.nanoTime() - t0) / 1e9

    // ~1% batch, localized keys (the realistic merge profile)
    val batch = scaled.filter(pmod(xxhash64(col("rdata")), lit(100)) === 0)
    val t1 = System.nanoTime()
    operators.ObservationStore.mergeBatch(spark, s"$dir/store", batch)
    val mergeSec = (System.nanoTime() - t1) / 1e9

    // load AFTER the merge: dynamic overwrite rewrites touched bucket
    // files, so an earlier handle's file index would be stale
    val store = operators.ObservationStore.load(spark, s"$dir/store")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val t2 = System.nanoTime()
    val lookups = 100
    (1 to lookups).foreach { i =>
      store.entries(rdata = Some(s"$i-0")).collect(): Unit
    }
    val qps = lookups / ((System.nanoTime() - t2) / 1e9)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    println(s"""{"metric":"scale_x$mult","rows":$nRows,"build_sec":$buildSec,"merge_1pct_sec":$mergeSec,"point_lookup_qps":$qps}""")
    spark.stop()
  }
}
