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
  * Bucket count follows the store sizing contract — buckets scale with
  * volume so rows-per-bucket stays constant (64 per 600k observations
  * here; a real deployment picks total/target-bucket-size exactly like
  * choosing output file counts).
  *
  * Round-3 measurements (sf0.1 base, local[32], sequential lookups,
  * after writeDual learned to pay the aggregation shuffle once):
  *   x1  /  600k rows /   64 buckets: build  5.9 s, merge  6.3 s, ~15 qps
  *   x10 /    6M rows /  640 buckets: build 29.2 s, merge 16.6 s, 13.2 qps
  *   x30 /   18M rows / 1920 buckets: build 72.2 s, merge 37.5 s, 15.5 qps
  *   x10 /    6M rows /   64 buckets (contract violated):       12.4 qps
  * i.e. build sub-linear per-row (shuffle+sort dominated), merge ~linear
  * in BATCH size (touched-buckets-only), and pruned point-lookup latency
  * is FLAT across a 30× corpus-size range when rows-per-bucket is held
  * constant — it tracks BUCKET size, not corpus size, which is the
  * property this harness exists to demonstrate. (Sequential qps here is
  * planner-overhead-bound and lower than graft.Bench's concurrent-worker
  * qps by design.) */
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

    // sizing contract: rows-per-bucket constant, so buckets scale with
    // the multiplier (64 at x1)
    val buckets = 64 * mult
    val t0 = System.nanoTime()
    operators.ObservationStore.writeDual(
      operators.ObservationStore.aggregate(scaled), s"$dir/store",
      numBuckets = buckets)
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

    println(s"""{"metric":"scale_x$mult","rows":$nRows,"buckets":$buckets,"build_sec":$buildSec,"merge_1pct_sec":$mergeSec,"point_lookup_qps":$qps}""")
    spark.stop()
  }
}
