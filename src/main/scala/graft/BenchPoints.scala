package graft

import org.apache.spark.sql.SparkSession

/** Point-lookup latency lab (not part of the driver contract): builds the
  * dual store once and measures concurrent rdata point queries under
  * different scheduler/planner configurations, to keep the serving-path
  * numbers honest. `graft.Bench` reports the headline figure; this main
  * exists so scheduler experiments don't need a full bench sweep.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchPoints"
  */
object BenchPoints {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Graft.configure(
      SparkSession.builder().appName("graft-points").master("local[32]")
        // FAIR lets the 5 concurrent lookups share the 32 cores instead
        // of queueing whole jobs FIFO — the analogue of the reference
        // backend's 64-thread connection pool
        .config("spark.scheduler.mode", "FAIR")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-points").toString
    operators.ObservationStore.writeDual(
      operators.ObservationStore.aggregate(Graft.observations(spark, sfDir)),
      dir)
    val store = operators.ObservationStore.load(spark, dir)

    def timed(n: Int, workers: Int)(q: Int => Unit): Double = {
      val t1 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
      try {
        (1 to n).map { i =>
          pool.submit(new Runnable { def run(): Unit = q(i) })
        }.foreach(_.get())
      } finally pool.shutdown()
      n / ((System.nanoTime() - t1) / 1e9)
    }
    def runPlan(n: Int, workers: Int): Double =
      timed(n, workers)(i =>
        store.entries(rdata = Some(i.toString)).collect(): Unit)
    def runServe(n: Int, workers: Int): Double =
      timed(n, workers)(i =>
        store.servePoint(rdata = Some(i.toString)).get: Unit)

    // serving fast path (PointReader): no Spark job, so planner config
    // is irrelevant — measured per worker count
    runServe(100, 5) // warm-up: footer parse JIT + fs metadata
    for (workers <- Seq(1, 5, 16)) {
      val qps = runServe(2000, workers)
      println(f"[points] path=serve workers=$workers%-3d qps=$qps%.1f")
    }

    // prefix seeks: the parallel bucket fan trades single-stream latency
    // for nothing under saturation (the pool is shared), so both ends
    // are what to watch
    def runPrefix(n: Int, workers: Int): Double =
      timed(n, workers)(i =>
        store.servePrefix(s"part-${100 + (i % 900)}").get: Unit)
    runPrefix(100, 5) // warm-up
    for (workers <- Seq(1, 5, 16)) {
      val qps = runPrefix(1000, workers)
      println(f"[points] path=prefix workers=$workers%-3d qps=$qps%.1f")
    }

    // GraphQL aliases workload: point-shaped parent + the per-entry
    // alias resolution — fast path (serveAliasRows: inverted point
    // lookups) vs the plan path (aliases self-join + collect per query)
    {
      def aliasQuery(i: Int): String =
        s"""{ entries(rrname: "part-$i") { rrname aliases { rrname } } }"""
      def run(i: Int): Unit =
        serve.Graphql.execute(aliasQuery(i), store): Unit
      timed(100, 5)(run) // warm
      val qps = timed(500, 5)(run)
      println(f"[points] path=alias-fast workers=5   qps=$qps%.1f")
      val planQps = timed(100, 5) { i =>
        val parents = store.entries(rrname = Some(s"part-$i"))
          .localCheckpoint(false)
        parents.collect(): Unit
        store.aliases(parents).collect(): Unit
      }
      println(f"[points] path=alias-plan workers=5   qps=$planQps%.1f")
    }

    runPlan(50, 5) // warm-up: codegen + footers
    for ((aqe, cg) <- Seq(("true", "true"), ("false", "true"),
        ("false", "false"))) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      for (workers <- Seq(5, 16)) {
        val qps = runPlan(200, workers)
        println(f"[points] path=plan aqe=$aqe%-5s codegen=$cg%-5s workers=$workers%-3d qps=$qps%.1f")
      }
    }
    spark.stop()
  }
}
