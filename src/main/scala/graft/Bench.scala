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

    // Local-iteration aid (the driver never sets this): run only the
    // comma-separated query names in SPARK_GRAFT_ONLY.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results: Seq[(String, Double)] =
      SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n))).map { name =>
        val sec =
          try runOnce(name)
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
          }
        name -> sec
      }

    // Reference bench-harness shape (SURVEY.md Q10: concurrent point
    // lookups, 5 workers — cmd/balboa/cmds/bench.go): build the dual
    // store once from this SF's observations, then hammer point queries.
    val (buildSec, qps, wideQps, cachedQps, mergeSec, tcpQps) =
      try benchPointLookups(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] point-lookups failed: ${e.getMessage}")
        (-1.0, -1.0, -1.0, -1.0, -1.0, -1.0)
      }
    val decodeRate =
      try benchDecodeRate(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] decode-rate failed: ${e.getMessage}")
        -1.0
      }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir","store_build_sec":$buildSec,"point_lookup_qps":$qps,"point_lookup_qps_16w":$wideQps,"point_lookup_qps_cached":$cachedQps,"merge_batch_sec":$mergeSec,"decode_rows_per_sec":$decodeRate,"tcp_query_qps":$tcpQps}""")
    spark.stop()
  }

  /** True decoder throughput: payloads pre-materialized (generation cost
    * excluded), then one timed decode pass — the 100 TB ingest number. */
  private def benchDecodeRate(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-dec").toString
    val li = Graft.table(spark, sfDir, "lineitem")
      .repartition(spark.sparkContext.defaultParallelism)
    li.select(
      to_json(struct(
        concat(lit("part-"), col("l_partkey")).as("q"),
        col("l_returnflag").as("qtype"),
        concat(lit("o"), col("l_orderkey")).as("a"),
        col("l_returnflag").as("atype"),
        concat(date_format(col("l_shipdate").cast("timestamp_ltz"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS xx"), lit(" UTC")).as("tstamp"))).as("value"),
      lit("bench").as("sensor_id"))
      .write.mode("overwrite").parquet(dir)
    val payloads = spark.read.parquet(dir)
    val n = payloads.count()
    val t0 = System.nanoTime()
    sources.Decoders.gopassivedns(payloads)
      .write.mode("overwrite").format("noop").save()
    n / ((System.nanoTime() - t0) / 1e9)
  }

  /** Build the bucketed dual store, then run 200 rdata point queries on 5
    * concurrent workers (the reference's bench workload shape), against
    * the parquet store and again with both copies cached. Measured
    * result: the PRUNED parquet path wins (one bucket dir = 1-2 tasks per
    * query) over the naive cache (InMemoryRelation loses partition
    * pruning — every lookup scans all cached partitions, batch-stats
    * skipping notwithstanding). Both numbers are reported to keep that
    * trade-off visible. */
  private def benchPointLookups(spark: SparkSession,
      sfDir: String): (Double, Double, Double, Double, Double, Double) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-store").toString
    val t0 = System.nanoTime()
    operators.ObservationStore.writeDual(
      operators.ObservationStore.aggregate(Graft.observations(spark, sfDir)),
      dir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val store = operators.ObservationStore.load(spark, dir)

    def run(n: Int, workers: Int = 5): Double = {
      val t1 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
      try {
        val tasks = (1 to n).map { i =>
          pool.submit(new Runnable {
            def run(): Unit =
              store.entries(rdata = Some(i.toString)).collect(): Unit
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
      n / ((System.nanoTime() - t1) / 1e9)
    }

    // Serving config for the point-query path (measured in BenchPoints):
    // AQE buys nothing for a single-stage pre-pruned scan but costs
    // per-query driver planning — ~1.5× qps when off. Restored after, so
    // the analytics sweep keeps adaptive execution.
    // try/finally: a failure mid-phase must not leave AQE off for the
    // whole subsequent analytics sweep
    val (coldQps, wideQps, cachedQps) =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val cold = run(200)
        // capacity at 16 workers: per-query latency is driver-scheduling
        // bound (~10 ms floor in local mode), so throughput scales with
        // concurrent clients under FAIR — the serving-capacity number
        val wide = run(200, workers = 16)
        store.cache()
        store.totalCount() // materialize the cache
        val cached = run(200)
        store.unpersist()
        (cold, wide, cached)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    // The same 200-query workload through the NATIVE TCP protocol
    // (serve.BalboaTcpServer) over real sockets — full msgpack encode/
    // decode both directions plus a fresh connection per query: the
    // number a live balboa frontend would see using graft as a drop-in
    // backend.
    val tcpQps = {
      val srv = new serve.BalboaTcpServer(store)
      srv.start()
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val n = 200
          val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
          val t1 = System.nanoTime()
          try {
            val tasks = (1 to n).map { i =>
              pool.submit(new Runnable {
                def run(): Unit = {
                  val sock = new java.net.Socket("localhost", srv.boundPort)
                  try {
                    sock.getOutputStream.write(
                      serve.BalboaTcp.encodeQueryRequest(
                        serve.BalboaTcp.QueryRequest(None, Some(i.toString),
                          None, None, 1000)))
                    sock.getOutputStream.flush()
                    val rd = new serve.BalboaTcp.MsgReader(
                      new java.io.DataInputStream(
                        new java.io.BufferedInputStream(sock.getInputStream)))
                    var done = false
                    while (!done) {
                      val (t, _) = rd.readTyped()
                      if (t == serve.BalboaTcp.TypeQueryStreamEndResponse ||
                        t == serve.BalboaTcp.TypeErrorResponse) done = true
                    }
                  } finally sock.close()
                }
              })
            }
            tasks.foreach(_.get())
          } finally pool.shutdown()
          n / ((System.nanoTime() - t1) / 1e9)
        } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      } finally srv.stop()
    }

    // incremental maintenance: merge a ~10% batch, touched-buckets only
    val batch = Graft.observations(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("rdata").cast("long") % 10 === 0)
      .withColumnRenamed("ts", "timestamp_start")
      .withColumn("timestamp_end",
        org.apache.spark.sql.functions.col("timestamp_start"))
    val t2 = System.nanoTime()
    operators.ObservationStore.mergeBatch(spark, dir, batch)
    val mergeSec = (System.nanoTime() - t2) / 1e9
    (buildSec, coldQps, wideQps, cachedQps, mergeSec, tcpQps)
  }
}
