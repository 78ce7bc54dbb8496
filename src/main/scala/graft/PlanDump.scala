package graft

/** Optimization-round tooling: dump `.explain("formatted")` plus an
  * isolated noop-sink timing for a list of declared gates.
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <gate>[,<gate>...]"
  *
  * Writes `<outDir>/<gate>_<suffix>.txt` per gate (the plan the judge
  * checks claims against) and prints one `[plandump] <gate> <sec>` line
  * per gate (min of two noop-materialized runs, same methodology as the
  * bench sweep). Reads the data dir from SPARK_GRAFT_SF_DIR like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <gate>[,<gate>...] [--no-time]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val time = !args.contains("--no-time")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.localSession("graft-plandump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try {
      // same warm-up as the bench sweep so timings are comparable
      if (time)
        try SparkEntry.queries("entries_rrname")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      names.foreach { name =>
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown gate: $name"))
        def runOnce(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        // first run BEFORE plan construction: for gates that memoize a
        // shared fixture (memoDf/prebuiltArtifact), the first invocation
        // pays the build exactly like the sweep's first run — report it
        // separately from the steady-state min-of-two
        val first = if (time) runOnce() else -1.0
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          outDir.resolve(s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8")): Unit
        if (time) {
          val sec = math.min(runOnce(), runOnce())
          println(f"[plandump] $name first=$first%.3f steady=$sec%.3f")
        } else println(s"[plandump] $name plan-only")
      }
    } finally spark.stop()
  }
}
