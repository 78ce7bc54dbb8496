package graft
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("probe", "32")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val q = graft.queries.DecoderQueries.queries("decode_gopassivedns")
    time("gopdns query run1")(noop(q(spark, "/root/testdata/sf0.1")))
    time("gopdns query run2")(noop(q(spark, "/root/testdata/sf0.1")))
    val li = Graft.table(spark, "/root/testdata/sf0.1", "lineitem")
      .repartition(32)
    val gen = li.select(
      to_json(struct(
        concat(lit("part-"), col("l_partkey")).as("q"),
        col("l_returnflag").as("qtype"),
        concat(lit("o"), col("l_orderkey")).as("a"),
        col("l_returnflag").as("atype"),
        concat(date_format(col("l_shipdate").cast("timestamp_ltz"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS xx"), lit(" UTC")).as("tstamp"))).as("value"),
      lit("gopdns").as("sensor_id"))
    time("gen only")(noop(gen))
    time("gen+decode fused")(noop(graft.sources.Decoders.gopassivedns(gen)))
    val tsOnly = gen.withColumn("j", from_json(col("value"), graft.sources.Decoders.gopassivednsSchema))
      .withColumn("ts", try_to_timestamp(regexp_replace(col("j.tstamp"), " [A-Z]+$", ""),
        lit("yyyy-MM-dd HH:mm:ss[.SSSSSS] xx")))
    time("gen+parse+tsparse (no filter)")(noop(tsOnly))
    time("gen+parse+tsparse+filter")(noop(tsOnly.filter(col("j").isNotNull && col("ts").isNotNull)))
    spark.stop()
  }
}
