package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table-loading helpers shared by the library, Verify and Bench.
  *
  * Design notes (100 TB stance): every loader returns a plain scan-rooted
  * DataFrame so Catalyst keeps predicate pushdown / column pruning; nothing
  * here caches or collects. `events.parquet` carries INT64
  * TIMESTAMP(NANOS) which Spark's Parquet reader rejects — we read nanos as
  * Long (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
  * microsecond TimestampType column, which is exactly what DuckDB stores
  * internally for the same file (ns truncated to us), keeping oracle parity.
  */
object Graft {

  /** Baseline configs every entry point should apply. Shuffle partitions
    * sized for local[32]; on a real cluster AQE coalesces the 32 upward
    * via spark.sql.adaptive.coalescePartitions.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    // concurrent point lookups share cores instead of queueing whole
    // jobs FIFO — the serving analogue of the reference backend's
    // 64-thread connection pool; no effect on sequential batch work
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.sql.session.timeZone", "UTC")
    // graft's TypedImperativeAggregates (TopKPairs, KmvDistinct,
    // CmSketch) hold O(k)-BOUNDED buffers, so the ObjectHashAggregate
    // hash path is memory-safe far beyond the default 128-key fallback
    // — and the sort-based fallback re-introduces exactly the full-sort
    // these aggregates exist to avoid (measured: knnJoin's per-id top-k
    // over 50M candidate pairs runs 24 s sort-based vs 6.6 s hashed).
    // 64k keys × the largest buffer (kmv k=256 ≈ 2 KB) ≈ 128 MB/task
    // worst case — bounded.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "65536")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.parquet.compression.codec", "zstd")
    .config("spark.ui.enabled", "false")

  def localSession(appName: String = "graft", cores: String = "*"): SparkSession = {
    val s = configure(
      SparkSession.builder().appName(appName).master(s"local[$cores]")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Load one of the driver-generated tables from a scale-factor dir. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // ns → us truncation matches DuckDB's internal microsecond
      // timestamps. Integer division — a double roundtrip would round
      // off-by-one at micro-epoch magnitudes (~1.7e15).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** The canonical passive-DNS-shaped observation stream derived from
    * `lineitem`, used to exercise the balboa operator surface against the
    * DuckDB oracle on the same parquet. Mapping (documented for the oracle
    * SQL in [[SparkEntry]]):
    *   rrname    := 'part-' || l_partkey      (the "domain name")
    *   sensor_id := l_suppkey % 10 as string  (the sensor)
    *   rrtype    := l_returnflag              ('A'|'N'|'R' — conveniently DNS-looking)
    *   rdata     := l_orderkey as string      (the "answer")
    *   count     := 1 per input row
    *   ts        := l_shipdate                (both first_seen and last_seen input)
    */
  def observations(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").select(
      concat(lit("part-"), col("l_partkey").cast("string")).as("rrname"),
      (col("l_suppkey") % 10).cast("string").as("sensor_id"),
      col("l_returnflag").as("rrtype"),
      col("l_orderkey").cast("string").as("rdata"),
      lit(1L).as("count"),
      col("l_shipdate").as("ts")
    )

  /** Same stream with IP-shaped rdata (dotted quad derived from
    * `l_orderkey`), for the server-side CIDR range query (SURVEY.md Q9).
    */
  def ipObservations(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").select(
      concat(lit("part-"), col("l_partkey").cast("string")).as("rrname"),
      (col("l_suppkey") % 10).cast("string").as("sensor_id"),
      col("l_returnflag").as("rrtype"),
      concat_ws(".", lit(10),
        shiftright(col("l_orderkey"), 16) % 256,
        shiftright(col("l_orderkey"), 8) % 256,
        col("l_orderkey") % 256).as("rdata"),
      lit(1L).as("count"),
      col("l_shipdate").as("ts")
    )

  /** Same stream with IPv6-shaped AAAA rdata (`2001:db8::<g7>:<g8>`, the
    * two low 16-bit groups carved from `l_orderkey`, minimal-hex like real
    * addresses), for the server-side v6 CIDR range query. The `::`
    * compressed form deliberately exercises the v6 parser's expansion. */
  def ip6Observations(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").select(
      concat(lit("part-"), col("l_partkey").cast("string")).as("rrname"),
      (col("l_suppkey") % 10).cast("string").as("sensor_id"),
      lit("AAAA").as("rrtype"),
      concat(lit("2001:db8::"),
        lower(hex(shiftright(col("l_orderkey"), 16) % 65536)), lit(":"),
        lower(hex(col("l_orderkey") % 65536))).as("rdata"),
      lit(1L).as("count"),
      col("l_shipdate").as("ts")
    )
}
