package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.Model
import graft.operators.{ObservationStore, Selectors}
import graft.sources.Decoders

/** Structured-Streaming ingest: the Spark shape of balboa's
  * feeder → decoder → selector engine → tag-routed sinks dataflow
  * (SURVEY.md §3.2).
  *
  * Reference parity notes:
  *  - the 50 000-slot ingest channel (`observation/input_observation.go:30`)
  *    is Spark micro-batching — no hand-rolled buffering;
  *  - the consume-goroutine-per-backend fan-out (`db/db_remote.go:53-123`)
  *    becomes per-sink filtered writes inside one `foreachBatch`;
  *  - the RocksDB merge operator becomes [[ObservationStore.mergeBatch]]
  *    (associative partial-aggregate merge, only touched buckets
  *    rewritten);
  *  - no watermark: the aggregation is unwindowed sum/min/max over all
  *    time, order-insensitive by construction (SURVEY §2.5), so late data
  *    needs no special handling — same as the reference.
  */
object IngestPipeline {

  /** A sink = balboa backend: receives observations carrying `tag`
    * (None ⇒ catch-all) and maintains its own dual-sorted store. */
  final case class Sink(name: String, tag: Option[String], path: String)

  val decoders: Map[String, DataFrame => DataFrame] = Map(
    "suricata" -> Decoders.suricata,
    "fever" -> Decoders.fever,
    "gopassivedns" -> Decoders.gopassivedns,
    "packetbeat" -> Decoders.packetbeat,
    "gamelinux" -> Decoders.gamelinux,
    "nmsg" -> Decoders.nmsg
  )

  /** Decode a raw payload stream (`value`, `sensor_id`) with the named
    * format decoder — works identically on batch and streaming frames. */
  def decode(raw: DataFrame, format: String): DataFrame =
    decoders.getOrElse(format,
      throw new IllegalArgumentException(
        s"unknown format '$format' (have: ${decoders.keys.mkString(",")})"))(raw)

  /** One micro-batch through selectors and into every sink's store —
    * also the batch/backfill entry point (streaming and bulk replay share
    * this exact code path, like the reference's replay feature A5).
    *
    * `batchId` (supplied by [[start]]'s foreachBatch) makes sink merges
    * EXACTLY-ONCE under micro-batch replays: each store records the
    * highest batch id it committed — atomically with its epoch — and
    * [[ObservationStore.mergeBatch]] skips a batch it already holds. A
    * crash between sink merges replays the batch into ONLY the sinks
    * that had not committed it; without the id (plain backfill calls) a
    * re-run re-merges, the documented at-least-once of manual replay. */
  def processBatch(spark: SparkSession, batch: DataFrame,
      selectors: Seq[Selectors.Selector], sinks: Seq[Sink],
      numBuckets: Int = 64, batchId: Option[Long] = None): Unit = {
    val tagged = Selectors.engine(batch, selectors)
    // one pass computes tags; each sink write reuses it
    val materialized = if (sinks.size > 1) tagged.localCheckpoint(true) else tagged
    try {
      sinks.foreach { sink =>
        val obs = Selectors.routeTo(materialized, sink.tag).select(
          col("rrname"), col("sensor_id"), col("rrtype"), col("rdata"),
          col("count"), col("timestamp_start"), col("timestamp_end"))
        ObservationStore.mergeBatch(spark, sink.path, obs, numBuckets, batchId)
      }
    } finally if (sinks.size > 1) {
      // release the eager per-batch checkpoint blocks now, not at GC —
      // a long-lived stream would otherwise accumulate stale batches in
      // executor storage memory
      materialized.unpersist()
      ()
    }
  }

  /** Start the streaming ingest: decoded-observation stream → selector
    * engine → tag-routed incremental store merges, exactly-once per sink
    * (the batch id threads into every store's commit marker). */
  def start(spark: SparkSession, observations: DataFrame,
      selectors: Seq[Selectors.Selector], sinks: Seq[Sink],
      checkpointDir: String, numBuckets: Int = 64): StreamingQuery =
    observations.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(spark, batch, selectors, sinks, numBuckets, Some(bid))
      }
      .start()

  /** Pure-streaming unwindowed aggregate (update mode) — the direct
    * streaming translation of the RocksDB merge operator for consumers
    * that want the live aggregate without a disk store. */
  def streamingAggregate(observations: DataFrame): DataFrame =
    // the store's A1 aggregation works unchanged on a streaming frame
    // (sum/min/max are order-insensitive) — ONE definition of the merge
    // semantics, never a drifting copy
    ObservationStore.aggregate(observations)
}
