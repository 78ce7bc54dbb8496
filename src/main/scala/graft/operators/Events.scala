package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics: tumbling-window aggregation and gap-based
  * sessionization. The reference has no windowing (SURVEY.md §2.5) — these
  * are the planned extensions for pipeline telemetry, built so the same
  * logic runs batch (window functions) and streaming (`window()` /
  * `session_window()` in Structured Streaming).
  *
  * Scale: tumbling agg is one shuffle on (window, key) with map-side
  * combine. Sessionization shuffles once on user_id; within-partition
  * sort is Spark's window-exec sort — at 100 TB, partition by user bucket
  * and the sort stays node-local and spillable.
  */
object Events {

  /** Tumbling-window counts/sums per key. `value` sums are computed as
    * integer cents (`round(value·100)` summed as BIGINT) — exact,
    * order-independent, identical in every engine; a double or DECIMAL sum
    * would be neither. */
  def tumblingAgg(events: DataFrame, ts: Column, keyCol: Column,
      windowDuration: String = "1 hour"): DataFrame =
    events
      .groupBy(window(ts, windowDuration).as("w"), keyCol.as("key"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).cast("long")
          .as("sum_value_cents"))
      .select(col("w.start").as("window_start"), col("key"),
        col("n_events"), col("sum_value_cents"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Returns one row
    * per session with start/end/size. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int = 30): DataFrame = {
    val order = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes * 60L * 1000000L
    val withFlag = events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(order))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol).cast("timestamp_ltz")) -
            unix_micros(col("prev_ts").cast("timestamp_ltz")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withFlag
      .groupBy(col(userCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
