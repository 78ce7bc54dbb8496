package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.Events
import util.micros

/** Windowed event-stream analytics over the `events` table. `events.ts`
  * arrives as TIMESTAMP(NANOS) parquet, read as nanos and truncated to
  * microseconds ([[Graft.table]]) — exactly DuckDB's internal precision,
  * so window boundaries agree. */
object EventQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "events")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type; decimal-exact value sums.
    "events_hourly" -> ((s, dir) =>
      Events.tumblingAgg(events(s, dir), col("ts"), col("event_type"))
        .select(micros(col("window_start")).as("window_start"),
          col("key").as("event_type"), col("n_events"),
          col("sum_value_cents"))),

    // Gap-based sessions (30 min) per user.
    "events_sessions" -> ((s, dir) =>
      Events.sessionize(events(s, dir), "user_id", "ts", "event_id")
        .select(col("user_id"), col("session_seq"),
          micros(col("session_start")).as("session_start"),
          micros(col("session_end")).as("session_end"),
          col("n_events"))),
  )

  def oracleSql: Map[String, String] = Map(
    "events_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS sum_value_cents
        |FROM events GROUP BY 1, 2
        |""".stripMargin,

    "events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                   > 30 * 60 * 1000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |         SUM(new_session) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       epoch_us(MIN(ts)) AS session_start,
        |       epoch_us(MAX(ts)) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM numbered GROUP BY 1, 2
        |""".stripMargin,
  )
}
