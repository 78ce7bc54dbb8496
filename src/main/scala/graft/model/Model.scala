package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical record shapes (reference: `observation/input_observation.go:12-23`
  * and `observation/observation.go:15-24` in DCSO/balboa — see SURVEY.md §1).
  */

/** One decoded ingest event. `tags` are ephemeral routing labels added by
  * selectors and stripped before storage (`db/db_remote.go:102-103`).
  */
final case class InputObservation(
    count: Long,
    rcode: String,
    rdata: String,
    rrtype: String,
    rrname: String,
    sensor_id: String,
    timestamp_start: Timestamp,
    timestamp_end: Timestamp,
    tags: Seq[String] = Seq.empty
)

/** One stored/query-result entry: the aggregate of all InputObservations
  * sharing the 4-part key (rrname, sensor_id, rrtype, rdata):
  * count = Σ, first_seen = min, last_seen = max
  * (`backend/balboa-rocksdb/rocksdb-impl.c:117-121`).
  */
final case class Observation(
    rrname: String,
    sensor_id: String,
    rrtype: String,
    rdata: String,
    count: Long,
    first_seen: Timestamp,
    last_seen: Timestamp
)

object Model {
  /** The 4-part aggregation key, in forward-index order. */
  val Key: Seq[String] = Seq("rrname", "sensor_id", "rrtype", "rdata")

  val inputSchema: StructType = StructType(Seq(
    StructField("count", LongType),
    StructField("rcode", StringType),
    StructField("rdata", StringType),
    StructField("rrtype", StringType),
    StructField("rrname", StringType),
    StructField("sensor_id", StringType),
    StructField("timestamp_start", TimestampType),
    StructField("timestamp_end", TimestampType),
    StructField("tags", ArrayType(StringType))
  ))

  val observationSchema: StructType = StructType(Seq(
    StructField("rrname", StringType),
    StructField("sensor_id", StringType),
    StructField("rrtype", StringType),
    StructField("rdata", StringType),
    StructField("count", LongType),
    StructField("first_seen", TimestampType),
    StructField("last_seen", TimestampType)
  ))
}
