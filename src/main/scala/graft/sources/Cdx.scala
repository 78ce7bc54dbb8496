package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDX web-archive index decoder — the lookup sidecar every WARC
  * collection ships (the Internet Archive / pywb "CDX N b a m s k r M S
  * V g" 11-field line format): one space-separated line per capture
  * with the SURT url key, 14-digit timestamp, original URL, mime,
  * status, content digest, and the (filename, offset, length) triple
  * that addresses the record inside its WARC — the replay/dedup planner
  * reads THIS, not the archives.
  *
  * Parsing is a narrow split: 11 fields exactly, `-` is the standard
  * absent marker (→ null), numeric fields cast (unparsable → null, the
  * permissive-decoder stance of the D1–D6 family), the timestamp
  * returned both raw and as unix micros. Malformed lines (wrong field
  * count) DROP — count them upstream if ingest monitoring needs the
  * rate. Zero shuffle.
  */
object Cdx {

  private def nn(c: Column): Column = when(c === "-", lit(null)).otherwise(c)

  def parse(lines: DataFrame, lineCol: String): DataFrame = {
    val f = split(trim(col(lineCol)), " +")
    lines
      .withColumn("_f", f)
      .filter(size(col("_f")) === 11)
      .select(
        col("_f").getItem(0).as("urlkey"),
        col("_f").getItem(1).as("ts_raw"),
        unix_micros(to_timestamp(col("_f").getItem(1), "yyyyMMddHHmmss"))
          .as("ts_us"),
        nn(col("_f").getItem(2)).as("url"),
        nn(col("_f").getItem(3)).as("mime"),
        nn(col("_f").getItem(4)).cast("long").as("status"),
        nn(col("_f").getItem(5)).as("digest"),
        nn(col("_f").getItem(6)).as("redirect"),
        nn(col("_f").getItem(7)).as("meta"),
        nn(col("_f").getItem(8)).cast("long").as("length"),
        nn(col("_f").getItem(9)).cast("long").as("offset"),
        nn(col("_f").getItem(10)).as("filename"))
  }
}
