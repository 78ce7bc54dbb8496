package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ObservationStore, Selectors, Tools}
import graft.operators.Selectors.RegexSelector
import graft.streaming.IngestPipeline
import graft.streaming.IngestPipeline.Sink

/** End-to-end streaming ingest: MemoryStream → selector engine →
  * tag-routed incremental merges into bucket-partitioned dual stores;
  * plus dump/replay round-trip. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def obs(rrname: String, rdata: String, cnt: Long, t: String) =
    (rrname, "s1", "A", rdata, cnt, ts(t), ts(t))

  private val cols = Seq("rrname", "sensor_id", "rrtype", "rdata", "count",
    "timestamp_start", "timestamp_end")

  test("streaming ingest merges micro-batches incrementally into both copies") {
    val dir = Files.createTempDirectory("graft-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String, String, String, Long, Timestamp, Timestamp)]
    val selectors = Seq(RegexSelector(Seq("^evil[.].*"), tags = Seq("evil")))
    val sinks = Seq(
      Sink("all", None, s"$dir/all"),
      Sink("evil", Some("evil"), s"$dir/evil"))

    val q = IngestPipeline.start(spark, stream.toDF().toDF(cols: _*),
      selectors, sinks, s"$dir/ckpt")
    stream.addData(
      obs("good.com", "1.1.1.1", 1, "2020-01-01 00:00:00"),
      obs("evil.com", "2.2.2.2", 2, "2020-02-01 00:00:00"))
    q.processAllAvailable()
    stream.addData(
      obs("good.com", "1.1.1.1", 5, "2020-03-01 00:00:00"), // same key: merge
      obs("evil.com", "3.3.3.3", 1, "2020-04-01 00:00:00"))
    q.processAllAvailable()
    q.stop()

    val all = ObservationStore.load(spark, s"$dir/all")
    val good = all.entries(rrname = Some("good.com")).collect()
    assert(good.length == 1)
    assert(good.head.getAs[Long]("count") == 6L) // 1 + 5 across batches
    assert(good.head.getAs[Timestamp]("first_seen") == ts("2020-01-01 00:00:00"))
    assert(good.head.getAs[Timestamp]("last_seen") == ts("2020-03-01 00:00:00"))
    assert(all.totalCount() == 3)
    // inverted copy answers rdata lookups with the same merged row
    assert(all.entries(rdata = Some("1.1.1.1")).collect()
      .head.getAs[Long]("count") == 6L)

    // tag-routed sink got only the evil.* observations
    val evil = ObservationStore.load(spark, s"$dir/evil")
    assert(evil.totalCount() == 2)
    assert(evil.entries(rrname = Some("good.com")).count() == 0)
  }

  test("streaming unwindowed aggregate (update mode) matches batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String, String, String, Long, Timestamp, Timestamp)]
    val agg = IngestPipeline.streamingAggregate(stream.toDF().toDF(cols: _*))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("agg_test").start()
    stream.addData(obs("a.com", "1.1.1.1", 1, "2020-01-01 00:00:00"))
    stream.addData(obs("a.com", "1.1.1.1", 3, "2020-06-01 00:00:00"))
    q.processAllAvailable()
    val rows = spark.table("agg_test").collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("count") == 4L)
  }

  test("dump/replay round-trip preserves the aggregate (unix-seconds JSON)") {
    val dir = Files.createTempDirectory("graft-dump").toString
    val input = Seq(
      obs("x.com", "9.9.9.9", 7, "2021-01-01 00:00:00"),
      obs("y.com", "8.8.8.8", 2, "2021-02-01 00:00:00"))
      .toDF(cols: _*)
    val agg = ObservationStore.aggregate(input)
    Tools.dump(agg, s"$dir/dump")
    // NDJSON shape: unix-seconds ints, one object per line
    val line = spark.read.text(s"$dir/dump").as[String].collect().head
    assert(line.contains("\"time_first\":"))
    assert(!line.contains("T00:00:00")) // not ISO — integer seconds

    Tools.replay(spark, s"$dir/dump", s"$dir/store")
    val st = ObservationStore.load(spark, s"$dir/store")
    assert(st.totalCount() == 2)
    assert(st.entries(rrname = Some("x.com")).collect()
      .head.getAs[Long]("count") == 7L)
  }

  test("backup snapshots a store directory that loads identically") {
    val dir = Files.createTempDirectory("graft-backup").toString
    val input = Seq(obs("b.com", "5.5.5.5", 3, "2022-01-01 00:00:00")).toDF(cols: _*)
    ObservationStore.writeDual(ObservationStore.aggregate(input), s"$dir/st")
    Tools.backup(spark, s"$dir/st", s"$dir/bak")
    val restored = ObservationStore.load(spark, s"$dir/bak")
    assert(restored.entries(rrname = Some("b.com")).collect()
      .head.getAs[Long]("count") == 3L)
  }

  test("incremental merge touches only the batch's buckets") {
    val dir = Files.createTempDirectory("graft-merge").toString
    val b1 = Seq(obs("a.com", "1.1.1.1", 1, "2020-01-01 00:00:00")).toDF(cols: _*)
    ObservationStore.mergeBatch(spark, s"$dir/st", b1, numBuckets = 8)
    val filesBefore = listParquet(s"$dir/st/by_rrname")
    val b2 = Seq(obs("zz.org", "2.2.2.2", 1, "2020-01-01 00:00:00")).toDF(cols: _*)
    ObservationStore.mergeBatch(spark, s"$dir/st", b2, numBuckets = 8)
    val filesAfter = listParquet(s"$dir/st/by_rrname")
    // a.com's bucket files survive untouched unless zz.org hashed into it
    val aBucket = filesBefore.head.split("/").init.last
    val bBucketRows = ObservationStore.load(spark, s"$dir/st").totalCount()
    assert(bBucketRows == 2)
    assert(filesAfter.filter(_.contains(aBucket)).nonEmpty)
  }

  private def listParquet(path: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path)).map(_.getPath).filter(_.endsWith(".parquet"))
  }
}
