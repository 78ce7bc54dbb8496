package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ObservationStore

/** The core store invariant, property-tested: splitting an observation
  * stream into ANY sequence of micro-batches and merging them
  * incrementally yields exactly the one-shot batch aggregate — the
  * associativity/commutativity that lets the RocksDB-merge semantics map
  * onto partial aggregation and incremental bucket merges. */
class MergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("rrname", "sensor_id", "rrtype", "rdata", "count",
    "timestamp_start", "timestamp_end")

  private val genObs: Gen[(String, String, String, String, Long, Long)] =
    for {
      name <- Gen.oneOf("a.com", "b.com", "c.org", "d.net")
      sensor <- Gen.oneOf("s1", "s2")
      rrtype <- Gen.oneOf("A", "AAAA")
      rdata <- Gen.oneOf("1.1.1.1", "2.2.2.2", "3.3.3.3")
      cnt <- Gen.choose(1L, 100L)
      tsSec <- Gen.choose(1500000000L, 1700000000L)
    } yield (name, sensor, rrtype, rdata, cnt, tsSec)

  private def toDf(rows: List[(String, String, String, String, Long, Long)]) =
    rows.map { case (n, s, t, r, c, e) =>
      (n, s, t, r, c, new Timestamp(e * 1000L), new Timestamp(e * 1000L))
    }.toDF(cols: _*)

  test("incremental merges over any batch split equal the one-shot aggregate") {
    val prop = Prop.forAll(
      Gen.listOfN(30, genObs), Gen.choose(1, 4)) { (rows, nBatches) =>
      rows.nonEmpty ==> {
        val dir = Files.createTempDirectory("graft-prop").toString
        rows.grouped(math.max(1, rows.size / nBatches)).foreach(b =>
          ObservationStore.mergeBatch(spark, s"$dir/st", toDf(b), numBuckets = 4))

        val inc = ObservationStore.load(spark, s"$dir/st")
          .forward.drop("bucket")
          .select(cols.take(4).map(org.apache.spark.sql.functions.col) :+
            org.apache.spark.sql.functions.col("count") :+
            org.apache.spark.sql.functions.col("first_seen") :+
            org.apache.spark.sql.functions.col("last_seen"): _*)
          .orderBy("rrname", "sensor_id", "rrtype", "rdata")
          .collect().map(_.toSeq).toSeq
        val exp = ObservationStore.aggregate(toDf(rows))
          .orderBy("rrname", "sensor_id", "rrtype", "rdata")
          .collect().map(_.toSeq).toSeq
        inc == exp
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
