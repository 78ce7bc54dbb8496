package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ObservationStore
import graft.sources.BalboaDump

/** The native balboa dump wire format (`backend/lib/protocol.c:149-187,
  * 800-871`): byte-exact encode fixture, strict/lenient decode, and the
  * Spark-level dump → replay round-trip. */
class BalboaDumpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one entry exactly as mpack would emit it: fixmap(7), fixint keys,
  // bin8 strings, uint16 count, uint32 second timestamps
  private val fixture: Array[Byte] = (Seq(0x87) ++
    Seq(0x00, 0xc4, 0x07) ++ "foo.bar".getBytes("UTF-8").map(_.toInt) ++
    Seq(0x01, 0xc4, 0x01) ++ "A".getBytes("UTF-8").map(_.toInt) ++
    Seq(0x02, 0xc4, 0x07) ++ "1.2.3.4".getBytes("UTF-8").map(_.toInt) ++
    Seq(0x03, 0xc4, 0x02) ++ "s1".getBytes("UTF-8").map(_.toInt) ++
    Seq(0x04, 0xcd, 0x01, 0x2c) ++ // count = 300
    Seq(0x05, 0xce, 0x5a, 0x49, 0x7a, 0x00) ++ // 1514764800
    Seq(0x06, 0xce, 0x5a, 0x49, 0x7a, 0x00)
    ).map(_.toByte).toArray

  test("decode matches the C encoder's bytes; encode reproduces them") {
    val rows = BalboaDump.decodeStream(fixture).toSeq
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "foo.bar") // rrname
    assert(r.getString(1) == "s1") // sensor_id
    assert(r.getString(2) == "A") // rrtype
    assert(r.getString(3) == "1.2.3.4") // rdata
    assert(r.getLong(4) == 300L)
    assert(r.getTimestamp(5) == Timestamp.valueOf("2018-01-01 00:00:00"))
    assert(r.getTimestamp(6) == Timestamp.valueOf("2018-01-01 00:00:00"))

    val out = new java.io.ByteArrayOutputStream()
    BalboaDump.encodeEntry(out, "foo.bar", "A", "1.2.3.4", "s1",
      300L, 1514764800L, 1514764800L)
    assert(out.toByteArray.sameElements(fixture))
  }

  test("lenient decode: str-family strings, any uint width, any key order") {
    // a conforming writer could use fixstr and wider/narrower ints, and
    // the reference's decoder switches on field index, not position
    val alt = (Seq(0x87,
      0x04, 0x2a, // count = fixint 42, fields out of order
      0x00, 0xa3) ++ "a.b".getBytes("UTF-8").map(_.toInt) ++ // fixstr
      Seq(0x01, 0xd9, 0x01) ++ "A".getBytes("UTF-8").map(_.toInt) ++ // str8
      Seq(0x02, 0xa1) ++ "x".getBytes("UTF-8").map(_.toInt) ++
      Seq(0x03, 0xa1) ++ "s".getBytes("UTF-8").map(_.toInt) ++
      Seq(0x05, 0xcc, 0x3c) ++ // uint8 60
      Seq(0x06, 0xcf, 0, 0, 0, 0, 0x5a, 0x49, 0x7a, 0x00) // uint64
      ).map(_.toByte).toArray
    val r = BalboaDump.decodeStream(alt).toSeq.head
    assert(r.getString(0) == "a.b" && r.getLong(4) == 42L)
    assert(r.getTimestamp(5) == Timestamp.valueOf("1970-01-01 00:01:00"))
    assert(r.getTimestamp(6) == Timestamp.valueOf("2018-01-01 00:00:00"))
  }

  test("corrupt streams fail loudly, not silently truncated") {
    intercept[IllegalArgumentException](
      BalboaDump.decodeStream(Array[Byte](0x85.toByte)).toSeq) // 5-field map
    intercept[Exception]( // truncated mid-entry
      BalboaDump.decodeStream(fixture.dropRight(3)).toSeq)
    // truncation INSIDE a bin/str payload: copyOfRange would zero-pad —
    // must raise the uniform truncated-dump error instead of decoding a
    // NUL-padded string and ending the stream silently
    val cutInPayload = Array[Byte](0x87.toByte, 0x00,
      0xc4.toByte, 10, 'f', 'o') // bin8 len=10, only 2 payload bytes
    val e = intercept[IllegalArgumentException](
      BalboaDump.decodeStream(cutInPayload).toSeq)
    assert(e.getMessage.contains("truncated dump"), e.getMessage)
    // truncation inside a multi-byte uint gets the same uniform error
    val cutInUint = Array[Byte](0x87.toByte, 0x04, 0xcd.toByte, 0x01)
    val e2 = intercept[IllegalArgumentException](
      BalboaDump.decodeStream(cutInUint).toSeq)
    assert(e2.getMessage.contains("truncated dump"), e2.getMessage)
  }

  test("spark-level dump -> replay round-trip preserves the aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bdump").toString
    val input = Seq(
      ("foo.bar", "s1", "A", "1.2.3.4", 4L,
        Timestamp.valueOf("2018-01-01 00:00:00")),
      ("foo.bar", "s1", "A", "1.2.3.4", 6L,
        Timestamp.valueOf("2018-06-01 00:00:00")),
      ("baz.io", "s2", "AAAA", "2001:db8::1", 1L,
        Timestamp.valueOf("2019-01-01 00:00:00"))
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count", "ts")
    val agg = ObservationStore.aggregate(input)
    graft.operators.Tools.dumpBalboa(agg, s"$dir/dump")
    // files are raw mpack, not parquet/text
    assert(new java.io.File(s"$dir/dump").listFiles()
      .exists(_.getName.endsWith(".mpack")))
    graft.operators.Tools.replayBalboa(spark, s"$dir/dump", s"$dir/store",
      numBuckets = 4)
    val st = ObservationStore.load(spark, s"$dir/store")
    assert(st.totalCount() == 2)
    val foo = st.entries(rrname = Some("foo.bar")).collect().head
    assert(foo.getAs[Long]("count") == 10L)
    assert(foo.getAs[Timestamp]("first_seen") ==
      Timestamp.valueOf("2018-01-01 00:00:00"))
    assert(foo.getAs[Timestamp]("last_seen") ==
      Timestamp.valueOf("2018-06-01 00:00:00"))
    // and the v6 rdata survives byte-for-byte
    assert(st.entries(rdata = Some("2001:db8::1")).count() == 1)
  }
}
