package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Decoders

/** Decoder parity tests using the reference's exact fixture payloads
  * (`format/format_*_test.go` — see FIXTURES.md §§1-6). Expected row counts
  * are the reference's own assertions. */
class DecodersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def in(payloads: String*): DataFrame =
    payloads.map(p => (p, "foo")).toDF("value", "sensor_id")

  private def inBin(payloads: Array[Byte]*): DataFrame =
    payloads.map(p => (p, "foo")).toDF("value", "sensor_id")

  // ---- Suricata (format_suricata_test.go) ----

  private val suriV1 =
    """{"timestamp": "2009-11-24T21:27:09.534255-0100", "event_type": "dns",
      | "src_ip": "192.168.2.7", "proto": "UDP",
      | "dns": {"type": "answer", "id":16000, "rcode":"NOERROR",
      |   "rrname": "twitter.com", "rrtype":"A", "ttl":8,
      |   "rdata": "199.16.156.6"}}""".stripMargin

  private val suriV2 =
    """{"timestamp": "2009-11-24T21:27:09.534255-0100", "event_type": "dns",
      | "dns": {"version": 2, "type": "answer", "id": 45444,
      |  "rcode": "NOERROR", "answers": [
      |   {"rrname": "www.suricata-ids.org", "rrtype": "CNAME", "ttl": 3324,
      |    "rdata": "suricata-ids.org"},
      |   {"rrname": "suricata-ids.org", "rrtype": "A", "ttl": 10,
      |    "rdata": "192.0.78.24"},
      |   {"rrname": "suricata-ids.org", "rrtype": "A", "ttl": 10,
      |    "rdata": "192.0.78.25"}]}}""".stripMargin

  private val suriV2Grouped =
    """{"timestamp": "2009-11-24T21:27:09.534255-0100", "event_type": "dns",
      | "dns": {"version": 2, "type": "answer", "id": 18523,
      |  "rcode": "NOERROR",
      |  "grouped": {"A": ["192.0.78.24", "192.0.78.25"],
      |              "CNAME": ["suricata-ids.org"]}}}""".stripMargin

  test("suricata: v1 + v2 detailed + v2 grouped -> 7 observations") {
    val rows = Decoders.suricata(in(suriV1, suriV2, suriV2Grouped)).collect()
    assert(rows.length == 7)
    val v1 = rows.filter(_.getAs[String]("rrname") == "twitter.com")
    assert(v1.length == 1)
    assert(v1.head.getAs[String]("rdata") == "199.16.156.6")
    assert(v1.head.getAs[String]("rrtype") == "A")
    assert(v1.head.getAs[String]("sensor_id") == "foo")
    // 21:27:09.534255-01:00 == 22:27:09.534255 UTC
    assert(v1.head.getAs[Timestamp]("timestamp_start") ==
      Timestamp.valueOf("2009-11-24 22:27:09.534255"))
    // grouped: one row per (rrtype, rdata), rrname comes from dns.rrname (absent -> null)
    assert(rows.count(_.getAs[String]("rdata") == "192.0.78.24") == 2)
  }

  test("suricata: garbage, bad timestamp, wrong event_type, wrong dns.type -> 0") {
    val badTs = suriV1.replace("2009-11-24T21:27:09.534255-0100", "2009-11-24T21:")
    val badEvent = suriV1.replace("\"event_type\": \"dns\"", "\"event_type\": \"foo\"")
    val badType = suriV1.replace("\"type\": \"answer\"", "\"type\": \"foo\"")
    assert(Decoders.suricata(in("babanana", "", badTs, badEvent, badType)).count() == 0)
  }

  test("suricata: MISSING event_type / dns.type (SQL-null guard) -> 0") {
    // absent keys make the validity conjunction SQL NULL, not false —
    // a non-null-safe guard would let these fall through to the emit
    // branches as observations with null fields (the reference drops
    // them, format_suricata.go:46-51)
    val noEvent = suriV1.replace("\"event_type\": \"dns\",", "")
    val noType = suriV1.replace("\"type\": \"answer\",", "")
    assert(Decoders.suricata(in(noEvent, noType)).count() == 0)
  }

  // ---- FEVER (format_fever_test.go) ----

  private val feverIn =
    """{"dns": {"foo.bar": {"rdata": [
      |   {"rdata": "1.2.3.4", "count":2, "rrtype": "A", "type":"answer"},
      |   {"rdata": "1.2.3.5", "count":1, "rrtype": "A", "type":"answer"}]}},
      | "timestamp_start":"2018-10-26T21:02:20+00:00",
      | "timestamp_end":"2018-10-26T21:03:20+00:00"}""".stripMargin

  test("fever: nested map -> 2 observations with source-side counts") {
    val rows = Decoders.fever(in(feverIn)).orderBy("rdata").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("rrname") == "foo.bar"))
    assert(rows(0).getAs[Long]("count") == 2L)
    assert(rows(1).getAs[Long]("count") == 1L)
    assert(rows(0).getAs[Timestamp]("timestamp_start") ==
      Timestamp.valueOf("2018-10-26 21:02:20"))
    assert(rows(0).getAs[Timestamp]("timestamp_end") ==
      Timestamp.valueOf("2018-10-26 21:03:20"))
    assert(Decoders.fever(in("babanana")).count() == 0)
  }

  // ---- gopassivedns (format_gopassivedns_test.go) ----

  private val gopdnsIn =
    """{"query_id":43264,"rcode":0,"q":"github.com","qtype":"A","a":"192.30.253.112","atype":"A","ttl":60,"dst":"9.9.9.9","src":"192.168.1.79","tstamp":"2018-10-26 19:32:36.141184 +0000 UTC","elapsed":35879000,"sport":"40651","level":"","bytes":102,"protocol":"udp","truncated":false,"aa":false,"rd":true,"ra":false}"""

  test("gopassivedns: single record") {
    val rows = Decoders.gopassivedns(in(gopdnsIn)).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("rrname") == "github.com")
    assert(r.getAs[String]("rdata") == "192.30.253.112")
    assert(r.getAs[String]("rrtype") == "A")
    assert(r.getAs[Long]("count") == 1L)
    assert(r.getAs[Timestamp]("timestamp_start") ==
      Timestamp.valueOf("2018-10-26 19:32:36.141184"))
  }

  // ---- Packetbeat (format_packetbeat_test.go) ----

  private val pbIn =
    """{"type": "dns",
      | "dns": {"answers": [{"name": "foo.bar.", "data": "1.2.3.4.",
      |                      "type": "A", "class": "foo"}]},
      | "@timestamp": "2018-10-26T21:03:20.222Z"}""".stripMargin

  test("packetbeat: answers exploded, trailing dots trimmed") {
    val rows = Decoders.packetbeat(in(pbIn)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("rrname") == "foo.bar")
    assert(rows.head.getAs[String]("rdata") == "1.2.3.4")
    assert(rows.head.getAs[Timestamp]("timestamp_start") ==
      Timestamp.valueOf("2018-10-26 21:03:20.222"))
    val badType = pbIn.replace("\"type\": \"dns\"", "\"type\": \"foo\"")
    val badTs = pbIn.replace("2018-10-26T21:03:20.222Z", "21:03")
    assert(Decoders.packetbeat(in(badType, badTs, "junk")).count() == 0)
  }

  // ---- gamelinux (format_gamelinux_test.go) ----

  private val fjellskaalIn =
    """1322849924.408856||10.1.1.1||8.8.8.8||IN||upload.youtube.com.||A||74.125.43.117||46587||5
      |1322849924.408857||10.1.1.1||8.8.8.8||IN||upload.youtube.com.||A||74.125.43.116||420509||5
      |1322849924.408858||10.1.1.1||8.8.8.8||IN||www.adobe.com.||CNAME||www.wip4.adobe.com.||43200||8
      |1322849924.408859||10.1.1.1||8.8.8.8||IN||www.adobe.com.||A||193.104.215.61||43200||8
      |1322849924.408860||10.1.1.1||8.8.8.8||IN||i1.ytimg.com.||CNAME||ytimg.l.google.com.||43200||3
      |1322849924.408861||10.1.1.1||8.8.8.8||IN||clients1.google.com.||A||173.194.32.3||43200||2
      |""".stripMargin

  test("gamelinux: 6 well-formed ||-lines -> 6 observations") {
    val rows = Decoders.gamelinux(in(fjellskaalIn)).orderBy("rdata").collect()
    assert(rows.length == 6)
    val r = rows.find(_.getAs[String]("rdata") == "74.125.43.117").get
    assert(r.getAs[String]("rrname") == "upload.youtube.com")
    assert(r.getAs[Long]("count") == 5L)
    // reference quirk: ".408856" is fed to time.Unix as NANOseconds
    assert(r.getAs[Timestamp]("timestamp_start").getTime == 1322849924000L)
    assert(r.getAs[Timestamp]("timestamp_start").getNanos == 408000)
    assert(Decoders.gamelinux(in("a||b||c")).count() == 0)
  }

  // ---- NMSG (format_nmsg_test.go) ----

  /** Hand-encoded NewDomain protobuf: time_seen(2)=1540000000,
    * rrname(3)=wire("google","com"), rrtype(4)=1, rdata(7)=[1.2.3.4]. */
  private def newDomainBytes: Array[Byte] = {
    def varint(v: Long): Seq[Byte] = {
      var x = v; val out = Seq.newBuilder[Byte]
      while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      out += x.toByte
      out.result()
    }
    val name = Seq(6.toByte) ++ "google".getBytes.toSeq ++
      Seq(3.toByte) ++ "com".getBytes.toSeq ++ Seq(0.toByte)
    (varint(2L << 3) ++ varint(1540000000L) ++
      varint((3L << 3) | 2) ++ varint(name.length) ++ name ++
      varint(4L << 3) ++ varint(1L) ++
      varint((7L << 3) | 2) ++ varint(4L) ++ Seq[Byte](1, 2, 3, 4)).toArray
  }

  test("edge payloads: fraction-less timestamps, empty structures") {
    // Go's .999999 layout means the fraction is OPTIONAL
    val noFraction = suriV1.replace("2009-11-24T21:27:09.534255-0100",
      "2009-11-24T21:27:09-0100")
    val rows = Decoders.suricata(in(noFraction)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Timestamp]("timestamp_start") ==
      Timestamp.valueOf("2009-11-24 22:27:09"))
    // packetbeat with dns present but answers absent -> 0 rows, no error
    assert(Decoders.packetbeat(in(
      """{"type":"dns","dns":{},"@timestamp":"2018-10-26T21:03:20.222Z"}"""))
      .count() == 0)
    // fever with empty dns map -> 0 rows
    assert(Decoders.fever(in(
      """{"dns":{},"timestamp_start":"2018-10-26T21:02:20+00:00",
        |"timestamp_end":"2018-10-26T21:03:20+00:00"}""".stripMargin))
      .count() == 0)
    // gamelinux: non-numeric count or malformed epoch -> line skipped
    assert(Decoders.gamelinux(in(
      "1322849924.408856||c||s||IN||a.com.||A||1.2.3.4||60||notanumber"))
      .count() == 0)
    assert(Decoders.gamelinux(in(
      "nodothere||c||s||IN||a.com.||A||1.2.3.4||60||5")).count() == 0)
  }

  test("nmsg: protobuf NewDomain -> decoded observation") {
    val rows = Decoders.nmsg(inBin(newDomainBytes)).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("rrname") == "google.com")
    assert(r.getAs[String]("rrtype") == "A")
    assert(r.getAs[String]("rdata") == "1.2.3.4")
    assert(r.getAs[Timestamp]("timestamp_start").getTime == 1540000000000L)
    // malformed payload is skipped, not fatal
    assert(Decoders.nmsg(inBin(Array[Byte](0x3a, 0x7f))).count() == 0)
  }

  test("Cdx.parse: 11-field lines, absent markers, malformed drop") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val good = "com,example)/p 20240115120000 https://example.com/p " +
      "text/html 200 ABCDEF - - 1234 5678 c.warc.gz"
    val dashes = "com,example)/q 20240101000000 - - - - - - - - -"
    val lines = Seq(good, dashes, "short line", "").toDF("line")
    val out = graft.sources.Cdx.parse(lines, "line").collect()
    assert(out.length == 2)
    val g = out.find(_.getString(0) == "com,example)/p").get
    assert(g.getString(1) == "20240115120000" &&
      g.getLong(5) == 200L && g.getLong(9) == 1234L &&
      g.getLong(10) == 5678L && g.getString(11) == "c.warc.gz")
    // 2024-01-15T12:00:00Z in micros
    assert(g.getLong(2) == 1705320000000000L)
    val d = out.find(_.getString(0) == "com,example)/q").get
    assert(d.isNullAt(3) && d.isNullAt(5) && d.isNullAt(9) &&
      d.isNullAt(11))
  }
}
