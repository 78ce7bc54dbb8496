package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC record-reader semantics: framing (plain + gzip member-per-record
  * + whole-file gzip), header parsing, payloads with record-like bytes
  * inside, and the write→read round-trip. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rec(url: String, body: String, date: String =
      "2020-05-18T12:34:56Z", ctype: String = "text/plain"): String =
    "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$url>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"Content-Type: $ctype\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n" +
      "\r\n" + body + "\r\n\r\n"

  test("plain warc: multiple records, padding tolerated, headers parsed") {
    val bytes = (rec("http://a/1", "hello") + "\r\n" +
      rec("http://a/2", "worlds", date = "1999-12-31T23:59:59Z"))
      .getBytes(UTF_8)
    val out = Warc.recordIterator(
      new java.io.ByteArrayInputStream(bytes)).toVector
    assert(out.map(_.url) == Vector("http://a/1", "http://a/2"))
    assert(new String(out(0).payload, UTF_8) == "hello")
    assert(out(0).warc_type == "response")
    assert(out(0).content_length == 5L)
    assert(out(1).ts.toInstant.toString == "1999-12-31T23:59:59Z")
  }

  test("payload containing WARC-like lines is not re-framed") {
    val tricky = "WARC/1.0\r\nContent-Length: 9999\r\n\r\nnot a record"
    val bytes = (rec("http://t/1", tricky) + rec("http://t/2", "after"))
      .getBytes(UTF_8)
    val out = Warc.recordIterator(
      new java.io.ByteArrayInputStream(bytes)).toVector
    assert(out.map(_.url) == Vector("http://t/1", "http://t/2"))
    assert(new String(out(0).payload, UTF_8) == tricky)
  }

  test("whole-file gzip decodes transparently") {
    val raw = (rec("http://g/1", "a") + rec("http://g/2", "bb")).getBytes(UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    val out = Warc.recordIterator(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
    assert(out.map(r => new String(r.payload, UTF_8)) == Vector("a", "bb"))
  }

  test("CDX index: every record fetchable by its byte extent alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cdx").toString
    val docs = (1 to 23).map(i => (s"http://c/$i", s"doc $i body " * (i % 5 + 1)))
      .toDF("url", "body")
      .withColumn("ts", timestamp_seconds(lit(1600000000L)))
      .withColumn("content_type", lit("text/plain"))
      .withColumn("payload", encode(col("body"), "UTF-8"))
    Warc.writeWithIndex(docs, dir)
    val cdx = spark.read.parquet(s"$dir/_cdx")
      .select("url", "file", "offset", "length").collect()
    assert(cdx.length == 23)
    // every record retrievable by ONE ranged read; content matches
    val fetched = cdx.map { r =>
      val rec = Warc.fetchRecord(dir, r.getString(1), r.getLong(2),
        r.getLong(3))
      rec.url -> new String(rec.payload, UTF_8)
    }.toMap
    val expected = (1 to 23)
      .map(i => s"http://c/$i" -> (s"doc $i body " * (i % 5 + 1))).toMap
    assert(fetched == expected)
    // extents tile each file exactly: offsets are cumulative lengths
    cdx.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a.getLong(2) + a.getLong(3) == b.getLong(2))
      }
    }
    // and the archive still full-scans like a plain write
    assert(Warc.read(spark, dir).count() == 23)
  }

  test("write→read round-trip through Spark (member-per-record gzip)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    val docs = Seq(
      ("http://x/1", "first doc", "text/plain"),
      ("http://x/2", "second doc with ünïcode", "text/html"),
      ("http://x/3", "", "text/plain") // empty payload
    ).toDF("url", "body", "content_type")
      .withColumn("ts", timestamp_seconds(lit(1600000000L)))
      .withColumn("payload", encode(col("body"), "UTF-8"))
    Warc.write(docs, dir)
    val back = Warc.read(spark, dir)
      .select(col("url"), col("payload").cast("string").as("body"),
        col("content_type"), col("content_length"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(back == Set(
      ("http://x/1", "first doc", "text/plain"),
      ("http://x/2", "second doc with ünïcode", "text/html"),
      ("http://x/3", "", "text/plain")))
  }

  test("writer ships the session Hadoop conf to executors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // graftfs:// resolves ONLY through the session conf (see
    // GraftTestFileSystem) — an executor-side fresh Configuration would
    // fail with "No FileSystem for scheme graftfs"
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.graftfs.impl") == null)
    hc.set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-warc-fs")
      val docs = Seq(("http://y/1", "via custom fs", "text/plain"))
        .toDF("url", "body", "content_type")
        .withColumn("ts", timestamp_seconds(lit(1600000000L)))
        .withColumn("payload", encode(col("body"), "UTF-8"))
      // write THROUGH the custom scheme (fs.create is where the conf
      // matters); read back via the plain local path — RawLocalFileSystem
      // can't serve listings under a foreign scheme
      Warc.write(docs, s"graftfs://$dir")
      val back = Warc.read(spark, dir.toString)
        .select(col("url"), col("payload").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(back == Set(("http://y/1", "via custom fs")))
    } finally hc.unset("fs.graftfs.impl")
  }
}
