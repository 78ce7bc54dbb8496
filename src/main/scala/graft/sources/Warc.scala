package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500 / WARC 1.0–1.1) ingestion — the
  * Common-Crawl-shaped input a large-scale training-data pipeline starts
  * from. Not a reference-surface operator (balboa ingests DNS wire
  * formats); the decoder-family pattern is `Decoders`/`Feeders` (NMSG
  * does harder binary framing), extended here to the one public corpus
  * format the engine lacked.
  *
  * Read path: `sc.binaryFiles` → one task per WARC file, records parsed
  * STREAMING off the (possibly gzipped) byte stream — memory is O(one
  * record), never O(file), so 1 GB Common-Crawl segments work unchanged.
  * At 100 TB parallelism is across files (the standard CC layout:
  * ~64k × ~1 GB segments per crawl), which is exactly Spark's sweet
  * spot — no shuffle, a pure narrow decode into whatever the curation
  * chain needs next. Gzip: both whole-file gzip and the Common-Crawl
  * member-per-record layout decode transparently (JDK GZIPInputStream
  * consumes concatenated members).
  *
  * Only WARC headers are interpreted (type, id, target URI, date,
  * content type/length); the payload stays opaque `binary` — HTTP
  * header splitting, charset sniffing etc. belong to downstream
  * operators, not the record reader.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("url", StringType),
    StructField("ts", TimestampType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType)
  ))

  final case class Record(
      warc_type: String,
      record_id: String,
      url: String,
      ts: Timestamp,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  /** Read every record of every WARC file under `path` (plain `.warc`
    * or gzipped `.warc.gz`, detected by magic bytes per file; other
    * files — e.g. the `_cdx` index parquet beside an indexed archive —
    * are ignored by extension). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(path)
      .filter { case (name, _) =>
        name.endsWith(".warc") || name.endsWith(".warc.gz")
      }
      .flatMap { case (_, pds) => recordIterator(pds.open()) }
      .map(r => org.apache.spark.sql.Row(
        r.warc_type, r.record_id, r.url, r.ts, r.content_type,
        r.content_length, r.payload))
    spark.createDataFrame(rdd, schema)
  }

  /** Streaming record iterator over one WARC stream; closes `raw` when
    * exhausted. Tolerates arbitrary inter-record padding (spec allows
    * trailing CRLFs) by scanning to the next `WARC/` version line. */
  private[graft] def recordIterator(raw: InputStream): Iterator[Record] = {
    val header = new java.io.PushbackInputStream(raw, 2)
    val b1 = header.read(); val b2 = header.read()
    if (b2 != -1) { header.unread(b2); () }
    if (b1 != -1) { header.unread(b1); () }
    val in: DataInputStream =
      if (b1 == 0x1f && b2 == 0x8b)
        new DataInputStream(new BufferedInputStream(
          new GZIPInputStream(new BufferedInputStream(header))))
      else new DataInputStream(new BufferedInputStream(header))

    new Iterator[Record] {
      private var nextRec: Record = null
      private var done = false

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          readLine(in) match {
            case null => done = true; in.close()
            case line if line.startsWith("WARC/") =>
              nextRec = readOne(in)
            case _ => // inter-record padding / unknown line: skip
          }
        }
      }

      def hasNext: Boolean = { advance(); nextRec != null }
      def next(): Record = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Parse one record body after its `WARC/x.y` version line: named
    * headers to the blank line, then exactly Content-Length payload
    * bytes. */
  private def readOne(in: DataInputStream): Record = {
    var warcType, recordId, uri, date, ctype: String = null
    var clen = 0L
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) {
        val (k, v) = (line.substring(0, i).trim.toLowerCase,
          line.substring(i + 1).trim)
        k match {
          case "warc-type" => warcType = v
          case "warc-record-id" => recordId = v
          case "warc-target-uri" => uri = v
          case "warc-date" => date = v
          case "content-type" => ctype = v
          case "content-length" => clen = v.toLong
          case _ => // other WARC/extension headers: not interpreted
        }
      }
      line = readLine(in)
    }
    val payload = new Array[Byte](
      if (clen <= Int.MaxValue) clen.toInt
      else throw new IllegalArgumentException(s"record too large: $clen"))
    in.readFully(payload)
    val ts =
      if (date == null) null
      else Timestamp.from(java.time.Instant.parse(date))
    Record(warcType, recordId, uri, ts, ctype, clen, payload)
  }

  /** One header/version line, CRLF or LF terminated, ISO-8859-1-safe
    * (WARC named fields are ASCII); null at clean EOF. */
  private def readLine(in: DataInputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var c = in.read()
    if (c == -1) return null
    while (c != -1 && c != '\n') {
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    new String(buf.toByteArray, UTF_8)
  }

  // ------------------------------------------------------------- writer

  /** Write a DataFrame with columns (url string, ts timestamp,
    * content_type string, payload binary) as WARC response records —
    * one `.warc.gz` per partition, one gzip MEMBER per record (the
    * Common-Crawl layout: members make records individually seekable).
    * Record IDs are deterministic name-UUIDs of the URL, keeping
    * write→read round-trips reproducible (the gate/oracle stance; real
    * crawls would use random UUIDs). */
  def write(df: DataFrame, outPath: String): Unit = {
    writeRecords(df, outPath).count(): Unit // force the write job
  }

  /** [[write]] plus a CDX-style record index (the Common-Crawl
    * `cluster.idx`/CDXJ idea): alongside the WARC files,
    * `<outPath>/_cdx` holds one parquet row `(url, file, offset,
    * length)` per record — the byte extent of its gzip member — so a
    * single record is retrievable by ONE ranged read + gunzip
    * ([[fetchRecord]]) without scanning the archive: the WARC analogue
    * of the store's PointReader serving path. */
  def writeWithIndex(df: DataFrame, outPath: String): Unit = {
    import df.sparkSession.implicits._
    writeRecords(df, outPath)
      .toDF("url", "file", "offset", "length")
      .write.mode("overwrite").parquet(s"$outPath/_cdx")
  }

  /** The shared write job: streams each partition into one `.warc.gz`
    * (a gzip member per record) and RETURNS the per-record extents.
    * The session's Hadoop conf rides a broadcast to every task (the
    * same move Spark's own writers make) so object-store credentials,
    * custom `fs.<scheme>.impl` registrations and tuning set on the
    * session apply to the WARC output filesystem too. */
  private def writeRecords(df: DataFrame, outPath: String)
      : org.apache.spark.rdd.RDD[(String, String, Long, Long)] = {
    val sc = df.sparkSession.sparkContext
    val confBc = sc.broadcast(
      new org.apache.spark.SerializableWritable(sc.hadoopConfiguration))
    df.select("url", "ts", "content_type", "payload").rdd
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val file = f"part-$pid%05d.warc.gz"
          val p = new org.apache.hadoop.fs.Path(s"$outPath/$file")
          val fs = p.getFileSystem(confBc.value.value)
          val out = fs.create(p, true)
          val index = Vector.newBuilder[(String, String, Long, Long)]
          var offset = 0L
          try rows.foreach { r =>
            val url = r.getString(0)
            val ts = r.getTimestamp(1)
            val ctype = r.getString(2)
            val payload = r.getAs[Array[Byte]](3)
            val date = java.time.format.DateTimeFormatter.ISO_INSTANT
              .format(ts.toInstant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
            val rid = "<urn:uuid:" +
              java.util.UUID.nameUUIDFromBytes(url.getBytes(UTF_8)) + ">"
            val head = ("WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Record-ID: $rid\r\n" +
              s"WARC-Date: $date\r\n" +
              s"WARC-Target-URI: $url\r\n" +
              s"Content-Type: $ctype\r\n" +
              s"Content-Length: ${payload.length}\r\n" +
              "\r\n").getBytes(UTF_8)
            // one gzip member per record, its byte extent counted
            val counter = new CountingNoCloseStream(out)
            val gz = new GZIPOutputStream(counter)
            gz.write(head)
            gz.write(payload)
            gz.write("\r\n\r\n".getBytes(UTF_8))
            gz.finish()
            gz.close()
            index += ((url, file, offset, counter.written))
            offset += counter.written
          } finally out.close()
          index.result().iterator
        }
      }
  }

  /** Driver-local random access: gunzip + parse the ONE record at
    * `(file, offset, length)` from a [[writeWithIndex]] archive (or any
    * member-per-record WARC whose extents are known) — a ranged read,
    * no scan, no Spark job. */
  def fetchRecord(warcDir: String, file: String, offset: Long,
      length: Long,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Record = {
    val p = new org.apache.hadoop.fs.Path(s"$warcDir/$file")
    val bytes = new Array[Byte](length.toInt)
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      // java.nio for local paths: Hadoop's ChecksumFileSystem costs
      // ~8 ms per open — ruinous for a fetch that reads a few KB
      // (the PointReader lesson applied to the archive)
      val ch = java.nio.file.Files.newByteChannel(
        java.nio.file.Paths.get(uri.getPath))
      try {
        ch.position(offset)
        val buf = java.nio.ByteBuffer.wrap(bytes)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        if (buf.hasRemaining)
          throw new java.io.EOFException(s"short read at $file:$offset")
      } finally ch.close()
    } else {
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try { in.seek(offset); in.readFully(bytes) } finally in.close()
    }
    val it = recordIterator(new java.io.ByteArrayInputStream(bytes))
    if (!it.hasNext)
      throw new IllegalArgumentException(s"no record at $file:$offset+$length")
    it.next()
  }

  /** Lets per-record GZIPOutputStreams finish their member without
    * closing the shared file stream, counting bytes written. */
  private final class CountingNoCloseStream(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    var written = 0L
    override def write(b: Int): Unit = { out.write(b); written += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); written += len
    }
    override def close(): Unit = flush()
  }

}
