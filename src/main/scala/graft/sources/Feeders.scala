package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feeders S1–S5 (SURVEY.md §2.1): network receivers bridging push
  * protocols into Spark's streaming file source.
  *
  * Architecture: Spark's streaming sources are pull-based; balboa's
  * feeders are push-based network endpoints. The idiomatic bridge is a
  * SPOOL DIRECTORY — each receiver appends complete payload files
  * (payload + sensor id), and a `readStream` file source consumes them
  * with exactly-once tracking via the streaming checkpoint. This is the
  * standard Spark ingestion pattern for push protocols (the same shape as
  * landing Kafka-less webhook data), keeps receivers tiny, and
  * parallelizes by just running more receivers against the same
  * directory tree.
  *
  * Payload file format: first line = sensor id, rest = raw payload. File
  * commit is atomic (write temp + move), so the file source never reads
  * partial events.
  *
  * AMQP (S2) is the same spool contract — an AMQP client would
  * acknowledge after spooling; no broker exists in this environment, so
  * only the contract ships (see [[FeederConfig]] docs).
  */
object Feeders {

  private val seq = new AtomicLong(0)
  // per-process nonce: multiple receiver processes share a spool dir, and
  // wall-clock+sequence alone would collide across JVMs (ATOMIC_MOVE
  // silently replaces, losing an event)
  private val processNonce =
    java.util.UUID.randomUUID().toString.take(8)

  /** Atomically spool one payload for the file stream. The sensor id
    * travels URL-encoded in the FILE NAME
    * (`<ts>-<nonce>-<n>__<sensor>.msg`), so payload bytes stay untouched —
    * text and binary formats share one spool contract. */
  def spool(dir: String, sensorId: String, payload: Array[Byte]): Unit = {
    val enc = java.net.URLEncoder.encode(sensorId, "UTF-8")
    val name =
      s"${System.currentTimeMillis()}-$processNonce-${seq.incrementAndGet()}__$enc"
    val tmp = Paths.get(dir, s".$name.tmp")
    val dst = Paths.get(dir, s"$name.msg")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, payload, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def sensorFromPath(path: Column): Column =
    // double decode: the spool file name is URL-encoded once by spool(),
    // and Hadoop URI-encodes the whole path again in path/input_file_name
    url_decode(url_decode(regexp_extract(path, "__([^/]*)\\.msg$", 1)))

  /** The consuming side: streaming frame of (value, sensor_id) from a
    * spool directory — feed it to any text [[Decoders]] decoder.
    * `wholetext` keeps one payload per row (payloads may contain
    * newlines, e.g. gamelinux multi-line blocks). */
  def spoolStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.option("wholetext", "true").text(dir)
      .select(col("value"), sensorFromPath(input_file_name()).as("sensor_id"))

  /** Binary variant (NMSG protobuf payloads must not pass through a
    * UTF-8 text decode). */
  def spoolStreamBinary(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.msg").load(dir)
      .select(col("content").as("value"),
        sensorFromPath(col("path")).as("sensor_id"))

  /** Batch variants (backfill/replay of a spool dir). */
  def spoolBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(col("value"), sensorFromPath(input_file_name()).as("sensor_id"))

  def spoolBatchBinary(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.msg").load(dir)
      .select(col("content").as("value"),
        sensorFromPath(col("path")).as("sensor_id"))

  /** S1 — HTTP feeder: POST body = payload, `X-Sensor-ID` header = sensor
    * — empty when the header is absent, exactly like the reference's
    * `r.Header.Get("X-Sensor-ID")` (`feeder/feeder_http.go:49-50`). */
  final class HttpFeeder(spoolDir: String, port: Int = 0) {
    private val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod == "POST") {
          val sensor = Option(ex.getRequestHeaders.getFirst("X-Sensor-ID"))
            .getOrElse("")
          spool(spoolDir, sensor, ex.getRequestBody.readAllBytes())
          ex.sendResponseHeaders(200, -1)
        } else ex.sendResponseHeaders(405, -1)
      } finally ex.close()
    })
    def boundPort: Int = server.getAddress.getPort
    def start(): Unit = server.start()
    def stop(): Unit = server.stop(0)
  }

  /** S3 — socket feeder: Spark's socket source, line-per-event, sensor id
    * fixed to "[unknown]" exactly like `feeder/feeder_socket.go:57` (UNIX
    * sockets aren't a Spark source; TCP is the Spark-native equivalent). */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket").option("host", host).option("port", port)
      .load()
      .withColumn("sensor_id", lit("[unknown]"))

  /** S4 — NMSG UDP feeder: datagram receiver that parses the NMSG
    * CONTAINER framing ([[NmsgContainer]]) — magic/version check,
    * vendor-id ≠ 2 payloads filtered, contained payload bodies extracted —
    * mirroring `feeder/feeder_nmsg_socket.go:60-77` (which delegates the
    * same steps to farsightsec/go-nmsg). Each extracted payload is the
    * SIE protobuf body for [[Decoders.nmsg]], spooled as its own file.
    * `bindHost` defaults to loopback for tests; real sensors bind an
    * interface address like the reference's configurable listen addr. */
  final class UdpFeeder(spoolDir: String, port: Int = 0, mtu: Int = 9000,
      bindHost: String = "127.0.0.1",
      extract: Array[Byte] => Seq[Array[Byte]] =
        NmsgContainer.extractPayloads(_)) {
    private val socket = new DatagramSocket(
      new InetSocketAddress(bindHost, port))
    private val running = new AtomicBoolean(false)
    private var thread: Thread = _

    def boundPort: Int = socket.getLocalPort

    def start(sensorId: String = "nmsg"): Unit = {
      running.set(true)
      thread = new Thread(() => {
        val buf = new Array[Byte](mtu)
        while (running.get()) {
          try {
            val pkt = new DatagramPacket(buf, buf.length)
            socket.receive(pkt)
            val datagram = java.util.Arrays.copyOfRange(buf, 0, pkt.getLength)
            extract(datagram).foreach(spool(spoolDir, sensorId, _))
          } catch {
            case _: java.net.SocketException => () // closed in stop()
            case e: Throwable if running.get() =>
              // e.g. spool disk full: drop the datagram and keep
              // receiving — a dead receiver thread behind a live-looking
              // feeder loses everything after it, silently
              System.err.println(
                s"[udp-feeder] datagram dropped: ${e.getMessage}")
          }
        }
      }, "graft-udp-feeder")
      thread.setDaemon(true)
      thread.start()
    }

    def stop(): Unit = { running.set(false); socket.close() }
  }
}

/** NMSG container wire format (public spec, farsightsec/nmsg): a 10-byte
  * header — magic `NMSG`, big-endian uint16 flags(hi byte)/version(lo
  * byte), big-endian uint32 body length — followed by a protobuf `Nmsg`
  * message whose field 1 repeats serialized `NmsgPayload` messages
  * (field 1 = vendor id varint, field 5 = payload bytes). The reference
  * consumes this via go-nmsg and keeps only vendor id 2 (SIE)
  * (`feeder/feeder_nmsg_socket.go:60-77`). */
object NmsgContainer {

  val SieVendorId = 2
  private val FlagZlib = 0x01
  private val FlagFragment = 0x02

  /** Contained payload bodies of one container datagram, vendor-filtered.
    * Malformed containers, wrong version, and fragments (a multi-datagram
    * reassembly protocol this single-datagram feeder doesn't speak) yield
    * an empty result — the datagram is dropped, matching the reference's
    * continue-on-data-error loop. Zlib-flagged bodies are inflated. */
  def extractPayloads(datagram: Array[Byte],
      vendorId: Int = SieVendorId): Seq[Array[Byte]] = {
    if (datagram == null || datagram.length < 10) return Seq.empty
    if (datagram(0) != 'N' || datagram(1) != 'M' ||
        datagram(2) != 'S' || datagram(3) != 'G') return Seq.empty
    val versFlags = ((datagram(4) & 0xff) << 8) | (datagram(5) & 0xff)
    val flags = versFlags >> 8
    if ((versFlags & 0xff) != 2) return Seq.empty // NMSG_VERSION
    if ((flags & FlagFragment) != 0) return Seq.empty
    val len = ((datagram(6) & 0xff) << 24) | ((datagram(7) & 0xff) << 16) |
      ((datagram(8) & 0xff) << 8) | (datagram(9) & 0xff)
    // compare against the REMAINING bytes: `10 + len` would overflow Int
    // for a crafted length like 0x7fffffff and slip past the guard
    if (len < 0 || len > datagram.length - 10) return Seq.empty
    var body = java.util.Arrays.copyOfRange(datagram, 10, 10 + len)
    if ((flags & FlagZlib) != 0) {
      body = inflate(body)
      if (body.isEmpty) return Seq.empty
    }
    parsePayloads(body, vendorId)
  }

  /** Serialize payload bodies INTO a container (test fixtures + loopback
    * tooling; also documents the format by construction). */
  def buildContainer(payloads: Seq[Array[Byte]],
      vendorId: Int = SieVendorId): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    payloads.foreach { p =>
      val inner = new java.io.ByteArrayOutputStream()
      writeVarint(inner, (1L << 3) | 0); writeVarint(inner, vendorId.toLong)
      writeVarint(inner, (5L << 3) | 2); writeVarint(inner, p.length.toLong)
      inner.write(p, 0, p.length)
      val innerBytes = inner.toByteArray
      writeVarint(out, (1L << 3) | 2)
      writeVarint(out, innerBytes.length.toLong)
      out.write(innerBytes, 0, innerBytes.length)
    }
    val body = out.toByteArray
    val frame = new java.io.ByteArrayOutputStream()
    frame.write('N'); frame.write('M'); frame.write('S'); frame.write('G')
    frame.write(0); frame.write(2) // flags=0, version=2
    frame.write((body.length >>> 24) & 0xff); frame.write((body.length >>> 16) & 0xff)
    frame.write((body.length >>> 8) & 0xff); frame.write(body.length & 0xff)
    frame.write(body, 0, body.length)
    frame.toByteArray
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // truncated input, or a preset-dictionary (FDICT) stream we don't
        // speak — without the second check the loop would spin forever
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return Array.emptyByteArray
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => Array.emptyByteArray
    } finally inf.end()
  }

  /** Walk the `Nmsg` protobuf: collect field-5 payload bytes of each
    * field-1 `NmsgPayload` whose field-1 vid == vendorId. */
  private def parsePayloads(body: Array[Byte],
      vendorId: Int): Seq[Array[Byte]] = {
    val result = Seq.newBuilder[Array[Byte]]
    var i = 0
    def varint(bytes: Array[Byte]): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        if (i >= bytes.length || shift > 63)
          throw new RuntimeException("varint overrun")
        val b = bytes(i) & 0xff; i += 1
        v |= (b & 0x7fL) << shift; shift += 7; more = (b & 0x80) != 0
      }
      v
    }
    // skips are bounded by the ENCLOSING message end, not the whole
    // buffer: a malformed inner field whose declared length runs past
    // its submessage (but inside the datagram) must fail the parse, not
    // desync it into the next payload's bytes
    def skip(bytes: Array[Byte], wire: Int, limit: Int): Unit = wire match {
      case 0 => varint(bytes): Unit
      case 1 =>
        if (i + 8 > limit) throw new RuntimeException("overrun")
        i += 8
      case 2 => val n = varint(bytes).toInt
        if (n < 0 || i + n > limit) throw new RuntimeException("overrun")
        i += n
      case 5 =>
        if (i + 4 > limit) throw new RuntimeException("overrun")
        i += 4
      case w => throw new RuntimeException(s"unsupported wire type $w")
    }
    try {
      while (i < body.length) {
        val tag = varint(body)
        if ((tag >> 3).toInt == 1 && (tag & 7).toInt == 2) {
          val len = varint(body).toInt
          if (len < 0 || i + len > body.length)
            throw new RuntimeException("overrun")
          val end = i + len
          // inner NmsgPayload
          var vid = -1
          var payload: Array[Byte] = null
          while (i < end) {
            val itag = varint(body)
            val ifield = (itag >> 3).toInt
            val iwire = (itag & 7).toInt
            if (ifield == 1 && iwire == 0) vid = varint(body).toInt
            else if (ifield == 5 && iwire == 2) {
              val plen = varint(body).toInt
              if (plen < 0 || i + plen > end)
                throw new RuntimeException("overrun")
              payload = java.util.Arrays.copyOfRange(body, i, i + plen)
              i += plen
            } else skip(body, iwire, end)
          }
          if (vid == vendorId && payload != null) result += payload
        } else skip(body, (tag & 7).toInt, body.length)
      }
      result.result()
    } catch { case _: RuntimeException => Seq.empty }
  }
}

/** S2 — AMQP delivery handling: a delivery whose headers carry
  * `compressed` is gunzipped before spooling
  * (`feeder/feeder_amqp.go:45-57,267-274`), `sensor_id` travels in a
  * header (`feeder_amqp.go:276-278`), and a failed decompress skips the
  * delivery without acking. The broker CLIENT is [[AmqpClient]] — a
  * native AMQP 0-9-1 consumer (no client library in this environment)
  * whose per-delivery callback is [[delivery]], acking on `true`;
  * [[FeederConfig.startAmqpClient]] wires a YAML-configured feeder to
  * it. */
object Amqp {

  /** `decompressBody` (`feeder_amqp.go:45-57`): the gzip payload path. */
  def decompressBody(body: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(body))
    try in.readAllBytes() finally in.close()
  }

  /** Handle one delivery into the spool; true = spooled (caller acks),
    * false = undecodable compressed body (skipped, not acked). */
  def delivery(spoolDir: String, headers: Map[String, String],
      body: Array[Byte]): Boolean = {
    val raw =
      if (headers.contains("compressed"))
        try decompressBody(body)
        catch { case _: java.io.IOException => return false }
      else body
    Feeders.spool(spoolDir, headers.getOrElse("sensor_id", ""), raw)
    true
  }
}

/** S5 — feeder registry/config (`feeder/feeder_config.go:41-150`): named
  * feeders with a type and an input format, duplicate names rejected. */
object FeederConfig {

  sealed trait FeederType
  case object Http extends FeederType
  case object Socket extends FeederType
  case object Udp extends FeederType
  /** Pre-populated directory (covers AMQP-landed data and backfills). */
  case object Dir extends FeederType

  final case class Feeder(name: String, kind: FeederType, format: String,
      options: Map[String, String] = Map.empty)

  final case class Setup(feeders: Seq[Feeder]) {
    require(feeders.map(_.name).distinct.size == feeders.size,
      "duplicate feeder name") // feeder_config.go:70-73
    feeders.foreach(f => require(
      graft.streaming.IngestPipeline.decoders.contains(f.format),
      s"unknown format '${f.format}' for feeder '${f.name}'"))
  }

  /** Start the AMQP broker client for an amqp-configured feeder: it
    * consumes deliveries into the feeder's spool directory
    * ([[Amqp.delivery]] — gunzip, sensor_id, selective ack) which
    * [[stream]] then reads as a Dir feeder; the topology (fanout
    * exchanges, the joined queue name, ttl/length limits, reconnect
    * loop) matches `feeder/feeder_amqp.go`. Caller owns `stop()`. */
  def startAmqpClient(f: Feeder,
      queueBase: String = "balboa"): AmqpClient = {
    require(f.options.contains("url"), s"feeder '${f.name}': URL missing")
    require(f.options.contains("exchange"),
      s"feeder '${f.name}': Exchange missing")
    val client = new AmqpClient(f.options("url"),
      f.options("exchange").split(",").toIndexedSeq, queueBase,
      (h, b) => Amqp.delivery(f.options("dir"), h, b))
    client.start()
    client
  }

  /** Build the decoded observation stream for one configured feeder. */
  def stream(spark: SparkSession, f: Feeder): DataFrame = {
    val raw = f.kind match {
      case Dir | Http | Udp =>
        if (f.format == "nmsg") Feeders.spoolStreamBinary(spark, f.options("dir"))
        else Feeders.spoolStream(spark, f.options("dir"))
      case Socket =>
        // the reference's unix-socket feeder maps to the TCP socket
        // source (SURVEY §2.1 S3): a YAML config carrying only the unix
        // Path cannot start a TCP stream — say so, instead of a bare
        // NoSuchElementException at stream-build time
        require(f.options.contains("port"),
          s"feeder '${f.name}': the socket feeder is served by Spark's " +
            "TCP socket source — add 'port' (and optionally 'host') to " +
            "the feeder options; the unix-socket 'path' alone cannot " +
            "carry a TCP stream")
        Feeders.socketStream(spark, f.options.getOrElse("host", "localhost"),
          f.options("port").toInt)
    }
    graft.streaming.IngestPipeline.decode(raw, f.format)
  }
}
