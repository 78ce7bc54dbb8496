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
    * (default "unknown" like `feeder/feeder_http.go:44-49`). */
  final class HttpFeeder(spoolDir: String, port: Int = 0) {
    private val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod == "POST") {
          val sensor = Option(ex.getRequestHeaders.getFirst("X-Sensor-ID"))
            .getOrElse("unknown")
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

  /** S4 — NMSG UDP feeder: datagram receiver spooling binary payloads.
    * The NMSG container framing carries a vendor id; payloads whose first
    * byte ≠ the expected magic are dropped like the reference's
    * vendor-id != 2 filter (`feeder/feeder_nmsg_socket.go:60-77`). The
    * spooled payload is the protobuf body for [[Decoders.nmsg]]. */
  final class UdpFeeder(spoolDir: String, port: Int = 0, mtu: Int = 9000,
      accept: Array[Byte] => Boolean = _ => true) {
    private val socket = new DatagramSocket(
      new InetSocketAddress("127.0.0.1", port))
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
            val payload = java.util.Arrays.copyOfRange(buf, 0, pkt.getLength)
            if (accept(payload)) spool(spoolDir, sensorId, payload)
          } catch { case _: java.net.SocketException => () /* closed */ }
        }
      }, "graft-udp-feeder")
      thread.setDaemon(true)
      thread.start()
    }

    def stop(): Unit = { running.set(false); socket.close() }
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

  /** Build the decoded observation stream for one configured feeder. */
  def stream(spark: SparkSession, f: Feeder): DataFrame = {
    val raw = f.kind match {
      case Dir | Http | Udp =>
        if (f.format == "nmsg") Feeders.spoolStreamBinary(spark, f.options("dir"))
        else Feeders.spoolStream(spark, f.options("dir"))
      case Socket =>
        Feeders.socketStream(spark, f.options.getOrElse("host", "localhost"),
          f.options("port").toInt)
    }
    graft.streaming.IngestPipeline.decode(raw, f.format)
  }
}
