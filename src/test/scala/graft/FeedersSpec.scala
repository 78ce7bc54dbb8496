package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ObservationStore
import graft.sources.{Decoders, FeederConfig, Feeders}
import graft.streaming.IngestPipeline

/** Feeder layer: real network receivers (HTTP POST, UDP datagrams) spooling
  * into the streaming file-source contract, consumed end-to-end. */
class FeedersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val suriV1 =
    """{"timestamp": "2009-11-24T21:27:09.534255-0100", "event_type": "dns",
      | "dns": {"type": "answer", "rrname": "twitter.com", "rrtype":"A",
      |  "rdata": "199.16.156.6"}}""".stripMargin

  test("HTTP feeder: POST with X-Sensor-ID spools; decoded via file source") {
    val dir = Files.createTempDirectory("graft-http").toString
    val feeder = new Feeders.HttpFeeder(dir)
    feeder.start()
    try {
      val client = HttpClient.newHttpClient()
      val resp: HttpResponse[String] = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${feeder.boundPort}/"))
          .header("X-Sensor-ID", "sensor one/x")
          .POST(HttpRequest.BodyPublishers.ofString(suriV1)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      // no header -> empty sensor, like r.Header.Get (feeder_http.go:49-50)
      client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${feeder.boundPort}/"))
          .POST(HttpRequest.BodyPublishers.ofString(suriV1)).build(),
        HttpResponse.BodyHandlers.ofString())
    } finally feeder.stop()

    val decoded = Decoders.suricata(Feeders.spoolBatch(spark, dir)).collect()
    assert(decoded.length == 2)
    assert(decoded.map(_.getAs[String]("sensor_id")).toSet ==
      Set("sensor one/x", ""))
  }

  // NewDomain protobuf: rrname=example.com, rrtype=A, rdata=9.9.9.9
  private def newDomainPayload: Array[Byte] = {
    def varint(v: Long): Seq[Byte] = {
      var x = v; val b = Seq.newBuilder[Byte]
      while ((x & ~0x7fL) != 0) { b += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      b += x.toByte; b.result()
    }
    val name = Seq(7.toByte) ++ "example".getBytes.toSeq ++
      Seq(3.toByte) ++ "com".getBytes.toSeq ++ Seq(0.toByte)
    (varint(2L << 3) ++ varint(1650000000L) ++
      varint((3L << 3) | 2) ++ varint(name.length.toLong) ++ name ++
      varint(4L << 3) ++ varint(1L) ++
      varint((7L << 3) | 2) ++ varint(4L) ++ Seq[Byte](9, 9, 9, 9)).toArray
  }

  test("UDP feeder: framed NMSG containers spool payload bodies and decode") {
    val dir = Files.createTempDirectory("graft-udp").toString
    val feeder = new Feeders.UdpFeeder(dir)
    feeder.start(sensorId = "sie")
    try {
      val framed = sources.NmsgContainer.buildContainer(Seq(newDomainPayload))
      val sock = new DatagramSocket()
      sock.send(new DatagramPacket(framed, framed.length,
        InetAddress.getByName("127.0.0.1"), feeder.boundPort))
      // an unframed datagram (no NMSG magic) must be DROPPED, not spooled
      val bare = newDomainPayload
      sock.send(new DatagramPacket(bare, bare.length,
        InetAddress.getByName("127.0.0.1"), feeder.boundPort))
      sock.close()
      // receiver thread is async: wait for the spool file
      val deadline = System.currentTimeMillis() + 5000
      while (new java.io.File(dir).listFiles((_, n) => n.endsWith(".msg"))
               .isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally feeder.stop()

    val decoded = Decoders.nmsg(Feeders.spoolBatchBinary(spark, dir)).collect()
    assert(decoded.length == 1)
    assert(decoded.head.getAs[String]("rrname") == "example.com")
    assert(decoded.head.getAs[String]("rdata") == "9.9.9.9")
    assert(decoded.head.getAs[String]("sensor_id") == "sie")
  }

  test("NMSG container parsing: vendor filter, multi-payload, malformed") {
    import sources.NmsgContainer
    val p1 = newDomainPayload
    val p2 = Array[Byte](1, 2, 3)
    // two payloads in one container, both vendor 2
    val two = NmsgContainer.extractPayloads(
      NmsgContainer.buildContainer(Seq(p1, p2)))
    assert(two.length == 2)
    assert(two.head.sameElements(p1) && two(1).sameElements(p2))
    // vendor id != 2 (feeder_nmsg_socket.go:66-70) -> filtered out
    assert(NmsgContainer.extractPayloads(
      NmsgContainer.buildContainer(Seq(p1), vendorId = 1)).isEmpty)
    // wrong magic / truncated / wrong version -> dropped
    assert(NmsgContainer.extractPayloads("XXXX??????".getBytes).isEmpty)
    assert(NmsgContainer.extractPayloads(Array[Byte](1, 2)).isEmpty)
    val badVersion = NmsgContainer.buildContainer(Seq(p1))
    badVersion(5) = 9
    assert(NmsgContainer.extractPayloads(badVersion).isEmpty)
    // truncated body (declared length > available bytes)
    val truncated = NmsgContainer.buildContainer(Seq(p1)).dropRight(3)
    assert(NmsgContainer.extractPayloads(truncated).isEmpty)
    // crafted length 0x7fffffff: `10 + len` overflows Int — must be
    // dropped, not thrown (an exception here kills the feeder thread)
    val overflow = Array[Byte]('N', 'M', 'S', 'G', 0, 2,
      0x7f, 0xff.toByte, 0xff.toByte, 0xff.toByte, 1, 2, 3)
    assert(NmsgContainer.extractPayloads(overflow).isEmpty)
  }

  test("AMQP delivery: compressed header gunzips, bad gzip skipped") {
    import sources.Amqp
    val dir = Files.createTempDirectory("graft-amqp").toString
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(bos)
      out.write(suriV1.getBytes("UTF-8")); out.close()
      bos.toByteArray
    }
    // gzip round-trip (feeder_amqp.go:45-57)
    assert(new String(Amqp.decompressBody(gz), "UTF-8") == suriV1)
    // compressed delivery spools the DECOMPRESSED body
    assert(Amqp.delivery(dir, Map("compressed" -> "true",
      "sensor_id" -> "amqp-1"), gz))
    // plain delivery spools as-is; missing sensor_id header -> ""
    assert(Amqp.delivery(dir, Map.empty, suriV1.getBytes("UTF-8")))
    // corrupt gzip: skipped (false = not acked), nothing spooled
    assert(!Amqp.delivery(dir, Map("compressed" -> "1"),
      Array[Byte](0x1f, 0x0b, 1, 2, 3)))

    val decoded = Decoders.suricata(Feeders.spoolBatch(spark, dir)).collect()
    assert(decoded.length == 2)
    assert(decoded.map(_.getAs[String]("sensor_id")).toSet == Set("amqp-1", ""))
  }

  test("configured Dir feeder streams end-to-end into a store") {
    val spool = Files.createTempDirectory("graft-spool").toString
    val dir = Files.createTempDirectory("graft-feedstore").toString
    Feeders.spool(spool, "cfg-sensor", suriV1.getBytes("UTF-8"))
    val setup = FeederConfig.Setup(Seq(
      FeederConfig.Feeder("main", FeederConfig.Dir, "suricata",
        Map("dir" -> spool))))
    val obs = FeederConfig.stream(spark, setup.feeders.head)
    val q = IngestPipeline.start(spark, obs, Nil,
      Seq(IngestPipeline.Sink("all", None, s"$dir/all")), s"$dir/ckpt")
    q.processAllAvailable()
    q.stop()
    val st = ObservationStore.load(spark, s"$dir/all")
    val rows = st.entries(rrname = Some("twitter.com")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("sensor_id") == "cfg-sensor")
  }

  test("YAML amqp feeder: broker -> spool -> stream -> store, config-to-store") {
    // the reference's feeders.yaml AMQP entry, unmodified shape: the
    // native client consumes the broker into the spool, and the SAME
    // feeder definition then streams that spool (Dir semantics) through
    // the ingest pipeline into a queryable store
    val broker = new MiniAmqpBroker
    val spoolRoot = Files.createTempDirectory("graft-amqp-cfg").toString
    val storeDir = Files.createTempDirectory("graft-amqp-cfgstore").toString
    val yaml =
      s"""feeder:
         |  - name: pdns amqp
         |    type: amqp
         |    url: amqp://127.0.0.1:${broker.port}
         |    exchange: [pdns]
         |    input_format: suricata
         |""".stripMargin
    val setup = graft.sources.ConfigYaml.loadFeederSetup(yaml, spoolRoot)
    val feeder = setup.feeders.head
    assert(feeder.kind == FeederConfig.Dir) // amqp streams its spool
    val client = FeederConfig.startAmqpClient(feeder)
    try {
      // one plain and one gzip-compressed delivery (feeder_amqp.go's
      // two payload paths), sensor ids via headers
      broker.publish(Seq("sensor_id" -> "amqp-a"),
        suriV1.getBytes("UTF-8"))
      val gz = {
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.util.zip.GZIPOutputStream(bos)
        out.write(suriV1.replace("twitter.com", "example.org")
          .getBytes("UTF-8"))
        out.close()
        bos.toByteArray
      }
      broker.publish(Seq("sensor_id" -> "amqp-b", "compressed" -> "true"),
        gz)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (broker.acks.size() < 2 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(broker.acks.size() == 2, "broker deliveries not acked")

      val obs = FeederConfig.stream(spark, feeder)
      val q = IngestPipeline.start(spark, obs, Nil,
        Seq(IngestPipeline.Sink("all", None, s"$storeDir/all")),
        s"$storeDir/ckpt")
      q.processAllAvailable()
      q.stop()
      val st = ObservationStore.load(spark, s"$storeDir/all")
      val a = st.entries(rrname = Some("twitter.com")).collect()
      assert(a.length == 1 && a.head.getAs[String]("sensor_id") == "amqp-a")
      val b = st.entries(rrname = Some("example.org")).collect()
      assert(b.length == 1 && b.head.getAs[String]("sensor_id") == "amqp-b")
    } finally { client.stop(); broker.stop() }
  }

  test("feeder registry rejects duplicate names and unknown formats") {
    def f(n: String, fmt: String = "suricata") =
      FeederConfig.Feeder(n, FeederConfig.Dir, fmt, Map("dir" -> "/tmp/x"))
    intercept[IllegalArgumentException](
      FeederConfig.Setup(Seq(f("a"), f("a"))))
    intercept[IllegalArgumentException](
      FeederConfig.Setup(Seq(f("a", fmt = "nope"))))
    FeederConfig.Setup(Seq(f("a"), f("b"))) // distinct names fine
  }
}
