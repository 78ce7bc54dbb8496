package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Amqp, AmqpClient, Feeders}

/** The AMQP consumer against the in-test mini broker: handshake bytes,
  * topology parity with the reference feeder (exchange/queue/bind/
  * consume arguments), delivery spooling incl. gzip and sensor_id,
  * selective acks, multi-frame bodies, and the reconnect loop. */
class AmqpSpec extends AnyFunSuite {

  private def await(what: String, timeoutMs: Long = 10000)(
      cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      if (System.currentTimeMillis() > deadline)
        fail(s"timed out waiting for $what")
      Thread.sleep(20)
    }
  }

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  test("handshake + topology match the reference feeder; deliveries " +
      "spool, acks are selective, reconnect redeclares") {
    import scala.jdk.CollectionConverters._
    val broker = new MiniAmqpBroker
    val spool = Files.createTempDirectory("graft-amqp-spool").toString
    val client = new AmqpClient(
      s"amqp://user:pw@127.0.0.1:${broker.port}/vh",
      exchanges = Seq("pdns", "extra"), queueBase = "balboa",
      onDelivery = (h, b) => Amqp.delivery(spool, h, b),
      reconnectDelayMillis = 100)
    try {
      client.start()
      await("consume established")(broker.consumes.size() == 1)

      // topology parity (feeder_amqp.go:109-199)
      assert(broker.startOkMechanisms.asScala.toSeq == Seq("PLAIN"))
      assert(broker.exchangeDeclares.asScala.toSet ==
        Set(("pdns", "fanout", 0x02), ("extra", "fanout", 0x02)))
      val (qName, qFlags, qArgs) = broker.queueDeclares.peek()
      assert(qName == "pdns.extra.balboa") // exchanges joined + base
      assert(qFlags == 0x0c) // exclusive + auto-delete, NOT durable
      assert(qArgs == Map("x-message-ttl" -> 300000,
        "x-max-length-bytes" -> 100 * 1024 * 1024))
      assert(broker.queueBinds.asScala.toSet ==
        Set(("pdns.extra.balboa", "pdns", ""),
          ("pdns.extra.balboa", "extra", "")))
      assert(broker.consumes.peek() == (("pdns.extra.balboa", "balboa")))

      // three deliveries: plain + sensor, gzip'd (multi-frame body),
      // corrupt gzip (must NOT ack — feeder_amqp.go:296-302)
      broker.publish(Seq("sensor_id" -> "s1"), "plain body".getBytes("UTF-8"))
      broker.publish(Seq("compressed" -> "true", "sensor_id" -> "s2"),
        gz("compressed body"))
      broker.publish(Seq("compressed" -> "true"), Array[Byte](1, 2, 3))
      await("acks for deliveries 1 and 2")(broker.acks.size() == 2)
      assert(broker.acks.asScala.toSet == Set((1L, true), (2L, true)))
      val spooled = new java.io.File(spool).listFiles()
        .filter(_.getName.endsWith(".msg"))
        .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8") ->
          f.getName.split("__")(1).stripSuffix(".msg")).toSet
      assert(spooled == Set("plain body" -> "s1",
        "compressed body" -> "s2"))

      // sever the connection: the client must redial, redo the FULL
      // topology, resume consuming, and drain a message published
      // meanwhile (reconnectOnFailure, feeder_amqp.go:60-86)
      broker.dropConnection()
      broker.publish(Seq("sensor_id" -> "s3"), "after".getBytes("UTF-8"))
      await("reconnect")(client.connections >= 2)
      await("post-reconnect delivery")(broker.acks.size() == 3)
      assert(broker.exchangeDeclares.size() == 4) // both, twice
      assert(broker.queueDeclares.size() == 2)
      val all = new java.io.File(spool).listFiles()
        .filter(_.getName.endsWith(".msg"))
        .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).toSet
      assert(all == Set("plain body", "compressed body", "after"))
    } finally {
      client.stop()
      broker.stop()
    }
  }

  test("YAML-configured amqp feeder consumes through the native client") {
    val broker = new MiniAmqpBroker
    val spoolRoot = Files.createTempDirectory("graft-amqp-yaml").toString
    val yaml =
      s"""feeder:
         |  - name: pdns feed
         |    type: amqp
         |    url: amqp://127.0.0.1:${broker.port}
         |    exchange: [pdns]
         |    input_format: fever_aggregate
         |""".stripMargin
    val setup = graft.sources.ConfigYaml.loadFeederSetup(yaml, spoolRoot)
    val client = graft.sources.FeederConfig
      .startAmqpClient(setup.feeders.head)
    try {
      assert(client.queueName == "pdns.balboa")
      broker.publish(Seq("sensor_id" -> "y1"), "hello".getBytes("UTF-8"))
      await("ack")(broker.acks.size() == 1)
      val files = new java.io.File(s"$spoolRoot/pdns_feed").listFiles()
        .filter(_.getName.endsWith(".msg"))
      assert(files.length == 1)
      assert(new String(Files.readAllBytes(files.head.toPath),
        "UTF-8") == "hello")
    } finally { client.stop(); broker.stop() }
  }

  test("spooled AMQP deliveries decode through the ingest pipeline") {
    val spark = TestSpark.spark
    val broker = new MiniAmqpBroker
    val spool = Files.createTempDirectory("graft-amqp-e2e").toString
    val eve = """{"timestamp":"2020-05-18T12:34:56.000000+0000",""" +
      """"event_type":"dns","dns":{"type":"answer","rrname":"x.example",""" +
      """"rrtype":"A","rdata":"1.2.3.4"}}"""
    val client = new AmqpClient(s"amqp://127.0.0.1:${broker.port}",
      Seq("pdns"), "q", (h, b) => Amqp.delivery(spool, h, b), 100)
    try {
      client.start()
      broker.publish(Seq("compressed" -> "1", "sensor_id" -> "amqp-e2e"),
        gz(eve))
      await("ack")(broker.acks.size() == 1)
    } finally { client.stop(); broker.stop() }
    val decoded = graft.sources.Decoders
      .suricata(Feeders.spoolBatch(spark, spool)).collect()
    assert(decoded.length == 1)
    assert(decoded.head.getAs[String]("rrname") == "x.example")
    assert(decoded.head.getAs[String]("sensor_id") == "amqp-e2e")
  }
}
