package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket, SocketTimeoutException}
import java.util.concurrent.ConcurrentLinkedQueue

import graft.sources.AmqpCodec
import graft.sources.AmqpCodec._

/** Test-side AMQP 0-9-1 broker implementing exactly the server half the
  * consumer handshake needs — the counterpart that lets AmqpSpec pin the
  * client's wire bytes from both sides (the BalboaTcpSpec stance). One
  * client at a time; records every piece of declared topology and every
  * ack; `publish` enqueues deliveries that are pushed once a consumer is
  * active (and survive reconnects, like a durable exchange feeding a
  * redeclared queue). `dropConnection` severs the socket to exercise the
  * client's reconnect loop. */
final class MiniAmqpBroker {
  private val server = new ServerSocket(0)
  server.setSoTimeout(200)
  def port: Int = server.getLocalPort

  // recorded topology + acks (appended across connections)
  val exchangeDeclares = new ConcurrentLinkedQueue[(String, String, Int)]
  val queueDeclares = new ConcurrentLinkedQueue[(String, Int, Map[String, Any])]
  val queueBinds = new ConcurrentLinkedQueue[(String, String, String)]
  val consumes = new ConcurrentLinkedQueue[(String, String)]
  val acks = new ConcurrentLinkedQueue[(Long, Boolean)]
  val startOkMechanisms = new ConcurrentLinkedQueue[String]

  private val pending =
    new ConcurrentLinkedQueue[(Seq[(String, Any)], Array[Byte])]
  @volatile private var deliveryTag = 0L
  @volatile private var stopped = false
  @volatile private var current: Socket = _
  @volatile var connectionsServed = 0

  def publish(headers: Seq[(String, Any)], body: Array[Byte]): Unit =
    pending.add((headers, body)): Unit

  def dropConnection(): Unit = {
    val s = current
    if (s != null) { try s.close() catch { case _: Exception => () } }
  }

  def stop(): Unit = {
    stopped = true
    dropConnection()
    try server.close() catch { case _: Exception => () }
    thread.join(5000)
  }

  private val thread = new Thread("mini-amqp-broker") {
    override def run(): Unit = {
      while (!stopped) {
        try {
          val s = server.accept()
          current = s
          connectionsServed += 1
          try serve(s)
          catch { case _: Exception => () }
          finally { try s.close() catch { case _: Exception => () } }
        } catch {
          case _: SocketTimeoutException => ()
          case _: Exception => ()
        }
      }
    }
  }
  thread.setDaemon(true)
  thread.start()

  private def serve(s: Socket): Unit = {
    s.setSoTimeout(50)
    val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
    val out = new DataOutputStream(
      new BufferedOutputStream(s.getOutputStream))
    val header = new Array[Byte](8)
    in.readFully(header)
    require(header.sameElements(AmqpCodec.ProtocolHeader),
      "bad protocol header")

    def sendMethod(ch: Int, cls: Int, mth: Int)(
        args: Writer => Unit): Unit =
      writeFrame(out, FrameMethod, ch, methodPayload(cls, mth)(args))

    // connection.start
    sendMethod(0, 10, 10) { w =>
      w.u8(0): Unit; w.u8(9): Unit
      w.table(Seq("product" -> "mini")): Unit
      w.longStr("PLAIN"): Unit
      w.longStr("en_US"): Unit
    }
    var consuming = false
    while (!stopped) {
      // push pending deliveries once a consumer is established
      if (consuming) {
        var next = pending.poll()
        while (next != null) {
          val (headers, body) = next
          deliveryTag += 1
          sendMethod(1, 60, 60) { w =>
            w.shortStr("balboa"): Unit
            w.u64(deliveryTag): Unit
            w.u8(0): Unit
            w.shortStr("pdns"): Unit
            w.shortStr(""): Unit
          }
          writeFrame(out, FrameHeader, 1,
            basicHeaderPayload(body.length, headers))
          // split the body over two frames when possible: the client
          // must reassemble multi-frame content
          val cut = body.length / 2
          if (cut > 0)
            writeFrame(out, FrameBody, 1, body.slice(0, cut))
          writeFrame(out, FrameBody, 1, body.slice(cut, body.length))
          next = pending.poll()
        }
      }
      val frame =
        try Some(readFrame(in))
        catch { case _: SocketTimeoutException => None }
      frame.foreach { f =>
        if (f.tpe == FrameMethod) {
          val (c, m, r) = AmqpCodec.method(f)
          (c, m) match {
            case (10, 11) => // start-ok
              r.table(): Unit
              startOkMechanisms.add(r.shortStr()): Unit
              sendMethod(0, 10, 30) { w => // tune
                w.u16(2047): Unit; w.u32(131072): Unit; w.u16(0): Unit
              }
            case (10, 31) => () // tune-ok
            case (10, 40) => // open
              sendMethod(0, 10, 41)(w => w.shortStr(""): Unit)
            case (20, 10) => // channel.open
              sendMethod(1, 20, 11)(w => w.longStr(""): Unit)
            case (40, 10) => // exchange.declare
              r.u16(): Unit
              val (name, tpe, flags) = (r.shortStr(), r.shortStr(), r.u8())
              exchangeDeclares.add((name, tpe, flags)): Unit
              sendMethod(1, 40, 11)(_ => ())
            case (50, 10) => // queue.declare
              r.u16(): Unit
              val name = r.shortStr()
              val flags = r.u8()
              val args = r.table()
              queueDeclares.add((name, flags, args)): Unit
              sendMethod(1, 50, 11) { w =>
                w.shortStr(name): Unit; w.u32(0): Unit; w.u32(0): Unit
              }
            case (50, 20) => // queue.bind
              r.u16(): Unit
              val (q, ex, key) = (r.shortStr(), r.shortStr(), r.shortStr())
              queueBinds.add((q, ex, key)): Unit
              sendMethod(1, 50, 21)(_ => ())
            case (60, 20) => // basic.consume
              r.u16(): Unit
              val (q, tag) = (r.shortStr(), r.shortStr())
              consumes.add((q, tag)): Unit
              sendMethod(1, 60, 21)(w => w.shortStr(tag): Unit)
              consuming = true
            case (60, 80) => // basic.ack
              acks.add((r.u64(), r.u8() != 0)): Unit
            case _ => ()
          }
        }
      }
    }
  }
}
