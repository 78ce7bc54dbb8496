package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}

/** AMQP 0-9-1 wire codec — frames, field values and the method payloads
  * the consumer needs, straight from the public protocol specification
  * (amqp0-9-1.pdf §2.3 framing, §4.2 field tables). Shared by the
  * [[AmqpClient]] and the in-test mini broker, so the byte layout is
  * exercised from BOTH sides like the balboa TCP protocol
  * (`serve/BalboaTcp.scala`) is.
  *
  * Only the general framing lives here; method semantics stay in the
  * client. Field-table values cover the types RabbitMQ emits in
  * practice; unknown types fail loudly rather than desync the stream.
  */
object AmqpCodec {

  val ProtocolHeader: Array[Byte] =
    Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)

  val FrameMethod = 1
  val FrameHeader = 2
  val FrameBody = 3
  val FrameHeartbeat = 8
  val FrameEnd: Int = 0xce

  final case class Frame(tpe: Int, channel: Int, payload: Array[Byte])

  def readFrame(in: DataInputStream): Frame = {
    val tpe = in.readUnsignedByte()
    val channel = in.readUnsignedShort()
    val size = in.readInt()
    if (size < 0 || size > 128 * 1024 * 1024)
      throw new EOFException(s"bad frame size $size")
    val payload = new Array[Byte](size)
    in.readFully(payload)
    val end = in.readUnsignedByte()
    if (end != FrameEnd)
      throw new EOFException(f"bad frame end 0x$end%02x")
    Frame(tpe, channel, payload)
  }

  def writeFrame(out: DataOutputStream, tpe: Int, channel: Int,
      payload: Array[Byte]): Unit = {
    out.writeByte(tpe)
    out.writeShort(channel)
    out.writeInt(payload.length)
    out.write(payload)
    out.writeByte(FrameEnd)
    out.flush()
  }

  /** Sequential writer for a method/header payload. */
  final class Writer {
    private val buf = new ByteArrayOutputStream(256)
    private val out = new DataOutputStream(buf)
    def u8(v: Int): Writer = { out.writeByte(v); this }
    def u16(v: Int): Writer = { out.writeShort(v); this }
    def u32(v: Int): Writer = { out.writeInt(v); this }
    def u64(v: Long): Writer = { out.writeLong(v); this }
    def shortStr(s: String): Writer = {
      val b = s.getBytes("UTF-8")
      require(b.length < 256, s"shortstr too long: ${b.length}")
      out.writeByte(b.length); out.write(b); this
    }
    def longStr(b: Array[Byte]): Writer = {
      out.writeInt(b.length); out.write(b); this
    }
    def longStr(s: String): Writer = longStr(s.getBytes("UTF-8"))
    def table(t: Seq[(String, Any)]): Writer = {
      val inner = new Writer
      t.foreach { case (k, v) =>
        inner.shortStr(k)
        v match {
          case s: String => inner.u8('S'); inner.longStr(s)
          case i: Int => inner.u8('I'); inner.u32(i)
          case l: Long => inner.u8('l'); inner.u64(l)
          case b: Boolean => inner.u8('t'); inner.u8(if (b) 1 else 0)
          case nested: Seq[_] =>
            inner.u8('F')
            inner.table(nested.asInstanceOf[Seq[(String, Any)]])
          case other => throw new IllegalArgumentException(
            s"unsupported table value: $other")
        }
      }
      val bytes = inner.bytes
      out.writeInt(bytes.length); out.write(bytes); this
    }
    def bytes: Array[Byte] = { out.flush(); buf.toByteArray }
  }

  /** Sequential reader over a method/header payload. */
  final class Reader(payload: Array[Byte]) {
    private val in = new DataInputStream(
      new java.io.ByteArrayInputStream(payload))
    def u8(): Int = in.readUnsignedByte()
    def u16(): Int = in.readUnsignedShort()
    def u32(): Int = in.readInt()
    def u64(): Long = in.readLong()
    def shortStr(): String = {
      val n = in.readUnsignedByte()
      val b = new Array[Byte](n); in.readFully(b)
      new String(b, "UTF-8")
    }
    def longStrBytes(): Array[Byte] = {
      val n = in.readInt()
      val b = new Array[Byte](n); in.readFully(b)
      b
    }
    def longStr(): String = new String(longStrBytes(), "UTF-8")
    def table(): Map[String, Any] = {
      val n = in.readInt()
      val body = new Array[Byte](n); in.readFully(body)
      readTable(body)
    }
    private def readTable(body: Array[Byte]): Map[String, Any] = {
      val r = new Reader(body)
      val out = Map.newBuilder[String, Any]
      var remaining = body.length
      while (remaining > 0) {
        val before = r.in.available()
        val k = r.shortStr()
        val v = r.value()
        out += (k -> v)
        remaining -= before - r.in.available()
      }
      out.result()
    }
    def value(): Any = u8().toChar match {
      case 'S' => longStr()
      case 'I' => u32()
      case 'l' => u64()
      case 't' => u8() != 0
      case 'b' => in.readByte()
      case 's' => in.readShort()
      case 'f' => in.readFloat()
      case 'd' => in.readDouble()
      case 'T' => u64()
      case 'F' => table()
      case 'V' => null
      case 'x' => longStrBytes()
      case 'A' =>
        val n = u32()
        val body = new Array[Byte](n); in.readFully(body)
        val r = new Reader(body)
        val items = Vector.newBuilder[Any]
        while (r.in.available() > 0) items += r.value()
        items.result()
      case 'D' => { u8(); u32() } // decimal: scale + value, as raw pair
      case other => throw new IllegalArgumentException(
        s"unsupported field type '$other'")
    }
  }

  /** (classId, methodId, argument reader) of a method frame. */
  def method(f: Frame): (Int, Int, Reader) = {
    require(f.tpe == FrameMethod, s"not a method frame: ${f.tpe}")
    val r = new Reader(f.payload)
    (r.u16(), r.u16(), r)
  }

  /** Method frame payload: classId, methodId, then `args` writes. */
  def methodPayload(classId: Int, methodId: Int)(
      args: Writer => Unit): Array[Byte] = {
    val w = new Writer
    w.u16(classId); w.u16(methodId)
    args(w)
    w.bytes
  }

  /** Content-header payload for class 60 (basic): body size + the
    * properties actually used (a headers table when non-empty). */
  def basicHeaderPayload(bodySize: Long,
      headers: Seq[(String, Any)]): Array[Byte] = {
    val w = new Writer
    w.u16(60); w.u16(0); w.u64(bodySize)
    if (headers.isEmpty) w.u16(0)
    else { w.u16(0x2000); w.table(headers) } // bit 13 = headers table
    w.bytes
  }

  /** Parse a class-60 content header: (bodySize, headers). Properties
    * other than the headers table are skipped in flag order. */
  def parseBasicHeader(f: Frame): (Long, Map[String, Any]) = {
    require(f.tpe == FrameHeader, s"not a header frame: ${f.tpe}")
    val r = new Reader(f.payload)
    val cls = r.u16()
    require(cls == 60, s"unexpected content class $cls")
    r.u16() // weight
    val bodySize = r.u64()
    val flags = r.u16()
    def has(bit: Int): Boolean = (flags & (1 << bit)) != 0
    if (has(15)) r.shortStr() // content-type
    if (has(14)) r.shortStr() // content-encoding
    val headers = if (has(13)) r.table() else Map.empty[String, Any]
    // remaining properties are irrelevant to the feeder; stop here
    (bodySize, headers)
  }
}
