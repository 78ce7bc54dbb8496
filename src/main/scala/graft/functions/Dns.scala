package graft.functions

/** DNS wire-format helpers for the NMSG/SIE decoder (SURVEY.md D6).
  *
  * Pure Scala ports of the reference's parsing behavior — including its
  * quirks (fallback to the raw bytes on malformed labels, empty string for
  * corrupt A rdata) — wrapped in UDFs by [[graft.sources.Decoders.nmsg]]:
  *  - `format/format_nmsg.go:11-27` domain-label join,
  *  - `format/format_nmsg.go:41-64` numeric rrtype → mnemonic,
  *  - `format/format_nmsg.go:66-79` rdata rendering.
  */
object Dns {

  /** DNS wire-format name (length-prefixed labels) → dotted name.
    * On malformed input returns the raw bytes as a string, like the
    * reference does. */
  def parseDomainString(rdata: Array[Byte]): String = {
    if (rdata == null) return null
    val sb = new StringBuilder
    var i = 0
    var ok = true
    while (ok && i < rdata.length && rdata(i) != 0) {
      val di = rdata(i) & 0xff
      if (i + 1 + di > rdata.length) ok = false
      else {
        sb.append(new String(rdata, i + 1, di, "ISO-8859-1")).append('.')
        i += 1 + di
      }
    }
    if (!ok || sb.length < 2) new String(rdata, "ISO-8859-1")
    else sb.substring(0, sb.length - 1)
  }

  /** Numeric DNS rrtype → mnemonic for the 9 types the reference names;
    * everything else renders as the decimal number. */
  def rrtypeName(rrtype: Int): String = rrtype match {
    case 1  => "A"
    case 28 => "AAAA"
    case 5  => "CNAME"
    case 15 => "MX"
    case 2  => "NS"
    case 12 => "PTR"
    case 6  => "SOA"
    case 33 => "SRV"
    case 16 => "TXT"
    case n  => n.toString
  }

  /** Render rdata bytes per rrtype: A → dotted quad ("" if not 4 bytes),
    * NS/CNAME/MX → wire-format domain, else raw bytes as string. */
  def renderRData(rdata: Array[Byte], rrtype: Int): String = {
    if (rdata == null) return ""
    rrtype match {
      case 1 =>
        if (rdata.length != 4) ""
        else s"${rdata(0) & 0xff}.${rdata(1) & 0xff}.${rdata(2) & 0xff}.${rdata(3) & 0xff}"
      case 2 | 5 | 15 => parseDomainString(rdata)
      case _          => new String(rdata, "ISO-8859-1")
    }
  }
}

/** Minimal protobuf wire-format reader for the Farsight SIE `NewDomain`
  * message — just the four fields the reference consumes
  * (`format/newdomain.pb.go:23-42`): rrname(3, bytes), rrtype(4, varint),
  * rdata(7, repeated bytes — first element used), time_seen(2, varint).
  * The protobuf wire encoding is public and trivial (tag = field<<3|type,
  * varints, length-delimited blobs); no codegen or library needed for a
  * 4-field read-only decoder.
  */
object NmsgCodec {

  final case class NewDomain(
      rrname: Array[Byte],
      rrtype: Int,
      rdataFirst: Array[Byte],
      timeSeen: Long
  )

  /** Decode the fields we need; returns null on malformed input (caller
    * skips the record, matching the reference's error return). */
  def decode(bytes: Array[Byte]): NewDomain = {
    if (bytes == null) return null
    var i = 0
    var rrname: Array[Byte] = null
    var rrtype = 0
    var rdataFirst: Array[Byte] = null
    var timeSeen = 0L

    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        if (i >= bytes.length || shift > 63) throw new RuntimeException("varint overrun")
        val b = bytes(i) & 0xff
        i += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }

    try {
      while (i < bytes.length) {
        val tag = varint()
        val field = (tag >> 3).toInt
        val wire = (tag & 7).toInt
        wire match {
          case 0 => // varint
            val v = varint()
            if (field == 4) rrtype = v.toInt
            else if (field == 2) timeSeen = v
          case 2 => // length-delimited
            val len = varint().toInt
            if (len < 0 || i + len > bytes.length) throw new RuntimeException("blob overrun")
            if (field == 3) rrname = java.util.Arrays.copyOfRange(bytes, i, i + len)
            else if (field == 7 && rdataFirst == null)
              rdataFirst = java.util.Arrays.copyOfRange(bytes, i, i + len)
            i += len
          case 5 => i += 4 // fixed32, skip
          case 1 => i += 8 // fixed64, skip
          case _ => throw new RuntimeException(s"unsupported wire type $wire")
        }
      }
      NewDomain(rrname, rrtype,
        if (rdataFirst == null) Array.emptyByteArray else rdataFirst, timeSeen)
    } catch {
      case _: RuntimeException => null
    }
  }
}
