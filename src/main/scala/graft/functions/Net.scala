package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.graft.IpToLong
import org.apache.spark.unsafe.types.UTF8String

/** IPv4 helpers for server-side CIDR/range queries (SURVEY.md Q9).
  *
  * The reference can only answer CIDR queries by client-side expansion into
  * one point lookup per address (`cmd/balboa/cmds/query.go:32-57`); parsing
  * the address to a number turns that into a single range predicate that
  * Parquet row-group stats can prune. Implemented as a codegen'd Catalyst
  * expression ([[org.apache.spark.sql.graft.IpToLong]]) so it stays inside
  * whole-stage codegen on the scan's hot path.
  */
object Net {

  /** Dotted-quad → unsigned 32-bit value in a Long; -1 if not an IPv4. */
  def ipv4ToLong(s: UTF8String): Long = {
    if (s == null) return -1L
    val bytes = s.getBytes
    var acc = 0L; var octet = -1L; var nOctets = 0; var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if (c >= '0' && c <= '9') {
        octet = (if (octet < 0) 0 else octet) * 10 + (c - '0')
        if (octet > 255) return -1L
      } else if (c == '.') {
        if (octet < 0 || nOctets == 3) return -1L
        acc = (acc << 8) | octet; octet = -1L; nOctets += 1
      } else return -1L
      i += 1
    }
    if (octet < 0 || nOctets != 3) -1L else (acc << 8) | octet
  }

  /** Inclusive (lo, hi) address bounds of a CIDR block like "10.0.0.0/8". */
  def cidrBounds(cidr: String): (Long, Long) = {
    val Array(base, lenStr) = cidr.split("/", 2)
    val len = lenStr.toInt
    require(len >= 0 && len <= 32, s"bad prefix length in $cidr")
    val ip = ipv4ToLong(UTF8String.fromString(base))
    require(ip >= 0, s"bad IPv4 in $cidr")
    val mask = if (len == 0) 0L else (0xffffffffL << (32 - len)) & 0xffffffffL
    val lo = ip & mask
    (lo, lo | (~mask & 0xffffffffL))
  }

  /** ip_to_long(col): LongType value of an IPv4 string, null if unparsable. */
  def ip_to_long(c: Column): Column =
    GraftShims.column(IpToLong(GraftShims.expression(c)))
}
