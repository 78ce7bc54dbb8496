package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.graft.{IpToLong, Ipv6ToHex}
import org.apache.spark.unsafe.types.UTF8String

/** IPv4/IPv6 helpers for server-side CIDR/range queries (SURVEY.md Q9).
  *
  * The reference can only answer CIDR queries by client-side expansion into
  * one point lookup per address (`cmd/balboa/cmds/query.go:32-57`); parsing
  * the address to a number turns that into a single range predicate that
  * Parquet row-group stats can prune. Implemented as codegen'd Catalyst
  * expressions ([[org.apache.spark.sql.graft.IpToLong]],
  * [[org.apache.spark.sql.graft.Ipv6ToHex]]) so they stay inside
  * whole-stage codegen on the scan's hot path.
  *
  * IPv6 representation: the 128-bit address as a 32-char LOWERCASE HEX
  * string. Fixed-width hex orders lexicographically exactly like the
  * underlying unsigned integer, so BETWEEN-on-string is a correct range
  * predicate, Parquet string min/max row-group stats prune it, and any
  * engine with string comparison can mirror it (a two-long split would
  * need unsigned-compare gymnastics on both engines).
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

  /** RFC 4291 textual IPv6 → 16 groups-of-4 lowercase hex chars (the
    * canonical 32-char key), or null if the input is not an IPv6 address.
    * Accepts full form, `::` compression (one occurrence, expanding to ≥ 1
    * zero group), and an embedded dotted-quad tail (`::ffff:1.2.3.4`). */
  def ipv6ToHex(s: UTF8String): UTF8String = {
    if (s == null) return null
    val hex = parseV6(s.toString)
    if (hex == null) null else UTF8String.fromString(hex)
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** 8 16-bit groups of the address, or null if unparsable. */
  private def v6Groups(str: String): Array[Int] = {
    if (str == null || str.length < 2 || str.length > 45) return null
    val dc = str.indexOf("::")
    if (dc >= 0 && str.indexOf("::", dc + 1) >= 0) return null // one '::' max

    // hex groups of one side of the '::' (or the whole address); null on
    // any malformed token. A dotted-quad is allowed only as the LAST
    // token of the WHOLE ADDRESS (so never on the left of '::' —
    // inet_pton rejects "1.2.3.4::") and contributes two groups.
    def groupsOf(part: String, allowDotted: Boolean): Array[Int] = {
      if (part.isEmpty) return Array.emptyIntArray
      val toks = part.split(":", -1)
      val buf = new Array[Int](toks.length + 1)
      var n = 0
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.isEmpty) return null
        if (t.indexOf('.') >= 0) {
          if (!allowDotted || i != toks.length - 1) return null
          val v4 = ipv4ToLong(UTF8String.fromString(t))
          if (v4 < 0) return null
          buf(n) = ((v4 >> 16) & 0xffff).toInt; n += 1
          buf(n) = (v4 & 0xffff).toInt; n += 1
        } else {
          if (t.length > 4) return null
          var v = 0
          var j = 0
          while (j < t.length) {
            val c = t.charAt(j)
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else if (c >= 'A' && c <= 'F') c - 'A' + 10
              else return null
            v = v * 16 + d
            j += 1
          }
          buf(n) = v; n += 1
        }
        i += 1
      }
      java.util.Arrays.copyOf(buf, n)
    }

    if (dc < 0) {
      val g = groupsOf(str, allowDotted = true)
      if (g == null || g.length != 8) null else g
    } else {
      val left = groupsOf(str.substring(0, dc), allowDotted = false)
      val right = groupsOf(str.substring(dc + 2), allowDotted = true)
      if (left == null || right == null) return null
      // '::' stands for AT LEAST one zero group (inet_pton semantics)
      if (left.length + right.length > 7) return null
      val out = new Array[Int](8)
      System.arraycopy(left, 0, out, 0, left.length)
      System.arraycopy(right, 0, out, 8 - right.length, right.length)
      out
    }
  }

  private def parseV6(str: String): String = {
    val groups = v6Groups(str)
    if (groups == null) return null
    val out = new Array[Char](32)
    var i = 0
    while (i < 8) {
      val g = groups(i)
      out(4 * i) = hexDigits((g >> 12) & 0xf)
      out(4 * i + 1) = hexDigits((g >> 8) & 0xf)
      out(4 * i + 2) = hexDigits((g >> 4) & 0xf)
      out(4 * i + 3) = hexDigits(g & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Inclusive (lo, hi) 32-char-hex bounds of an IPv6 CIDR block like
    * "2001:db8::/32" — string BETWEEN on these equals numeric membership
    * (fixed-width hex preserves unsigned order). */
  def cidrBounds6(cidr: String): (String, String) = {
    val Array(base, lenStr) = cidr.split("/", 2)
    val len = lenStr.toInt
    require(len >= 0 && len <= 128, s"bad prefix length in $cidr")
    val hex = parseV6(base)
    require(hex != null, s"bad IPv6 in $cidr")
    val lo = new Array[Char](32)
    val hi = new Array[Char](32)
    var i = 0
    while (i < 32) {
      val nibble = Character.digit(hex.charAt(i), 16)
      val bitsKept = math.max(0, math.min(4, len - 4 * i)) // prefix bits in this nibble
      val mask = (0xf << (4 - bitsKept)) & 0xf
      lo(i) = hexDigits(nibble & mask)
      hi(i) = hexDigits((nibble & mask) | (~mask & 0xf))
      i += 1
    }
    (new String(lo), new String(hi))
  }

  /** ipv6_to_hex(col): 32-char lowercase hex key of an IPv6 string, null
    * if unparsable. */
  /** Longest-prefix-match enrichment join — route-table lookup as a
    * dataflow (geo/ASN/threat-list enrichment of IP-bearing telemetry;
    * the reference's CIDR query answers "which rows fall in ONE
    * prefix", this answers "which prefix owns EACH row").
    *
    * Algorithm: LPM-as-equi-join. The route table parses to
    * `(len, base − base mod 2^(32−len))` — masking is flooring to the
    * block size, pure integer arithmetic, no bitwise ops an engine
    * could disagree on. The DISTINCT prefix lengths present (≤ 33 rows,
    * the lone driver-side piece) become a literal array; each IP
    * explodes to one masked candidate per length and equi-joins on
    * (len, masked). Per IP the winner is `max_by(struct(len, cidr,
    * attr))` — longest prefix, deterministic tie-break.
    *
    * Scale shape: candidate fan-out is |ips| × (distinct lengths in the
    * table) — in real route tables ~20, never 2^32 expansion or a range
    * join; the join is a plain shuffled/broadcast equi-join Catalyst
    * can route either way (route tables are usually broadcast-sized).
    * Output: one row per ip that matched any prefix:
    * `(ipCol, cidr, prefix_len, attrCol)`. */
  def lpmJoin(ips: org.apache.spark.sql.DataFrame, ipCol: String,
      routes: org.apache.spark.sql.DataFrame, cidrCol: String,
      attrCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val two32 = 4294967296L
    def blockOf(len: Column): Column = GraftShims.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        GraftShims.expression(lit(1L)),
        GraftShims.expression((lit(32) - len).cast("int"))))
    val parsed = routes.select(
        col(cidrCol).as("cidr"), col(attrCol).as("_attr"),
        split(col(cidrCol), "/").getItem(1).cast("int").as("prefix_len"),
        ip_to_long(split(col(cidrCol), "/").getItem(0)).as("_base"))
      .withColumn("_block", blockOf(col("prefix_len")))
      .withColumn("_masked", col("_base") - pmod(col("_base"), col("_block")))
      .select(col("cidr"), col("_attr"), col("prefix_len"), col("_masked"))
    // one route-sized validation pass: malformed cidrs (no /len, bad
    // octets, nulls) fail loudly here instead of NPEing the collect or
    // silently never matching
    val chk = parsed.agg(
      collect_set(col("prefix_len")).as("lens"),
      sum(when(col("prefix_len").isNull || col("_masked").isNull, 1L)
        .otherwise(0L)).as("bad"),
      count(lit(1)).as("total")).head()
    require(chk.getLong(2) > 0L, "lpmJoin: route table is empty")
    require(chk.getLong(1) == 0L,
      s"lpmJoin: ${chk.getLong(1)} route row(s) have a malformed or " +
        "null cidr (expect dotted-quad/len)")
    val lens = chk.getSeq[Int](0).sorted
    require(lens.forall(l => l >= 0 && l <= 32),
      s"lpmJoin: prefix lengths must be in [0, 32], got ${lens.toSeq}")
    val lenBlocks = array(lens.map(l =>
      struct(lit(l).as("prefix_len"),
        lit(if (l == 0) two32 else 1L << (32 - l)).as("_block"))): _*)
    val candidates = ips
      .withColumn("_ipl", ip_to_long(col(ipCol)))
      .withColumn("_lb", explode(lenBlocks))
      .select(col("*"), col("_lb.prefix_len").as("prefix_len"),
        (col("_ipl") - pmod(col("_ipl"), col("_lb._block"))).as("_masked"))
      .drop("_lb")
    candidates.join(parsed, Seq("prefix_len", "_masked"))
      .groupBy(col(ipCol))
      .agg(max_by(struct(col("prefix_len"), col("cidr"), col("_attr")),
        struct(col("prefix_len"), col("cidr"), col("_attr"))).as("_w"))
      .select(col(ipCol), col("_w.cidr").as("cidr"),
        col("_w.prefix_len").cast("long").as("prefix_len"),
        col("_w._attr").as(attrCol))
  }

  def ipv6_to_hex(c: Column): Column =
    GraftShims.column(Ipv6ToHex(GraftShims.expression(c)))

  /** Prefix-preserving IPv4 anonymization at octet granularity — the
    * transform that lets passive-DNS / netflow logs LEAVE the building
    * (GDPR treats client IPs as personal data, but subnet structure is
    * the analytical signal; Crypto-PAn [Xu et al., ICNP'02] proved the
    * per-prefix-keyed rewrite preserves it): octet i XORs with a mask
    * byte derived from `md5(secret:<raw octets 1..i-1>)`, so two
    * addresses agree on the first k ANONYMIZED octets IFF they agreed
    * on the first k RAW octets — subnet joins, /24 spreads
    * ([[graft.operators.DnsAnalytics.fastFluxSignals]]) and CIDR
    * rollups all still work on the anonymized column, while recovering
    * a raw address needs the secret. Octet (not bit) granularity is
    * documented semantics: coarser than Crypto-PAn's bitwise tree, 4
    * md5s per row instead of 32, and exactly mirrorable in one SQL
    * expression (all md5-derived, so every engine/run agrees).
    *
    * Scale shape: pure narrow map, codegen'd concat/md5/xor chain,
    * zero shuffle. Malformed addresses (anything [[ip_to_long]]
    * rejects) return NULL rather than a half-anonymized string. */
  def anonymizeIpv4(c: Column, secret: String): Column = {
    import org.apache.spark.sql.functions._
    val parts = split(c, "\\.")
    def maskByte(prefix: Column): Column =
      conv(substring(md5(prefix), 1, 2), 16, 10).cast("long")
    def anonOctet(i: Int): Column = {
      val prefix =
        if (i == 1) lit(s"$secret:")
        else concat(lit(s"$secret:"),
          concat_ws(".", (1 until i).map(j => element_at(parts, j)): _*))
      element_at(parts, i).cast("long").bitwiseXOR(maskByte(prefix))
    }
    when(ip_to_long(c) >= 0L,
      concat_ws(".", (1 to 4).map(i => anonOctet(i).cast("string")): _*))
  }
}
