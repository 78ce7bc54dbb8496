package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization as pure Column expressions — the dedup-key
  * normalization step of a web-corpus pipeline (CommonCrawl-style
  * crawls reach the same page through case-variant hosts, default
  * ports, duplicate slashes, fragment anchors and permuted query
  * strings; canonicalizing BEFORE the exact/MinHash dedup stages is
  * what lets them see those as one document).
  *
  * Rules (the conservative, loss-free subset every canonicalizer
  * agrees on): lowercase scheme and host (NEVER the path — paths are
  * case-sensitive), strip the scheme's default port (:80 http, :443
  * https), drop the fragment, collapse duplicate slashes in the path,
  * strip one trailing slash (except the root path), sort query
  * parameters byte-wise. %-escape decoding is deliberately NOT done
  * (it can change meaning — '%2F' vs '/').
  *
  * Everything is regexp/split/sort built-ins (codegen'd, zero UDFs)
  * chosen to behave identically under Java regex and RE2: anchored
  * single-match patterns, no backreferences — so the oracle SQL
  * mirrors the chain literally. A value with no `scheme://` prefix
  * passes through with only fragment/query handling (host rules
  * can't apply when no host is identifiable).
  */
object Url {

  def normalize(u: Column): Column = {
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val rest = regexp_replace(u, schemeRe, "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val auth = regexp_extract(noFrag, "^([^/?]+)", 1)
    // userinfo (user:pass@) is case-SENSITIVE per RFC 3986 — carry it
    // through verbatim; only the host past it gets lowercased
    val userinfo = regexp_extract(auth, "^([^@]*@)", 1)
    val hostport = lower(regexp_replace(auth, "^[^@]*@", ""))
    val host = concat(userinfo,
      when(scheme === "http", regexp_replace(hostport, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport))
    val pq = regexp_replace(noFrag, "^[^/?]+", "")
    val path0 = regexp_extract(pq, "^([^?]*)", 1)
    val query = regexp_replace(pq, "^[^?]*\\??", "")
    val collapsed = regexp_replace(path0, "/{2,}", "/")
    val path1 = when(collapsed === "", lit("/")).otherwise(collapsed)
    val path = when(length(path1) > 1,
      regexp_replace(path1, "/$", "")).otherwise(path1)
    val sortedQ = array_join(array_sort(split(query, "&")), "&")
    val tail = when(sortedQ === "", lit(""))
      .otherwise(concat(lit("?"), sortedQ))
    when(scheme === "", // no scheme → no host to normalize; keep as-is
        concat(regexp_replace(regexp_replace(u, "#.*$", ""),
          "\\?.*$", ""), tail))
      .otherwise(concat(scheme, lit("://"), host, path, tail))
  }

  /** The registrable host suffix heuristic used for per-domain grouping
    * (sampling quotas, domain mixing): last two labels of the host —
    * 'www.a.example.com' → 'example.com'. A public-suffix list would be
    * more precise; two labels is the deterministic, list-free
    * approximation (documented trade).
    *
    * Hosts where "last two labels" is meaningless keep the FULL host as
    * their grouping key instead: single-label hosts ('localhost' — the
    * suffix regex would yield '' and lump every such host into one
    * empty-string group), IPv4 literals ('10.1.2.3' — the last two
    * octets are not a domain), and IPv6 literals ('[2001:db8::7]'). */
  /** RFC 3986 §5 reference resolution (codegen'd
    * [[org.apache.spark.sql.graft.ResolveUrl]] — the JDK's exact
    * algorithm): the step between `TextAnalysis.htmlLinks`' raw hrefs
    * and a crawl frontier. Null when either side is unparsable;
    * fragments dropped. */
  def resolve(base: Column, href: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.graft.ResolveUrl(
        org.apache.spark.sql.GraftShims.expression(base),
        org.apache.spark.sql.GraftShims.expression(href)))

  /** A seed public-suffix rule table in the PSL's own syntax (exact /
    * `*.` wildcard / `!` exception rules) — enough to exercise every
    * branch of the algorithm; production pipelines pass the full
    * publicsuffix.org list (driver-sized, ~9k rules) instead. */
  val seedPsl: Seq[String] = Seq(
    "com", "org", "net", "io", "de", "jp",
    "uk", "co.uk", "gov.uk", "ac.jp",
    "ck", "*.ck", "!www.ck",
    "*.kobe.jp", "!city.kobe.jp")

  /** Registrable domain of a bare HOST under a public-suffix rule
    * table (codegen'd [[org.apache.spark.sql.graft.RegisteredDomain]],
    * O(labels) hash probes per row — see [[PublicSuffix]]). Null when
    * the host has no registrable domain. */
  def registeredDomain(host: Column,
      rules: Seq[String] = seedPsl): Column =
    org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.graft.RegisteredDomain(
        org.apache.spark.sql.GraftShims.expression(host), rules))

  /** Total per-domain grouping key over full URLs: the PSL-precise
    * upgrade of [[domainOf]]. IPv4/IPv6 literals and single-label
    * hosts keep the full host (same screening as [[domainOf]] — the
    * PSL only speaks DNS names), and hosts that are themselves public
    * suffixes fall back to the host rather than a null group. */
  def domainKey(u: Column, rules: Seq[String] = seedPsl): Column = {
    val auth = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val host = lower(regexp_replace(
      regexp_replace(auth, "^[^@]*@", ""), ":\\d*$", ""))
    when(host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$") ||
        host.contains(":") || !host.contains("."), host)
      .otherwise(coalesce(registeredDomain(host, rules), host))
  }

  /** SURT (Sort-friendly URI Reordering Transform) key — the canonical
    * form web-archive CDX indexes sort and range-scan by: reversing the
    * host's labels (`www.example.com` → `com,example,www`) makes every
    * URL under a domain a contiguous key range, so "all captures under
    * example.com" is ONE sorted-range scan over the `_cdx` index
    * (`Warc.writeWithIndex`) instead of a suffix-match over every row
    * — the same locality trick as the store's sorted buckets, applied
    * to URL space. Composes with [[normalize]]'s conventions: scheme
    * and userinfo dropped (SURT keys never carry them), host
    * lowercased, default port stripped (any other port rides after the
    * reversed labels), fragment dropped, duplicate path slashes
    * collapsed, one trailing slash stripped (root keeps `/`), query
    * byte-sorted. Same Java/RE2-portable regex + split/sort built-ins
    * as [[normalize]] — codegen'd, zero shuffle — so the oracle
    * replays the chain literally. Null for values with no
    * `scheme://` (a SURT without a host is meaningless). */
  def surt(u: Column): Column = {
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val rest = regexp_replace(u, schemeRe, "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val auth = regexp_extract(noFrag, "^([^/?]+)", 1)
    val hostport = lower(regexp_replace(auth, "^[^@]*@", ""))
    val bare = regexp_replace(hostport, ":\\d+$", "")
    val port = regexp_extract(hostport, ":(\\d+)$", 1)
    val keepPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rev = array_join(reverse(split(bare, "\\.")), ",")
    val pq = regexp_replace(noFrag, "^[^/?]+", "")
    val path0 = regexp_extract(pq, "^([^?]*)", 1)
    val query = regexp_replace(pq, "^[^?]*\\??", "")
    val collapsed = regexp_replace(path0, "/{2,}", "/")
    val path1 = when(collapsed === "", lit("/")).otherwise(collapsed)
    val path = when(length(path1) > 1,
      regexp_replace(path1, "/$", "")).otherwise(path1)
    val sortedQ = array_join(array_sort(split(query, "&")), "&")
    val tail = when(sortedQ === "", lit(""))
      .otherwise(concat(lit("?"), sortedQ))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(rev, keepPort, lit(")"), path, tail))
  }

  def domainOf(u: Column): Column = {
    val auth = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    // strip userinfo and port before taking labels — 'u.x@example.com'
    // must group under example.com, not under 'x@example.com'
    val host = lower(regexp_replace(
      regexp_replace(auth, "^[^@]*@", ""), ":\\d*$", ""))
    when(host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$") || // IPv4 literal
        host.contains(":") ||                        // bracketed IPv6
        !host.contains("."), host)                   // single-label
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }
}
