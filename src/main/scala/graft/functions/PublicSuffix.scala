package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix rule table (publicsuffix.org algorithm) — the precise
  * replacement for [[Url.domainOf]]'s two-label heuristic. Per-domain
  * crawl budgets, sampling quotas and host-level dedup must group by
  * REGISTRABLE domain: grouping by host over-fragments (every
  * subdomain its own group) and two labels breaks on multi-label
  * suffixes (`a.example.co.uk` must group under `example.co.uk`, not
  * `co.uk` — which would lump half the UK web into one group and skew
  * every per-domain quota at corpus scale).
  *
  * Rules are the PSL's own syntax: exact suffixes (`com`, `co.uk`),
  * wildcards (`*.ck` — `*` consumes exactly one host label), and
  * exceptions (`!www.ck` — carves a registrable domain back out of a
  * wildcard). Matching follows the published algorithm: an exception
  * prevails outright; otherwise the longest matching rule wins; a host
  * matching no rule falls under the implicit default rule `*` (public
  * suffix = its last label). The registrable domain is the public
  * suffix plus one label — null when the host IS a public suffix
  * (nothing registrable), which callers turn into a fallback key via
  * `coalesce` ([[Url.registeredDomain]]).
  *
  * The table is driver-sized (the full PSL is ~9k rules — the
  * IVF-centroid class, megabytes at most) and ships to executors once
  * per task as a codegen reference object; lookup is O(labels) hash
  * probes per host, NOT O(rules) — a 9k-term when-chain or an
  * exploded rule join would be the wrong shape. Lookup structures
  * build lazily per JVM from the serialized rule list.
  */
final class PublicSuffix(rules: Seq[String]) extends Serializable {
  require(rules.nonEmpty, "public-suffix: empty rule list")

  // exact suffixes; wildcard PARENTS (the X of `*.X`); exception
  // suffixes (the rule minus `!`). Built lazily so only the compact
  // rule list serializes.
  @transient private lazy val exact: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    rules.foreach { r =>
      if (!r.startsWith("!") && !r.startsWith("*.")) s.add(r.toLowerCase)
    }
    s
  }
  @transient private lazy val wildcardParents: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    rules.foreach { r =>
      if (r.startsWith("*.")) s.add(r.substring(2).toLowerCase)
    }
    s
  }
  @transient private lazy val exceptions: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    rules.foreach { r =>
      if (r.startsWith("!")) s.add(r.substring(1).toLowerCase)
    }
    s
  }

  /** Registrable domain of a bare host, or null when none exists
    * (single-label hosts, hosts that ARE a public suffix, empty
    * labels). Input tolerates case and one trailing dot (DNS root);
    * IP-literal screening is the caller's job ([[Url]] does it). */
  def registrable(host: String): String = {
    if (host == null || host.isEmpty) return null
    val h0 = host.toLowerCase
    val h = if (h0.endsWith(".")) h0.substring(0, h0.length - 1) else h0
    if (h.isEmpty || h.startsWith(".") || h.contains("..")) return null
    val labels = h.split('.')
    val n = labels.length
    // walk suffixes from 1..n labels, building each by prepending —
    // exception prevails outright, else track the longest psLen
    var psLen = 1 // the implicit default rule `*`
    var c = 1
    var suffix = labels(n - 1)
    while (c <= n) {
      if (exceptions.contains(suffix)) {
        // public suffix = the exception minus its leftmost label, so
        // the registrable domain is exactly this suffix
        return suffix
      }
      if (exact.contains(suffix) && c > psLen) psLen = c
      // `*.X` needs a real label for the `*`: host must be longer
      if (wildcardParents.contains(suffix) && n >= c + 1 && c + 1 > psLen)
        psLen = c + 1
      c += 1
      if (c <= n) suffix = labels(n - c) + "." + suffix
    }
    if (psLen >= n) return null // the host IS a public suffix
    labels.slice(n - psLen - 1, n).mkString(".")
  }

  /** UTF8String shim for the codegen'd expression. */
  def registrableUtf8(host: UTF8String): UTF8String = {
    val r = registrable(host.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}
