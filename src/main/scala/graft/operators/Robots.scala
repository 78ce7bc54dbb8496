package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL filtering — the crawl-compliance step of
  * a web ingestion pipeline (which URLs may feed the corpus at all),
  * implementing the Robots Exclusion Protocol's group/precedence rules
  * (RFC 9309):
  *
  *  - a GROUP is one or more stacked `User-agent:` lines followed by its
  *    rules; a new group starts at an agent line whose predecessor is
  *    not an agent line;
  *  - a group applies when it names the agent exactly or `*`;
  *  - per URL the MOST SPECIFIC matching rule wins (longest path
  *    prefix), `Allow` beating `Disallow` on equal length; no matching
  *    rule → allowed. Path matching is plain prefix (`*`/`$` wildcards
  *    out of scope, documented).
  *
  * Everything is window/join algebra — group assignment is a running
  * sum over line index PARTITIONED BY HOST (robots bodies are KB-sized,
  * so per-host windows are bounded by construction), rule application
  * is a broadcast equi-join on host with a prefix residual, and the
  * winner is one max(struct(len, is_allow)) aggregation — no UDFs, no
  * driver loops, DuckDB-mirrorable line for line (the robots_filter
  * gate). At 100 TB the rules side is the small one (one robots.txt
  * per host) and stays broadcast; the URL side never shuffles for the
  * verdict join. */
object Robots {

  /** Parse robots.txt bodies into `(host, rule, path)` rows applying to
    * `agent` (exact or `*` group match). `rule` ∈ allow | disallow.
    * Comments (`#`) are stripped; empty-path rules are dropped (an
    * empty `Disallow:` means allow-everything in the wild — no rule). */
  def parseRules(bodies: DataFrame, hostCol: String, bodyCol: String,
      agent: String = "*"): DataFrame = {
    // directive NAMES match case-insensitively (the (?i) regexes) but
    // rule PATHS keep their case — robots paths are case-sensitive, and
    // lowercasing the body would silently break /CaseSensitive rules
    val w = Window.partitionBy(col("host")).orderBy(col("idx"))
    val lines = bodies
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("idx", "raw")))
      .select(col("host"), col("idx"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
    val tagged = lines
      .withColumn("is_agent", col("line").rlike("(?i)^user-agent:"))
      .withColumn("prev_is_agent", lag(col("is_agent"), 1).over(w))
      .withColumn("new_group",
        (col("is_agent") &&
          coalesce(!col("prev_is_agent"), lit(true))).cast("long"))
      .withColumn("group",
        sum(col("new_group")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val groupAgents = tagged.filter(col("is_agent"))
      .select(col("host"), col("group"),
        lower(trim(regexp_extract(col("line"), "(?i)^user-agent:(.*)$", 1)))
          .as("agent"))
      .filter(col("agent").isin(agent.toLowerCase, "*"))
      .select(col("host"), col("group")).distinct()
    tagged
      .filter(col("line").rlike("(?i)^(allow|disallow):"))
      .select(col("host"), col("group"),
        lower(regexp_extract(col("line"), "(?i)^(allow|disallow):(.*)$", 1))
          .as("rule"),
        trim(regexp_extract(col("line"), "(?i)^(allow|disallow):(.*)$", 2))
          .as("path"))
      .filter(col("path") =!= "")
      .join(groupAgents, Seq("host", "group"))
      .select(col("host"), col("rule"), col("path"))
  }

  /** URL host (`http`/`https`, authority up to the first `/`). */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^https?://([^/]+)", 1)

  /** URL path (leading `/`; bare-host URLs normalize to `/`). */
  def urlPath(url: Column): Column = {
    val p = regexp_extract(url, "^https?://[^/]+(/.*)$", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Politeness-interleaved crawl schedule — the frontier ordering step
    * after [[filterUrls]]: per host, URLs rank by (priority desc, url
    * asc) into a 1-based `visit` number; the crawl order is
    * `(visit, host)` ascending, which round-robins hosts so consecutive
    * fetches of ONE host are separated by every other host that still
    * has a visit-`n` URL — the per-host delay emerges from the
    * interleave instead of a stateful rate limiter. Per-host windows
    * only (frontier lists are bounded per host; partition by host at
    * any scale, and range-partition the output on `visit` instead of
    * globally sorting). Output: input columns + `host`, `visit`. */
  def crawlSchedule(urls: DataFrame, urlCol: String,
      priorityCol: String): DataFrame = {
    val w = Window.partitionBy(col("host"))
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    urls
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("visit", row_number().over(w).cast("long"))
  }

  /** Verdict per URL against parsed rules ([[parseRules]] output):
    * input columns + `is_allowed` (0/1). Longest matching prefix wins,
    * allow beats disallow on ties, no match → allowed. */
  def filterUrls(urls: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame = {
    val withParts = urls
      .withColumn("_host", urlHost(col(urlCol)))
      .withColumn("_path", urlPath(col(urlCol)))
    // equi-join on host, prefix residual; the struct max implements the
    // RFC precedence: longest path first, then allow > disallow
    val verdicts = withParts
      .join(broadcast(rules), col("_host") === col("host") &&
        col("_path").startsWith(col("path")))
      .groupBy(col(urlCol).as("_u"))
      .agg(max(struct(length(col("path")).as("l"),
        (col("rule") === "allow").as("a"))).as("best"))
      .select(col("_u"), col("best.a").as("_allowed"))
    withParts
      .join(verdicts, col(urlCol) === col("_u"), "left")
      .withColumn("is_allowed",
        coalesce(col("_allowed"), lit(true)).cast("long"))
      .drop("_u", "_allowed", "_host", "_path")
  }
}
