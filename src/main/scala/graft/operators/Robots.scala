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
  *  - per host, a crawler obeys only the MOST SPECIFIC matching group
  *    kind (§2.2.1): the groups naming the agent exactly when any do,
  *    else the `*` groups — never the union of both;
  *  - rule paths support the §2.2.3 special characters: `*` matches any
  *    span, a TRAILING `$` anchors the match at the end of the URL path
  *    (a `$` elsewhere is literal, as deployed crawlers treat it);
  *  - per URL the MOST SPECIFIC matching rule wins (longest rule path,
  *    octet length as written), `Allow` beating `Disallow` on equal
  *    length; no matching rule → allowed.
  *
  * Everything is window/join/fold algebra — group assignment is a
  * running sum over line index PARTITIONED BY HOST (robots bodies are
  * KB-sized, so per-host windows are bounded by construction), and rule
  * application collapses each host's rules to ONE broadcast array row,
  * with the winning rule computed per URL by higher-order functions
  * (`filter` the matching rules, `aggregate` the longest-path/
  * allow-wins max) — no UDFs, no driver loops, DuckDB-mirrorable line
  * for line (the robots_filter gate). Wildcard-free rules (the
  * overwhelming majority in the wild) keep the codegen'd `startswith`
  * test; only rules that actually use `*`/`$` pay the regex. At 100 TB
  * the rules side is the small one (one robots.txt per host) and stays
  * broadcast; the URL corpus crosses ZERO shuffles for the verdict —
  * no matched-row groupBy, no join-back (PlanSpec-pinned). */
object Robots {

  /** Parse robots.txt bodies into `(host, rule, path, pattern, wild)`
    * rows applying to `agent`. `rule` ∈ allow | disallow; `path` is the
    * rule path as written (its length is the precedence key); `pattern`
    * is the anchored Java regex realizing `*`/`$` semantics and `wild`
    * whether the path uses them (wildcard-free rules match by plain
    * prefix, no regex). Groups follow RFC 9309 §2.2.1 specificity: when
    * any group on a host names `agent` exactly, only those groups
    * contribute; otherwise the `*` groups do. Comments (`#`) are
    * stripped; empty-path rules are dropped (an empty `Disallow:` means
    * allow-everything in the wild — no rule). */
  def parseRules(bodies: DataFrame, hostCol: String, bodyCol: String,
      agent: String = "*"): DataFrame = {
    val (tagged, selected) = groupedLines(bodies, hostCol, bodyCol, agent)
    val rules = tagged
      .filter(col("line").rlike("(?i)^(allow|disallow):"))
      .select(col("host"), col("group"),
        lower(regexp_extract(col("line"), "(?i)^(allow|disallow):(.*)$", 1))
          .as("rule"),
        trim(regexp_extract(col("line"), "(?i)^(allow|disallow):(.*)$", 2))
          .as("path"))
      .filter(col("path") =!= "")
      .join(selected, Seq("host", "group"))
    // §2.2.3 pattern compilation, pure column algebra: strip a trailing
    // `$` (the end anchor), regex-escape everything except `*`, then
    // `*` → `.*`, re-anchoring both ends
    val anchored = col("path").endsWith("$")
    val core = when(anchored,
      expr("substring(path, 1, length(path) - 1)")).otherwise(col("path"))
    val escaped = regexp_replace(core,
      "([\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|\\\\])", "\\\\$1")
    rules.select(col("host"), col("rule"), col("path"),
      concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
        when(anchored, lit("$")).otherwise(lit(""))).as("pattern"),
      (col("path").contains("*") || anchored).as("wild"))
  }

  /** Shared line/group machinery of [[parseRules]], [[crawlDelays]]:
    * comment-stripped non-empty lines with their running-sum group id,
    * plus each host's SELECTED group set under RFC 9309 §2.2.1
    * specificity (spec 2 = names `agent` exactly, 1 = names `*`; only
    * the max-spec groups of a host apply — a stacked "User-agent: x /
    * User-agent: *" header counts as exact for x). Directive NAMES
    * match case-insensitively (the (?i) regexes) but line BODIES keep
    * their case — robots paths are case-sensitive, and lowercasing the
    * body would silently break /CaseSensitive rules. */
  private def groupedLines(bodies: DataFrame, hostCol: String,
      bodyCol: String, agent: String): (DataFrame, DataFrame) = {
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
      .groupBy(col("host"), col("group"))
      .agg(max(when(col("agent") === agent.toLowerCase, 2).otherwise(1))
        .as("spec"))
    val selected = groupAgents
      .withColumn("max_spec",
        max(col("spec")).over(Window.partitionBy(col("host"))))
      .filter(col("spec") === col("max_spec"))
      .select(col("host"), col("group"))
    (tagged, selected)
  }

  /** `Sitemap:` directives per host — RFC 9309 §2.3 allows them on any
    * line, OUTSIDE any group (every crawler sees every sitemap), so no
    * agent parameter. Output: (host, idx, sitemap) with the directive's
    * comment-stripped line index preserved for ordering. */
  def sitemaps(bodies: DataFrame, hostCol: String,
      bodyCol: String): DataFrame =
    bodies
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("idx", "raw")))
      .select(col("host"), col("idx").cast("long").as("idx"),
        trim(regexp_extract(
          trim(regexp_replace(col("raw"), "#.*$", "")),
          "(?i)^sitemap:(.*)$", 1)).as("sitemap"))
      .filter(col("sitemap") =!= "")

  /** Per-host `Crawl-delay` (the de-facto extension every major engine
    * honored; not in RFC 9309) under the same §2.2.1 group selection as
    * [[parseRules]]: the delay lines of the most specific matching
    * groups, minimum wins when several apply. Output:
    * (host, crawl_delay double seconds). */
  def crawlDelays(bodies: DataFrame, hostCol: String, bodyCol: String,
      agent: String = "*"): DataFrame = {
    val (tagged, selected) = groupedLines(bodies, hostCol, bodyCol, agent)
    tagged
      .filter(col("line").rlike("(?i)^crawl-delay:"))
      .select(col("host"), col("group"),
        // try_cast: junk values ("Crawl-delay: soon") drop as null
        // instead of failing the job under ANSI casts
        trim(regexp_extract(col("line"), "(?i)^crawl-delay:(.*)$", 1))
          .try_cast("double").as("delay"))
      .filter(col("delay").isNotNull && col("delay") >= 0)
      .join(selected, Seq("host", "group"))
      .groupBy(col("host")).agg(min(col("delay")).as("crawl_delay"))
  }

  /** Sitemap XML entries — `<urlset>` and `<sitemapindex>` documents
    * both: per `<url>`/`<sitemap>` block, the `<loc>` target and the
    * optional `<lastmod>` stamp (empty string when absent; block-scoped
    * extraction keeps the two aligned when lastmod is sparse). Output:
    * (sitemap_url, pos, loc, lastmod, is_index). Narrow regex pass —
    * the same no-DOM stance as [[TextAnalysis.htmlExtract]]; sitemap
    * files are machine-generated, the well-formed case IS the case. */
  def parseSitemap(df: DataFrame, urlCol: String,
      bodyCol: String): DataFrame =
    df.select(col(urlCol).as("sitemap_url"),
        when(col(bodyCol).contains("<sitemapindex"), 1L).otherwise(0L)
          .as("is_index"),
        posexplode(regexp_extract_all(col(bodyCol),
          lit("(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1)))
          .as(Seq("pos", "block")))
      .select(col("sitemap_url"), col("pos").cast("long").as("pos"),
        trim(regexp_extract(col("block"), "(?s)<loc>(.*?)</loc>", 1))
          .as("loc"),
        trim(regexp_extract(col("block"),
          "(?s)<lastmod>(.*?)</lastmod>", 1)).as("lastmod"),
        col("is_index"))
      .filter(col("loc") =!= "")

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

  /** [[crawlSchedule]] with per-host `Crawl-delay` honored: joins the
    * (broadcast — one row per host) [[crawlDelays]] output and emits
    * `due_sec` = (visit − 1) × delay, the earliest fetch offset of each
    * URL relative to its host's crawl start. Hosts without a delay
    * directive use `defaultDelay`. The interleave ordering stays
    * `(due_sec, host, visit)`; same per-host-window-only scale shape. */
  def crawlScheduleWithDelays(urls: DataFrame, urlCol: String,
      priorityCol: String, delays: DataFrame,
      defaultDelay: Double = 1.0): DataFrame =
    crawlSchedule(urls, urlCol, priorityCol)
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("due_sec", (col("visit") - 1).cast("double") *
        coalesce(col("crawl_delay"), lit(defaultDelay)))
      .drop("crawl_delay")

  /** Crawl snapshot diff — the recrawl-planning step: classify every
    * URL across two crawl snapshots `(url, fingerprint)` as `added`
    * (new in `cur`), `removed` (gone from `cur`), `changed`
    * (fingerprint differs) or `unchanged`. One full-outer equi-join on
    * URL (both sides shuffle-partition by url — co-partitioned at any
    * scale, no skew: URLs are unique per snapshot); feed `changed` +
    * `added` back into [[crawlSchedule]] as the high-priority frontier.
    * Output: (url, status). */
  def crawlDiff(prev: DataFrame, cur: DataFrame, urlCol: String,
      fpCol: String): DataFrame =
    prev.select(col(urlCol).as("url"), col(fpCol).as("_fp_prev"))
      .join(cur.select(col(urlCol).as("url"), col(fpCol).as("_fp_cur")),
        Seq("url"), "full_outer")
      .select(col("url"),
        when(col("_fp_prev").isNull, lit("added"))
          .when(col("_fp_cur").isNull, lit("removed"))
          .when(col("_fp_prev") === col("_fp_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))

  /** Per-host churn of a [[crawlDiff]]: status counts per host — the
    * signal a recrawl scheduler budgets hosts by. One map-side-combined
    * aggregation. Output: (host, status, n). */
  def crawlChurn(diff: DataFrame, urlCol: String = "url"): DataFrame =
    diff.groupBy(urlHost(col(urlCol)).as("host"), col("status"))
      .agg(count(lit(1)).as("n"))

  /** Verdict per URL against parsed rules ([[parseRules]] output):
    * input columns + `is_allowed` (0/1). Longest matching rule path
    * wins, allow beats disallow on ties, no match → allowed. Matching
    * runs through the native `robots_match` two-pointer scan
    * ([[org.apache.spark.sql.graft.RobotsMatch]]): the rule paths
    * arrive as DATA (a broadcast rules array), so the regex form
    * (`rlike` on the compiled `pattern`) would re-compile the Pattern
    * on every (url, rule) evaluation — measured at ~2× the whole gate.
    *
    * Shape: each host's rules collapse to ONE array row (the rules side
    * is one robots.txt per host — tiny at any scale), that one-row-per-
    * host frame broadcasts, and the winning rule is computed per URL
    * row with higher-order functions (`filter` the matching rules,
    * `aggregate` the longest-path/allow-wins max). The URL corpus
    * crosses ZERO Exchanges: no matched-row groupBy, no verdict
    * join-back — the only shuffle in the whole plan is the rules-side
    * collect_list aggregation, which is host-count-sized (PlanSpec pins
    * this). */
  def filterUrls(urls: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame = {
    val hostRules = rules
      .groupBy(col("host"))
      .agg(collect_list(struct(col("path"), col("pattern"), col("wild"),
        (col("rule") === "allow").as("a"))).as("_rules"))
      .select(col("host").as("_rhost"), col("_rules"))
    // the RFC precedence as one array fold: keep the candidate when its
    // path is longer, or equal-length and allow-over-disallow; ties on
    // (length, verdict) are interchangeable, so collect_list's
    // nondeterministic order cannot change the outcome
    def matches(r: Column): Column = org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.graft.RobotsMatch(
        org.apache.spark.sql.GraftShims.expression(col("_path")),
        org.apache.spark.sql.GraftShims.expression(r.getField("path"))))
    val best = aggregate(
      filter(col("_rules"), matches(_)),
      lit(null).cast("struct<l: int, a: boolean>"),
      (acc, r) => {
        val rl = length(r.getField("path"))
        when(acc.isNull
            .or(rl > acc.getField("l"))
            .or(rl === acc.getField("l") && r.getField("a") &&
              !acc.getField("a")),
          struct(rl.as("l"), r.getField("a").as("a"))).otherwise(acc)
      })
    urls
      .withColumn("_host", urlHost(col(urlCol)))
      .withColumn("_path", urlPath(col(urlCol)))
      .join(broadcast(hostRules), col("_host") === col("_rhost"), "left")
      .withColumn("is_allowed",
        coalesce(best.getField("a"), lit(true)).cast("long"))
      .drop("_rhost", "_rules", "_host", "_path")
  }

  // ------------------------------------------------- page-level meta

  /** `<meta name="robots">` content of a fetched page, lower-cased —
    * the PAGE-level compliance layer robots.txt cannot express (a host
    * may allow the fetch yet forbid indexing). Both attribute orders
    * are read (name-first wins when both match; first robots meta per
    * page wins — regexp_extract's leftmost match); `[^>]*` keeps a
    * pattern inside ONE tag. Quoted values and unquoted single tokens
    * parse; no lookaround, so an oracle replays the same two
    * extractions. */
  /** The two attribute-order patterns, exported so oracles embed them
    * BY REFERENCE (quote-doubled), never as a drifting copy. */
  val metaNameFirstPattern: String =
    "(?i)<meta\\s[^>]*name\\s*=\\s*[\"']?robots[\"']?[^>]*" +
      "content\\s*=\\s*[\"']?([a-zA-Z, ]*)"
  val metaContentFirstPattern: String =
    "(?i)<meta\\s[^>]*content\\s*=\\s*[\"']?([a-zA-Z, ]*)[\"']?" +
      "[^>]*name\\s*=\\s*[\"']?robots"

  def metaRobots(html: Column): Column = {
    val nameFirst = regexp_extract(html, metaNameFirstPattern, 1)
    val contentFirst = regexp_extract(html, metaContentFirstPattern, 1)
    lower(when(length(nameFirst) > 0, nameFirst).otherwise(contentFirst))
  }

  /** Directive flags from [[metaRobots]]: `noindex` / `nofollow`
    * (with `none` implying both, per the de-facto standard) as 1/0
    * BIGINTs plus the `index_ok` verdict a corpus-admission filter
    * keys on, and the link-graph gate `follow_ok` the frontier
    * expander keys on. Token-exact matching (comma/space split), so
    * "noindexing" never false-positives. Narrow codegen'd pass, zero
    * shuffle. */
  def metaDirectiveColumns(html: Column): Seq[Column] = {
    val toks = split(metaRobots(html), "[, ]+")
    // coalesce: a NULL html makes the flags SQL NULL, and then
    // `when(!NULL, …)` leaves index_ok/follow_ok 0 while the
    // noindex/nofollow columns ALSO read 0 — an inconsistent verdict
    // (the Suricata-decoder null-guard class). A row with no parseable
    // HTML has no robots meta: indexable, followable.
    def has(d: String): Column =
      coalesce(array_contains(toks, d), lit(false))
    val noindex = has("noindex") || has("none")
    val nofollow = has("nofollow") || has("none")
    Seq(
      when(noindex, 1L).otherwise(0L).as("meta_noindex"),
      when(nofollow, 1L).otherwise(0L).as("meta_nofollow"),
      when(!noindex, 1L).otherwise(0L).as("index_ok"),
      when(!nofollow, 1L).otherwise(0L).as("follow_ok"))
  }

  /** Crawler-trap detection — the frontier's immune system (calendar
    * pages, session-id mazes, and self-linking mirrors generate
    * unbounded URL spaces; every real crawler ships these heuristics):
    * per URL the path depth, the longest run of IDENTICAL consecutive
    * path segments (the `/a/a/a/` recursion signature), the query-param
    * count, and the length — flagged against the caller's thresholds
    * with a deterministic comma-joined reason list.
    *
    * The run scan is one `aggregate` fold over the segment array —
    * narrow, zero shuffle; the lambda re-references the segment array
    * per element (the documented Catalyst-lambda cost), fine at URL
    * segment counts. Output: `(urlCol, depth, max_run, n_params,
    * url_len, is_trap, reasons)`. */
  def detectTraps(urls: DataFrame, urlCol: String, maxDepth: Int = 12,
      maxSegmentRun: Int = 2, maxParams: Int = 8,
      maxLen: Int = 512): DataFrame = {
    require(maxDepth >= 1 && maxSegmentRun >= 1 && maxParams >= 0 &&
      maxLen >= 1, "detectTraps: thresholds must be positive")
    val withParts = urls
      // absolute, protocol-relative (//host/…), and relative (/a/b)
      // forms all yield their PATH — imperfectly normalized frontiers
      // are exactly where traps hide, so none of the three shapes may
      // silently score depth 0
      .withColumn("_path", when(
        col(urlCol).rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
        regexp_extract(col(urlCol),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1))
        .when(col(urlCol).startsWith("//"),
          regexp_extract(col(urlCol), "^//[^/?#]*(/[^?#]*)?", 1))
        .otherwise(regexp_extract(col(urlCol), "^([^?#]*)", 1)))
      .withColumn("_q", regexp_extract(col(urlCol), "\\?([^#]*)", 1))
      .withColumn("_segs",
        filter(split(col("_path"), "/"), s => length(s) > 0))
      .withColumn("depth", size(col("_segs")).cast("long"))
      // size ≤ 1 short-circuits: Spark's sequence(2, 1) DESCENDS, and
      // the fold would index element 0 (arrays are 1-based)
      .withColumn("max_run",
        when(size(col("_segs")) <= 1, size(col("_segs")).cast("long"))
        .otherwise(expr(
          """aggregate(sequence(2, size(_segs)),
            |  named_struct('run', 1L, 'best', 1L),
            |  (a, i) -> IF(element_at(_segs, i) = element_at(_segs, i - 1),
            |    named_struct('run', a.run + 1L,
            |      'best', greatest(a.best, a.run + 1L)),
            |    named_struct('run', 1L, 'best', a.best)),
            |  a -> a.best)""".stripMargin)))
      .withColumn("n_params", when(length(col("_q")) === 0, lit(0L))
        .otherwise(size(split(col("_q"), "&")).cast("long")))
      .withColumn("url_len", length(col(urlCol)).cast("long"))
    val reasons = array(
      when(col("depth") > maxDepth, lit("depth")),
      when(col("max_run") > maxSegmentRun, lit("loop")),
      when(col("n_params") > maxParams, lit("params")),
      when(col("url_len") > maxLen, lit("length")))
    withParts
      .withColumn("reasons",
        array_join(filter(reasons, r => r.isNotNull), ","))
      .select(col(urlCol), col("depth"), col("max_run"), col("n_params"),
        col("url_len"),
        (length(col("reasons")) > 0).cast("long").as("is_trap"),
        col("reasons"))
  }
}
