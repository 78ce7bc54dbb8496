package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passive-DNS hunting analytics over the observation stream — the
  * detection layer a balboa user builds DOWNSTREAM of the store (the
  * reference stops at storage + exact/prefix query,
  * `/root/reference/query/query_graphql.go`; the questions its users
  * then ask — "which domains look like DGA output", "is someone
  * tunneling data through my resolver" — are aggregations this engine
  * can answer in place).
  *
  * Everything is exact-integer (permille ratios via integer `div`,
  * never float division), so every signal has a bit-exact DuckDB
  * oracle. Scale shapes: [[labelSignals]] is a narrow codegen'd pass
  * (zero shuffle, linear in name bytes); [[tunnelAggregates]] is ONE
  * map-side-combined groupBy on the registered-parent key — the
  * classic tunnel detector (many unique, long, rarely-repeated
  * subdomains under one parent) without ever pairing names.
  */
object DnsAnalytics {

  /** Per-name DGA/tunnel character signals appended to `df`:
    * `n_labels`, `max_label_len`, `name_chars` (dots excluded), and
    * permille ratios of digit / hex-alphabet / vowel characters over
    * the name's non-dot characters. DGA names run digit-heavy and
    * vowel-poor; tunnel payloads run hex/base32-heavy with one long
    * label — thresholds belong to the caller (they're policy), the
    * exact signals are the engine's job. Empty names emit null
    * permilles rather than dividing by zero. */
  def labelSignals(df: DataFrame, nameCol: String): DataFrame = {
    val name = col(nameCol)
    val labels = split(name, "\\.")
    val stripped = regexp_replace(name, "\\.", "")
    def countClass(re: String): Column =
      (length(stripped) - length(regexp_replace(stripped, re, "")))
        .cast("long")
    df
      .withColumn("n_labels", size(labels).cast("long"))
      .withColumn("max_label_len",
        array_max(transform(labels, l => length(l))).cast("long"))
      .withColumn("name_chars", length(stripped).cast("long"))
      .withColumn("_digits", countClass("[0-9]"))
      .withColumn("_hex", countClass("[0-9a-f]"))
      .withColumn("_vowels", countClass("[aeiou]"))
      .withColumn("digit_permille", expr(
        "case when name_chars > 0 then _digits * 1000 div name_chars end"))
      .withColumn("hex_permille", expr(
        "case when name_chars > 0 then _hex * 1000 div name_chars end"))
      .withColumn("vowel_permille", expr(
        "case when name_chars > 0 then _vowels * 1000 div name_chars end"))
      .drop("_digits", "_hex", "_vowels")
  }

  /** Newly-observed-domain (NOD) feed — the passive-DNS product every
    * store like the reference ultimately feeds (a name NEVER seen
    * before anywhere is the single strongest phishing/DGA prior;
    * commercial NOD feeds are exactly this query productized): names
    * whose FIRST observation across all sensors/types/answers falls at
    * or after `fromMicros`, with that first timestamp and its UTC day
    * bucket. Input is the store aggregate (first_seen already
    * min-merged per key); this folds it once more to name grain.
    *
    * Scale shape: ONE map-side-combined min per name, then a
    * residual filter — no joins; the output is the feed. */
  def newlyObserved(agg: DataFrame, nameCol: String,
      firstSeenCol: String, fromMicros: Long): DataFrame =
    agg.groupBy(col(nameCol))
      .agg(min(col(firstSeenCol)).as("first_seen"))
      .filter(col("first_seen") >= fromMicros)
      .withColumn("first_day",
        expr("first_seen div 86400000000"))

  /** Day-grain rollup of the newly-observed feed, split by parent
    * novelty — the triage view a NOD consumer reads ([[newlyObserved]]
    * is row-per-name; the daily question is "how much is new today,
    * and how much of it is new INFRASTRUCTURE vs new subdomains under
    * zones we already know"): per UTC day of first observation, the
    * count of newly-observed names plus the count and permille of
    * those whose registered parent (last `parentLabels` labels) is
    * ITSELF first observed at or after `fromMicros`. A campaign
    * standing up fresh zones scores near 1000; subdomain churn under
    * established zones scores near 0. Parent novelty is judged over
    * ALL names in the input — a parent with only pre-window history
    * counts as established even though none of its old names pass the
    * window filter.
    *
    * Input is any (name, micros) stream — raw observations or the
    * store aggregate's first_seen; the name-grain min fold makes both
    * yield the same feed.
    *
    * Scale shape: one map-side-combined min per name, a parent-sized
    * second fold, one equi-join co-located on the parent key (AQE
    * broadcasts the parent census when it fits), then a day-sized
    * census. The name-grain frame is checkpointed once — it feeds the
    * parent census AND the join probe from a single scan. */
  def nodRollup(df: DataFrame, nameCol: String, tsCol: String,
      fromMicros: Long, parentLabels: Int = 2): DataFrame = {
    require(parentLabels >= 1,
      s"parentLabels must be >= 1, got $parentLabels")
    val nameFirst = df
      .select(col(nameCol).as("name"), col(tsCol).as("_ts"))
      .groupBy(col("name"))
      .agg(min(col("_ts")).as("first_seen"))
      .withColumn("parent",
        substring_index(col("name"), ".", -parentLabels))
      .localCheckpoint(false) // feeds the parent census AND the probe
    val parentFirst = nameFirst.groupBy(col("parent"))
      .agg(min(col("first_seen")).as("_parent_first"))
    nameFirst.filter(col("first_seen") >= fromMicros)
      .join(parentFirst, "parent")
      .groupBy(expr("first_seen div 86400000000").as("first_day"))
      .agg(
        count(lit(1)).as("n_new_names"),
        sum(when(col("_parent_first") >= fromMicros, 1L).otherwise(0L))
          .as("n_under_new_parent"))
      .withColumn("new_parent_permille", expr(
        "n_under_new_parent * 1000 div n_new_names"))
  }

  /** Tunnel-detection aggregates per registered parent (the LAST
    * `parentLabels` labels of the name): unique-subdomain volume and
    * shape under each parent. A DNS tunnel shows up as ONE parent with
    * thousands of distinct, long, rarely-repeated subdomains — so the
    * detector's columns are `n_unique_names`, `total_count`,
    * `uniq_permille` (distinct names per 1000 lookups — near 1000
    * means every query is fresh, the tunnel signature; benign domains
    * repeat), `max_name_len`, and `sum_name_chars` (the exfiltrated-
    * byte upper bound). Names with ≤ `parentLabels` labels group under
    * themselves. ONE shuffle, all aggregates map-side combinable
    * (countDistinct carries distinct (parent, name) pairs — the
    * standard exact-distinct cost; `approxDistinct = true` swaps it
    * for [[Curation.kmvDistinct]], whose per-group state is a bounded
    * k-sized hash buffer — the path for a parent keyspace whose
    * distinct (parent, name) pair volume would dominate the shuffle
    * at continuous 100 TB cadence; every other column is unchanged). */
  def tunnelAggregates(df: DataFrame, nameCol: String,
      countCol: String, parentLabels: Int = 2,
      approxDistinct: Boolean = false, kmvK: Int = 256): DataFrame = {
    require(parentLabels >= 1,
      s"parentLabels must be >= 1, got $parentLabels")
    val parent = substring_index(col(nameCol), ".", -parentLabels)
    val uniq =
      if (approxDistinct) Curation.kmvDistinct(col("_name"), kmvK)
      else countDistinct(col("_name"))
    df.select(parent.as("parent"), col(nameCol).as("_name"),
        col(countCol).as("_n"))
      .groupBy(col("parent"))
      .agg(
        uniq.as("n_unique_names"),
        sum(col("_n")).as("total_count"),
        max(length(col("_name"))).cast("long").as("max_name_len"),
        sum((length(col("_name")) * col("_n")).cast("long"))
          .as("sum_name_chars"))
      .withColumn("uniq_permille", expr(
        "case when total_count > 0" +
          " then n_unique_names * 1000 div total_count end"))
  }

  /** Fast-flux hosting signals per name — the OTHER classic hunting
    * aggregate beside [[tunnelAggregates]] (a tunnel is one parent
    * with many names; fast flux is one name with many ADDRESSES,
    * rotated through botnet members so takedowns always chase
    * yesterday's hosts — Holz et al., NDSS'08 measured the pattern as
    * high distinct-IP counts across many /24s plus heavy infrastructure
    * sharing between fluxed names): per name the distinct-address
    * volume (`n_ips`), its /24 spread (`n_subnets24` — a CDN resolves
    * to many IPs in FEW subnets; flux scatters across networks), and
    * `max_names_on_shared_ip` (the busiest co-tenant count over the
    * name's addresses — flux networks recycle the same compromised
    * hosts across campaigns). Thresholds are caller policy; the exact
    * signals are the engine's job.
    *
    * Scale shape: ONE distinct over (name, ip) incidences (map-side
    * combinable), a map-side per-ip name count, then the incidence
    * frame joins that ip-sized count CO-LOCATED on the ip key (one
    * shuffle each side, AQE broadcasts the count side when it fits)
    * and folds per name — names are never paired with names, so a
    * million-name flux campaign costs incidence-sized work, not a
    * quadratic blowup. */
  def fastFluxSignals(df: DataFrame, nameCol: String,
      ipCol: String): DataFrame = {
    val inc = df.select(col(nameCol).as("name"), col(ipCol).as("ip"))
      .distinct()
      .localCheckpoint(false) // feeds the per-ip census AND the join
      // probe side — one scan of the observation stream
    val perIp = inc.groupBy(col("ip"))
      .agg(count(lit(1)).as("_names_on_ip"))
    inc.join(perIp, "ip")
      .groupBy(col("name"))
      .agg(
        count(lit(1)).as("n_ips"),
        countDistinct(substring_index(col("ip"), ".", 3))
          .as("n_subnets24"),
        max(col("_names_on_ip")).as("max_names_on_shared_ip"))
  }

  /** Per-address co-tenancy profile — the REVERSE view of
    * [[fastFluxSignals]] (flux asks "how many addresses does this
    * name rotate through"; an investigator pivoting on an address
    * asks "what else lives HERE"): per address the distinct-name
    * count, total observation mass, the dominant name and its
    * permille share. A parking/sinkhole address shows thousands of
    * names with no dominant tenant; a dedicated C2 host shows one
    * name near 1000‰; shared hosting sits between. Thresholds are
    * caller policy.
    *
    * Determinism: the dominant name ties break to the lexically
    * SMALLEST name at equal mass.
    *
    * Scale shape: one map-side-combined fold to (address, name)
    * mass, a second address-sized fold, and the dominant-tenant
    * row_number over an ADDRESS-partitioned window — the window
    * shuffles on the same key the fold needs, so it costs a sort,
    * not an extra exchange; the final join is address-keyed and
    * co-located. A mega-tenant address (a parking lot with millions
    * of names) bounds the window's sort run, never a cartesian. */
  def coTenancy(df: DataFrame, ipCol: String, nameCol: String,
      countCol: String): DataFrame = {
    val pair = df.select(col(ipCol).as("ip"),
        col(nameCol).as("name"), col(countCol).as("_n"))
      .groupBy(col("ip"), col("name"))
      .agg(sum(col("_n")).as("_cnt"))
      .localCheckpoint(false) // feeds the per-ip fold AND the argmax
    val perIp = pair.groupBy(col("ip"))
      .agg(count(lit(1)).as("n_names"),
        sum(col("_cnt")).as("total_count"))
    val top = pair
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ip"))
          .orderBy(col("_cnt").desc, col("name").asc)))
      .filter(col("_r") === 1)
      .select(col("ip"), col("name").as("top_name"),
        col("_cnt").as("_top_cnt"))
    perIp.join(top, "ip")
      .withColumn("top_share_permille", expr(
        "case when total_count > 0" +
          " then _top_cnt * 1000 div total_count end"))
      .drop("_top_cnt")
  }

  /** Confusable-skeleton fold for lookalike detection — the
    * single-character leet/homoglyph map every IDN-spoof checker
    * starts from (Unicode TR39's "skeleton" idea restricted to the
    * ASCII confusables that survive DNS's hostname charset): lowercase,
    * then `0→o 1→l 3→e 4→a 5→s 7→t 8→b` and hyphens DELETED — so
    * `PayPa1`, `paypa1` and `pay-pal` all fold to `paypal`. One
    * `translate` (codegen'd, zero allocation beyond the result); the
    * map is deliberately single-char-to-single-char so the DuckDB
    * oracle replays it with the same translate call, byte for byte. */
  def confusableSkeleton(c: Column): Column =
    translate(lower(c), "0134578-", "oleastb")

  /** Edit-distance-1 typosquat detection — the OTHER lookalike class
    * beside [[confusableSkeleton]]'s homoglyphs (leet folds look the
    * same; typos are what fingers do: `gogle`, `paypall`, `amaozn` —
    * fat-finger registrations that catch traffic the brand loses):
    * every dot-separated label within Levenshtein distance ≤ `maxDist`
    * of a brand, the exact brand itself excluded. Skeleton-equal pairs
    * are ALSO excluded when `excludeConfusable` (default) — `paypa1`
    * is a leetsquat, not a typo; the two detectors partition the
    * lookalike space instead of double-reporting.
    *
    * Scale shape: labels explode narrow, the brand list BROADCASTS,
    * and the candidate check is a broadcast nested-loop bounded by
    * |labels| × |brands| with brands fleet-small (a brand list is
    * thousands; the reference workload's protected set is far
    * smaller) — each probe a codegen'd levenshtein over short labels.
    * A length-difference prefilter (| |a|−|b| | ≤ maxDist) prunes most
    * probes before the DP runs. */
  def typoNames(names: DataFrame, nameCol: String, brands: DataFrame,
      brandCol: String, maxDist: Int = 1,
      excludeConfusable: Boolean = true): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val labels = names.select(col(nameCol).as("name"),
        explode(split(col(nameCol), "\\.")).as("label"))
      .withColumn("_l", lower(col("label")))
    val folded = brands.select(lower(col(brandCol)).as("brand"))
      .distinct()
    val joined = labels.join(broadcast(folded),
      abs(length(col("_l")) - length(col("brand"))) <= maxDist &&
        levenshtein(col("_l"), col("brand")) <= maxDist &&
        col("_l") =!= col("brand"))
    val out =
      if (excludeConfusable)
        joined.filter(confusableSkeleton(col("_l")) =!=
          confusableSkeleton(col("brand")))
      else joined
    out.select(col("name"), col("label"), col("brand"),
      levenshtein(col("_l"), col("brand")).cast("long").as("distance"))
  }

  /** Brand-lookalike label detection — the phishing-hunting query a
    * passive-DNS user runs against a NOD feed (a never-seen name whose
    * label FOLDS to a protected brand but ISN'T it is the classic
    * typosquat/leetsquat registration): every dot-separated label of
    * every name whose [[confusableSkeleton]] equals a brand's skeleton
    * while the raw lowercased label differs from the brand comes back
    * as `(name, label, brand)` — exact label matches are the brand
    * itself and stay out; thresholdless, the JOIN is the detector.
    *
    * Scale shape: labels explode narrow (≤ name-label fan-out), the
    * brand list folds to skeletons and BROADCASTS (brand lists are
    * thousands, never data-sized), and the equi-join runs on the
    * skeleton key — zero data-sized shuffles, linear in total labels. */
  def lookalikeNames(names: DataFrame, nameCol: String,
      brands: DataFrame, brandCol: String): DataFrame = {
    val labels = names.select(col(nameCol).as("name"),
        explode(split(col(nameCol), "\\.")).as("label"))
      .withColumn("_sk", confusableSkeleton(col("label")))
    val folded = brands
      .select(lower(col(brandCol)).as("brand"),
        confusableSkeleton(col(brandCol)).as("_bsk"))
      .distinct()
    labels.join(broadcast(folded), col("_sk") === col("_bsk"))
      .filter(lower(col("label")) =!= col("brand"))
      .select(col("name"), col("label"), col("brand"))
  }
}
