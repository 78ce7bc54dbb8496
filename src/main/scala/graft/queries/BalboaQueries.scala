package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.Net
import graft.operators.{ObservationStore, Tools}
import util._

/** The balboa storage/query surface (SURVEY.md §2.3/§2.4) as driver-gate
  * queries with DuckDB oracles. */
object BalboaQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — the core merge aggregation (count=Σ, first_seen=min, last_seen=max).
    "store_agg" -> ((s, dir) => aggMicros(s, dir)),

    // Q1/Q2/Q3 — forward access path: rrname point lookup + limit.
    "entries_rrname" -> ((s, dir) =>
      store(s, dir).entries(rrname = Some("part-42"))),

    // Q2/Q4 — inverted access path: rdata point lookup.
    "entries_rdata" -> ((s, dir) =>
      store(s, dir).entries(rdata = Some("7"))),

    // Q3 residual equality filters (sensor_id + rrtype on top of rrname).
    "entries_residual" -> ((s, dir) =>
      store(s, dir).entries(rrname = Some("part-42"),
        rrtype = Some("A"), sensorId = Some("3"))),

    // Prefix range scan (extension). The limit is lifted far above any
    // SF's match count: a BOUND limit on an unordered scan would return
    // an arbitrary subset and the gate would flap at larger SFs (the
    // oracle has no LIMIT).
    "entries_prefix" -> ((s, dir) =>
      store(s, dir).entriesPrefix("part-1999", limit = Int.MaxValue)),

    // Q7 — REST/CIRCL semantics: subject as rrname ∪ subject as rdata.
    "rest_union" -> ((s, dir) => store(s, dir).restQuery("part-42")),

    // Q6 — aliases virtual self-join with per-entry ranking limit.
    "aliases" -> ((s, dir) => {
      val st = store(s, dir)
      st.aliases(st.entries(rrname = Some("part-42")), perEntryLimit = 2)
        .select(col("e_rrname"), col("e_rdata").as("rdata"),
          col("e_sensor_id").as("sensor_id"),
          col("rrname").as("alias_rrname"), col("rrtype").as("alias_rrtype"))
    }),

    // Q9 — server-side CIDR range query over IP-shaped rdata (ip_to_long
    // native expression + numeric BETWEEN instead of client-side expansion).
    "cidr_range" -> ((s, dir) => {
      val agg = ObservationStore.aggregate(Graft.ipObservations(s, dir))
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
      val (lo, hi) = Net.cidrBounds("10.0.4.0/22")
      agg.filter(Net.ip_to_long(col("rdata")).between(lo, hi))
    }),

    // Q9 for IPv6 — the same range-over-parsed-address idea on the
    // 32-char hex key (string BETWEEN = unsigned 128-bit membership;
    // see Net.cidrBounds6). /118 over 2001:db8::/32 space = the low 10
    // bits free, i.e. g8 in [0x1000, 0x13ff].
    "cidr_range_v6" -> ((s, dir) => {
      val agg = ObservationStore.aggregate(Graft.ip6Observations(s, dir))
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
      val (lo, hi) = Net.cidrBounds6("2001:db8::1000/118")
      agg.filter(Net.ipv6_to_hex(col("rdata")).between(lo, hi))
    }),

    // Order-independent table checksum over engine-stable columns
    // (keys, strings, epoch-cast timestamps) — the replication /
    // dump-replay / engine-swap validator: sum of per-row hash60 mod
    // 1e18 plus row count, identical regardless of partitioning or
    // row order.
    "table_checksum" -> ((s, dir) =>
      Tools.tableChecksum(
        Graft.table(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"),
          micros(col("o_orderdate")).as("od_us")),
        Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority", "od_us"))),

    // Longest-prefix-match enrichment: every observed IP against a
    // 3-level route table (/8 default, nation-derived /16s and /24s) —
    // each IP labeled by the LONGEST matching prefix, LPM as a masked
    // equi-join (one candidate per distinct prefix length, never a
    // range join).
    "lpm_join" -> ((s, dir) => {
      import s.implicits._
      val ips = Graft.ipObservations(s, dir).select(col("rdata").as("ip"))
      val nat = Graft.table(s, dir, "nation")
      val r8 = Seq(("10.0.0.0/8", "default")).toDF("cidr", "label")
      val r16 = nat.select(
        concat(lit("10."), (col("n_nationkey") * 7 % 256).cast("string"),
          lit(".0.0/16")).as("cidr"),
        col("n_name").as("label"))
      val r24 = nat.select(
        concat(lit("10."), (col("n_nationkey") * 7 % 256).cast("string"),
          lit("."), (col("n_nationkey") * 13 % 256).cast("string"),
          lit(".0/24")).as("cidr"),
        concat(col("n_name"), lit(":24")).as("label"))
      Net.lpmJoin(ips, "ip", r8.unionByName(r16).unionByName(r24),
        "cidr", "label")
    }),

    // Q5 — multi-backend fan-out: per-store query then bag union. The
    // second store overlaps the first (the full store ∪ a sensor-3 slice)
    // so the gate exercises the duplicates-KEPT semantics of
    // `db_remote.go:133-202` — matching rows appear once per backend.
    "fanout_union" -> ((s, dir) => {
      val agg = aggMicros(s, dir)
      val full = ObservationStore.inMemory(agg)
      val slice = ObservationStore.inMemory(agg.filter(col("sensor_id") === "3"))
      full.fanOut(Seq(full, slice), rrname = Some("part-42"), rdata = None)
    }),

    // A4/A6 — dump/jsonize: the aggregate rendered in the reference's
    // NDJSON dump shape (unix-SECONDS integer timestamps,
    // observation.go:26-37), one JSON string per key. Derived from the
    // memoized store aggregate the other balboa gates share — jsonize is
    // a rendering of the store, not a second aggregation of raw input.
    "jsonize_dump" -> ((s, dir) => Tools.jsonizeMicros(aggMicros(s, dir))),

    // A4+A5 — dump → replay round-trip THROUGH DISK: dump the aggregate
    // as NDJSON, replay it into a fresh dual store, read the forward copy
    // back. The oracle is the plain aggregate — the gate proves the
    // round-trip is lossless (the reference's dump|replay contract).
    "dump_replay" -> ((s, dir) => {
      val tmp = scratchDir("roundtrip", dir)
      val agg = ObservationStore.aggregate(Graft.observations(s, dir))
      Tools.dump(agg, s"$tmp/dump")
      Tools.replay(s, s"$tmp/dump", s"$tmp/store", numBuckets = 16)
      ObservationStore.load(s, s"$tmp/store").forward
        .drop("bucket")
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
    }),

    // Retention expiry (extension — the reference prunes by
    // dump-filter-replay, a full rewrite; here it is an incremental
    // staged merge): build a disk store, expire everything last seen
    // before 1996, read the forward copy back. Oracle = the aggregate
    // with the same retention predicate.
    "store_expire" -> ((s, dir) => {
      // a COPY of the shared prebuilt store (see util.copyOfPrebuiltStore):
      // the gate times the staged expiry, not a full store rebuild
      val storePath = copyOfPrebuiltStore(s, dir, "expire")
      ObservationStore.expire(s, storePath, java.sql.Timestamp.from(
        java.time.LocalDateTime.parse("1996-01-01T00:00:00")
          .toInstant(java.time.ZoneOffset.UTC)))
      ObservationStore.load(s, storePath).forward
        .drop("bucket")
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
    }),

    // Predicate deletion (targeted takedown — the axis expire's
    // last_seen cutoff cannot express): drop every 'part-1…' key from a
    // copy of the prebuilt store through the staged dual rewrite, read
    // the forward copy back. Oracle = the aggregate minus the predicate.
    "store_delete" -> ((s, dir) => {
      val storePath = copyOfPrebuiltStore(s, dir, "delete")
      require(ObservationStore.deleteWhere(s, storePath,
        col("rrname").startsWith("part-1")) > 0L,
        "store deleteWhere dropped nothing")
      ObservationStore.load(s, storePath).forward
        .drop("bucket")
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
    }),

    // Snapshot diff (CDC audit of staged mutations): mutate a COPY of
    // the prebuilt store — delete 'part-2%' keys, then merge a batch
    // that doubles 'part-10%' counts and introduces 'new-part-10%'
    // keys — and diff it against the untouched base. Unchanged keys
    // (the bulk of the store) must not appear; the oracle rebuilds
    // both generations and full-outer-joins them.
    "store_diff" -> ((s, dir) => {
      val base = prebuiltStorePath(s, dir)
      val mutated = copyOfPrebuiltStore(s, dir, "diff")
      require(ObservationStore.deleteWhere(s, mutated,
        col("rrname").startsWith("part-2")) > 0L,
        "store_diff: delete dropped nothing")
      val upd = Graft.observations(s, dir)
        .filter(col("rrname").startsWith("part-10"))
      ObservationStore.mergeBatch(s, mutated,
        upd.unionAll(upd.withColumn("rrname",
          concat(lit("new-"), col("rrname")))))
      ObservationStore.diff(s, base, mutated)
        .withColumn("old_first_seen", micros(col("old_first_seen")))
        .withColumn("old_last_seen", micros(col("old_last_seen")))
        .withColumn("new_first_seen", micros(col("new_first_seen")))
        .withColumn("new_last_seen", micros(col("new_last_seen")))
    }),

    // Compaction identity: a deliberately FRAGMENTED copy of the shared
    // prebuilt store (every bucket split into several files — the
    // post-churn shape) compacts back to one sorted file per bucket
    // with zero data change; the oracle is the plain aggregate, so the
    // hash proves the rewrite is lossless while StoreSpec pins the
    // file-count and crash behavior.
    "store_compact" -> ((s, dir) => {
      // fresh copy of the PREBUILT fragmented base (post-churn shape,
      // built once untimed — util.fragmentedStoreBase): the gate times
      // compaction, not the fixture fragmentation it undoes
      val storePath = util.freshDirCopy(util.fragmentedStoreBase(s, dir),
        util.scratchDir("compact", dir) + "/store")
      ObservationStore.compact(s, storePath): Unit
      ObservationStore.load(s, storePath).forward
        .drop("bucket")
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
    }),

    // Re-bucketing is lossless: halve the prebuilt store's bucket count
    // (16 → 6, deliberately not a divisor so every key re-hashes),
    // then read the forward copy back — the whole-copy staged swap must
    // preserve every row while the old count's bucket dirs disappear.
    "store_rebucket" -> ((s, dir) => {
      val storePath = copyOfPrebuiltStore(s, dir, "rebucket")
      require(ObservationStore.rebucket(s, storePath, 6) == 16)
      ObservationStore.load(s, storePath).forward
        .drop("bucket")
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
    }),

    // A4+A5 in the reference's NATIVE wire format: dump the aggregate as
    // a real balboa MessagePack stream (protocol.c:149-187), replay it
    // into a fresh dual store, read the forward copy back. Oracle = the
    // plain aggregate (timestamps here are date-granular, so the
    // format's unix-seconds are lossless).
    "balboa_dump" -> ((s, dir) => {
      val tmp = scratchDir("balboadump", dir)
      val agg = ObservationStore.aggregate(Graft.observations(s, dir))
      Tools.dumpBalboa(agg, s"$tmp/dump")
      Tools.replayBalboa(s, s"$tmp/dump", s"$tmp/store", numBuckets = 16)
      ObservationStore.load(s, s"$tmp/store").forward
        .drop("bucket")
        .withColumn("first_seen", micros(col("first_seen")))
        .withColumn("last_seen", micros(col("last_seen")))
    }),

    // A9/Q11 — stats: total distinct-key count of the store.
    "total_count" -> ((s, dir) =>
      aggMicros(s, dir).agg(count(lit(1)).as("total_count"))),

    // KMV distinct-count sketch (k=256) over the answer column, beside
    // the exact count — O(k) state instead of shuffling every distinct
    // value; the estimator (not just the plumbing) is oracle-checked
    // because all hashing is md5-derived.
    "kmv_distinct" -> ((s, dir) => {
      val obs = Graft.observations(s, dir)
      obs.agg(
          graft.operators.Curation.kmvDistinct(col("rdata"), 256)
            .as("estimate"),
          countDistinct(col("rdata")).as("n_exact"))
        .select(col("estimate"), col("n_exact"),
          expr("abs(estimate - n_exact) * 1000 div n_exact")
            .as("error_permille"))
    }),

    // Theta-style KMV set overlap: |A|, |B|, |A∪B|, |A∩B| and Jaccard
    // between two key sets from two O(k) sketches — customers vs.
    // customers-with-orders (a strict subset, so intersection ≈ |B| and
    // Jaccard < 1000‰). The whole estimator is md5-derived exact
    // integers, mirrored in the oracle.
    "kmv_overlap" -> ((s, dir) =>
      graft.operators.Curation.kmvOverlap(
        Graft.table(s, dir, "customer")
          .select(col("c_custkey").cast("string").as("k")), "k",
        Graft.table(s, dir, "orders")
          .filter(col("o_custkey") % 3 > 0) // strict subset: partial overlap
          .select(col("o_custkey").cast("string").as("k")), "k", 256)),

    // Stats extension: per-rrtype cardinalities over the store — the
    // rollup a passive-DNS analyst asks first (how many names/answers per
    // record type, how much observation mass).
    "cardinality_stats" -> ((s, dir) =>
      aggMicros(s, dir).groupBy(col("rrtype"))
        .agg(countDistinct(col("rrname")).as("n_names"),
          countDistinct(col("rdata")).as("n_answers"),
          countDistinct(col("sensor_id")).as("n_sensors"),
          sum(col("count")).cast("long").as("observations"))),

    // Hunting extension: the newly-observed-domains feed — names whose
    // FIRST observation (min first_seen across sensors/types/answers)
    // lands after mid-1995 — one name-grain min fold over the store aggregate
    // plus a residual filter; the strongest phishing/DGA prior.
    "dns_newly_observed" -> ((s, dir) =>
      graft.operators.DnsAnalytics.newlyObserved(
        aggMicros(s, dir), "rrname", "first_seen",
        fromMicros = 801964800000000L)), // 1995-06-01T00:00:00Z

    // Hunting extension: NOD day-grain triage rollup — per UTC day of
    // first observation, how many names are new and how many sit under
    // NEW parents. Even orderkeys mint per-year campaign zones
    // (tun<sensor>-<year>.com — fresh infrastructure), odd keep
    // established corp<sensor>.com zones, so the permille split is
    // non-degenerate. Two min folds + one parent-keyed equi-join.
    "nod_rollup" -> ((s, dir) => {
      val obs = Graft.observations(s, dir)
      val even = col("rdata").cast("long") % 2 === 0
      val named = obs.select(
        concat(
          when(even, md5(concat(col("rdata"), col("rrname"))))
            .otherwise(col("rrname")),
          lit("."),
          when(even,
            concat(lit("tun"), col("sensor_id"), lit("-"),
              year(col("ts")).cast("string")))
            .otherwise(concat(lit("corp"), col("sensor_id"))),
          lit(".com")).as("name"),
        util.micros(col("ts")).as("ts"))
      graft.operators.DnsAnalytics.nodRollup(named, "name", "ts",
        fromMicros = 820454400000000L) // 1996-01-01T00:00:00Z
    }),

    // Ops extension: per-sensor feed-coverage gap audit — the
    // feed-health question asked before trusting any windowed analytic
    // (a sensor dark for a week mints false NOD hits the day it
    // returns): per sensor the active day span, observed/missing day
    // counts and the longest dark run. (key, day)-distinct fold + one
    // key-partitioned lag window.
    "sensor_gaps" -> ((s, dir) =>
      graft.operators.Events.coverageGaps(
        Graft.observations(s, dir)
          .select(col("sensor_id"), util.micros(col("ts")).as("ts_us")),
        "sensor_id", "ts_us")),

    // Hunting extension: per-address co-tenancy profile over the
    // IP-shaped observation stream — the investigator's reverse pivot
    // (what else lives on this address): distinct-name volume,
    // observation mass, dominant tenant + permille share (ties to the
    // lexically smallest name). Two folds + an address-keyed argmax.
    "ip_cotenancy" -> ((s, dir) =>
      graft.operators.DnsAnalytics.coTenancy(
        Graft.ipObservations(s, dir), "rdata", "rrname", "count")),

    // Hunting extension: wildcard-DNS detection per parent zone — the
    // NOD-feed polluter (a wildcard zone mints a "new name" for every
    // probe, so the feed drowns in synthetic children): per parent the
    // distinct-child count, distinct-rdata count, dominant rdata + its
    // observation-mass share. Even orderkeys simulate wildcard zones
    // (every child collapses to ONE rdata under wild<sensor>.com);
    // odd keep real dotted-quad diversity under norm<sensor>.com.
    // Composes coTenancy keyed by parent over rdata + a child census.
    "dns_wildcard" -> ((s, dir) => {
      val lastOct = expr("cast(split(rdata, '\\\\.')[3] as bigint)")
      val even = lastOct % 2 === 0
      val base = Graft.ipObservations(s, dir).select(
        concat(col("rrname"), lit("."),
          when(even, concat(lit("wild"), col("sensor_id")))
            .otherwise(concat(lit("norm"), col("sensor_id"))),
          lit(".com")).as("name"),
        when(even, concat(lit("10.9.9."), col("sensor_id")))
          .otherwise(col("rdata")).as("rdata"),
        col("count"))
        .withColumn("parent", substring_index(col("name"), ".", -2))
      val ct = graft.operators.DnsAnalytics
        .coTenancy(base, "parent", "rdata", "count")
        .select(col("ip").as("parent"), col("n_names").as("n_rdata"),
          col("total_count"), col("top_name").as("top_rdata"),
          col("top_share_permille"))
      val kids = base.groupBy(col("parent"))
        .agg(countDistinct(col("name")).as("n_children"))
      ct.join(kids, "parent")
    }),

    // Hunting extension: per-name DGA/tunnel character signals over a
    // dotted-name stream (even orderkeys mint md5-hex tunnel
    // subdomains under tun<sensor>.com, odd keep the dictionary-ish
    // rrname under corp<sensor>.com) — narrow pass over distinct
    // names, exact permilles.
    "dns_labels" -> ((s, dir) =>
      graft.operators.DnsAnalytics.labelSignals(
        dottedNames(s, dir).select(col("name")).distinct(), "name")),

    // Hunting extension: the tunnel detector — per registered parent,
    // unique-subdomain volume/shape; tun* parents must surface with
    // uniq_permille near 1000 (every lookup fresh) while corp*
    // parents repeat. One map-side-combined shuffle.
    "dns_tunnel" -> ((s, dir) =>
      graft.operators.DnsAnalytics.tunnelAggregates(
        dottedNames(s, dir), "name", "count")),

    // Hunting extension: fast-flux signals per name over the IP-shaped
    // observation stream — distinct-address volume, /24 spread, and
    // the busiest co-tenant count; names never paired with names.
    "dns_fastflux" -> ((s, dir) =>
      graft.operators.DnsAnalytics.fastFluxSignals(
        Graft.ipObservations(s, dir), "rrname", "rdata")),

    // Store stats extension: per-rrtype mix over the merged aggregate
    // (the record-type profile a pDNS operator reads before retention
    // or schema decisions) — entry count, observation mass, permille
    // share of the grand total.
    "rrtype_mix" -> ((s, dir) => {
      val per = aggMicros(s, dir).groupBy(col("rrtype"))
        .agg(count(lit(1)).as("n_entries"),
          sum(col("count")).as("total_count"))
        .localCheckpoint(false) // feeds the rows AND the grand total
      per.crossJoin(broadcast(
          per.agg(sum(col("total_count")).as("_g"))))
        .select(col("rrtype"), col("n_entries"), col("total_count"),
          expr("total_count * 1000 div _g").as("count_permille"))
    }),

    // Hunting extension: domain co-occurrence per (sensor, day)
    // context — names queried together cluster C2 infrastructure with
    // its decoys and CDNs with their customers; the quadratic-safe
    // bipartite projection (oversized contexts dropped entirely)
    // over part-group items.
    "dns_cooccur" -> ((s, dir) => {
      val obs = Graft.observations(s, dir)
      graft.operators.Graphs.bipartiteProject(
        obs.select(
          concat(col("sensor_id"), lit(":"),
            expr("unix_micros(cast(ts as timestamp_ltz))" +
              " div 86400000000")).as("ctx"),
          concat(lit("g"),
            col("rrname").substr(lit(6), lit(100)).cast("long") % 200L)
            .as("item")),
        "ctx", "item", minShared = 3, maxContextDegree = 12)
    }),

    // Hunting extension: edit-distance-1 typosquats against the same
    // brand list — fat-finger registrations (char dropped when
    // rdata % 4 == 1, char doubled when == 2), leetsquats excluded by
    // the skeleton filter so the two detectors partition the space.
    "dns_typo" -> ((s, dir) => {
      val k = col("rdata").cast("long")
      val brand = element_at(
        array(lookalikeBrands.map(lit): _*), (k % 5 + 1).cast("int"))
      // drop the 2nd char / double the 3rd char — both distance 1
      val label = when(k % 4 === 1,
          concat(substring(brand, 1, 1), substring(brand, 3, 100)))
        .otherwise(when(k % 4 === 2,
          concat(substring(brand, 1, 3), substring(brand, 3, 100)))
          .otherwise(col("rrname")))
      val names = Graft.observations(s, dir)
        .select(concat(label, lit(".zone"), col("sensor_id"),
          lit(".com")).as("name"))
        .distinct()
      import s.implicits._
      graft.operators.DnsAnalytics.typoNames(
        names, "name", lookalikeBrands.toDF("brand"), "brand")
    }),

    // Prefix-preserving IPv4 anonymization (Crypto-PAn at octet
    // granularity): per-octet md5-keyed XOR masks — shared raw
    // prefixes stay shared, everything else scrambles; narrow map.
    "ip_anon" -> ((s, dir) =>
      Graft.ipObservations(s, dir).select(col("rdata").as("ip"))
        .distinct()
        .select(col("ip"),
          Net.anonymizeIpv4(col("ip"), "graft").as("anon_ip"))),

    // Hunting extension: brand-lookalike labels via the confusable
    // skeleton — leetsquat registrations (paypa1, g00gle, 4m4zon) fold
    // onto their brand while the raw label differs; the minting picks a
    // brand by orderkey and a substitution by orderkey mod 3 (a
    // substitution with no target letter leaves the brand intact and
    // must be self-excluded by the raw-mismatch filter).
    "dns_lookalike" -> ((s, dir) => {
      val k = col("rdata").cast("long")
      val brand = element_at(
        array(lookalikeBrands.map(lit): _*), (k % 5 + 1).cast("int"))
      val label = when(k % 4 === 0,
          when(k % 3 === 0, regexp_replace(brand, "l", "1"))
            .otherwise(when(k % 3 === 1, regexp_replace(brand, "o", "0"))
              .otherwise(regexp_replace(brand, "a", "4"))))
        .otherwise(col("rrname"))
      val names = Graft.observations(s, dir)
        .select(concat(label, lit(".zone"), col("sensor_id"),
          lit(".com")).as("name"))
        .distinct()
      import s.implicits._
      graft.operators.DnsAnalytics.lookalikeNames(
        names, "name", lookalikeBrands.toDF("brand"), "brand")
    }),
  )

  /** The protected-brand fixture for the dns_lookalike gate. */
  private val lookalikeBrands =
    Seq("paypal", "google", "amazon", "netflix", "office")

  /** The dotted-name fixture shared by the dns_labels / dns_tunnel
    * gates: even orderkeys become hex-subdomain tunnel traffic, odd
    * stay dictionary-ish repeats; both inherit the observation
    * stream's count column. */
  private def dottedNames(s: SparkSession, dir: String): DataFrame = {
    val obs = Graft.observations(s, dir)
    val even = col("rdata").cast("long") % 2 === 0
    obs.select(
      concat(
        when(even, md5(concat(col("rdata"), col("rrname"))))
          .otherwise(col("rrname")),
        lit("."),
        when(even, concat(lit("tun"), col("sensor_id")))
          .otherwise(concat(lit("corp"), col("sensor_id"))),
        lit(".com")).as("name"),
      col("count"))
  }

  /** The shared 60-bit md5 hash mirror ([[util.hash60Sql]]). */
  private def hash60Sql(c: String): String = util.hash60Sql(c)

  /** SQL mirror of [[dottedNames]] (the dns_labels/dns_tunnel fixture). */
  private val dottedNamesCte: String =
    """WITH o AS (
      |  SELECT (CASE WHEN l_orderkey % 2 = 0
      |          THEN md5(CAST(l_orderkey AS VARCHAR) || 'part-' ||
      |                   CAST(l_partkey AS VARCHAR))
      |          ELSE 'part-' || CAST(l_partkey AS VARCHAR) END) ||
      |         '.' ||
      |         (CASE WHEN l_orderkey % 2 = 0 THEN 'tun'
      |               ELSE 'corp' END) ||
      |         CAST(l_suppkey % 10 AS VARCHAR) || '.com' AS name,
      |         1 AS cnt
      |  FROM lineitem)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // Name-grain min over the merged store aggregate, residual filter,
    // UTC day via integer div.
    "dns_newly_observed" ->
      s"""$obsCte
         |SELECT rrname,
         |  CAST(MIN(first_seen) AS BIGINT) AS first_seen,
         |  CAST(MIN(first_seen) // 86400000000 AS BIGINT) AS first_day
         |FROM agg
         |GROUP BY 1
         |HAVING MIN(first_seen) >= 801964800000000
         |""".stripMargin,

    // Year-keyed campaign fixture, name-grain min fold, parent census,
    // parent-keyed join, day census; permilles via //.
    "nod_rollup" ->
      """WITH o AS (
        |  SELECT (CASE WHEN l_orderkey % 2 = 0
        |          THEN md5(CAST(l_orderkey AS VARCHAR) || 'part-' ||
        |                   CAST(l_partkey AS VARCHAR))
        |          ELSE 'part-' || CAST(l_partkey AS VARCHAR) END) ||
        |         '.' ||
        |         (CASE WHEN l_orderkey % 2 = 0
        |          THEN 'tun' || CAST(l_suppkey % 10 AS VARCHAR) || '-' ||
        |               CAST(year(l_shipdate) AS VARCHAR)
        |          ELSE 'corp' || CAST(l_suppkey % 10 AS VARCHAR) END) ||
        |         '.com' AS name,
        |         epoch_us(l_shipdate) AS ts
        |  FROM lineitem),
        |nf AS (SELECT name, MIN(ts) AS first_seen FROM o GROUP BY 1),
        |np AS (SELECT name, first_seen,
        |         array_to_string(
        |           list_slice(string_split(name, '.'), -2, -1), '.')
        |           AS parent
        |       FROM nf),
        |pf AS (SELECT parent, MIN(first_seen) AS parent_first
        |       FROM np GROUP BY 1)
        |SELECT CAST(np.first_seen // 86400000000 AS BIGINT) AS first_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_new_names,
        |  CAST(SUM(CASE WHEN pf.parent_first >= 820454400000000
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_under_new_parent,
        |  CAST(SUM(CASE WHEN pf.parent_first >= 820454400000000
        |            THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
        |    AS new_parent_permille
        |FROM np JOIN pf USING (parent)
        |WHERE np.first_seen >= 820454400000000
        |GROUP BY 1
        |""".stripMargin,

    // (sensor, day)-distinct census, lag over the day sequence per
    // sensor, then one fold; the longest dark run via MAX(day-prev-1).
    "sensor_gaps" ->
      """WITH obs AS (
        |  SELECT CAST(l_suppkey % 10 AS VARCHAR) AS sensor_id,
        |         epoch_us(l_shipdate) // 86400000000 AS day
        |  FROM lineitem),
        |d AS (SELECT DISTINCT sensor_id, day FROM obs),
        |g AS (SELECT sensor_id, day,
        |        lag(day) OVER (PARTITION BY sensor_id ORDER BY day)
        |          AS prev
        |      FROM d)
        |SELECT sensor_id,
        |  CAST(MIN(day) AS BIGINT) AS first_day,
        |  CAST(MAX(day) AS BIGINT) AS last_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_days_observed,
        |  CAST(COALESCE(MAX(day - prev - 1), 0) AS BIGINT)
        |    AS max_gap_days,
        |  CAST(MAX(day) - MIN(day) + 1 - COUNT(*) AS BIGINT)
        |    AS n_days_missing
        |FROM g GROUP BY 1
        |""".stripMargin,

    // Same ip-shaped rdata as cidr_range; (ip, name) mass fold,
    // ip-sized totals, dominant tenant by (mass desc, name asc).
    "ip_cotenancy" ->
      """WITH obs AS (
        |  SELECT 'part-' || CAST(l_partkey AS VARCHAR) AS name,
        |         '10.' || CAST((l_orderkey // 65536) % 256 AS VARCHAR) ||
        |         '.'   || CAST((l_orderkey // 256)   % 256 AS VARCHAR) ||
        |         '.'   || CAST(l_orderkey % 256          AS VARCHAR)
        |           AS ip,
        |         CAST(1 AS BIGINT) AS cnt
        |  FROM lineitem),
        |p AS (SELECT ip, name, CAST(SUM(cnt) AS BIGINT) AS cnt
        |      FROM obs GROUP BY 1, 2),
        |t AS (SELECT ip, CAST(COUNT(*) AS BIGINT) AS n_names,
        |             CAST(SUM(cnt) AS BIGINT) AS total_count
        |      FROM p GROUP BY 1),
        |r AS (SELECT ip, name, cnt,
        |        row_number() OVER (PARTITION BY ip
        |          ORDER BY cnt DESC, name ASC) AS rn
        |      FROM p)
        |SELECT t.ip, t.n_names, t.total_count, r.name AS top_name,
        |  CASE WHEN t.total_count > 0 THEN
        |    CAST(r.cnt * 1000 // t.total_count AS BIGINT) END
        |    AS top_share_permille
        |FROM t JOIN r USING (ip) WHERE r.rn = 1
        |""".stripMargin,

    // Same wildcard/normal minting keyed on orderkey parity (the last
    // rdata octet's parity — 256 is even); (parent, rdata) mass fold,
    // dominant rdata by (mass desc, rdata asc), child census joined.
    "dns_wildcard" ->
      """WITH o AS (
        |  SELECT 'part-' || CAST(l_partkey AS VARCHAR) AS rrname,
        |         CAST(l_suppkey % 10 AS VARCHAR) AS sensor,
        |         l_orderkey % 2 = 0 AS ev,
        |         '10.' || CAST((l_orderkey // 65536) % 256 AS VARCHAR) ||
        |         '.'   || CAST((l_orderkey // 256)   % 256 AS VARCHAR) ||
        |         '.'   || CAST(l_orderkey % 256          AS VARCHAR)
        |           AS q,
        |         1 AS cnt
        |  FROM lineitem),
        |b AS (SELECT rrname || '.' ||
        |        (CASE WHEN ev THEN 'wild' ELSE 'norm' END) || sensor ||
        |        '.com' AS name,
        |        CASE WHEN ev THEN '10.9.9.' || sensor ELSE q END
        |          AS rdata,
        |        (CASE WHEN ev THEN 'wild' ELSE 'norm' END) || sensor ||
        |        '.com' AS parent,
        |        cnt
        |      FROM o),
        |p AS (SELECT parent, rdata, CAST(SUM(cnt) AS BIGINT) AS c
        |      FROM b GROUP BY 1, 2),
        |t AS (SELECT parent, CAST(COUNT(*) AS BIGINT) AS n_rdata,
        |             CAST(SUM(c) AS BIGINT) AS total_count
        |      FROM p GROUP BY 1),
        |r AS (SELECT parent, rdata, c,
        |        row_number() OVER (PARTITION BY parent
        |          ORDER BY c DESC, rdata ASC) AS rn
        |      FROM p),
        |k AS (SELECT parent, CAST(COUNT(DISTINCT name) AS BIGINT)
        |        AS n_children
        |      FROM b GROUP BY 1)
        |SELECT t.parent, t.n_rdata, t.total_count, r.rdata AS top_rdata,
        |  CASE WHEN t.total_count > 0 THEN
        |    CAST(r.c * 1000 // t.total_count AS BIGINT) END
        |    AS top_share_permille,
        |  k.n_children
        |FROM t JOIN r ON r.parent = t.parent AND r.rn = 1
        |JOIN k ON k.parent = t.parent
        |""".stripMargin,

    // Shared dotted-name rendering, then per-name character classes
    // counted by remove-and-subtract, permilles via //.
    "dns_labels" ->
      s"""$dottedNamesCte,
         |n AS (SELECT DISTINCT name FROM o),
         |x AS (SELECT name, replace(name, '.', '') AS s,
         |             string_split(name, '.') AS l
         |      FROM n)
         |SELECT name,
         |  CAST(len(l) AS BIGINT) AS n_labels,
         |  CAST(list_max(list_transform(l, t -> len(t))) AS BIGINT)
         |    AS max_label_len,
         |  CAST(len(s) AS BIGINT) AS name_chars,
         |  CASE WHEN len(s) > 0 THEN CAST(
         |    (len(s) - len(regexp_replace(s, '[0-9]', '', 'g'))) * 1000
         |      // len(s) AS BIGINT) END AS digit_permille,
         |  CASE WHEN len(s) > 0 THEN CAST(
         |    (len(s) - len(regexp_replace(s, '[0-9a-f]', '', 'g'))) * 1000
         |      // len(s) AS BIGINT) END AS hex_permille,
         |  CASE WHEN len(s) > 0 THEN CAST(
         |    (len(s) - len(regexp_replace(s, '[aeiou]', '', 'g'))) * 1000
         |      // len(s) AS BIGINT) END AS vowel_permille
         |FROM x
         |""".stripMargin,

    "dns_tunnel" ->
      s"""$dottedNamesCte
         |SELECT array_to_string(
         |    list_slice(string_split(name, '.'), -2, -1), '.') AS parent,
         |  CAST(COUNT(DISTINCT name) AS BIGINT) AS n_unique_names,
         |  CAST(SUM(cnt) AS BIGINT) AS total_count,
         |  CAST(MAX(len(name)) AS BIGINT) AS max_name_len,
         |  CAST(SUM(len(name) * cnt) AS BIGINT) AS sum_name_chars,
         |  CASE WHEN SUM(cnt) > 0 THEN
         |    CAST(COUNT(DISTINCT name) * 1000 // SUM(cnt) AS BIGINT) END
         |    AS uniq_permille
         |FROM o GROUP BY 1
         |""".stripMargin,

    // Per-rrtype fold of the merged aggregate, permille of the total.
    "rrtype_mix" ->
      s"""$obsCte,
         |per AS (SELECT rrtype, CAST(COUNT(*) AS BIGINT) AS n_entries,
         |          CAST(SUM("count") AS BIGINT) AS total_count
         |        FROM agg GROUP BY 1)
         |SELECT rrtype, n_entries, total_count,
         |  CAST(total_count * 1000 //
         |    (SELECT SUM(total_count) FROM per) AS BIGINT)
         |    AS count_permille
         |FROM per
         |""".stripMargin,

    // Same (sensor, day) contexts and part-group items; ≤-cap keep,
    // co-located pair join, shared-context count.
    "dns_cooccur" ->
      """WITH inc AS (
        |  SELECT DISTINCT
        |    CAST(l_suppkey % 10 AS VARCHAR) || ':' ||
        |    CAST(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000
        |      AS VARCHAR) AS ctx,
        |    'g' || CAST(l_partkey % 200 AS VARCHAR) AS item
        |  FROM lineitem),
        |keep AS (SELECT ctx FROM inc GROUP BY ctx
        |         HAVING COUNT(*) <= 12),
        |e AS (SELECT inc.ctx, inc.item FROM inc JOIN keep USING (ctx))
        |SELECT a.item AS a, b.item AS b,
        |       CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM e a JOIN e b ON a.ctx = b.ctx AND a.item < b.item
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |""".stripMargin,

    // Same fat-finger minting (drop 2nd char / double 3rd), same
    // length prefilter + levenshtein bound + skeleton exclusion.
    "dns_typo" ->
      """WITH src AS (
        |  SELECT *, list_extract(
        |      ['paypal','google','amazon','netflix','office'],
        |      CAST(l_orderkey % 5 + 1 AS INT)) AS br
        |  FROM lineitem),
        |o AS (
        |  SELECT (CASE WHEN l_orderkey % 4 = 1
        |            THEN substr(br, 1, 1) || substr(br, 3)
        |          WHEN l_orderkey % 4 = 2
        |            THEN substr(br, 1, 3) || substr(br, 3)
        |          ELSE 'part-' || CAST(l_partkey AS VARCHAR) END) ||
        |         '.zone' || CAST(l_suppkey % 10 AS VARCHAR) || '.com'
        |           AS name
        |  FROM src),
        |n AS (SELECT DISTINCT name FROM o),
        |l AS (SELECT name, unnest(string_split(name, '.')) AS label
        |      FROM n),
        |x AS (SELECT name, label, lower(label) AS ll FROM l),
        |b AS (SELECT unnest(
        |    ['paypal','google','amazon','netflix','office']) AS brand)
        |SELECT x.name, x.label, b.brand,
        |  CAST(levenshtein(x.ll, b.brand) AS BIGINT) AS distance
        |FROM x JOIN b ON abs(len(x.ll) - len(b.brand)) <= 1
        |  AND levenshtein(x.ll, b.brand) <= 1 AND x.ll <> b.brand
        |WHERE translate(x.ll, '0134578-', 'oleastb') <>
        |      translate(b.brand, '0134578-', 'oleastb')
        |""".stripMargin,

    // Same per-octet mask bytes (first md5 hex byte via the strpos
    // idiom), same secret, xor() per octet.
    "ip_anon" -> {
      def mb(x: String): String =
        s"((strpos('0123456789abcdef', md5($x)[1]) - 1) * 16 + " +
          s"(strpos('0123456789abcdef', md5($x)[2]) - 1))"
      """WITH ips AS (
        |  SELECT DISTINCT
        |    '10.' || CAST((l_orderkey // 65536) % 256 AS VARCHAR) ||
        |    '.'   || CAST((l_orderkey // 256)   % 256 AS VARCHAR) ||
        |    '.'   || CAST(l_orderkey % 256          AS VARCHAR) AS ip
        |  FROM lineitem),
        |o AS (SELECT ip, string_split(ip, '.') AS p FROM ips),
        |m AS (SELECT ip,
        |  CAST(p[1] AS BIGINT) AS o1, CAST(p[2] AS BIGINT) AS o2,
        |  CAST(p[3] AS BIGINT) AS o3, CAST(p[4] AS BIGINT) AS o4,
        |  'graft:' AS q1,
        |  'graft:' || p[1] AS q2,
        |  'graft:' || p[1] || '.' || p[2] AS q3,
        |  'graft:' || p[1] || '.' || p[2] || '.' || p[3] AS q4
        |FROM o)
        |SELECT ip,
        |  CAST(xor(o1, MB1) AS VARCHAR) || '.' ||
        |  CAST(xor(o2, MB2) AS VARCHAR) || '.' ||
        |  CAST(xor(o3, MB3) AS VARCHAR) || '.' ||
        |  CAST(xor(o4, MB4) AS VARCHAR) AS anon_ip
        |FROM m
        |""".stripMargin
        .replace("MB1", mb("q1")).replace("MB2", mb("q2"))
        .replace("MB3", mb("q3")).replace("MB4", mb("q4"))
    },

    // Distinct (name, ip) incidences, per-ip co-tenant counts joined
    // back on the ip key, folded per name — /24 spread via the
    // 3-octet prefix.
    "dns_fastflux" ->
      """WITH inc AS (
        |  SELECT DISTINCT
        |    'part-' || CAST(l_partkey AS VARCHAR) AS name,
        |    '10.' || CAST((l_orderkey // 65536) % 256 AS VARCHAR) ||
        |    '.'   || CAST((l_orderkey // 256)   % 256 AS VARCHAR) ||
        |    '.'   || CAST(l_orderkey % 256          AS VARCHAR) AS ip
        |  FROM lineitem),
        |per_ip AS (
        |  SELECT ip, CAST(COUNT(*) AS BIGINT) AS names_on_ip
        |  FROM inc GROUP BY 1)
        |SELECT inc.name,
        |  CAST(COUNT(*) AS BIGINT) AS n_ips,
        |  CAST(COUNT(DISTINCT array_to_string(
        |    list_slice(string_split(inc.ip, '.'), 1, 3), '.'))
        |    AS BIGINT) AS n_subnets24,
        |  CAST(MAX(per_ip.names_on_ip) AS BIGINT)
        |    AS max_names_on_shared_ip
        |FROM inc JOIN per_ip ON inc.ip = per_ip.ip
        |GROUP BY 1
        |""".stripMargin,

    // The same minting (brand by orderkey mod 5, substitution by mod
    // 3), then the skeleton fold (translate: leet map + hyphen delete)
    // joins labels to brands and the raw-mismatch filter drops the
    // substitutions that had no target letter.
    "dns_lookalike" ->
      """WITH src AS (
        |  SELECT *, list_extract(
        |      ['paypal','google','amazon','netflix','office'],
        |      CAST(l_orderkey % 5 + 1 AS INT)) AS br
        |  FROM lineitem),
        |o AS (
        |  SELECT (CASE WHEN l_orderkey % 4 = 0 THEN
        |            CASE WHEN l_orderkey % 3 = 0 THEN replace(br, 'l', '1')
        |                 WHEN l_orderkey % 3 = 1 THEN replace(br, 'o', '0')
        |                 ELSE replace(br, 'a', '4') END
        |          ELSE 'part-' || CAST(l_partkey AS VARCHAR) END) ||
        |         '.zone' || CAST(l_suppkey % 10 AS VARCHAR) || '.com'
        |           AS name
        |  FROM src),
        |n AS (SELECT DISTINCT name FROM o),
        |l AS (SELECT name, unnest(string_split(name, '.')) AS label
        |      FROM n),
        |sk AS (SELECT name, label,
        |         translate(lower(label), '0134578-', 'oleastb') AS s
        |       FROM l),
        |bs AS (SELECT DISTINCT lower(brand) AS brand,
        |         translate(lower(brand), '0134578-', 'oleastb') AS bsk
        |       FROM (SELECT unnest(
        |         ['paypal','google','amazon','netflix','office']) AS brand))
        |SELECT sk.name, sk.label, bs.brand
        |FROM sk JOIN bs ON sk.s = bs.bsk
        |WHERE lower(sk.label) <> bs.brand
        |""".stripMargin,

    "kmv_distinct" ->
      s"""WITH v AS (
         |  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS rdata
         |  FROM lineitem),
         |h AS (SELECT DISTINCT ${hash60Sql("rdata")} AS h FROM v),
         |km AS (SELECT h FROM h ORDER BY h ASC LIMIT 256),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk, MAX(h) AS kth FROM km),
         |x AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM v),
         |sel AS (
         |  SELECT CASE WHEN a.nk < 256 THEN a.nk
         |              ELSE CAST(CAST(255 AS HUGEINT) *
         |                        CAST(1152921504606846976 AS HUGEINT) //
         |                        CAST(a.kth AS HUGEINT) AS BIGINT)
         |         END AS estimate,
         |         x.n_exact AS n_exact
         |  FROM a CROSS JOIN x)
         |SELECT estimate, n_exact,
         |       abs(estimate - n_exact) * 1000 // n_exact AS error_permille
         |FROM sel
         |""".stripMargin,

    "kmv_overlap" ->
      s"""WITH ka AS (
         |  SELECT h FROM (
         |    SELECT DISTINCT ${hash60Sql("v")} AS h FROM (
         |      SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS v
         |      FROM customer))
         |  ORDER BY h LIMIT 256),
         |kb AS (
         |  SELECT h FROM (
         |    SELECT DISTINCT ${hash60Sql("v")} AS h FROM (
         |      SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS v
         |      FROM orders WHERE o_custkey % 3 > 0))
         |  ORDER BY h LIMIT 256),
         |ku AS (
         |  SELECT DISTINCT h FROM (
         |    SELECT h FROM ka UNION ALL SELECT h FROM kb)
         |  ORDER BY h LIMIT 256),
         |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS kth FROM ka),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS kth FROM kb),
         |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS kth FROM ku),
         |rho AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS rho FROM ku
         |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
         |est AS (
         |  SELECT
         |    CASE WHEN na.n < 256 THEN na.n
         |         ELSE CAST(CAST(255 AS HUGEINT) *
         |                   CAST(1152921504606846976 AS HUGEINT) //
         |                   CAST(na.kth AS HUGEINT) AS BIGINT) END AS est_a,
         |    CASE WHEN nb.n < 256 THEN nb.n
         |         ELSE CAST(CAST(255 AS HUGEINT) *
         |                   CAST(1152921504606846976 AS HUGEINT) //
         |                   CAST(nb.kth AS HUGEINT) AS BIGINT) END AS est_b,
         |    CASE WHEN nu.n < 256 THEN nu.n
         |         ELSE CAST(CAST(255 AS HUGEINT) *
         |                   CAST(1152921504606846976 AS HUGEINT) //
         |                   CAST(nu.kth AS HUGEINT) AS BIGINT) END AS est_union,
         |    nu.n AS m, rho.rho AS rho
         |  FROM na, nb, nu, rho)
         |SELECT est_a, est_b, est_union,
         |       CASE WHEN m = 0 THEN 0
         |            ELSE CAST(CAST(rho AS HUGEINT) *
         |                      CAST(est_union AS HUGEINT) //
         |                      CAST(m AS HUGEINT) AS BIGINT)
         |       END AS est_intersection,
         |       CASE WHEN m = 0 THEN 0 ELSE rho * 1000 // m
         |       END AS jaccard_permille
         |FROM est
         |""".stripMargin,

    "store_agg" ->
      s"""$obsCte SELECT * FROM agg""",

    // compaction is an identity on the data — same oracle as the
    // expiry-free aggregate
    "store_compact" ->
      s"""$obsCte SELECT * FROM agg""",

    // so is re-bucketing (the hashing changes, the rows must not)
    "store_rebucket" ->
      s"""$obsCte SELECT * FROM agg""",

    "entries_rrname" ->
      s"""$obsCte SELECT * FROM agg WHERE rrname = 'part-42'""",

    "entries_rdata" ->
      s"""$obsCte SELECT * FROM agg WHERE rdata = '7'""",

    "entries_residual" ->
      s"""$obsCte SELECT * FROM agg
         | WHERE rrname = 'part-42' AND rrtype = 'A' AND sensor_id = '3'
         |""".stripMargin,

    "entries_prefix" ->
      s"""$obsCte SELECT * FROM agg WHERE rrname LIKE 'part-1999%'""",

    "rest_union" ->
      s"""$obsCte
         |SELECT * FROM agg WHERE rrname = 'part-42'
         |UNION ALL
         |SELECT * FROM agg WHERE rdata = 'part-42'
         |""".stripMargin,

    "aliases" ->
      s"""$obsCte,
         |e AS (SELECT rrname AS e_rrname, sensor_id AS e_sensor_id,
         |             rdata AS e_rdata
         |      FROM agg WHERE rrname = 'part-42' AND rrtype = 'A'),
         |j AS (SELECT e.e_rrname, e.e_rdata AS rdata,
         |             e.e_sensor_id AS sensor_id,
         |             t.rrname AS alias_rrname, t.rrtype AS alias_rrtype,
         |             ROW_NUMBER() OVER (
         |               PARTITION BY e.e_rrname, e.e_sensor_id, e.e_rdata
         |               ORDER BY t.rrname, t.rrtype) AS rn
         |      FROM e JOIN agg t
         |        ON t.rdata = e.e_rdata AND t.sensor_id = e.e_sensor_id
         |       AND t.rrname <> e.e_rrname)
         |SELECT e_rrname, rdata, sensor_id, alias_rrname, alias_rrtype
         |FROM j WHERE rn <= 2
         |""".stripMargin,

    // Same uniquely-decodable token stream (per-field md5 or 'N')
    // through the shared hash60 mirror, summed in HUGEINT.
    "table_checksum" -> {
      val canon = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority", "od_us")
        .map(c => s"COALESCE(md5(CAST($c AS VARCHAR)), 'N')")
        .mkString("(", " || ", ")")
      s"""WITH t AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         |         epoch_us(o_orderdate) AS od_us
         |  FROM orders),
         |h AS (SELECT ${util.hash60Sql(canon)} AS hh FROM t)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(COALESCE(SUM(CAST(hh AS HUGEINT)), 0)
         |              % 1000000000000000000 AS BIGINT) AS checksum
         |FROM h
         |""".stripMargin
    },

    // LPM by direct containment join + longest-wins row_number — the
    // naive formulation the masked equi-join must reproduce. Masking is
    // flooring to the block size (base - base % 2^(32-len)), the same
    // arithmetic both engines run exactly.
    "lpm_join" ->
      """WITH ips AS (
        |  SELECT DISTINCT
        |    '10.' || CAST((l_orderkey // 65536) % 256 AS VARCHAR) ||
        |    '.'   || CAST((l_orderkey // 256)   % 256 AS VARCHAR) ||
        |    '.'   || CAST(l_orderkey % 256 AS VARCHAR) AS ip
        |  FROM lineitem),
        |routes AS (
        |  SELECT '10.0.0.0/8' AS cidr, 'default' AS label
        |  UNION ALL
        |  SELECT '10.' || CAST((n_nationkey * 7) % 256 AS VARCHAR)
        |           || '.0.0/16', n_name FROM nation
        |  UNION ALL
        |  SELECT '10.' || CAST((n_nationkey * 7) % 256 AS VARCHAR) || '.'
        |           || CAST((n_nationkey * 13) % 256 AS VARCHAR)
        |           || '.0/24', n_name || ':24' FROM nation),
        |pr AS (
        |  SELECT cidr, label,
        |    CAST(split_part(cidr, '/', 2) AS BIGINT) AS len,
        |    CAST(split_part(split_part(cidr,'/',1),'.',1) AS BIGINT)
        |      * 16777216 +
        |    CAST(split_part(split_part(cidr,'/',1),'.',2) AS BIGINT)
        |      * 65536 +
        |    CAST(split_part(split_part(cidr,'/',1),'.',3) AS BIGINT)
        |      * 256 +
        |    CAST(split_part(split_part(cidr,'/',1),'.',4) AS BIGINT)
        |      AS base
        |  FROM routes),
        |prm AS (
        |  SELECT cidr, label, len,
        |    CASE WHEN len = 0 THEN CAST(4294967296 AS BIGINT)
        |         ELSE CAST(1 AS BIGINT) << CAST(32 - len AS INT)
        |    END AS block,
        |    base - base % (CASE WHEN len = 0
        |                        THEN CAST(4294967296 AS BIGINT)
        |                        ELSE CAST(1 AS BIGINT)
        |                             << CAST(32 - len AS INT) END)
        |      AS masked
        |  FROM pr),
        |ipl AS (
        |  SELECT ip,
        |    CAST(split_part(ip,'.',1) AS BIGINT) * 16777216 +
        |    CAST(split_part(ip,'.',2) AS BIGINT) * 65536 +
        |    CAST(split_part(ip,'.',3) AS BIGINT) * 256 +
        |    CAST(split_part(ip,'.',4) AS BIGINT) AS v
        |  FROM ips),
        |j AS (
        |  SELECT i.ip, r.cidr, r.len, r.label,
        |         row_number() OVER (PARTITION BY i.ip
        |           ORDER BY r.len DESC, r.cidr DESC, r.label DESC) AS rn
        |  FROM ipl i JOIN prm r ON i.v - i.v % r.block = r.masked)
        |SELECT ip, cidr, CAST(len AS BIGINT) AS prefix_len, label
        |FROM j WHERE rn = 1
        |""".stripMargin,

    "cidr_range" ->
      """WITH obs AS (
        |  SELECT 'part-' || CAST(l_partkey AS VARCHAR) AS rrname,
        |         CAST(l_suppkey % 10 AS VARCHAR)       AS sensor_id,
        |         l_returnflag                          AS rrtype,
        |         '10.' || CAST((l_orderkey // 65536) % 256 AS VARCHAR) ||
        |         '.'   || CAST((l_orderkey // 256)   % 256 AS VARCHAR) ||
        |         '.'   || CAST(l_orderkey % 256          AS VARCHAR) AS rdata,
        |         CAST(1 AS BIGINT) AS "count",
        |         l_shipdate        AS ts
        |  FROM lineitem),
        |agg AS (
        |  SELECT rrname, sensor_id, rrtype, rdata,
        |         CAST(SUM("count") AS BIGINT) AS "count",
        |         epoch_us(MIN(ts)) AS first_seen,
        |         epoch_us(MAX(ts)) AS last_seen
        |  FROM obs GROUP BY 1, 2, 3, 4),
        |parsed AS (
        |  SELECT *,
        |         CAST(string_split(rdata, '.')[1] AS BIGINT) * 16777216 +
        |         CAST(string_split(rdata, '.')[2] AS BIGINT) * 65536 +
        |         CAST(string_split(rdata, '.')[3] AS BIGINT) * 256 +
        |         CAST(string_split(rdata, '.')[4] AS BIGINT) AS ip_num
        |  FROM agg)
        |SELECT rrname, sensor_id, rrtype, rdata, "count", first_seen, last_seen
        |FROM parsed
        |WHERE ip_num BETWEEN 167773184 AND 167774207
        |""".stripMargin,

    // The oracle re-derives the 32-char hex key from the rdata STRING
    // (the generated shape is 2001:db8::G7:G8, so splitting on ':' gives
    // [2001, db8, '', G7, G8]) and compares against hand-derived hex
    // bounds for 2001:db8::1000/118 — independently computed, NOT taken
    // from Net.cidrBounds6, so a bounds bug cannot cancel out.
    "cidr_range_v6" ->
      """WITH obs AS (
        |  SELECT 'part-' || CAST(l_partkey AS VARCHAR) AS rrname,
        |         CAST(l_suppkey % 10 AS VARCHAR)       AS sensor_id,
        |         'AAAA'                                AS rrtype,
        |         '2001:db8::' ||
        |         lower(hex((l_orderkey // 65536) % 65536)) || ':' ||
        |         lower(hex(l_orderkey % 65536)) AS rdata,
        |         CAST(1 AS BIGINT) AS "count",
        |         l_shipdate        AS ts
        |  FROM lineitem),
        |agg AS (
        |  SELECT rrname, sensor_id, rrtype, rdata,
        |         CAST(SUM("count") AS BIGINT) AS "count",
        |         epoch_us(MIN(ts)) AS first_seen,
        |         epoch_us(MAX(ts)) AS last_seen
        |  FROM obs GROUP BY 1, 2, 3, 4),
        |parsed AS (
        |  SELECT *,
        |         '20010db80000000000000000' ||
        |         lpad(string_split(rdata, ':')[4], 4, '0') ||
        |         lpad(string_split(rdata, ':')[5], 4, '0') AS ip6_hex
        |  FROM agg)
        |SELECT rrname, sensor_id, rrtype, rdata, "count", first_seen, last_seen
        |FROM parsed
        |WHERE ip6_hex BETWEEN '20010db8000000000000000000001000'
        |                  AND '20010db80000000000000000000013ff'
        |""".stripMargin,

    "fanout_union" ->
      s"""$obsCte
         |SELECT * FROM agg WHERE rrname = 'part-42'
         |UNION ALL
         |SELECT * FROM agg WHERE sensor_id = '3' AND rrname = 'part-42'
         |""".stripMargin,

    // Spark's toJSON renders fields in schema order with no spaces;
    // rebuild the byte-identical string (values here contain no
    // JSON-escapable characters).
    "jsonize_dump" ->
      """WITH obs AS (
        |  SELECT 'part-' || CAST(l_partkey AS VARCHAR) AS rrname,
        |         CAST(l_suppkey % 10 AS VARCHAR)       AS sensor_id,
        |         l_returnflag                          AS rrtype,
        |         CAST(l_orderkey AS VARCHAR)           AS rdata,
        |         CAST(1 AS BIGINT)                     AS "count",
        |         l_shipdate                            AS ts
        |  FROM lineitem),
        |agg AS (
        |  SELECT rrname, sensor_id, rrtype, rdata,
        |         CAST(SUM("count") AS BIGINT) AS "count",
        |         epoch_us(MIN(ts)) // 1000000 AS time_first,
        |         epoch_us(MAX(ts)) // 1000000 AS time_last
        |  FROM obs GROUP BY 1, 2, 3, 4)
        |SELECT '{"rrname":"' || rrname ||
        |       '","rdata":"' || rdata ||
        |       '","rrtype":"' || rrtype ||
        |       '","sensor_id":"' || sensor_id ||
        |       '","count":' || CAST("count" AS VARCHAR) ||
        |       ',"time_first":' || CAST(time_first AS VARCHAR) ||
        |       ',"time_last":' || CAST(time_last AS VARCHAR) || '}' AS value
        |FROM agg
        |""".stripMargin,

    "dump_replay" ->
      s"""$obsCte SELECT * FROM agg""",

    "store_expire" ->
      s"""$obsCte
         |SELECT * FROM agg
         |WHERE last_seen >= epoch_us(TIMESTAMP '1996-01-01 00:00:00')
         |""".stripMargin,

    "store_delete" ->
      s"""$obsCte
         |SELECT * FROM agg
         |WHERE rrname NOT LIKE 'part-1%'
         |""".stripMargin,

    "store_diff" ->
      s"""$obsCte,
         |b0 AS (SELECT * FROM obs WHERE rrname LIKE 'part-10%'),
         |batch AS (
         |  SELECT * FROM b0
         |  UNION ALL
         |  SELECT 'new-' || rrname AS rrname, sensor_id, rrtype, rdata,
         |         "count", ts
         |  FROM b0),
         |batchagg AS (
         |  SELECT rrname, sensor_id, rrtype, rdata,
         |         CAST(SUM("count") AS BIGINT) AS "count",
         |         epoch_us(MIN(ts)) AS first_seen,
         |         epoch_us(MAX(ts)) AS last_seen
         |  FROM batch GROUP BY 1, 2, 3, 4),
         |aft AS (
         |  SELECT rrname, sensor_id, rrtype, rdata,
         |         CAST(SUM("count") AS BIGINT) AS "count",
         |         MIN(first_seen) AS first_seen,
         |         MAX(last_seen) AS last_seen
         |  FROM (SELECT * FROM agg WHERE rrname NOT LIKE 'part-2%'
         |        UNION ALL SELECT * FROM batchagg)
         |  GROUP BY 1, 2, 3, 4),
         |d AS (
         |  SELECT COALESCE(b.rrname, a.rrname)       AS rrname,
         |         COALESCE(b.sensor_id, a.sensor_id) AS sensor_id,
         |         COALESCE(b.rrtype, a.rrtype)       AS rrtype,
         |         COALESCE(b.rdata, a.rdata)         AS rdata,
         |         b."count" AS old_count, b.first_seen AS old_first_seen,
         |         b.last_seen AS old_last_seen,
         |         a."count" AS new_count, a.first_seen AS new_first_seen,
         |         a.last_seen AS new_last_seen
         |  FROM agg b FULL OUTER JOIN aft a
         |    ON b.rrname = a.rrname AND b.sensor_id = a.sensor_id
         |   AND b.rrtype = a.rrtype AND b.rdata = a.rdata)
         |SELECT rrname, sensor_id, rrtype, rdata,
         |       old_count, old_first_seen, old_last_seen,
         |       new_count, new_first_seen, new_last_seen,
         |       CASE WHEN old_count IS NULL THEN 'added'
         |            WHEN new_count IS NULL THEN 'removed'
         |            ELSE 'changed' END AS status
         |FROM d
         |WHERE (old_count IS NULL) <> (new_count IS NULL)
         |   OR old_count <> new_count
         |   OR old_first_seen <> new_first_seen
         |   OR old_last_seen <> new_last_seen
         |""".stripMargin,

    "balboa_dump" ->
      s"""$obsCte SELECT * FROM agg""",

    "total_count" ->
      s"""$obsCte SELECT CAST(COUNT(*) AS BIGINT) AS total_count FROM agg""",

    "cardinality_stats" ->
      s"""$obsCte
         |SELECT rrtype,
         |       CAST(COUNT(DISTINCT rrname) AS BIGINT) AS n_names,
         |       CAST(COUNT(DISTINCT rdata) AS BIGINT) AS n_answers,
         |       CAST(COUNT(DISTINCT sensor_id) AS BIGINT) AS n_sensors,
         |       CAST(SUM("count") AS BIGINT) AS observations
         |FROM agg GROUP BY 1
         |""".stripMargin,
  )
}
