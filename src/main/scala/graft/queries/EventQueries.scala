package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.Events
import util.micros

/** Windowed event-stream analytics over the `events` table. `events.ts`
  * arrives as TIMESTAMP(NANOS) parquet, read as nanos and truncated to
  * microseconds ([[Graft.table]]) — exactly DuckDB's internal precision,
  * so window boundaries agree. */
object EventQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "events")

  /** Shared SQL replay of [[walksCorpus]]: the undirected
    * customer–supplier adjacency, 2 walks per node, three unrolled
    * hash-argmin steps, unioned as `w(start, walk, step, node)`. */
  private val walksOracleCte: String = {
    def stepCte(prev: String, cur: String, t: Int): String =
      s"""$cur AS (
         |  SELECT start, walk, CAST($t AS BIGINT) AS step,
         |    CAST(substr(MIN(
         |      md5(CAST(start AS VARCHAR) || ':' ||
         |          CAST(walk AS VARCHAR) || ':$t:' ||
         |          CAST(e.dst AS VARCHAR)) || ':' ||
         |      CAST(e.dst AS VARCHAR)), 34) AS BIGINT) AS node
         |  FROM $prev JOIN e ON e.src = $prev.node
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT src, dst FROM (
       |        SELECT src, dst FROM e0
       |        UNION SELECT dst, src FROM e0)
       |      WHERE src <> dst),
       |n AS (SELECT DISTINCT src AS node FROM e
       |      UNION SELECT DISTINCT dst FROM e),
       |s0 AS (SELECT CAST(node AS BIGINT) AS start,
       |              CAST(w.walk AS BIGINT) AS walk,
       |              CAST(0 AS BIGINT) AS step,
       |              CAST(node AS BIGINT) AS node
       |       FROM n CROSS JOIN (VALUES (0), (1)) AS w(walk)),
       |${stepCte("s0", "s1", 1)},
       |${stepCte("s1", "s2", 2)},
       |${stepCte("s2", "s3", 3)},
       |w AS (SELECT * FROM s0
       |      UNION ALL SELECT * FROM s1
       |      UNION ALL SELECT * FROM s2
       |      UNION ALL SELECT * FROM s3)""".stripMargin
  }

  /** LPA labels shared by graph_lpa and graph_modularity (memoized —
    * the 2-round propagation is the expensive half of both gates). */
  private def lpaLabels(s: SparkSession, dir: String): DataFrame =
    util.memoDf(s, dir, "graph_lpa")(
      graft.operators.Graphs.labelPropagation(
        suppCooccurEdges(s, dir), "src", "dst", rounds = 2))

  /** The walk corpus shared by graph_walks and walk_pairs (memoized —
    * the walk itself is the expensive half; the pair explode is cheap). */
  private def walksCorpus(s: SparkSession, dir: String): DataFrame =
    util.memoDf(s, dir, "graph_walks")(
      graft.operators.Graphs.randomWalks(custSuppEdges(s, dir), "src",
        "dst", walksPerNode = 2, steps = 3))

  /** The customer→supplier order graph both PageRank gates walk (ONE
    * definition — the dst offset and join must not drift apart);
    * memoized: ~10 graph gates share this orders⋈lineitem join, and
    * each paying it again was the family's dominant fixture cost. */
  private def custSuppEdges(s: SparkSession, dir: String): DataFrame =
    util.memoDf(s, dir, "custSuppEdges")(
      Graft.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Graft.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst")))

  /** The thresholded supplier co-occurrence graph shared by the
    * triangle and label-propagation gates (ONE definition — the
    * threshold and the pair orientation must not drift apart):
    * suppliers linked when they serve the same order at least 5 times.
    * An unthresholded projection of a busy hub goes dense and both
    * clustering signals stop meaning anything. */
  private def suppCooccurEdges(s: SparkSession, dir: String): DataFrame =
    // memoized for the same reason as custSuppEdges (the co-occurrence
    // self-join is the priciest fixture in the family)
    util.memoDf(s, dir, "suppCooccurEdges") {
      val li = Graft.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      li.join(
          li.select(col("l_orderkey").as("ok2"),
            col("l_suppkey").as("sk2")),
          col("l_orderkey") === col("ok2") &&
            col("l_suppkey") < col("sk2"))
        .groupBy(col("l_suppkey").as("src"), col("sk2").as("dst"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type; decimal-exact value sums.
    "events_hourly" -> ((s, dir) =>
      Events.tumblingAgg(events(s, dir), col("ts"), col("event_type"))
        .select(micros(col("window_start")).as("window_start"),
          col("key").as("event_type"), col("n_events"),
          col("sum_value_cents"))),

    // Sliding 1-hour windows advancing every 15 minutes per event type:
    // each event lands in exactly 4 windows (Expand before ONE shuffle,
    // never a self-join). The oracle derives the same 4 window starts
    // per event with integer epoch-micros arithmetic.
    "events_sliding" -> ((s, dir) =>
      Events.slidingAgg(events(s, dir), col("ts"), col("event_type"))
        .select(micros(col("window_start")).as("window_start"),
          col("key").as("event_type"), col("n_events"),
          col("sum_value_cents"))),

    // Burst detection: hourly windows whose count reaches 1.5× the
    // key's average per active window — exact integer permille ratio,
    // baseline broadcast back onto the windows.
    "events_bursts" -> ((s, dir) =>
      Events.burstWindows(events(s, dir), col("ts"), col("event_type"))
        .select(col("key").as("event_type"),
          micros(col("window_start")).as("window_start"),
          col("n_events"), col("avg_n"), col("ratio_permille"))),

    // Distinct users per (hour, type) from an O(8) KMV sketch INSIDE
    // the windowed aggregation — the mergeable-sketch-in-window
    // composition (exact countDistinct shuffles every (window, user)
    // occurrence; the sketch caps per-group state). k=8 so the gate
    // exercises BOTH branches: most groups exact, the 9-10-user groups
    // through the estimator. n_exact rides beside as the verification.
    "window_distinct" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(graft.operators.Curation
            .kmvDistinct(col("user_id").cast("string"), 8).as("est_users"),
          countDistinct(col("user_id")).as("n_exact"))
        .select(micros(col("w.start")).as("window_start"),
          col("event_type"), col("est_users"), col("n_exact"))),

    // Top-3 users per hourly window by event count — the bounded
    // TopKPairs aggregate INSIDE the windowed groupBy (the leaderboard
    // per window, O(k) state per window where the row_number window
    // sort holds each window's full user list on one task). Rank and
    // ties match the window formulation exactly — the oracle IS that
    // window.
    "window_topk" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("w"))
        .agg(graft.operators.Curation.topKPairs(col("n"), col("user_id"), 3)
          .as("t"))
        .select(micros(col("w.start")).as("window_start"),
          posexplode(col("t")).as(Seq("rank0", "p")))
        .select(col("window_start"), col("rank0").cast("long").as("rank"),
          col("p.ord").as("n_events"), col("p.payload").as("user_id"))),

    // Weekly retention cohorts: users keyed by first active week,
    // counted in each returning week — everything past the first
    // distinct runs on (user, week) rows, never event-sized data.
    // The synthetic stream has every user active every week (one
    // cohort); a deterministic per-user onboarding day (id mod 28)
    // staggers first activity so the matrix is genuinely triangular.
    "retention_cohorts" -> ((s, dir) =>
      Events.retentionCohorts(
        events(s, dir)
          .filter(dayofmonth(col("ts")) >= col("user_id") % 28),
        "user_id", "ts")
        .select(micros(col("cohort")).as("cohort"), col("week_offset"),
          col("n_users"))),

    // Beaconing (C2 heartbeat) signals per (user, type): inter-arrival
    // deltas in micros, the mode delta with multiplicity and its share
    // of all intervals — a timer fires at mode_permille near 1000.
    "events_beaconing" -> ((s, dir) =>
      Events.beaconingSignals(
        events(s, dir).select(col("user_id"), col("event_type"),
          micros(col("ts")).as("t"), col("event_id")),
        Seq("user_id", "event_type"), "t", "event_id")),

    // Gap-based sessions (30 min) per user.
    "events_sessions" -> ((s, dir) =>
      Events.sessionize(events(s, dir), "user_id", "ts", "event_id")
        .select(col("user_id"), col("session_seq"),
          micros(col("session_start")).as("session_start"),
          micros(col("session_end")).as("session_end"),
          col("n_events"))),

    // Nearest-event join: for every click, the user's closest purchase
    // within ±6h from EITHER direction (the as-of forms answer only
    // one side); equal-distance ties prefer the earlier purchase.
    "events_nearest" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_id")).as("pid"))
      Events.nearestJoin(clicks, buys, "user_id", "ts", "ts",
          Seq("pid"), toleranceUs = 6L * 3600L * 1000000L)
        .select(col("event_id"), col("user_id"), micros(col("ts")).as("t"),
          micros(col("near_ts")).as("near_t"), col("near_pid"),
          col("near_delta_us"), col("near_direction"))
    }),

    // Integer gap-filling of the hourly count series with PLANTED gaps
    // (every hour ≡ 2 mod 5 dropped): dropped hours come back by
    // linear interpolation between observed neighbors, edges carry
    // flat; truncating div both engines share (slopes go negative).
    "gap_fill" -> ((s, dir) => {
      val series = events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(cast(ts as timestamp_ltz)) div 3600000000")
            .as("h"))
        .groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("v"))
        .filter(col("h") % 5 =!= 2)
      Events.gapFill(series, "event_type", "h", "v")
    }),

    // Frequent within-session event 3-grams (2-day gap sessions — the
    // synthetic stream's ~1 event/user/day needs a wide gap for
    // multi-event sessions): support = distinct sessions containing the
    // gram (the sequential-pattern support), occurrences raw.
    "frequent_sequences" -> ((s, dir) =>
      Events.frequentSequences(events(s, dir), "user_id", "ts",
        "event_id", "event_type", k = 3, minSupport = 5,
        gapMinutes = 2880)),

    // Hour-of-week seasonal anomalies with a PLANTED spike (2% of
    // events, user_id % 50 = 7, collapse onto one hour) — the flagged
    // set must contain exactly the cells whose count beats 2× the
    // leave-one-out weekly baseline for the same slot, spike included.
    // Slot/week come from epoch-hour arithmetic, never calendar
    // functions (the cross-engine drift trap).
    "seasonal_anomaly" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"),
        when(col("user_id") % 50 === 7,
          lit("2024-01-10 10:00:00").cast("timestamp"))
          .otherwise(col("ts")).as("ts"))
      Events.seasonalAnomalies(ev, "event_type", "ts")
    }),

    // Incremental sessionization: fold the strictly-later 30% of the
    // stream into the sessions built from the first 70% — the delta
    // answer must be bit-identical to the full rebuild (the oracle
    // windows ALL events). Exercises seed-gap fusing (group 0 extends a
    // stored session), fresh-session renumbering, and pass-through of
    // untouched users.
    "sessions_delta" -> ((s, dir) => {
      val cutoff = lit("2024-01-22").cast("timestamp")
      val ev = events(s, dir)
      val old = Events.sessionize(
        ev.filter(col("ts") < cutoff), "user_id", "ts", "event_id")
      Events.sessionizeDelta(old, ev.filter(col("ts") >= cutoff),
          "user_id", "ts", "event_id")
        .select(col("user_id"), col("session_seq"),
          micros(col("session_start")).as("session_start"),
          micros(col("session_end")).as("session_end"),
          col("n_events"))
    }),

    // Interval union per user: each event opens a 10/20/30-minute span
    // (duration from event_id % 3 — deterministic integers, no floats);
    // overlapping-or-touching spans coalesce via the prefix-max
    // linearization (one shuffle, no transitive-closure self-join).
    "interval_merge" -> ((s, dir) => {
      val iv = events(s, dir).select(col("user_id"),
        micros(col("ts")).as("s"),
        (micros(col("ts")) +
          (lit(1L) + col("event_id") % 3) * 600000000L).as("e"))
      Events.mergeIntervals(iv, "user_id", "s", "e")
        .select(col("user_id"), col("merge_seq"), col("span_start"),
          col("span_end"), col("n_intervals"))
    }),

    // Interval-overlap self-join per user: which of a user's 10/30-min
    // activity spans ran concurrently — the binned equi-join with
    // exactly-once pair accounting (accepted only in the bin holding
    // the later start), never the per-user cartesian. Oracle is the
    // naive inequality join.
    "interval_overlap" -> ((s, dir) => {
      def iv(idAs: String) = events(s, dir).select(
        col("event_id").as(idAs), col("user_id"),
        micros(col("ts")).as("s"),
        (micros(col("ts")) +
          (lit(1L) + col("event_id") % 3) * 600000000L).as("e"))
      Events.overlapJoin(iv("l_id"), iv("r_id"), "user_id",
          "s", "e", "s", "e", binUs = 3600000000L,
          leftOut = Seq("l_id"), rightOut = Seq("r_id"))
        .filter(col("l_id") < col("r_id"))
    }),

    // First-order Markov transitions per user (ordered by ts, event_id):
    // pair counts + exact integer permille of everything leaving the
    // previous type.
    "event_transitions" -> ((s, dir) =>
      Events.transitionCounts(events(s, dir), "user_id", "ts",
        "event_id", "event_type")),

    // As-of join: each click picks up the user's most recent
    // prior-or-simultaneous purchase (amount pre-aggregated to integer
    // cents per (user, ts) — the uniqueness precondition). Oracle is
    // DuckDB's NATIVE ASOF JOIN — an independent implementation of the
    // semantics, not a mirrored query.
    "events_asof" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(round(col("value") * 100, 0).cast("long"))
          .as("purchase_cents"))
      Events.asofJoin(clicks, purchases, "user_id", "ts", "ts",
          Seq("purchase_cents"))
        .filter(col("asof_ts").isNotNull) // inner-ASOF, like the oracle
        .select(col("event_id"), col("user_id"), micros(col("ts")).as("ts"),
          micros(col("asof_ts")).as("purchase_ts"),
          col("asof_purchase_cents").as("purchase_cents"))
    }),

    // FORWARD as-of: the EARLIEST purchase at-or-after each click —
    // the mirror window direction ("next event after this one").
    "events_asof_forward" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(round(col("value") * 100, 0).cast("long"))
          .as("purchase_cents"))
      Events.asofJoinForward(clicks, purchases, "user_id", "ts", "ts",
          Seq("purchase_cents"))
        .filter(col("asof_ts").isNotNull)
        .select(col("event_id"), col("user_id"), micros(col("ts")).as("ts"),
          micros(col("asof_ts")).as("purchase_ts"),
          col("asof_purchase_cents").as("purchase_cents"))
    }),

    // Range join: purchases within 24h AFTER a view by the same user
    // (attribution window), via the binned equi-join — never a per-key
    // cartesian. Oracle is the plain inequality join.
    "events_range_join" -> ((s, dir) => {
      val e = events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      Events.rangeJoin(views, purchases, "user_id", "ts", "ts",
        windowUs = 24L * 3600 * 1000000,
        leftOut = Seq("view_id"), rightOut = Seq("purchase_id"))
    }),

    // Key-skew profile of the event stream's user key — the decision
    // input for salting/AQE on a big shuffle.
    "skew_profile" -> ((s, dir) =>
      graft.operators.Curation.keySkew(events(s, dir), "user_id")),

    // Ordered funnel over the event stream: view → click → purchase per
    // user, each stage gated on the previous stage's completion time.
    // Null stage times are rendered as -1 (both engines agree on the
    // sentinel; nullable-int rendering differs between their dataframe
    // bridges).
    "events_funnel" -> ((s, dir) => {
      val f = Events.funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      f.select(col("user_id"),
        coalesce(micros(col("t0")), lit(-1L)).as("view_ts"),
        coalesce(micros(col("t1")), lit(-1L)).as("click_ts"),
        coalesce(micros(col("t2")), lit(-1L)).as("purchase_ts"),
        col("stages_completed"))
    }),

    // Per-stage funnel conversion metrics: entered/converted counts,
    // exact integer per-mille rate, and the median time-to-convert from
    // the previous stage (interpolated percentile over exact integer
    // micros, emitted ×100 — the length_quantiles exactness pattern).
    "events_funnel_rates" -> ((s, dir) =>
      Events.funnelRates(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    // Fixed-iteration integer PageRank over the customer→supplier order
    // graph (3 rounds, damping 85/100, ranks scaled to 1e9) — exact
    // integer arithmetic end to end, dangling supplier mass dropped per
    // round (documented simplification; the oracle mirrors it).
    "graph_pagerank" -> ((s, dir) =>
      graft.operators.Graphs.pageRank(custSuppEdges(s, dir), "src", "dst",
        iters = 3)),

    // Common-neighbor link prediction over the customer→supplier
    // bipartite graph (2% deterministic customer sample keeps the gate
    // pair-count bounded): customer pairs sharing ≥3 suppliers, scored
    // by shared count and exact-integer neighborhood Jaccard.
    "link_predict" -> ((s, dir) =>
      graft.operators.Graphs.commonNeighbors(
        custSuppEdges(s, dir).filter(col("src") % 50 === 3),
        "src", "dst", minCommon = 3)),

    // Seeded (TrustRank-style) PageRank: teleport mass lands only on
    // three trusted customers, so rank = authority as seen from the
    // seeds — the link-spam demotion signal. Same graph and arithmetic
    // as graph_pagerank, different teleport vector.
    "graph_trustrank" -> ((s, dir) =>
      graft.operators.Graphs.pageRank(custSuppEdges(s, dir), "src", "dst",
        iters = 3, seeds = Seq(1L, 4L, 7L))),

    // Bounded top-k per key via the custom TopKPairs aggregate (O(k)
    // group state, map-side combine) — oracle is the window row_number
    // formulation it replaces, proving exact parity. Null-bearing rows
    // are planted under a 3-row synthetic key so the documented
    // window-parity recipe (coalesce both inputs to Long.MinValue,
    // matching the window's nulls-last-under-DESC rank) is exercised in
    // the OUTPUT, not vacuously trimmed away.
    "topk_per_key" -> ((s, dir) => {
      import s.implicits._
      val e = events(s, dir).select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        col("user_id").cast("long").as("user_id"))
      val planted = Seq[(String, Option[Long], Option[Long])](
        ("_nulls", Some(700L), Some(7L)),
        ("_nulls", None, Some(42L)),
        ("_nulls", Some(500L), None)
      ).toDF("event_type", "cents", "user_id")
      val sentinel = lit(Long.MinValue)
      e.union(planted).groupBy(col("event_type"))
        .agg(graft.operators.Curation.topKPairs(
          coalesce(col("cents"), sentinel),
          coalesce(col("user_id"), sentinel), 3).as("top"))
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
          col("col.ord").as("cents"), col("col.payload").as("user_id"))
    }),

    // Freshness-weighted event counts: weight halves every 7 days of
    // age below the stream's max ts (exact power-of-two integers, one
    // map-side-combined shuffle) — the crawl-scheduling / recency-
    // mixing signal.
    "decayed_counts" -> ((s, dir) => {
      val e = events(s, dir)
      val asOf = lit(e.agg(max(col("ts"))).head().get(0))
      graft.operators.Events.decayedCounts(e, "event_type", "ts", asOf)
    }),

    // Per-node triangle counts over the supplier co-occurrence graph:
    // suppliers linked when they serve the same order AT LEAST 5 times
    // (the co-occurrence threshold every projection graph needs — an
    // unthresholded projection of a busy hub goes dense and triangle
    // counts stop meaning anything). Exact integer counting; the oracle
    // closes triangles with the naive canonical 3-way join,
    // independently of the degree-oriented plan.
    "graph_triangles" -> ((s, dir) =>
      graft.operators.Graphs.triangleCounts(
        suppCooccurEdges(s, dir), "src", "dst")),

    // Multi-source BFS hop distances from the three trusted customers
    // over the UNDIRECTED customer–supplier order graph, 3 rounds:
    // round 1 reaches their suppliers, round 2 the co-customers of
    // those suppliers, round 3 the next supplier ring — the discrete
    // seed-proximity twin of graph_trustrank. Nodes unreached within 3
    // rounds are absent (the oracle unrolls the same three frontier
    // expansions as CTE steps).
    "graph_bfs" -> ((s, dir) =>
      graft.operators.Graphs.bfsDistances(custSuppEdges(s, dir), "src",
        "dst", seeds = Seq(1L, 4L, 7L), rounds = 3)),

    // Deterministic DeepWalk corpus: 2 hash-chosen walks of ≤3 steps
    // from EVERY node of the undirected customer–supplier graph — at
    // each step the walker moves to the out-neighbor minimizing
    // md5(start:walk:step:dst). The oracle replays the same argmin as
    // three unrolled frontier joins.
    "graph_walks" -> ((s, dir) => walksCorpus(s, dir)),

    // Skip-gram (center, context) pair counts within 2 steps over the
    // SAME walk corpus (memoized — the walk is the expensive half) —
    // the rows a DeepWalk embedder actually trains on. Offset explode +
    // one equi-join back to the corpus; never an inequality self-join.
    "walk_pairs" -> ((s, dir) =>
      graft.operators.Graphs.skipGramPairs(walksCorpus(s, dir),
        window = 2)),

    // Bounded weighted shortest paths over the customer→supplier graph
    // with deterministic integer edge costs: 3 Bellman–Ford rounds =
    // cheapest path using ≤3 edges from sources {1, 4} (the weighted
    // answer BFS hop counts can't give).
    "graph_sssp" -> ((s, dir) => {
      val weighted = Graft.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Graft.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"),
          (col("o_orderkey") % 7 + 1L).as("w"))
      graft.operators.Graphs.shortestPaths(weighted, "src", "dst", "w",
        sources = Seq(1L, 4L), rounds = 3)
    }),

    // Landmark closeness/harmonic centrality: one multi-source BFS
    // walks all three landmark seeds simultaneously (a (seed, id)
    // frontier — k landmarks cost one loop, not k); per node the
    // reached-seed count, total hop distance, and floor-per-term
    // harmonic sum.
    "graph_closeness" -> ((s, dir) =>
      graft.operators.Graphs.closenessFromSeeds(custSuppEdges(s, dir),
        "src", "dst", seeds = Seq(2L, 5L, 8L), rounds = 3)),

    // Thresholded bipartite projection, order→supplier: suppliers
    // co-occur when they share ≥ 2 orders, orders with > 6 distinct
    // suppliers dropped whole (the hub guard BINDS on this data —
    // 7-lineitem orders exist). The first-class form of the projection
    // the lpa/triangle gates derive inline.
    // Degree-distribution audit of the customer→supplier graph — the
    // shape check every iterative-graph cap keys off; per direction
    // the node count at each distinct degree over the distinct edges.
    "graph_degrees" -> ((s, dir) =>
      graft.operators.Graphs.degreeProfile(custSuppEdges(s, dir),
        "src", "dst")),

    // Directed reciprocity over a partially-mutual fixture (part and
    // order keys folded into ONE 300-id space, so reverse edges occur
    // organically but not always): distinct edges, one reversed-pair
    // left join, one scalar fold.
    "graph_reciprocity" -> ((s, dir) =>
      graft.operators.Graphs.reciprocity(
        Graft.table(s, dir, "lineitem").select(
          (col("l_partkey") % 300).as("src"),
          (col("l_orderkey") % 300).as("dst")),
        "src", "dst")),

    "graph_project" -> ((s, dir) =>
      graft.operators.Graphs.bipartiteProject(
        Graft.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ctx"), col("l_suppkey").as("item")),
        "ctx", "item", minShared = 2, maxContextDegree = 6)),

    // Integer HITS (2 rounds) on the directed customer→supplier graph:
    // customers are pure hubs, suppliers pure authorities (bipartite),
    // each side L1-renormalized to 1e6 per round by exact DECIMAL
    // div — the oracle mirrors both rounds in HUGEINT.
    "graph_hits" -> ((s, dir) =>
      graft.operators.Graphs.hits(custSuppEdges(s, dir), "src", "dst",
        rounds = 2)),

    // Synchronous label propagation (2 rounds, ties to the smallest
    // label) over the supplier co-occurrence graph: each supplier
    // adopts the most frequent label among its co-suppliers —
    // label-consensus clusters = the trading communities. Deterministic
    // by construction (synchronous rounds + total tie order), so the
    // oracle can mirror both rounds exactly.
    "graph_lpa" -> ((s, dir) => lpaLabels(s, dir)),

    // Newman modularity of the LPA communities over the same
    // co-occurrence graph — the eval that makes graph_lpa's output
    // judgeable, exact integer micro-units (4·m·e_c − d_c² numerator,
    // truncating div).
    "graph_modularity" -> ((s, dir) =>
      graft.operators.Graphs.modularity(suppCooccurEdges(s, dir),
        "src", "dst", lpaLabels(s, dir), "id", "label")),

    // Fixed-round k-core peeling (k=30, 2 rounds) over the
    // customer–supplier order graph: strips the low-degree fringe,
    // keeps the dense trading core. Exact integer degrees; the oracle
    // mirrors the two peel rounds as explicit CTE steps.
    "graph_kcore" -> ((s, dir) =>
      // the edge expression is custSuppEdges verbatim — reuse the
      // memoized fixture instead of re-paying the orders⋈lineitem join
      graft.operators.Graphs.kcorePeel(custSuppEdges(s, dir), "src",
        "dst", k = 30, rounds = 2)),

    // Exact salted distinct-count: per event type, distinct users via
    // 16 disjoint hash slices — salting is semantics-preserving, so the
    // oracle is the plain COUNT(DISTINCT).
    "salted_distinct" -> ((s, dir) =>
      graft.operators.Curation.saltedDistinctCount(events(s, dir),
        "event_type", "user_id")),

    // Salted equi-join: every event joined to its user's lifetime spend
    // through the (key, salt) join — the oracle is the PLAIN join,
    // because salting must be invisible in the result.
    "salted_join" -> ((s, dir) => {
      val e = events(s, dir)
      val perUser = e.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .as("lifetime_cents"))
      graft.operators.Curation.saltedJoin(
          e.select(col("event_id"), col("user_id")), perUser,
          "user_id", saltOn = col("event_id"), Seq("lifetime_cents"))
        .select(col("event_id"), col("user_id"), col("lifetime_cents"))
    }),

    // One-sided CUSUM changepoint scan per event type over DENSIFIED
    // hourly counts (integer statistic in events·H units; the oracle
    // replays the same recursive fold with a recursive CTE).
    "events_cusum" -> ((s, dir) =>
      Events.cusumPeaks(events(s, dir), "ts", "event_type")),

    // AMS/Tug-of-War F2 sketch over event user_ids: per-estimator signed
    // sums and squares next to the exact second moment (= the self-join
    // size on user_id) — the planner's pre-shuffle cardinality probe.
    "f2_sketch" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"))
      val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * n")).cast("long").as("exact_f2"))
      graft.operators.Curation.f2Sketch(e, "user_id")
        .crossJoin(broadcast(exact))
    }),

    // Join-size estimate from two Count-Min sketches (inner-product
    // estimator): views ⋈ purchases on user_id without shuffling either
    // side; exact join size rides along for calibration.
    "cm_join_size" -> ((s, dir) => {
      val e = events(s, dir)
      val a = e.filter(col("event_type") === "view").select(col("user_id"))
      val b = e.filter(col("event_type") === "purchase")
        .select(col("user_id"))
      val exact = a.groupBy(col("user_id")).agg(count(lit(1)).as("na"))
        .join(b.groupBy(col("user_id")).agg(count(lit(1)).as("nb")),
          "user_id")
        .agg(coalesce(sum(expr("na * nb")), lit(0L)).cast("long")
          .as("exact_join_size"))
      graft.operators.Curation.cmJoinSize(a, "user_id", b, "user_id")
        .crossJoin(broadcast(exact))
    }),

    // HLL-in-window: the new sketch composed INSIDE a windowed groupBy
    // (the window_distinct KMV composition, constant-space variant),
    // with the exact distinct alongside for scale reading.
    "window_distinct_hll" -> ((s, dir) =>
      graft.operators.Curation.withHllEstimate(
        events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(graft.operators.Curation
              .hllSketch(col("user_id").cast("string")).as("regs"),
            countDistinct(col("user_id")).as("n_exact")),
        "regs")
        .select(micros(col("w.start")).as("window_start"),
          col("event_type"), col("est_distinct"), col("n_zero"),
          col("n_exact"))),
  )

  /** One unrolled PageRank round in SQL (contributions then rank). */
  /** One PageRank round as CTE steps; `teleport` is the per-node base
    * term (uniform default; the TrustRank gate passes a seeded CASE) and
    * `joinNn` controls whether the node-count CTE is in scope. ONE
    * definition of the contribution join — the variants may only differ
    * in the teleport expression. */
  private def prRound(prIn: String, cOut: String, prOut: String,
      teleport: String = "150000000 // nn.n_nodes",
      joinNn: Boolean = true): String =
    s"""$cOut AS (
       |  SELECT e.dst AS id, CAST(SUM($prIn.pr // deg.outdeg) AS BIGINT) AS c
       |  FROM e JOIN $prIn ON $prIn.id = e.src
       |         JOIN deg ON deg.src = e.src
       |  GROUP BY 1),
       |$prOut AS (
       |  SELECT n.id,
       |         ($teleport) +
       |         (85 * COALESCE($cOut.c, 0)) // 100 AS pr
       |  FROM n ${if (joinNn) "CROSS JOIN nn " else ""}LEFT JOIN $cOut ON $cOut.id = n.id)""".stripMargin

  private val trustTeleport =
    "CASE WHEN n.id IN (1, 4, 7) THEN 150000000 // 3 ELSE 0 END"

  def oracleSql: Map[String, String] = Map(
    "events_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
        |       WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, MIN(e.ts) AS t1
        |       FROM events e JOIN s0 ON s0.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s0.t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 GROUP BY 1)
        |SELECT u.user_id,
        |       COALESCE(epoch_us(s0.t0), -1) AS view_ts,
        |       COALESCE(epoch_us(s1.t1), -1) AS click_ts,
        |       COALESCE(epoch_us(s2.t2), -1) AS purchase_ts,
        |       CAST((CASE WHEN s0.t0 IS NOT NULL THEN 1 ELSE 0 END) +
        |            (CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END) +
        |            (CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS stages_completed
        |FROM u LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
        |       LEFT JOIN s2 USING (user_id)
        |""".stripMargin,

    "events_funnel_rates" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
        |       WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, MIN(e.ts) AS t1
        |       FROM events e JOIN s0 ON s0.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s0.t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 GROUP BY 1),
        |f AS (SELECT u.user_id, s0.t0, s1.t1, s2.t2
        |      FROM u LEFT JOIN s0 USING (user_id)
        |             LEFT JOIN s1 USING (user_id)
        |             LEFT JOIN s2 USING (user_id))
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
        |       CAST(COUNT(*) AS BIGINT) AS entered,
        |       CAST(COUNT(t0) AS BIGINT) AS converted,
        |       CASE WHEN COUNT(*) = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(COUNT(t0) * 1000 // COUNT(*) AS BIGINT)
        |       END AS conv_per_mille,
        |       CAST(-1 AS BIGINT) AS median_from_prev_cents
        |FROM f
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), 'click',
        |       CAST(COUNT(t0) AS BIGINT), CAST(COUNT(t1) AS BIGINT),
        |       CASE WHEN COUNT(t0) = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(COUNT(t1) * 1000 // COUNT(t0) AS BIGINT) END,
        |       COALESCE(CAST(round(quantile_cont(
        |           epoch_us(t1) - epoch_us(t0), 0.5) * 100) AS BIGINT),
        |         CAST(-1 AS BIGINT))
        |FROM f
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'purchase',
        |       CAST(COUNT(t1) AS BIGINT), CAST(COUNT(t2) AS BIGINT),
        |       CASE WHEN COUNT(t1) = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(COUNT(t2) * 1000 // COUNT(t1) AS BIGINT) END,
        |       COALESCE(CAST(round(quantile_cont(
        |           epoch_us(t2) - epoch_us(t1), 0.5) * 100) AS BIGINT),
        |         CAST(-1 AS BIGINT))
        |FROM f
        |""".stripMargin,

    // Same dedupe → middle-join → HAVING → degree-join shape; `//` is
    // floor division, matching the Spark side's pmod formulation on
    // positive operands.
    "link_predict" ->
      """WITH inc AS (
        |  SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS m
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey % 50 = 3),
        |keep AS (SELECT m FROM inc GROUP BY m HAVING COUNT(*) <= 1000),
        |e AS (SELECT s, m FROM inc JOIN keep USING (m)),
        |d AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |p AS (
        |  SELECT a.s AS u, b.s AS v, CAST(COUNT(*) AS BIGINT) AS common_cnt
        |  FROM e a JOIN e b ON a.m = b.m AND a.s < b.s
        |  GROUP BY 1, 2
        |  HAVING COUNT(*) >= 3)
        |SELECT u, v, common_cnt,
        |       CAST(common_cnt * 1000
        |              // (du.deg + dv.deg - common_cnt) AS BIGINT)
        |         AS jaccard_permille
        |FROM p JOIN d du ON p.u = du.s JOIN d dv ON p.v = dv.s
        |""".stripMargin,

    "graph_pagerank" ->
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |n AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM n),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
         |        FROM e GROUP BY 1),
         |pr0 AS (SELECT n.id, 1000000000 // nn.n_nodes AS pr
         |        FROM n CROSS JOIN nn),
         |${prRound("pr0", "c1", "pr1")},
         |${prRound("pr1", "c2", "pr2")},
         |${prRound("pr2", "c3", "pr3")}
         |SELECT id, CAST(pr AS BIGINT) AS pr FROM pr3
         |""".stripMargin,

    "graph_kcore" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |d1 AS (SELECT id, COUNT(*) AS deg FROM (
        |         SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)
        |       GROUP BY 1),
        |k1 AS (SELECT id FROM d1 WHERE deg >= 30),
        |e1 AS (SELECT a, b FROM e0
        |       WHERE a IN (SELECT id FROM k1)
        |         AND b IN (SELECT id FROM k1)),
        |d2 AS (SELECT id, COUNT(*) AS deg FROM (
        |         SELECT a AS id FROM e1 UNION ALL SELECT b FROM e1)
        |       GROUP BY 1),
        |k2 AS (SELECT id FROM d2 WHERE deg >= 30),
        |e2 AS (SELECT a, b FROM e1
        |       WHERE a IN (SELECT id FROM k2)
        |         AND b IN (SELECT id FROM k2))
        |SELECT CAST(id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS deg
        |FROM (SELECT a AS id FROM e2 UNION ALL SELECT b FROM e2)
        |GROUP BY 1
        |""".stripMargin,

    "graph_trustrank" ->
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |n AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
         |        FROM e GROUP BY 1),
         |pr0 AS (SELECT n.id,
         |               CASE WHEN n.id IN (1, 4, 7)
         |                    THEN 1000000000 // 3 ELSE 0 END AS pr
         |        FROM n),
         |${prRound("pr0", "c1", "pr1", trustTeleport, joinNn = false)},
         |${prRound("pr1", "c2", "pr2", trustTeleport, joinNn = false)},
         |${prRound("pr2", "c3", "pr3", trustTeleport, joinNn = false)}
         |SELECT id, CAST(pr AS BIGINT) AS pr FROM pr3
         |""".stripMargin,

    "topk_per_key" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |         CAST(user_id AS BIGINT) AS user_id
        |  FROM events
        |  UNION ALL
        |  SELECT v.et, CAST(v.c AS BIGINT), CAST(v.u AS BIGINT)
        |  FROM (VALUES ('_nulls', 700, 7), ('_nulls', NULL, 42),
        |               ('_nulls', 500, NULL)) AS v(et, c, u)),
        |c AS (
        |  SELECT event_type,
        |         coalesce(cents,   -9223372036854775807 - 1) AS cents,
        |         coalesce(user_id, -9223372036854775807 - 1) AS user_id
        |  FROM e),
        |r AS (
        |  SELECT event_type, cents, user_id,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY cents DESC, user_id DESC)
        |           AS rn
        |  FROM c)
        |SELECT event_type, CAST(rn AS BIGINT) AS rank, cents, user_id
        |FROM r WHERE rn <= 3
        |""".stripMargin,

    "decayed_counts" ->
      """WITH m AS (SELECT max(ts) AS as_of FROM events),
        |h AS (
        |  SELECT event_type,
        |         least(greatest((epoch_us(m.as_of) - epoch_us(ts))
        |                        // (86400000000 * 7), 0), 30) AS hl
        |  FROM events, m)
        |SELECT event_type,
        |       CAST(SUM(CAST(1 AS BIGINT) << CAST(30 - hl AS INT))
        |         AS BIGINT) AS decayed_weight,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM h GROUP BY 1
        |""".stripMargin,

    // The same degree-capped projection: distinct incidences, contexts
    // over the cap dropped whole, pairs counted on surviving contexts.
    // Same folded id space; reversed-pair left join, one scalar fold.
    "graph_reciprocity" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey % 300 AS s, l_orderkey % 300 AS d
        |  FROM lineitem
        |  WHERE l_partkey % 300 <> l_orderkey % 300),
        |j AS (SELECT e.s, e.d,
        |        CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END AS m
        |      FROM e LEFT JOIN e r ON r.s = e.d AND r.d = e.s)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        |  CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_reciprocal,
        |  CASE WHEN COUNT(*) > 0 THEN
        |    CAST(SUM(m) * 1000 // COUNT(*) AS BIGINT) END
        |    AS reciprocity_permille
        |FROM j
        |""".stripMargin,

    // distinct edges, per-side degree census, histogram per direction
    "graph_degrees" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS degree
        |       FROM e GROUP BY 1),
        |idg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM e GROUP BY 1)
        |SELECT 'out' AS direction, degree,
        |       CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM od GROUP BY 2
        |UNION ALL
        |SELECT 'in' AS direction, degree,
        |       CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM idg GROUP BY 2
        |""".stripMargin,

    "graph_project" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS ctx, l_suppkey AS item
        |  FROM lineitem),
        |keep AS (
        |  SELECT ctx FROM inc GROUP BY ctx HAVING COUNT(*) <= 6),
        |e AS (SELECT inc.ctx, inc.item FROM inc JOIN keep USING (ctx))
        |SELECT CAST(a.item AS BIGINT) AS a, CAST(b.item AS BIGINT) AS b,
        |       CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM e a JOIN e b ON a.ctx = b.ctx AND a.item < b.item
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |""".stripMargin,

    // Two unrolled HITS rounds in HUGEINT; L1 renormalization to 1e6
    // per half-round via exact integer division, like the engine's
    // DECIMAL(38,0) multiply-then-div.
    "graph_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS hub FROM n),
        |ar1 AS (SELECT n.id, COALESCE(SUM(h0.hub), 0) AS raw
        |        FROM n LEFT JOIN e ON e.dst = n.id
        |               LEFT JOIN h0 ON h0.id = e.src
        |        GROUP BY n.id),
        |a1 AS (SELECT id, CAST(CAST(raw AS HUGEINT) * 1000000
        |         // (SELECT SUM(raw) FROM ar1) AS BIGINT) AS auth
        |       FROM ar1),
        |hr1 AS (SELECT n.id, COALESCE(SUM(a1.auth), 0) AS raw
        |        FROM n LEFT JOIN e ON e.src = n.id
        |               LEFT JOIN a1 ON a1.id = e.dst
        |        GROUP BY n.id),
        |h1 AS (SELECT id, CAST(CAST(raw AS HUGEINT) * 1000000
        |         // (SELECT SUM(raw) FROM hr1) AS BIGINT) AS hub
        |       FROM hr1),
        |ar2 AS (SELECT n.id, COALESCE(SUM(h1.hub), 0) AS raw
        |        FROM n LEFT JOIN e ON e.dst = n.id
        |               LEFT JOIN h1 ON h1.id = e.src
        |        GROUP BY n.id),
        |a2 AS (SELECT id, CAST(CAST(raw AS HUGEINT) * 1000000
        |         // (SELECT SUM(raw) FROM ar2) AS BIGINT) AS auth
        |       FROM ar2),
        |hr2 AS (SELECT n.id, COALESCE(SUM(a2.auth), 0) AS raw
        |        FROM n LEFT JOIN e ON e.src = n.id
        |               LEFT JOIN a2 ON a2.id = e.dst
        |        GROUP BY n.id),
        |h2 AS (SELECT id, CAST(CAST(raw AS HUGEINT) * 1000000
        |         // (SELECT SUM(raw) FROM hr2) AS BIGINT) AS hub
        |       FROM hr2)
        |SELECT CAST(h2.id AS BIGINT) AS id, h2.hub, a2.auth
        |FROM h2 JOIN a2 USING (id)
        |""".stripMargin,

    // Three unrolled frontier expansions over the undirected edge set;
    // each frontier excludes everything already at a distance.
    "graph_bfs" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0
        |      UNION SELECT dst, src FROM e0),
        |d0 AS (SELECT * FROM (VALUES (1, 0), (4, 0), (7, 0)) AS t(id, dist)),
        |f1 AS (SELECT DISTINCT e.dst AS id FROM e
        |       JOIN d0 ON e.src = d0.id
        |       WHERE e.dst NOT IN (SELECT id FROM d0)),
        |d1 AS (SELECT id, dist FROM d0 UNION ALL SELECT id, 1 FROM f1),
        |f2 AS (SELECT DISTINCT e.dst AS id FROM e
        |       JOIN f1 ON e.src = f1.id
        |       WHERE e.dst NOT IN (SELECT id FROM d1)),
        |d2 AS (SELECT id, dist FROM d1 UNION ALL SELECT id, 2 FROM f2),
        |f3 AS (SELECT DISTINCT e.dst AS id FROM e
        |       JOIN f2 ON e.src = f2.id
        |       WHERE e.dst NOT IN (SELECT id FROM d2)),
        |d3 AS (SELECT id, dist FROM d2 UNION ALL SELECT id, 3 FROM f3)
        |SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist
        |FROM d3
        |""".stripMargin,

    // Three unrolled hash-argmin frontier steps; the per-step winner is
    // min over md5(start:walk:step:dst) || ':' || dst, dst recovered
    // from char 34 (32 hex digits + ':').
    "graph_walks" -> s"$walksOracleCte\nSELECT * FROM w\n",

    // The skip-gram pairing over the SAME replayed corpus: offset
    // probes (±1, ±2) resolved by one (start, walk, step) equi-join.
    "walk_pairs" ->
      s"""$walksOracleCte
         |SELECT x.node AS node_a, y.node AS node_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM w x
         |CROSS JOIN UNNEST([-2, -1, 1, 2]) AS u(d)
         |JOIN w y ON y.start = x.start AND y.walk = x.walk
         |        AND y.step = x.step + u.d
         |GROUP BY 1, 2
         |""".stripMargin,

    // Three unrolled min-plus relaxations over the min-collapsed
    // symmetric weighted edge list — the operator's loop, written out.
    "graph_sssp" ->
      """WITH we AS (
        |  SELECT o_custkey AS src, l_suppkey + 1000000 AS dst,
        |         o_orderkey % 7 + 1 AS w
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |sym AS (SELECT src, dst, w FROM we
        |        UNION ALL SELECT dst, src, w FROM we),
        |e AS (SELECT src, dst, MIN(w) AS w FROM sym
        |      WHERE src <> dst GROUP BY 1, 2),
        |d0 AS (SELECT * FROM (VALUES (1, 0), (4, 0)) AS t(id, dist)),
        |c1 AS (SELECT e.dst AS id, d0.dist + e.w AS dist
        |       FROM d0 JOIN e ON e.src = d0.id),
        |d1 AS (SELECT id, MIN(dist) AS dist FROM
        |       (SELECT * FROM d0 UNION ALL SELECT * FROM c1) GROUP BY 1),
        |c2 AS (SELECT e.dst AS id, d1.dist + e.w AS dist
        |       FROM d1 JOIN e ON e.src = d1.id),
        |d2 AS (SELECT id, MIN(dist) AS dist FROM
        |       (SELECT * FROM d1 UNION ALL SELECT * FROM c2) GROUP BY 1),
        |c3 AS (SELECT e.dst AS id, d2.dist + e.w AS dist
        |       FROM d2 JOIN e ON e.src = d2.id),
        |d3 AS (SELECT id, MIN(dist) AS dist FROM
        |       (SELECT * FROM d2 UNION ALL SELECT * FROM c3) GROUP BY 1)
        |SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist
        |FROM d3
        |""".stripMargin,

    // Per-seed BFS unroll (the graph_bfs shape carrying the seed
    // through every frontier), aggregated to the three centrality
    // sums; 1000 // dist mirrors the floor-per-term harmonic.
    "graph_closeness" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0
        |      UNION SELECT dst, src FROM e0),
        |s(seed) AS (VALUES (2), (5), (8)),
        |d0 AS (SELECT seed, seed AS id, 0 AS dist FROM s),
        |f1 AS (SELECT DISTINCT d0.seed, e.dst AS id FROM d0
        |       JOIN e ON e.src = d0.id
        |       WHERE NOT EXISTS (SELECT 1 FROM d0 x
        |         WHERE x.seed = d0.seed AND x.id = e.dst)),
        |d1 AS (SELECT * FROM d0
        |       UNION ALL SELECT seed, id, 1 FROM f1),
        |f2 AS (SELECT DISTINCT f1.seed, e.dst AS id FROM f1
        |       JOIN e ON e.src = f1.id
        |       WHERE NOT EXISTS (SELECT 1 FROM d1 x
        |         WHERE x.seed = f1.seed AND x.id = e.dst)),
        |d2 AS (SELECT * FROM d1
        |       UNION ALL SELECT seed, id, 2 FROM f2),
        |f3 AS (SELECT DISTINCT f2.seed, e.dst AS id FROM f2
        |       JOIN e ON e.src = f2.id
        |       WHERE NOT EXISTS (SELECT 1 FROM d2 x
        |         WHERE x.seed = f2.seed AND x.id = e.dst)),
        |d3 AS (SELECT * FROM d2
        |       UNION ALL SELECT seed, id, 3 FROM f3)
        |SELECT CAST(id AS BIGINT) AS id,
        |       CAST(COUNT(*) AS BIGINT) AS n_seeds_reached,
        |       CAST(SUM(dist) AS BIGINT) AS total_dist,
        |       CAST(SUM(CASE WHEN dist > 0 THEN 1000 // dist ELSE 0 END)
        |         AS BIGINT) AS harmonic_milli
        |FROM d3 GROUP BY id
        |""".stripMargin,

    // Two unrolled synchronous LPA rounds; the arg-max is formulated
    // independently (max-count filter then MIN(label)), not via the
    // struct trick the engine uses.
    "graph_lpa" ->
      """WITH e0 AS (
        |  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey
        |   AND l1.l_suppkey < l2.l_suppkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |adj AS (SELECT a AS id, b AS nbr FROM e0
        |        UNION ALL SELECT b, a FROM e0),
        |l0 AS (SELECT DISTINCT id, id AS label FROM adj),
        |c1 AS (SELECT adj.id, l0.label, COUNT(*) AS n
        |       FROM adj JOIN l0 ON l0.id = adj.nbr GROUP BY 1, 2),
        |m1 AS (SELECT id, MAX(n) AS mx FROM c1 GROUP BY 1),
        |l1 AS (SELECT c1.id, MIN(c1.label) AS label
        |       FROM c1 JOIN m1 ON c1.id = m1.id AND c1.n = m1.mx
        |       GROUP BY 1),
        |c2 AS (SELECT adj.id, l1.label, COUNT(*) AS n
        |       FROM adj JOIN l1 ON l1.id = adj.nbr GROUP BY 1, 2),
        |m2 AS (SELECT id, MAX(n) AS mx FROM c2 GROUP BY 1),
        |l2 AS (SELECT c2.id, MIN(c2.label) AS label
        |       FROM c2 JOIN m2 ON c2.id = m2.id AND c2.n = m2.mx
        |       GROUP BY 1)
        |SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label
        |FROM l2
        |""".stripMargin,

    // LPA replay (the graph_lpa CTE) + exact modularity: e_c from
    // same-label canonical edges, d_c from label-joined degrees,
    // Σ(4·m·e_c − d_c²)·10⁶ // 4m².
    "graph_modularity" ->
      """WITH e0 AS (
        |  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey
        |   AND l1.l_suppkey < l2.l_suppkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |adj AS (SELECT a AS id, b AS nbr FROM e0
        |        UNION ALL SELECT b, a FROM e0),
        |l0 AS (SELECT DISTINCT id, id AS label FROM adj),
        |c1 AS (SELECT adj.id, l0.label, COUNT(*) AS n
        |       FROM adj JOIN l0 ON l0.id = adj.nbr GROUP BY 1, 2),
        |m1 AS (SELECT id, MAX(n) AS mx FROM c1 GROUP BY 1),
        |l1 AS (SELECT c1.id, MIN(c1.label) AS label
        |       FROM c1 JOIN m1 ON c1.id = m1.id AND c1.n = m1.mx
        |       GROUP BY 1),
        |c2 AS (SELECT adj.id, l1.label, COUNT(*) AS n
        |       FROM adj JOIN l1 ON l1.id = adj.nbr GROUP BY 1, 2),
        |m2 AS (SELECT id, MAX(n) AS mx FROM c2 GROUP BY 1),
        |lab AS (SELECT c2.id, MIN(c2.label) AS label
        |        FROM c2 JOIN m2 ON c2.id = m2.id AND c2.n = m2.mx
        |        GROUP BY 1),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
        |ec AS (SELECT x.label AS c, CAST(COUNT(*) AS BIGINT) AS e
        |       FROM e0 JOIN lab x ON x.id = e0.a
        |               JOIN lab y ON y.id = e0.b
        |       WHERE x.label = y.label GROUP BY 1),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM adj GROUP BY 1),
        |dc AS (SELECT lab.label AS c, CAST(SUM(d) AS BIGINT) AS dc
        |       FROM deg JOIN lab ON lab.id = deg.id GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(4 * CAST(m AS HUGEINT) * COALESCE(e, 0)
        |               - CAST(dc AS HUGEINT) * dc) AS HUGEINT) AS num,
        |         CAST(COUNT(*) AS BIGINT) AS n_communities,
        |         CAST(MIN(m) AS BIGINT) AS n_edges
        |  FROM dc LEFT JOIN ec USING (c) CROSS JOIN mm)
        |SELECT n_edges, n_communities,
        |  CASE WHEN n_edges > 0 THEN
        |    CAST(num * 1000000 // (4 * CAST(n_edges AS HUGEINT)
        |                           * n_edges) AS BIGINT) END AS q_micro
        |FROM tot
        |""".stripMargin,

    "graph_triangles" ->
      """WITH e AS (
        |  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey
        |   AND l1.l_suppkey < l2.l_suppkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |nodes AS (
        |  SELECT x AS id FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |SELECT CAST(id AS BIGINT) AS id,
        |       CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM nodes GROUP BY 1
        |""".stripMargin,

    // Each event's 4 containing sliding windows derived arithmetically:
    // starts aligned to the 15-min grid, offset k = 0..3 slides back.
    "events_sliding" ->
      """SELECT (epoch_us(ts) // 900000000 - t.k) * 900000000
        |         AS window_start,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS sum_value_cents
        |FROM events CROSS JOIN range(4) AS t(k)
        |GROUP BY 1, 2
        |""".stripMargin,

    "events_bursts" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
        |         CAST(COUNT(*) AS BIGINT) AS nw
        |  FROM w GROUP BY 1)
        |SELECT w.event_type, epoch_us(w.ws) AS window_start,
        |       w.n AS n_events,
        |       CAST(a.total // a.nw AS BIGINT) AS avg_n,
        |       CAST((w.n * 1000) // (a.total // a.nw) AS BIGINT)
        |         AS ratio_permille
        |FROM w JOIN a USING (event_type)
        |WHERE w.n * 1000 >= 1500 * (a.total // a.nw)
        |""".stripMargin,

    "events_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS sum_value_cents
        |FROM events GROUP BY 1, 2
        |""".stripMargin,

    // Per-(window, type) bottom-8 distinct user hashes via a ranked
    // window; the Beyer estimator (k−1)·2⁶⁰ // kth-hash beyond
    // saturation, the exact distinct count under it — digit-for-digit
    // the KmvDistinct convention.
    "window_distinct" -> {
      val h60 = util.hash60Sql("u")
      s"""WITH v AS (
         |  SELECT DISTINCT date_trunc('hour', ts) AS ws, event_type,
         |         CAST(user_id AS VARCHAR) AS u
         |  FROM events),
         |r AS (
         |  SELECT ws, event_type, CAST($h60 AS HUGEINT) AS h,
         |         row_number() OVER (PARTITION BY ws, event_type
         |           ORDER BY $h60) AS rk
         |  FROM v)
         |SELECT epoch_us(ws) AS window_start, event_type,
         |       CAST(CASE WHEN COUNT(*) < 8 THEN COUNT(*)
         |            ELSE CAST(7 AS HUGEINT) * 1152921504606846976
         |                 // MAX(CASE WHEN rk = 8 THEN h END)
         |            END AS BIGINT) AS est_users,
         |       CAST(COUNT(*) AS BIGINT) AS n_exact
         |FROM r GROUP BY 1, 2
         |""".stripMargin
    },

    "window_topk" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS ws, user_id,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT ws, user_id, n,
        |         row_number() OVER (PARTITION BY ws
        |           ORDER BY n DESC, user_id DESC) AS rk
        |  FROM c)
        |SELECT epoch_us(ws) AS window_start,
        |       CAST(rk - 1 AS BIGINT) AS rank, n AS n_events, user_id
        |FROM r WHERE rk <= 3
        |""".stripMargin,

    "retention_cohorts" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS wk
        |  FROM events
        |  WHERE date_part('day', ts) >= user_id % 28),
        |c AS (SELECT u, MIN(wk) AS cohort FROM a GROUP BY u)
        |SELECT epoch_us(c.cohort) AS cohort,
        |       CAST(datediff('day', c.cohort, a.wk) // 7 AS BIGINT)
        |         AS week_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a JOIN c USING (u) GROUP BY 1, 2
        |""".stripMargin,

    "events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                   > 30 * 60 * 1000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |         SUM(new_session) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       epoch_us(MIN(ts)) AS session_start,
        |       epoch_us(MAX(ts)) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM numbered GROUP BY 1, 2
        |""".stripMargin,

    // The honest formulation: inequality join within tolerance +
    // min-|Δ| row_number (before wins ties) — the engine's two as-of
    // passes must reproduce it exactly, including unmatched rows.
    "events_nearest" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |buys AS (
        |  SELECT user_id, ts, CAST(MIN(event_id) AS BIGINT) AS pid
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts, b.ts AS bts, b.pid,
        |         abs(epoch_us(c.ts) - epoch_us(b.ts)) AS ad,
        |         CASE WHEN b.ts <= c.ts THEN 0 ELSE 1 END AS aft,
        |         row_number() OVER (PARTITION BY c.event_id
        |           ORDER BY abs(epoch_us(c.ts) - epoch_us(b.ts)),
        |                    CASE WHEN b.ts <= c.ts THEN 0 ELSE 1 END)
        |           AS rn
        |  FROM clicks c JOIN buys b
        |    ON c.user_id = b.user_id
        |   AND abs(epoch_us(c.ts) - epoch_us(b.ts))
        |       <= CAST(6 AS BIGINT) * 3600 * 1000000),
        |best AS (SELECT * FROM j WHERE rn = 1)
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS t,
        |       epoch_us(b.bts) AS near_t, b.pid AS near_pid,
        |       b.ad AS near_delta_us,
        |       CASE WHEN b.aft = 0 THEN 'before'
        |            WHEN b.aft = 1 THEN 'after' END AS near_direction
        |FROM clicks c LEFT JOIN best b ON c.event_id = b.event_id
        |""".stripMargin,

    // The same four IGNORE-NULLS neighbor windows over the dense grid;
    // // is the truncating division matching Spark's div on negative
    // slopes.
    "gap_fill" ->
      """WITH s0 AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |         CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT * FROM s0 WHERE h % 5 <> 2),
        |b AS (SELECT event_type, MIN(h) AS t0, MAX(h) AS t1
        |      FROM sp GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(t0, t1)) AS h
        |      FROM b),
        |j AS (SELECT g.event_type, g.h, sp.v
        |      FROM g LEFT JOIN sp
        |        ON g.event_type = sp.event_type AND g.h = sp.h),
        |f AS (
        |  SELECT event_type, h, v,
        |    last_value(v IGNORE NULLS) OVER wb AS vp,
        |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER wb AS tp,
        |    first_value(v IGNORE NULLS) OVER wf AS vn,
        |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER wf AS tn
        |  FROM j
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, CAST(h AS BIGINT) AS h,
        |  CAST(CASE WHEN v IS NOT NULL THEN v
        |       WHEN vp IS NULL THEN vn
        |       WHEN vn IS NULL THEN vp
        |       ELSE vp + (vn - vp) * (h - tp) // (tn - tp) END
        |    AS BIGINT) AS value,
        |  CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_observed
        |FROM f
        |""".stripMargin,

    // Same session numbering as events_sessions at a 2-day gap, then
    // per-session lead-grams; ROW() tuple-distinct = Spark's
    // countDistinct(user, seq).
    "frequent_sequences" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                   > CAST(2880 AS BIGINT) * 60 * 1000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_session) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged),
        |g AS (
        |  SELECT user_id, session_seq, event_type,
        |         lead(event_type, 1) OVER w2 AS t1,
        |         lead(event_type, 2) OVER w2 AS t2
        |  FROM numbered
        |  WINDOW w2 AS (PARTITION BY user_id, session_seq
        |                ORDER BY ts, event_id)),
        |f AS (
        |  SELECT user_id, session_seq,
        |         event_type || '>' || t1 || '>' || t2 AS gram
        |  FROM g
        |  WHERE event_type IS NOT NULL AND t1 IS NOT NULL
        |    AND t2 IS NOT NULL)
        |SELECT gram,
        |       CAST(COUNT(DISTINCT ROW(user_id, session_seq)) AS BIGINT)
        |         AS support,
        |       CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM f GROUP BY 1
        |HAVING COUNT(DISTINCT ROW(user_id, session_seq)) >= 5
        |""".stripMargin,

    "seasonal_anomaly" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CASE WHEN user_id % 50 = 7
        |              THEN TIMESTAMP '2024-01-10 10:00:00'
        |              ELSE ts END AS ts
        |  FROM events),
        |cells AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 3600000000) % 168 AS slot,
        |         (epoch_us(ts) // 3600000000) // 168 AS week,
        |         CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM ev GROUP BY 1, 2, 3),
        |s AS (
        |  SELECT *, SUM(obs) OVER w - obs AS rest,
        |         COUNT(*) OVER w AS weeks
        |  FROM cells WINDOW w AS (PARTITION BY event_type, slot))
        |SELECT event_type, CAST(slot AS BIGINT) AS slot,
        |       CAST(week AS BIGINT) AS week, obs,
        |       CAST(rest AS BIGINT) AS rest,
        |       CAST(weeks AS BIGINT) AS weeks,
        |       CAST(obs * (weeks - 1) * 1000 // greatest(rest, 1)
        |         AS BIGINT) AS score_permille
        |FROM s WHERE weeks >= 2 AND obs * (weeks - 1) > rest * 2
        |""".stripMargin,

    // The delta must equal the full rebuild — the oracle IS the full
    // rebuild over every event (same SQL as events_sessions).
    "sessions_delta" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                   > 30 * 60 * 1000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |         SUM(new_session) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       epoch_us(MIN(ts)) AS session_start,
        |       epoch_us(MAX(ts)) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM numbered GROUP BY 1, 2
        |""".stripMargin,

    // The same prefix-max linearization over the derived spans; NULL
    // prefix-max (first row per user) falls to the ELSE → new span.
    "interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |         epoch_us(ts) + (1 + event_id % 3) * 600000000 AS e
        |  FROM events),
        |f AS (
        |  SELECT user_id, s, e,
        |         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |                >= s
        |              THEN 0 ELSE 1 END AS ns
        |  FROM iv),
        |g AS (
        |  SELECT user_id, s, e,
        |         SUM(ns) OVER (PARTITION BY user_id ORDER BY s, e
        |           ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM f)
        |SELECT user_id, CAST(grp AS BIGINT) AS merge_seq,
        |       CAST(MIN(s) AS BIGINT) AS span_start,
        |       CAST(MAX(e) AS BIGINT) AS span_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_intervals
        |FROM g GROUP BY 1, 2
        |""".stripMargin,

    "interval_overlap" ->
      """WITH iv AS (
        |  SELECT event_id AS id, user_id, epoch_us(ts) AS s,
        |         epoch_us(ts) + (1 + event_id % 3) * 600000000 AS e
        |  FROM events)
        |SELECT a.id AS l_id, b.id AS r_id,
        |       CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT)
        |         AS overlap_us
        |FROM iv a JOIN iv b
        |  ON a.user_id = b.user_id AND a.id < b.id
        | AND a.s <= b.e AND b.s <= a.e
        |""".stripMargin,

    // Same lag-delta frame, mode by count-desc-then-smallest-delta
    // (QUALIFY row_number), share via integer //.
    "events_beaconing" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id
        |  FROM events),
        |d AS (
        |  SELECT user_id, event_type, t,
        |         t - lag(t) OVER (PARTITION BY user_id, event_type
        |                          ORDER BY t, event_id) AS dl
        |  FROM e),
        |pk AS (
        |  SELECT user_id, event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         CAST(MAX(t) - MIN(t) AS BIGINT) AS span
        |  FROM d GROUP BY 1, 2),
        |md AS (
        |  SELECT user_id, event_type, dl AS mode_delta,
        |         CAST(COUNT(*) AS BIGINT) AS mode_count
        |  FROM d WHERE dl IS NOT NULL
        |  GROUP BY 1, 2, 3
        |  QUALIFY row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY COUNT(*) DESC, dl ASC) = 1)
        |SELECT pk.user_id, pk.event_type, pk.n_events,
        |  CAST(pk.n_events - 1 AS BIGINT) AS n_intervals,
        |  CAST(md.mode_delta AS BIGINT) AS mode_delta, md.mode_count,
        |  CASE WHEN pk.n_events > 1 THEN
        |    CAST(md.mode_count * 1000 // (pk.n_events - 1) AS BIGINT) END
        |    AS mode_permille,
        |  pk.span
        |FROM pk LEFT JOIN md
        |  ON pk.user_id = md.user_id AND pk.event_type = md.event_type
        |""".stripMargin,

    "event_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev_type,
        |         event_type AS next_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total
        |  FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n,
        |       CAST((c.n * 1000) // t.total AS BIGINT) AS permille
        |FROM c JOIN t USING (prev_type)
        |""".stripMargin,

    // DuckDB's native ASOF JOIN — an independent implementation of the
    // same semantics (inner, >=), not a transliteration of ours.
    "events_asof" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts,
        |         MAX(CAST(round(value * 100, 0) AS BIGINT)) AS purchase_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts,
        |       epoch_us(p.ts) AS purchase_ts, p.purchase_cents
        |FROM c ASOF JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |""".stripMargin,

    "events_asof_forward" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts,
        |         MAX(CAST(round(value * 100, 0) AS BIGINT)) AS purchase_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts,
        |       epoch_us(p.ts) AS purchase_ts, p.purchase_cents
        |FROM c ASOF JOIN p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |""".stripMargin,

    // The plain inequality join the binned implementation must reproduce.
    "events_range_join" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, ts FROM events
        |  WHERE event_type = 'view'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT v.view_id, p.purchase_id,
        |       epoch_us(p.ts) - epoch_us(v.ts) AS delta_us
        |FROM v JOIN p ON v.user_id = p.user_id
        |  AND epoch_us(p.ts) > epoch_us(v.ts)
        |  AND epoch_us(p.ts) - epoch_us(v.ts) <= CAST(86400 AS BIGINT) * 1000000
        |""".stripMargin,

    "skew_profile" ->
      """WITH c AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |       CAST(SUM(n) AS BIGINT) AS n_rows,
        |       CAST(MAX(n) AS BIGINT) AS max_key_rows,
        |       CAST(MIN(n) AS BIGINT) AS min_key_rows,
        |       CAST((MAX(n) * 1000) //
        |            (CAST(SUM(n) AS BIGINT) // COUNT(*))
        |            AS BIGINT) AS max_over_avg_permille
        |FROM c
        |""".stripMargin,

    "salted_distinct" ->
      """SELECT event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events GROUP BY 1
        |""".stripMargin,

    "salted_join" ->
      """WITH p AS (
        |  SELECT user_id,
        |         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS lifetime_cents
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id, p.lifetime_cents
        |FROM events e JOIN p ON e.user_id = p.user_id
        |""".stripMargin,

    "f2_sketch" ->
      """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events
        |           WHERE user_id IS NOT NULL),
        |js AS (SELECT UNNEST(generate_series(0, 7)) AS j),
        |s AS (
        |  SELECT js.j,
        |         CASE WHEN (strpos('0123456789abcdef',
        |             md5(js.j || ':' || v.v)[1]) - 1) % 2 = 0
        |              THEN 1 ELSE -1 END AS s
        |  FROM v CROSS JOIN js),
        |z AS (SELECT j, CAST(SUM(s) AS BIGINT) AS z FROM s GROUP BY 1),
        |x AS (SELECT CAST(SUM(n * n) AS BIGINT) AS exact_f2
        |      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n
        |            FROM events GROUP BY user_id))
        |SELECT CAST(z.j AS BIGINT) AS j, z.z,
        |       CAST(CAST(z.z AS HUGEINT) * z.z AS BIGINT) AS f2_est,
        |       x.exact_f2
        |FROM z, x
        |""".stripMargin,

    "cm_join_size" ->
      """WITH av AS (
        |  SELECT CAST(user_id AS VARCHAR) AS v FROM events
        |  WHERE event_type = 'view'),
        |bv AS (
        |  SELECT CAST(user_id AS VARCHAR) AS v FROM events
        |  WHERE event_type = 'purchase'),
        |rws AS (SELECT UNNEST([0, 1, 2, 3]) AS r),
        |ac AS (
        |  SELECT r,
        |         ((strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[1]) - 1) * 4096 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[2]) - 1) * 256 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[3]) - 1) * 16 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[4]) - 1)) % 512 AS p,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM av CROSS JOIN rws GROUP BY 1, 2),
        |bc AS (
        |  SELECT r,
        |         ((strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[1]) - 1) * 4096 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[2]) - 1) * 256 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[3]) - 1) * 16 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[4]) - 1)) % 512 AS p,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM bv CROSS JOIN rws GROUP BY 1, 2),
        |dots AS (
        |  SELECT ac.r, SUM(CAST(ac.c AS HUGEINT) * bc.c) AS dot
        |  FROM ac JOIN bc ON ac.r = bc.r AND ac.p = bc.p
        |  GROUP BY 1),
        |m AS (SELECT MIN(dot) AS est FROM dots),
        |x AS (
        |  SELECT CAST(COALESCE(SUM(a.na * b.nb), 0) AS BIGINT)
        |           AS exact_join_size
        |  FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS na
        |        FROM events WHERE event_type = 'view' GROUP BY 1) a
        |  JOIN (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nb
        |        FROM events WHERE event_type = 'purchase' GROUP BY 1) b
        |    ON a.user_id = b.user_id)
        |SELECT CAST(dots.r AS BIGINT) AS r,
        |       CAST(dots.dot AS BIGINT) AS dot,
        |       CAST(m.est AS BIGINT) AS est_join_size,
        |       x.exact_join_size
        |FROM dots, m, x
        |""".stripMargin,

    "window_distinct_hll" ->
      """WITH base AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type, user_id
        |  FROM events),
        |ex AS (
        |  SELECT ws, event_type,
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM base GROUP BY 1, 2),
        |v AS (
        |  SELECT DISTINCT ws, event_type,
        |         md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM base),
        |rr AS (
        |  SELECT ws, event_type,
        |         (strpos('0123456789abcdef', h[1]) - 1) * 16 +
        |         (strpos('0123456789abcdef', h[2]) - 1) AS register,
        |         substr(h, 3, 16) AS tail
        |  FROM v),
        |rz AS (
        |  SELECT ws, event_type, register,
        |         length(regexp_extract(tail, '^0*')) AS z, tail
        |  FROM rr),
        |rho AS (
        |  SELECT ws, event_type, register,
        |         CASE WHEN z = 16 THEN 65
        |              ELSE z * 4 +
        |                CASE WHEN strpos('89abcdef', tail[z + 1]) > 0 THEN 0
        |                     WHEN strpos('4567', tail[z + 1]) > 0 THEN 1
        |                     WHEN strpos('23', tail[z + 1]) > 0 THEN 2
        |                     ELSE 3 END + 1 END AS rho
        |  FROM rz),
        |regs AS (
        |  SELECT ws, event_type, register, MAX(rho) AS rho
        |  FROM rho GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT ws, event_type,
        |         CAST(SUM(CASE WHEN rho <= 32
        |                       THEN (CAST(1 AS BIGINT)
        |                             << CAST(32 - rho AS INT))
        |                       ELSE 0 END) AS BIGINT)
        |           + (256 - CAST(COUNT(*) AS BIGINT)) * 4294967296 AS denom,
        |         256 - CAST(COUNT(*) AS BIGINT) AS n_zero
        |  FROM regs GROUP BY 1, 2)
        |SELECT epoch_us(a.ws) AS window_start, a.event_type,
        |       CAST(202099033278251008 // (1000 * denom) AS BIGINT)
        |         AS est_distinct,
        |       CAST(n_zero AS BIGINT) AS n_zero,
        |       ex.n_exact
        |FROM agg a JOIN ex ON ex.ws = a.ws AND ex.event_type = a.event_type
        |""".stripMargin,

    "events_cusum" ->
      """WITH RECURSIVE c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS ws,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(ws) AS lo, max(ws) AS hi FROM c),
        |hrs AS (
        |  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ws
        |  FROM span),
        |dense AS (
        |  SELECT k.event_type, hrs.ws, COALESCE(c.n, 0) AS n
        |  FROM (SELECT DISTINCT event_type FROM c) k
        |  CROSS JOIN hrs
        |  LEFT JOIN c ON c.event_type = k.event_type AND c.ws = hrs.ws),
        |base AS (
        |  SELECT event_type, ws, n,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |                                 ORDER BY ws) AS BIGINT) AS rn,
        |         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
        |           AS total,
        |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
        |           AS h
        |  FROM dense),
        |walk AS (
        |  SELECT event_type, rn, ws,
        |         GREATEST(CAST(0 AS BIGINT), n * h - total) AS s
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.event_type, b.rn, b.ws,
        |         GREATEST(CAST(0 AS BIGINT), w.s + b.n * b.h - b.total)
        |  FROM walk w
        |  JOIN base b ON b.event_type = w.event_type AND b.rn = w.rn + 1),
        |peaks AS (
        |  SELECT event_type, max(s) AS peak_cusum FROM walk GROUP BY 1)
        |SELECT p.event_type,
        |       any_value(b.h) AS n_windows,
        |       any_value(b.total) AS total_events,
        |       p.peak_cusum,
        |       epoch_us(min(w.ws)) AS peak_window
        |FROM peaks p
        |JOIN walk w ON w.event_type = p.event_type AND w.s = p.peak_cusum
        |JOIN base b ON b.event_type = p.event_type AND b.rn = 1
        |GROUP BY 1, 4
        |""".stripMargin,
  )
}
