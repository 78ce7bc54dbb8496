package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics: tumbling-window aggregation and gap-based
  * sessionization. The reference has no windowing (SURVEY.md §2.5) — these
  * are the planned extensions for pipeline telemetry, built so the same
  * logic runs batch (window functions) and streaming (`window()` /
  * `session_window()` in Structured Streaming).
  *
  * Scale: tumbling agg is one shuffle on (window, key) with map-side
  * combine. Sessionization shuffles once on user_id; within-partition
  * sort is Spark's window-exec sort — at 100 TB, partition by user bucket
  * and the sort stays node-local and spillable.
  */
object Events {

  /** Tumbling-window counts/sums per key. `valueCol` sums are computed
    * as integer cents (`round(value·100)` summed as BIGINT) — exact,
    * order-independent, identical in every engine; a double or DECIMAL sum
    * would be neither. Pass `valueCol = None` for count-only frames that
    * have no value column at all. */
  def tumblingAgg(events: DataFrame, ts: Column, keyCol: Column,
      windowDuration: String = "1 hour",
      valueCol: Option[Column] = Some(col("value"))): DataFrame = {
    val aggs = count(lit(1)).as("n_events") +: valueCol.toSeq.map(v =>
      sum(round(v * 100, 0).cast("long")).cast("long")
        .as("sum_value_cents"))
    events
      .groupBy(window(ts, windowDuration).as("w"), keyCol.as("key"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("window_start") +: col("key") +:
        col("n_events") +: valueCol.toSeq.map(_ =>
          col("sum_value_cents")): _*)
  }

  /** Sliding-window counts/sums per key — the rolling-rate view of the
    * stream ([[tumblingAgg]] with overlap): each event lands in
    * `windowDuration / slideDuration` windows, so a 1 h window sliding
    * by 15 min yields the hourly rate refreshed every quarter hour — the
    * shape rate-limit and trend monitors want.
    *
    * Exactness contract as [[tumblingAgg]] (integer-cents sums). Scale
    * shape: Spark plans the multi-window assignment as an Expand (a
    * constant ×(win/slide) row multiplication BEFORE the shuffle, fused
    * into codegen) followed by ONE map-side-combined aggregation on
    * (window, key) — no self-joins, no window functions; the same query
    * runs under Structured Streaming with a watermark
    * ([[graft.streaming.StreamingAnalytics.slidingCounts]]). */
  def slidingAgg(events: DataFrame, ts: Column, keyCol: Column,
      windowDuration: String = "1 hour",
      slideDuration: String = "15 minutes",
      valueCol: Option[Column] = Some(col("value"))): DataFrame = {
    val aggs = count(lit(1)).as("n_events") +: valueCol.toSeq.map(v =>
      sum(round(v * 100, 0).cast("long")).cast("long")
        .as("sum_value_cents"))
    events
      .groupBy(window(ts, windowDuration, slideDuration).as("w"),
        keyCol.as("key"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("window_start") +: col("key") +:
        col("n_events") +: valueCol.toSeq.map(_ =>
          col("sum_value_cents")): _*)
  }

  /** Burst windows — per-key rate anomalies in exact integers: tumbling
    * windows whose event count reaches `thresholdPermille`/1000 of the
    * key's average count per ACTIVE window (windows with zero events for
    * the key don't exist in the aggregate and therefore don't dilute the
    * average — the stance that makes the statistic computable in one
    * pass over the aggregated windows, documented rather than hidden).
    *
    * All arithmetic is integer (`div`), so the flag is engine-exact —
    * no float mean/stddev to drift. Output: `(key, window_start,
    * n_events, avg_n, ratio_permille)` for flagged windows only.
    *
    * Scale shape: one tumbling aggregation (one shuffle), then a
    * key-count-sized per-key baseline BROADCAST back onto the windows —
    * the second pass is map-side only. At 100 TB the baseline table is
    * |keys| rows, broadcastable by construction for any real key
    * cardinality; if keys outgrow a broadcast, drop the hint and the
    * same plan shuffles on key. */
  def burstWindows(events: DataFrame, ts: Column, keyCol: Column,
      windowDuration: String = "1 hour",
      thresholdPermille: Long = 1500L): DataFrame = {
    require(thresholdPermille >= 1,
      s"thresholdPermille must be >= 1, got $thresholdPermille")
    val w = tumblingAgg(events, ts, keyCol, windowDuration, valueCol = None)
    val base = w.groupBy(col("key"))
      .agg(sum(col("n_events")).as("total"),
        count(lit(1)).as("n_windows"))
    w.join(broadcast(base), "key")
      .withColumn("avg_n", expr("total div n_windows"))
      .filter(col("n_events") * 1000 >= lit(thresholdPermille) * col("avg_n"))
      .select(col("key"), col("window_start"), col("n_events"),
        col("avg_n"), expr("(n_events * 1000) div avg_n").as("ratio_permille"))
  }

  /** As-of join: each left row picks up the LATEST right row with
    * `right.time <= left.time` on the same key (the "most recent quote
    * for this trade" / "last purchase before this click" join). Spark has
    * no native ASOF JOIN; the naive formulation is an inequality join
    * (nested-loop at scale). This is the distributed-standard union trick
    * instead: tag both sides, ONE shuffle on the key, one within-partition
    * sort on (time, side), and a running `last(_, ignoreNulls)` window
    * carries the most recent right payload forward into the left rows —
    * linear in rows, no pairwise product anywhere, spillable sort.
    *
    * Right rows must be unique per (key, time) — the same precondition
    * that makes any engine's ASOF deterministic; pre-aggregate duplicates.
    * Ties (`left.time == right.time`) match, i.e. `>=` semantics, like
    * DuckDB's `ASOF JOIN ... ON l.t >= r.t`. Unmatched left rows keep a
    * NULL payload (left-join shape); filter the payload's time column for
    * inner-ASOF.
    *
    * Output: every left column, plus `<prefix><rightTimeCol>` and
    * `<prefix><c>` for each requested right value column. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      rightValueCols: Seq[String], prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCol, leftTimeCol, rightTimeCol,
      rightValueCols, prefix, forward = false)

  /** FORWARD as-of join: each left row picks up the EARLIEST right row
    * with `right.time >= left.time` on the same key — "the next deploy
    * after this alert" / "the next scheduled crawl at-or-after this
    * change". The mirror of [[asofJoin]] (same union trick, same one
    * shuffle + one sort), with the running aggregate looking FORWARD:
    * `first(_, ignoreNulls)` over `[current row, unbounded following]`,
    * the left side sorting BEFORE the right at equal times so an
    * exactly-simultaneous right row matches (`<=` semantics, DuckDB's
    * `ASOF JOIN ... ON l.t <= r.t`). Same preconditions and left-join
    * shape as the backward form. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      rightValueCols: Seq[String], prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCol, leftTimeCol, rightTimeCol,
      rightValueCols, prefix, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      rightValueCols: Seq[String], prefix: String,
      forward: Boolean): DataFrame = {
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rvExpr = struct((rightTimeCol +: rightValueCols).map(col): _*)
    val rvType = right.select(rvExpr.as("_rv")).schema.head.dataType
    // the side that must be VISIBLE to the other at equal times sorts
    // toward the frame: backward = right before left (a right row at
    // exactly left.time is inside [preceding, current]), forward = left
    // before right (the simultaneous right row is inside
    // [current, following]) — >= / <= tie semantics respectively
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    // equi-join semantics: a NULL key matches nothing (without the
    // filters, the window would co-partition NULL-keyed rows and match
    // them to each other — which no ASOF join does); NULL-keyed left
    // rows still flow through unmatched
    val l2 = left.select(col(keyCol).as("_k"), col(leftTimeCol).as("_t"),
      lit(lSide).as("_side"), struct(left.columns.toIndexedSeq.map(col): _*).as("_l"),
      lit(null).cast(rvType).as("_rv"))
    // a NULL-TIME right row can never satisfy either inequality (SQL
    // comparison semantics), but NULLS-FIRST ordering would park it
    // where the backward frame hands it to every left row — drop it
    val r2 = right.filter(col(keyCol).isNotNull &&
        col(rightTimeCol).isNotNull)
      .select(col(keyCol).as("_k"), col(rightTimeCol).as("_t"),
        lit(rSide).as("_side"), lit(null).cast(lType).as("_l"), rvExpr.as("_rv"))
    val w0 = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
    val w =
      if (forward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      if (forward) first(col("_rv"), ignoreNulls = true)
      else last(col("_rv"), ignoreNulls = true)
    // NULL-TIME left rows match nothing either (they'd sort to the head
    // of the key, where the FORWARD frame sees every right row) — they
    // flow through with a NULL payload, the unmatched left-join shape
    val matched = l2.unionByName(r2)
      .withColumn("_m", when(col("_t").isNull, lit(null).cast(rvType))
        .otherwise(carried.over(w)))
      .filter(col("_side") === lSide)
    val outCols = left.columns.toSeq.map(c => col(s"_l.$c").as(c)) ++
      (rightTimeCol +: rightValueCols).map(c => col(s"_m.$c").as(s"$prefix$c"))
    matched.select(outCols: _*)
  }

  /** NEAREST-event join: each left row picks the right row with the
    * smallest |Δt| on the same key within `toleranceUs`, from EITHER
    * direction — "the sensor reading closest to this alert", where the
    * backward/forward as-of forms answer only "the latest before" /
    * "earliest after". Ties (equal distance both sides) prefer the
    * earlier (backward) row — a total rule, deterministic.
    *
    * Composition of the two [[asofJoin]] passes (same union trick, so
    * still NO inequality join anywhere): two key-shuffles + sorts
    * total, linear, spillable — the price of symmetry is exactly one
    * extra as-of pass. Same preconditions (right unique per (key,
    * time)); unmatched left rows keep null payloads. Output: every
    * left column + `<prefix><rightTimeCol>`, `<prefix><c>` per value
    * column, `<prefix>delta_us`, `<prefix>direction`
    * ('before'/'after'/null). */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      rightValueCols: Seq[String], toleranceUs: Long,
      prefix: String = "near_"): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs >= 0, got $toleranceUs")
    def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))
    val b = asofJoin(left, right, keyCol, leftTimeCol, rightTimeCol,
      rightValueCols, "_nb_")
    val bf = asofJoinForward(b, right, keyCol, leftTimeCol, rightTimeCol,
      rightValueCols, "_nf_")
    val db = us(col(leftTimeCol)) - us(col(s"_nb_$rightTimeCol"))
    val df = us(col(s"_nf_$rightTimeCol")) - us(col(leftTimeCol))
    val candB = col(s"_nb_$rightTimeCol").isNotNull && db <= toleranceUs
    val candF = col(s"_nf_$rightTimeCol").isNotNull && df <= toleranceUs
    def side(tag: String, delta: Column, dir: String) = struct(
      (rightTimeCol +: rightValueCols)
        .map(c => col(s"_$tag$c").as(c)) :+
        delta.as("delta_us") :+ lit(dir).as("direction"): _*)
    val winner = when(candB && (!coalesce(candF, lit(false)) || db <= df),
        side("nb_", db, "before"))
      .when(coalesce(candF, lit(false)), side("nf_", df, "after"))
    val outCols = left.columns.toSeq.map(col) ++
      ((rightTimeCol +: rightValueCols) ++ Seq("delta_us", "direction"))
        .map(c => col(s"_w.$c").as(s"$prefix$c"))
    bf.withColumn("_w", winner).select(outCols: _*)
  }

  /** Range (interval) join: all (left, right) pairs on the same key with
    * `0 < right.time - left.time <= windowUs` (e.g. "purchases within 24h
    * after a view"). A direct inequality join degenerates to a per-key
    * cartesian; this bins both sides by `windowUs` and equi-joins on
    * (key, bin) — the left side probes its own bin and the next one (a
    * right row in range lands in exactly one of the two), so the product
    * is bounded by pairs-per-2-bins, not pairs-per-key. One shuffle per
    * side, no distinct needed: each qualifying pair matches exactly one
    * bin pair. Output columns are the caller-projected `leftOut` /
    * `rightOut` (pre-rename collisions away) plus `delta_us`. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, windowUs: Long,
      leftOut: Seq[String], rightOut: Seq[String]): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val lt = unix_micros(col(leftTimeCol).cast("timestamp_ltz"))
    val rt = unix_micros(col(rightTimeCol).cast("timestamp_ltz"))
    val l2 = left.select((leftOut.map(col) :+ col(keyCol).as("_k") :+
        lt.as("_lt")): _*)
      .withColumn("_bin", explode(array(expr(s"_lt div $windowUs"),
        expr(s"_lt div $windowUs") + 1)))
    val r2 = right.select((rightOut.map(col) :+ col(keyCol).as("_rk") :+
        rt.as("_rt")): _*)
      .withColumn("_rbin", expr(s"_rt div $windowUs"))
    l2.join(r2, col("_k") === col("_rk") && col("_bin") === col("_rbin") &&
        col("_rt") > col("_lt") && col("_rt") - col("_lt") <= windowUs)
      .select((leftOut ++ rightOut).map(col) :+
        (col("_rt") - col("_lt")).as("delta_us"): _*)
  }

  /** Interval-overlap join: all (left, right) pairs on the same key
    * whose CLOSED intervals intersect (`l.s ≤ r.e && r.s ≤ l.e`) — the
    * temporal/genomic overlap classic ("which sessions overlapped this
    * incident window", concurrent-span detection). [[rangeJoin]]'s
    * point-in-window sibling for two interval SETS; the naive
    * inequality join is a per-key cartesian.
    *
    * Binned equi-join with EXACTLY-ONCE pair accounting: each interval
    * replicates to every `binUs`-wide bin it touches, candidates join
    * on (key, bin), and a pair is accepted only in the single bin
    * containing `max(l.s, r.s)` — the overlap's later start lies in
    * both intervals, so exactly one accepted bin exists per overlapping
    * pair and no DISTINCT pass is needed. Fan-out per interval is
    * `len/binUs + 1` replicas: choose `binUs` at or above the typical
    * interval length (p99), and the join cost is pairs-per-bin bounded,
    * never pairs-per-key. Rows with `end < start` are dropped (no
    * extent to overlap). Output: `leftOut ++ rightOut` (pre-rename
    * collisions away) + `overlap_us ≥ 0` (0 = touching endpoints). */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lsCol: String, leCol: String, rsCol: String, reCol: String,
      binUs: Long, leftOut: Seq[String], rightOut: Seq[String]): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    val l = left.filter(col(leCol) >= col(lsCol))
      .select(leftOut.map(col) :+ col(keyCol).as("_k") :+
        col(lsCol).as("_ls") :+ col(leCol).as("_le"): _*)
      .withColumn("_bin", explode(sequence(
        expr(s"_ls div $binUs"), expr(s"_le div $binUs"))))
    val r = right.filter(col(reCol) >= col(rsCol))
      .select(rightOut.map(col) :+ col(keyCol).as("_rk") :+
        col(rsCol).as("_rs") :+ col(reCol).as("_re"): _*)
      .withColumn("_rbin", explode(sequence(
        expr(s"_rs div $binUs"), expr(s"_re div $binUs"))))
    l.join(r, col("_k") === col("_rk") && col("_bin") === col("_rbin") &&
        col("_ls") <= col("_re") && col("_rs") <= col("_le") &&
        col("_bin") === expr(s"greatest(_ls, _rs) div $binUs"))
      .select((leftOut ++ rightOut).map(col) :+
        (least(col("_le"), col("_re")) -
          greatest(col("_ls"), col("_rs"))).as("overlap_us"): _*)
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Returns one row
    * per session with start/end/size. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int = 30): DataFrame =
    sessionTagged(events, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Every input event with its `session_seq` attached — the per-event
    * half of [[sessionize]] (ONE gap/cumsum definition so session
    * boundaries cannot drift between the aggregate and per-event
    * consumers like [[frequentSequences]]). */
  def sessionTagged(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int = 30): DataFrame = {
    val order = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(order))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol).cast("timestamp_ltz")) -
            unix_micros(col("prev_ts").cast("timestamp_ltz")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Frequent contiguous event-type sequences within sessions — the
    * sequential-pattern miner (PrefixSpan's contiguous special case,
    * which is what click-path / funnel-discovery analyses actually
    * read): every k-gram of consecutive event types inside one session,
    * with SUPPORT = number of distinct sessions containing the gram
    * (the standard sequential-pattern support — a loop emitting one
    * gram 1000× in one session is one supporting session, not 1000)
    * plus the raw occurrence count.
    *
    * Scale shape: session tagging is [[sessionize]]'s one shuffle on
    * the user key; the k−1 `lead`s run under a (user, session) window
    * that the user-hash partitioning already satisfies (no second
    * event-sized exchange); the distinct-and-count pair shuffles
    * gram-sized data. `minSupport` prunes the tail before output. */
  def frequentSequences(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, k: Int = 3, minSupport: Long = 2,
      gapMinutes: Int = 30): DataFrame = {
    require(k >= 2 && k <= 8, s"k in [2, 8], got $k")
    require(minSupport >= 1, s"minSupport >= 1, got $minSupport")
    val tagged = sessionTagged(events, userCol, tsCol, idCol, gapMinutes)
    val w = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(col(tsCol), col(idCol))
    val parts = col(typeCol) +:
      (1 until k).map(i => lead(col(typeCol), i).over(w))
    // session tails (missing leads) and null types drop — a gram is k
    // REAL consecutive types, never a null-skipping shorter concat
    val full = tagged.withColumn("_arr", array(parts: _*))
      .filter(!exists(col("_arr"), _.isNull))
      .withColumn("gram", array_join(col("_arr"), ">"))
    full.groupBy(col("gram"))
      .agg(countDistinct(col(userCol), col("session_seq")).as("support"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("support") >= minSupport)
  }

  /** Incremental sessionization: fold an append-only event batch into a
    * persisted [[sessionize]] output WITHOUT rescanning raw history.
    *
    * The only stored session a strictly-later batch can change is each
    * touched user's LAST one (extend it, or leave it and open new
    * sessions after it) — earlier sessions are closed by events the
    * batch cannot precede. So the merge is: seed the batch's gap flags
    * with the last stored `session_end` per user, group the batch into
    * sessions, fuse group 0 (gap ≤ threshold to the stored end) with the
    * stored last session, and renumber the rest from the stored
    * `session_seq`. Gate-proven ≡ a full [[sessionize]] rebuild.
    *
    * Contract: the batch is append-only PER USER — every batch event is
    * strictly later than that user's last stored event. Violations are
    * refused (one batch-sized validation aggregate; out-of-order arrivals
    * could split closed sessions, which needs the raw events back).
    *
    * Scale shape: cost is O(batch) + one row per touched user from the
    * store (semi-join, then a per-user max — never session history), and
    * untouched sessions pass through behind a batch-keyed anti-join.
    * The full rebuild re-windows every event ever seen; at 100 TB the
    * delta is the only affordable path, and this one is exact. */
  def sessionizeDelta(oldSessions: DataFrame, newEvents: DataFrame,
      userCol: String, tsCol: String, idCol: String,
      gapMinutes: Int = 30): DataFrame = {
    def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))
    val gapUs = gapMinutes * 60L * 1000000L

    // The last stored session of each user the batch touches.
    val last = oldSessions
      .join(newEvents.select(col(userCol)).distinct(), Seq(userCol),
        "left_semi")
      .groupBy(col(userCol))
      .agg(max(struct(col("session_seq"), col("session_start"),
        col("session_end"), col("n_events"))).as("_l"))
      .select(col(userCol), col("_l.session_seq").as("_lseq"),
        col("_l.session_start").as("_lstart"),
        col("_l.session_end").as("_lend"), col("_l.n_events").as("_ln"))

    // Refuse non-append-only batches (batch-sized aggregate, store never
    // scanned beyond `last`).
    val violations = newEvents.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("_min_ts"))
      .join(last, Seq(userCol))
      .filter(us(col("_min_ts")) <= us(col("_lend")))
      .limit(1).count()
    require(violations == 0L,
      "sessionizeDelta requires an append-only batch: some batch event " +
        "is not strictly later than its user's last stored session_end")

    // Gap-sessionize the batch, seeding each user's first gap with the
    // stored session_end; group 0 = "continues the stored last session".
    val order = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val flagged = newEvents
      .select(col(userCol), col(tsCol), col(idCol))
      .join(last, Seq(userCol), "left")
      .withColumn("_prev",
        coalesce(lag(col(tsCol), 1).over(order), col("_lend")))
      .withColumn("_open",
        when(col("_prev").isNull ||
          us(col(tsCol)) - us(col("_prev")) > gapUs, 1L).otherwise(0L))
      .withColumn("_seq", sum(col("_open")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val newSess = flagged.groupBy(col(userCol), col("_seq"))
      .agg(min(col(tsCol)).as("_ns_start"), max(col(tsCol)).as("_ns_end"),
        count(lit(1)).as("_ns_n"),
        // constant per user — first() is deterministic here
        first(col("_lseq")).as("_lseq"), first(col("_lstart")).as("_lstart"),
        first(col("_ln")).as("_ln"))

    val fused = newSess.filter(col("_seq") === 0L)
      .select(col(userCol), col("_lseq").as("session_seq"),
        col("_lstart").as("session_start"), col("_ns_end").as("session_end"),
        (col("_ln") + col("_ns_n")).as("n_events"))
    val fresh = newSess.filter(col("_seq") > 0L)
      .select(col(userCol),
        (coalesce(col("_lseq"), lit(0L)) + col("_seq")).as("session_seq"),
        col("_ns_start").as("session_start"), col("_ns_end").as("session_end"),
        col("_ns_n").as("n_events"))
    val kept = oldSessions
      .select(col(userCol), col("session_seq"), col("session_start"),
        col("session_end"), col("n_events"))
      .join(fused.select(col(userCol), col("session_seq")),
        Seq(userCol, "session_seq"), "left_anti")
    kept.unionByName(fused).unionByName(fresh)
  }

  /** Ordered funnel analysis: per user, the earliest completion time of
    * each stage GIVEN every previous stage completed at or before it —
    * `t_i = min(ts of stage_i events with ts ≥ t_{i−1})`. A later-stage
    * event before the funnel entered that stage does not count (the
    * standard product-analytics funnel semantics); simultaneous
    * timestamps count (≥, not >). Output: one row per user with
    * `t_0..t_{k−1}` (null where the funnel stalled) and
    * `stages_completed`.
    *
    * Scale shape: ONE shuffle on the user key; the per-stage minima are
    * k whole-partition window aggregates stacked over the same
    * partitioning (no re-exchange between stages), then a per-user
    * dedup. No self-joins — the naive formulation joins the event table
    * to itself once per stage. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct, got $stages")
    val w = Window.partitionBy(col(userCol))
    var cur = events.select(col(userCol), col(tsCol).as("_ts"),
      col(typeCol).as("_et"))
    stages.zipWithIndex.foreach { case (s, i) =>
      val gate =
        if (i == 0) lit(true) else col(s"t${i - 1}").isNotNull &&
          col("_ts") >= col(s"t${i - 1}")
      cur = cur.withColumn(s"t$i",
        min(when(col("_et") === s && gate, col("_ts"))).over(w))
    }
    val completed = stages.indices
      .map(i => col(s"t$i").isNotNull.cast("long"))
      .reduceLeft(_ + _)
    // the window columns are constant per user — min() just deduplicates
    val perStage = stages.indices.map(i => min(col(s"t$i")).as(s"t$i"))
    cur.groupBy(col(userCol))
      .agg(perStage.head, perStage.tail: _*)
      .withColumn("stages_completed", completed)
  }

  /** Funnel CONVERSION metrics — the aggregate [[funnel]]'s per-user
    * table exists to feed: one row per stage with
    *  - `entered`: users who had completed the previous stage (stage 0:
    *    every user),
    *  - `converted`: users who completed this stage,
    *  - `conv_per_mille`: exact integer `converted·1000 div entered`
    *    (−1 when nobody entered — no float rates, no divide-by-zero),
    *  - `median_from_prev_cents`: median time from the previous stage's
    *    completion, interpolated percentile over exact integer
    *    microseconds, emitted ×100 as integer cents (the
    *    `length_quantiles` exactness pattern: an interpolated median of
    *    integers is a multiple of 0.5, so ×100 is exact in a double);
    *    −1 for stage 0 (no previous stage) and for stages nobody reached.
    *
    * Cost: [[funnel]]'s one user-key shuffle + ONE single-row aggregation
    * over the per-user table (3k conditional aggregates); the per-stage
    * rows are exploded from that single row — nothing extra shuffles. */
  def funnelRates(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val f = funnel(events, userCol, tsCol, typeCol, stages)
    def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))
    val aggs: Seq[Column] = stages.indices.flatMap { i =>
      // coalesce: sum() over ZERO users is NULL, but the contract is
      // exact integers with -1 sentinels — an empty event stream must
      // yield entered=converted=0, rate -1, like the oracle's COUNT
      val entered =
        if (i == 0) count(lit(1))
        else coalesce(sum(col(s"t${i - 1}").isNotNull.cast("long")), lit(0L))
      val medianDelta =
        if (i == 0) lit(null).cast("long")
        else round(percentile(us(col(s"t$i")) - us(col(s"t${i - 1}")),
          lit(0.5)) * 100).cast("long")
      Seq(entered.as(s"entered_$i"),
        coalesce(sum(col(s"t$i").isNotNull.cast("long")), lit(0L))
          .as(s"converted_$i"),
        medianDelta.as(s"med_$i"))
    }
    val one = f.agg(aggs.head, aggs.tail: _*)
    val rows = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(s).as("stage"),
        col(s"entered_$i").as("entered"),
        col(s"converted_$i").as("converted"),
        when(col(s"entered_$i") === 0L, lit(-1L))
          .otherwise(expr(s"converted_$i * 1000 div entered_$i"))
          .as("conv_per_mille"),
        coalesce(col(s"med_$i"), lit(-1L)).as("median_from_prev_cents"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Interval coalescing — the union of overlapping-or-touching
    * `[start, end]` intervals per key, the classic "active periods"
    * reduction (merge per-event validity spans into coverage windows;
    * the span-union primitive behind crawl-coverage, uptime and
    * rate-limit accounting). Distinct from [[sessionize]]: gaps are
    * defined by the intervals' own extents, not a fixed idle timeout,
    * so a long interval bridges events a gap rule would split.
    *
    * Semantics: intervals are `(startCol, endCol)` integer pairs (unix
    * micros by convention); two intervals merge when the later one's
    * start is ≤ the running max end of everything before it (touching
    * endpoints merge). Output: one row per merged span — `(key,
    * merge_seq, span_start, span_end, n_intervals)`, `merge_seq`
    * 1-based in span order. Intervals are taken as given (an
    * `end < start` row behaves as a point at `start`; the oracle
    * mirrors it because the prefix-max formula is the semantics).
    *
    * Scale shape: the naive formulation is a transitive-closure
    * self-join (quadratic per key, unbounded chase for chains); this is
    * the textbook prefix-max linearization instead — ONE shuffle on the
    * key, one within-partition spillable sort, two stacked window
    * passes over the SAME partitioning (no re-exchange: running max-end
    * excluding the current row flags span starts, a running sum numbers
    * the spans), then a map-side-combinable aggregation. Linear in
    * rows at any key width; determinism: equal `(start, end)` ties
    * leave both window flags unchanged under any tie order. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("_new_span",
        when(prevMaxEnd.isNotNull && prevMaxEnd >= col(startCol), 0L)
          .otherwise(1L))
      .withColumn("_span", sum(col("_new_span")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_span").as("merge_seq"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** First-order transition counts — the Markov view of the event
    * stream (what follows what, per user): for every consecutive pair
    * of events of the same user, count `(prev_type, next_type)` and
    * rate it against everything leaving `prev_type` as an exact integer
    * permille (`n·1000 div total_from_prev` — no float probabilities to
    * drift). The behavioral-sequence statistic behind next-action
    * models, anomaly rules ("purchase never follows logout") and
    * session-flow dashboards.
    *
    * Per-user order is `(tsCol, idCol)` — the same total order
    * [[sessionize]] uses, so ties are deterministic. A user's first
    * event has no predecessor and contributes no pair (standard bigram
    * convention, mirrored by the oracle).
    *
    * Scale shape: ONE shuffle on the user key + a spillable
    * within-partition sort for the lag, then a map-side-combined
    * (prev, next) count; the per-prev totals are a WINDOW SUM over the
    * counted pairs (|types|² rows, not events) — nothing re-touches the
    * event-sized data, and there is exactly one event-sized Window in
    * the physical plan (PlanSpec-pinned; the previous aggregate-and-
    * join-back formulation re-executed the whole lag pipeline for the
    * totals branch — two scans and two sorts of the events at scale). */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val order = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_prev", lag(col(typeCol), 1).over(order))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("_total",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000 div _total").as("permille"))
  }

  /** Retention cohort matrix — the product-analytics staple: users
    * bucketed by their FIRST active week (the cohort), counted in every
    * later week they return — `(cohort, week_offset, n_users)`, the
    * table retention curves and cohort heatmaps read straight off.
    * Weeks are Monday-truncated calendar weeks (`date_trunc('week')`,
    * identical in Spark and DuckDB), so offsets are exact integer
    * `days div 7`.
    *
    * Scale shape: the FIRST step dedups activity to distinct
    * (user, week) — everything after runs on ≤ |users|·|weeks| rows,
    * never event-sized data: one min-aggregation for cohorts
    * (map-side combined), one equi-join back, one final count. Within
    * a (cohort, offset) cell each user appears once by construction,
    * so the count IS the distinct-user count — no countDistinct
    * shuffle. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val active = events
      .select(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
    val cohorts = active.groupBy(col("u")).agg(min(col("wk")).as("cohort"))
    active.join(cohorts, "u")
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Recency-weighted counts per key — the freshness signal behind
    * crawl re-visit scheduling and recency-weighted corpus mixing: an
    * event `h` half-lives older than `asOf` contributes weight
    * 2^(maxShift − h) (clamped to [0, maxShift] half-lives), so the
    * newest events dominate and weights halve every `halfLifeDays`.
    *
    * Exact integers end to end (the repo's determinism convention):
    * age in whole half-lives by floor division on unix micros, weight
    * by a codegen'd long bit-shift — no libm `exp`, so the result is
    * bit-identical on any engine. Everything at or beyond `maxShift`
    * half-lives contributes weight 1 — old evidence never vanishes,
    * it just stops mattering (2^30 : 1 at the defaults).
    *
    * Shape: narrow per-row weight, then ONE map-side-combined
    * aggregation — the same single-shuffle profile as a plain count,
    * whatever the corpus size. */
  /** One-sided CUSUM changepoint scan (Page 1954) over per-key hourly
    * event counts — the drift detector that catches a SUSTAINED rate
    * shift a per-window burst ratio ([[burstWindows]]) misses: the
    * statistic `S_t = max(0, S_{t-1} + (x_t − mean))` accumulates small
    * consecutive excesses, so ten hours at +20% trips it while no single
    * hour would trip a burst threshold.
    *
    * Exact-integer formulation: deviations are scaled by the window
    * count H (`dev_t = x_t·H − total`, i.e. (x_t − mean)·H with the mean
    * as a rational kept in numerator form), so `peak_cusum` is in units
    * of events·H — comparable across keys of one run, reproducible on
    * any engine, no floats. Windows with zero events are DENSIFIED in
    * (an absent hour is evidence the rate fell — dropping it would bias
    * S upward), over the corpus-wide [min, max] hour span so every key
    * sees the same H. Output per key: `n_windows`, `total_events`,
    * `peak_cusum` with the FIRST window start that attains it
    * (`peak_window`, unix micros) — the changepoint location estimate.
    *
    * Shape: one shuffle for the hourly counts (map-side combined), a
    * broadcast of the tiny global hour span, then ONE more shuffle of
    * H-length (key, hour, n) rows into a per-key sorted-array fold —
    * the [[graft.operators.Curation.repetitionColumns]] sorted-run HOF
    * idiom: the recursive max(0, ·) is order-dependent, which no window
    * function expresses, but per-key state is bounded (hours in a
    * retention span, not events), so the collect_list is small by
    * construction — and that bound is ENFORCED: the call fails fast
    * (require) when the densified span would exceed `maxWindows`
    * windows per key (default 200 000 ≈ 22 years of hours / 138 days
    * of minutes), instead of silently building multi-megabyte per-key
    * rows on an unbounded input. */
  def cusumPeaks(events: DataFrame, tsCol: String, keyCol: String,
      unit: String = "hour", maxWindows: Long = 200000L): DataFrame = {
    require(Set("minute", "hour", "day")(unit),
      s"unit must be minute/hour/day, got $unit")
    require(maxWindows >= 1, s"maxWindows must be >= 1, got $maxWindows")
    def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))
    val w = date_trunc(unit, col(tsCol))
    val counts = events
      .select(col(keyCol).as("key"), w.as("ws"))
      .groupBy(col("key"), col("ws"))
      .agg(count(lit(1)).as("n"))
    // The "bounded by construction" claim is ENFORCED, not assumed: the
    // per-key collect_list below holds H structs per key, fine for a
    // retention-bounded span but catastrophic for, say, ten years at
    // minute granularity (5.3 M structs in one row). The span is tiny
    // (one min/max row), so the guard collects it up front and the
    // densification sequence is built from the collected literals —
    // same plan shape, one fewer in-plan aggregation.
    val spanRow = counts
      .agg(min(us(col("ws"))).as("lo"), max(us(col("ws"))).as("hi")).head()
    if (spanRow.isNullAt(0)) {
      // no events at all: zero keys, zero rows — preserve the schema
      return counts.groupBy(col("key"))
        .agg(count(lit(1)).as("n_windows"),
          sum(col("n")).cast("long").as("total_events"))
        .select(col("key").as(keyCol), col("n_windows"),
          col("total_events"), lit(0L).as("peak_cusum"),
          lit(0L).as("peak_window"))
    }
    val (loUs, hiUs) = (spanRow.getLong(0), spanRow.getLong(1))
    val unitMicros = unit match {
      case "minute" => 60000000L
      case "hour"   => 3600000000L
      case _        => 86400000000L
    }
    val nWindows = (hiUs - loUs) / unitMicros + 1L
    require(nWindows <= maxWindows,
      s"cusumPeaks would densify $nWindows $unit windows per key (span " +
        s"${java.time.Instant.ofEpochMilli(loUs / 1000)} .. " +
        s"${java.time.Instant.ofEpochMilli(hiUs / 1000)}), above " +
        s"maxWindows=$maxWindows — bound the input to a retention span " +
        "or raise maxWindows explicitly")
    val hours = events.sparkSession.range(1)
      .select(explode(expr(
        s"sequence(timestamp_micros(${loUs}L), timestamp_micros(${hiUs}L), " +
          s"interval 1 $unit)")).as("ws"))
    val dense = counts.select(col("key")).distinct()
      .crossJoin(broadcast(hours))
      .join(counts, Seq("key", "ws"), "left")
      .select(col("key"), us(col("ws")).as("wsu"),
        coalesce(col("n"), lit(0L)).as("n"))
    dense.groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("wsu"), col("n")))).as("seq"),
        count(lit(1)).as("n_windows"),
        sum(col("n")).cast("long").as("total_events"))
      .withColumn("walk", expr(
        // first-attainment peak: strict > keeps the earliest window at
        // which the running maximum is reached
        """aggregate(seq,
          |  named_struct('s', 0L, 'peak', -1L, 'pw', -1L),
          |  (a, x) -> named_struct(
          |    's', greatest(0L, a.s + x.n * n_windows - total_events),
          |    'peak', if(greatest(0L, a.s + x.n * n_windows - total_events)
          |                 > a.peak,
          |               greatest(0L, a.s + x.n * n_windows - total_events),
          |               a.peak),
          |    'pw', if(greatest(0L, a.s + x.n * n_windows - total_events)
          |               > a.peak,
          |             x.wsu, a.pw)))""".stripMargin))
      .select(col("key").as(keyCol), col("n_windows"),
        col("total_events"), col("walk.peak").as("peak_cusum"),
        col("walk.pw").as("peak_window"))
  }

  /** Integer gap-filling of a sparse per-key series — the step between
    * raw telemetry and anything windowed/seasonal that assumes a dense
    * grid (a missing hour reads as "no data", not zero, and a
    * season-blind fill poisons every downstream baseline): for each key,
    * every integer tick in [min t, max t] gets a value — observed where
    * present, otherwise LINEAR interpolation between the nearest
    * observed neighbors, `vp + (vn−vp)·(t−tp) div (tn−tp)` in pure
    * integer arithmetic (the truncating div both engines share —
    * slopes can be negative), and edge ticks before the first / after
    * the last observation CARRY the nearest value flat.
    *
    * Scale shape: the grid explode is per-key span-bounded and guarded
    * by `maxSpan` (a span-sized blowup from one bad key is refused, the
    * [[cusumPeaks]] stance — one tiny min/max aggregate pays for the
    * guard); all four neighbor windows share ONE key-partitioned sort,
    * so the whole fill is a single shuffle on the key. Output:
    * `(keyCol, tCol, value, is_observed)`. */
  def gapFill(series: DataFrame, keyCol: String, tCol: String,
      valueCol: String, maxSpan: Long = 100000L): DataFrame = {
    require(maxSpan >= 1, s"maxSpan >= 1, got $maxSpan")
    val spans = series.groupBy(col(keyCol))
      .agg(min(col(tCol)).as("_t0"), max(col(tCol)).as("_t1"))
    val worst = spans.agg(coalesce(max(col("_t1") - col("_t0")), lit(0L)))
      .head.getLong(0)
    require(worst < maxSpan,
      s"gapFill: a key spans $worst ticks (>= maxSpan $maxSpan); raise " +
        "maxSpan only if the dense grid is genuinely wanted")
    val grid = spans.select(col(keyCol),
      explode(sequence(col("_t0"), col("_t1"))).as(tCol))
    val joined = grid.join(
      series.select(col(keyCol), col(tCol), col(valueCol).as("_v")),
      Seq(keyCol, tCol), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val back = w.rowsBetween(Long.MinValue, 0)
    val fwd = w.rowsBetween(0, Long.MaxValue)
    val filled = joined
      .withColumn("_vp", last(col("_v"), ignoreNulls = true).over(back))
      .withColumn("_tp", last(when(col("_v").isNotNull, col(tCol)),
        ignoreNulls = true).over(back))
      .withColumn("_vn", first(col("_v"), ignoreNulls = true).over(fwd))
      .withColumn("_tn", first(when(col("_v").isNotNull, col(tCol)),
        ignoreNulls = true).over(fwd))
    filled
      // internal names only inside the expr — a caller's tick column
      // never splices into SQL text
      .withColumn("_num", (col("_vn") - col("_vp")) *
        (col(tCol) - col("_tp")))
      .withColumn("_den", col("_tn") - col("_tp"))
      .select(col(keyCol), col(tCol),
        when(col("_v").isNotNull, col("_v"))
          .when(col("_vp").isNull, col("_vn"))
          .when(col("_vn").isNull, col("_vp"))
          .otherwise(col("_vp") + expr("_num div _den"))
          .as("value"),
        col("_v").isNotNull.cast("long").as("is_observed"))
  }

  /** Seasonal (hour-of-week) anomaly detection: flag (key, hour-slot,
    * week) cells whose event count exceeds `multiple`× the same slot's
    * leave-one-out weekly baseline — "this Monday 9am is 3× every other
    * Monday 9am". The seasonality-aware complement of [[cusumPeaks]]
    * (level shifts) and burst detection (absolute spikes): a nightly
    * batch job's hour is NOT an anomaly at its usual hour but IS at any
    * other, which no season-blind threshold can express.
    *
    * All arithmetic is exact-integer: slot = epoch-hour mod 168 and
    * week = epoch-hour div 168 (no calendar/timezone functions — the
    * cross-engine drift trap), and the flag is the cross-multiplied
    * `obs·(weeks−1) > multiple·rest` — never a float division. Weeks
    * with ZERO events for a cell simply don't appear, which only raises
    * the leave-one-out bar (conservative, documented). Cells observed
    * in a single week have no baseline and are not flagged.
    *
    * Scale shape: one map-side-combined count down to (key, slot, week)
    * cells — input-linear, the only event-sized pass — then a window
    * over (key, slot) on cell-sized data. Output: flagged cells with
    * `score_permille = 1000·obs·(weeks−1) div max(rest, 1)`. */
  def seasonalAnomalies(events: DataFrame, keyCol: String, tsCol: String,
      multiple: Int = 2): DataFrame = {
    require(multiple >= 1, s"multiple >= 1, got $multiple")
    // exact integer div (the `/` operator is DOUBLE division — its
    // rounding can cross an hour boundary for extreme timestamps)
    val cells = events
      .select(col(keyCol),
        unix_micros(col(tsCol).cast("timestamp_ltz")).as("_us"))
      .withColumn("_hour", expr("_us div 3600000000"))
      .select(col(keyCol), expr("_hour % 168").as("slot"),
        expr("_hour div 168").as("week"))
      .groupBy(col(keyCol), col("slot"), col("week"))
      .agg(count(lit(1)).as("obs"))
    val w = Window.partitionBy(col(keyCol), col("slot"))
    val scored = cells
      .withColumn("rest", sum(col("obs")).over(w) - col("obs"))
      .withColumn("weeks", count(lit(1)).over(w))
    scored
      .filter(col("weeks") >= 2L &&
        col("obs") * (col("weeks") - 1L) > col("rest") * multiple)
      .withColumn("_num", col("obs") * (col("weeks") - 1L) * 1000L)
      .withColumn("_den", greatest(col("rest"), lit(1L)))
      .select(col(keyCol), col("slot"), col("week"), col("obs"),
        col("rest"), col("weeks"),
        ((col("_num") - pmod(col("_num"), col("_den"))) / col("_den"))
          .cast("long").as("score_permille"))
  }

  def decayedCounts(events: DataFrame, keyCol: String, tsCol: String,
      asOf: Column, halfLifeDays: Int = 7, maxShift: Int = 30): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays >= 1, got $halfLifeDays")
    require(maxShift >= 1 && maxShift <= 62,
      s"maxShift in [1, 62] (long shift), got $maxShift")
    def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))
    val denom = 86400000000L * halfLifeDays
    val age = us(asOf) - us(col(tsCol))
    // floor division via pmod keeps the arithmetic exact-integer
    val h = least(greatest(((age - pmod(age, lit(denom))) / denom)
      .cast("long"), lit(0L)), lit(maxShift.toLong))
    val weight = org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.GraftShims.expression(lit(1L)),
        org.apache.spark.sql.GraftShims.expression(
          (lit(maxShift.toLong) - h).cast("int"))))
    events.groupBy(col(keyCol))
      .agg(sum(weight).as("decayed_weight"),
        count(lit(1)).as("n_events"))
  }

  /** Beaconing (C2 heartbeat) signals per key — the hunting analytic
    * the tunnel/fast-flux detectors' cousin runs on TIMING instead of
    * names (malware phoning home fires on a timer, so its
    * inter-arrival deltas collapse onto ONE value; organic human
    * traffic scatters): per key the count of events, of inter-arrival
    * deltas, the MODE delta with its multiplicity, `mode_permille`
    * (share of intervals exactly at the mode — a beacon sits near
    * 1000; thresholds and jitter-bucketing are caller policy, callers
    * wanting jitter tolerance pre-quantize the timestamp column), and
    * the active span in the same time unit.
    *
    * Determinism: events order by (ts, tie), so equal timestamps
    * cannot flap the deltas; the mode ties break to the SMALLEST
    * delta. Keys with one event have no intervals and report the mode
    * columns NULL out loud.
    *
    * Scale shape: one shuffle on the key for the lag window (the
    * within-partition sort is window-exec's, node-local and
    * spillable), then two map-side-combined folds — (key, delta)
    * counts, then the per-key argmax via a KEY-partitioned
    * row_number; nothing is ever single-partition. */
  def beaconingSignals(df: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keys = keyCols.map(col)
    val lagW = Window.partitionBy(keys: _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val deltas = df
      .withColumn("_d", col(tsCol) - lag(col(tsCol), 1).over(lagW))
    val perKey = deltas.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("span"))
    val modes = deltas.filter(col("_d").isNotNull)
      .groupBy(keys :+ col("_d"): _*)
      .agg(count(lit(1)).as("_c"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(keys: _*)
          .orderBy(col("_c").desc, col("_d").asc)))
      .filter(col("_r") === 1)
      .select(keys ++ Seq(col("_d").as("mode_delta"),
        col("_c").as("mode_count")): _*)
    perKey.join(modes, keyCols, "left")
      .select(keys ++ Seq(
        col("n_events"),
        (col("n_events") - 1L).as("n_intervals"),
        col("mode_delta"), col("mode_count"),
        when(col("n_events") > 1L,
          expr("mode_count * 1000 div (n_events - 1)"))
          .as("mode_permille"),
        col("span")): _*)
  }

  /** Feed-coverage gap audit per key — the health question a fleet
    * operator asks of every sensor/source BEFORE trusting any
    * time-windowed analytic over it (a sensor dark for a week makes
    * `dns_newly_observed` mint false "new" names the day it returns;
    * gap detection is the guard): per key, over UTC-day grain, the
    * active span (`first_day`..`last_day`), days with at least one
    * event, days missing inside the span, and the LONGEST consecutive
    * missing run (`max_gap_days` — one 7-day outage reads differently
    * from seven scattered dark days at the same miss count).
    *
    * `tsCol` is unix micros. Keys with a single active day report
    * `max_gap_days = 0` (no interior to be missing).
    *
    * Scale shape: a map-side-combined distinct to (key, day) — the
    * frame is bounded by keys × calendar days, NOT event volume — then
    * one key-partitioned lag window (same shuffle key the final fold
    * needs, so the window costs a sort, not an extra exchange) and one
    * key-sized aggregate. */
  def coverageGaps(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val days = df.select(col(keyCol),
        expr(s"`$tsCol` div 86400000000").as("_day"))
      .distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_day"))
    days.withColumn("_prev", lag(col("_day"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        min(col("_day")).as("first_day"),
        max(col("_day")).as("last_day"),
        count(lit(1)).as("n_days_observed"),
        coalesce(max(col("_day") - col("_prev") - 1L), lit(0L))
          .as("max_gap_days"))
      .withColumn("n_days_missing", expr(
        "last_day - first_day + 1 - n_days_observed"))
  }
}
