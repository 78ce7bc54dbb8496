package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Events

/** As-of and range join: correctness against naive per-row references on
  * crafted edge cases (ties, no-match, boundary inclusion), plus the
  * plan property that makes them usable at scale — equi-joins, never a
  * cartesian/nested-loop.
  */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // key 1: right at 10, 20; left at 5 (no match), 10 (tie), 15, 25
  // key 2: right empty; left at 10 (no match)
  private lazy val left = Seq(
    (101L, 1L, ts(5)), (102L, 1L, ts(10)), (103L, 1L, ts(15)),
    (104L, 1L, ts(25)), (201L, 2L, ts(10)))
    .toDF("l_id", "k", "t")
  private lazy val right = Seq(
    (11L, 1L, ts(10), 100L), (12L, 1L, ts(20), 200L))
    .toDF("r_id", "k", "rt", "v")

  test("asofJoin picks the latest right row at or before each left time") {
    val out = Events.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select($"l_id", $"asof_rt", $"asof_v")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)).map(_.getTime / 1000L),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(101L) == (None, None))            // before first right row
    assert(out(102L) == (Some(10L), Some(100L))) // tie: >= matches
    assert(out(103L) == (Some(10L), Some(100L)))
    assert(out(104L) == (Some(20L), Some(200L))) // latest, not first
    assert(out(201L) == (None, None))            // key with no right rows
  }

  test("asofJoinForward picks the earliest right row at or after each left") {
    val out = Events.asofJoinForward(left, right, "k", "t", "rt", Seq("v"))
      .select($"l_id", $"asof_rt", $"asof_v")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)).map(_.getTime / 1000L),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(101L) == (Some(10L), Some(100L))) // next right row ahead
    assert(out(102L) == (Some(10L), Some(100L))) // tie: <= matches
    assert(out(103L) == (Some(20L), Some(200L))) // earliest, not latest
    assert(out(104L) == (None, None))            // after last right row
    assert(out(201L) == (None, None))            // key with no right rows
  }

  test("asof joins: NULL times match nothing in either direction") {
    val nl = Seq((301L, 1L, Option.empty[Timestamp]),
      (302L, 1L, Some(ts(15)))).toDF("l_id", "k", "t")
    val nr = Seq((21L, 1L, Option.empty[Timestamp], 999L),
      (22L, 1L, Some(ts(10)), 100L)).toDF("r_id", "k", "rt", "v")
    def vals(df: org.apache.spark.sql.DataFrame) = df
      .select($"l_id", $"asof_v").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // forward: the NULL-time left row must NOT grab the key's earliest
    // right row; the NULL-time right row must never be a match
    val fwd = vals(Events.asofJoinForward(nl, nr, "k", "t", "rt", Seq("v")))
    assert(fwd == Map(301L -> None, 302L -> None))
    // backward: the NULL-time right row (sorted first by NULLS FIRST)
    // must not become "the latest row at or before" anything
    val bwd = vals(Events.asofJoin(nl, nr, "k", "t", "rt", Seq("v")))
    assert(bwd == Map(301L -> None, 302L -> Some(100L)))
  }

  test("asofJoinForward matches a naive per-row reference on random data") {
    val n = 400
    val l = (1 to n).map(i => (i.toLong, (i % 7).toLong,
      ts((i * 2654435761L) % 1000))).toDF("l_id", "k", "t")
    val r = (1 to n / 2).map(i => (i.toLong, (i % 7).toLong,
      ts((i * 40503L) % 1000), i * 10L)).toDF("r_id", "k", "rt", "v")
    val rRows = r.collect()
    val naive = l.collect().map { lr =>
      val cand = rRows.filter(rr => rr.getLong(1) == lr.getLong(1) &&
        !rr.getTimestamp(2).before(lr.getTimestamp(2)))
      val best = if (cand.isEmpty) None
        else Some(cand.minBy(_.getTimestamp(2).getTime))
      (lr.getLong(0), best.map(_.getLong(3)))
    }.toMap
    val got = Events.asofJoinForward(l, r, "k", "t", "rt", Seq("v"))
      .select($"l_id", $"asof_v").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(got == naive)
  }

  test("asofJoin matches a naive per-row reference on random data") {
    val n = 400
    val l = (1 to n).map(i => (i.toLong, (i % 7).toLong,
      ts((i * 2654435761L) % 1000))).toDF("l_id", "k", "t")
    val r = (1 to n / 2).map(i => (i.toLong, (i % 7).toLong,
      ts((i * 40503L) % 1000), i * 10L)).toDF("r_id", "k", "rt", "v")
    // naive: for every left row, max right time <= t on the key (right
    // times are unique per key here, so the value is unambiguous)
    val rRows = r.collect()
    val naive = l.collect().map { lr =>
      val cand = rRows.filter(rr => rr.getLong(1) == lr.getLong(1) &&
        !rr.getTimestamp(2).after(lr.getTimestamp(2)))
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(_.getTimestamp(2).getTime))
      (lr.getLong(0), best.map(_.getLong(3)))
    }.toMap
    val got = Events.asofJoin(l, r, "k", "t", "rt", Seq("v"))
      .select($"l_id", $"asof_v").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(got == naive)
  }

  test("rangeJoin equals the naive inequality join, boundaries included") {
    val l = Seq((1L, 1L, ts(0)), (2L, 1L, ts(50)), (3L, 2L, ts(0)))
      .toDF("a_id", "k", "t")
    val r = Seq((10L, 1L, ts(0)), (11L, 1L, ts(10)), (12L, 1L, ts(60)),
      (13L, 1L, ts(111)), (14L, 2L, ts(9)))
      .toDF("b_id", "k", "rt")
    val got = Events.rangeJoin(l, r, "k", "t", "rt",
        windowUs = 10L * 1000000, Seq("a_id"), Seq("b_id"))
      .select($"a_id", $"b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    // strict > on the left edge, inclusive <= on the right edge
    assert(got == Set((1L, 11L), (2L, 12L), (3L, 14L)))
  }

  test("rangeJoin matches naive on random data (cross-bin pairs included)") {
    val l = (1 to 300).map(i => (i.toLong, (i % 5).toLong,
      ts((i * 2654435761L) % 500))).toDF("a_id", "k", "t")
    val r = (1 to 300).map(i => (i.toLong + 1000, (i % 5).toLong,
      ts((i * 40503L) % 500))).toDF("b_id", "k", "rt")
    val win = 37L * 1000000
    val lRows = l.collect(); val rRows = r.collect()
    val naive = for {
      lr <- lRows; rr <- rRows
      if lr.getLong(1) == rr.getLong(1)
      d = (rr.getTimestamp(2).getTime - lr.getTimestamp(2).getTime) * 1000L
      if d > 0 && d <= win
    } yield (lr.getLong(0), rr.getLong(0))
    val got = Events.rangeJoin(l, r, "k", "t", "rt", win,
        Seq("a_id"), Seq("b_id"))
      .select($"a_id", $"b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size, "no duplicate pairs")
    assert(got.toSet == naive.toSet)
  }

  test("asofJoin and rangeJoin plan as equi-join/sort — no nested loop") {
    def explainOf(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }
    val asof = explainOf(
      Events.asofJoin(left, right, "k", "t", "rt", Seq("v")))
    assert(!asof.contains("CartesianProduct") &&
      !asof.contains("BroadcastNestedLoopJoin"), asof)
    assert(asof.contains("Window"), asof) // union+window, not a join at all
    val rj = explainOf(Events.rangeJoin(left, right, "k", "t", "rt",
      10L * 1000000, Seq("l_id"), Seq("r_id")))
    assert(!rj.contains("CartesianProduct") &&
      !rj.contains("BroadcastNestedLoopJoin"), rj)
  }

  test("funnel: stage events before the previous stage never count") {
    val events = Seq(
      // user 1: click BEFORE the first view must not complete stage 2;
      // the later click does, then purchase
      (1L, ts(90), "click"), (1L, ts(100), "view"),
      (1L, ts(110), "click"), (1L, ts(120), "purchase"),
      // user 2: entered at stage 2 only -> nothing counts
      (2L, ts(100), "click"),
      // user 3: stalls after stage 1
      (3L, ts(100), "view"),
      // user 4: simultaneous view+click counts (>=, not >)
      (4L, ts(100), "view"), (4L, ts(100), "click")
    ).toDF("user_id", "t", "event_type")
    val out = graft.operators.Events.funnel(events, "user_id", "t",
      "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Timestamp]("t0"), r.getAs[Timestamp]("t1"),
          r.getAs[Timestamp]("t2"), r.getAs[Long]("stages_completed"))).toMap
    assert(out(1L) == ((ts(100), ts(110), ts(120), 3L)))
    assert(out(2L) == ((null, null, null, 0L)))
    assert(out(3L) == ((ts(100), null, null, 1L)))
    assert(out(4L) == ((ts(100), ts(100), null, 2L)))
    intercept[IllegalArgumentException](
      graft.operators.Events.funnel(events, "user_id", "t", "event_type",
        Seq("view", "view")))
  }

  test("funnelRates: counts, per-mille rates, median time-to-convert") {
    val events = Seq(
      // converts all the way, 10s then 10s
      (1L, ts(100), "view"), (1L, ts(110), "click"), (1L, ts(120), "purchase"),
      // converts to click only, 30s
      (3L, ts(100), "view"), (3L, ts(130), "click"),
      // never enters the funnel (click without view)
      (2L, ts(50), "click")
    ).toDF("user_id", "t", "event_type")
    val out = graft.operators.Events.funnelRates(events, "user_id", "t",
      "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("stage_idx") ->
        (r.getAs[String]("stage"), r.getAs[Long]("entered"),
          r.getAs[Long]("converted"), r.getAs[Long]("conv_per_mille"),
          r.getAs[Long]("median_from_prev_cents"))).toMap
    // 3 users total; 2 entered stage 0 (user 2's early click never counts)
    assert(out(0L) == (("view", 3L, 2L, 666L, -1L)))
    // both viewers clicked; median delta = (10s + 30s)/2 = 20s = 2e6 cents
    assert(out(1L) == (("click", 2L, 2L, 1000L, 2000000000L)))
    // one of two clickers purchased, 10s after the click
    assert(out(2L) == (("purchase", 2L, 1L, 500L, 1000000000L)))

    // EMPTY event stream: exact zeros and -1 sentinels, never NULLs
    val empty = graft.operators.Events.funnelRates(
      events.filter(col("user_id") < 0L), "user_id", "t", "event_type",
      Seq("view", "click"))
      .collect().map(r => r.getAs[Long]("stage_idx") ->
        (r.getAs[Long]("entered"), r.getAs[Long]("converted"),
          r.getAs[Long]("conv_per_mille"),
          r.getAs[Long]("median_from_prev_cents"))).toMap
    assert(empty(0L) == ((0L, 0L, -1L, -1L)))
    assert(empty(1L) == ((0L, 0L, -1L, -1L)))
  }

  test("tumblingAgg: value sums in exact cents; count-only mode for value-less frames") {
    import graft.operators.Events
    val t = Timestamp.valueOf("2021-06-01 10:15:00")
    val t2 = Timestamp.valueOf("2021-06-01 11:05:00")
    val events = Seq(
      (t, "click", 0.1), (t, "click", 0.2), (t2, "click", 1.0),
      (t, "view", 5.0))
      .toDF("ts", "event_type", "value")
    val out = Events.tumblingAgg(events, col("ts"), col("event_type"))
      .collect().map(r => (r.getAs[Timestamp]("window_start").getTime,
        r.getAs[String]("key")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_value_cents"))).toMap
    val h10 = Timestamp.valueOf("2021-06-01 10:00:00").getTime
    val h11 = Timestamp.valueOf("2021-06-01 11:00:00").getTime
    assert(out((h10, "click")) == ((2L, 30L))) // 0.1+0.2 = exactly 30 cents
    assert(out((h11, "click")) == ((1L, 100L)))
    assert(out((h10, "view")) == ((1L, 500L)))
    // a frame WITHOUT a value column: counts only, no sum column at all
    val bare = events.drop("value")
    val co = Events.tumblingAgg(bare, col("ts"), col("event_type"),
      valueCol = None)
    assert(!co.columns.contains("sum_value_cents"))
    assert(co.collect().map(r => (r.getAs[String]("key"),
      r.getAs[Long]("n_events"))).toSet ==
      Set(("click", 2L), ("click", 1L), ("view", 1L)))
  }

  test("decayedCounts: exact half-life weights, clamps at both ends") {
    val day = 86400L
    val asOf = ts(1000L * day)
    val rows = Seq(
      ("a", ts(1000L * day)),            // age 0      → 2^30
      ("a", ts(993L * day)),             // exactly 7d → 2^29
      ("a", ts(994L * day)),             // 6d         → 2^30
      ("b", ts(1000L * day - 14 * day)), // 14d        → 2^28
      ("b", ts(1001L * day)),            // future     → clamped to 2^30
      ("c", ts(1000L * day - 7 * 31 * day)), // 31 half-lives → clamp, 1
      ("c", ts(10L * day))               // ancient    → 1
    ).toDF("k", "ts")
    val out = Events.decayedCounts(rows, "k", "ts", lit(asOf))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("decayed_weight"), r.getAs[Long]("n_events"))).toMap
    assert(out("a") == ((1L << 30) + (1L << 29) + (1L << 30), 3L))
    assert(out("b") == ((1L << 28) + (1L << 30), 2L))
    assert(out("c") == (2L, 2L))
  }

  test("mergeIntervals coalesces chains, touching endpoints, and islands") {
    // key 1: [0,10] [5,8] (contained) [10,20] (touching) → one span;
    //        [30,35] island; [25,26] island BETWEEN them in start order
    // key 2: a long interval bridging what a gap rule would split:
    //        [0,100] [40,50] [90,110] → one span [0,110]
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 8L), (1L, 10L, 20L),
      (1L, 25L, 26L), (1L, 30L, 35L),
      (2L, 0L, 100L), (2L, 40L, 50L), (2L, 90L, 110L))
      .toDF("k", "s", "e")
    val out = Events.mergeIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("merge_seq")) ->
        (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
          r.getAs[Long]("n_intervals"))).toMap
    assert(out.size == 4)
    assert(out((1L, 1L)) == ((0L, 20L, 3L)))
    assert(out((1L, 2L)) == ((25L, 26L, 1L)))
    assert(out((1L, 3L)) == ((30L, 35L, 1L)))
    assert(out((2L, 1L)) == ((0L, 110L, 3L)))
  }

  test("mergeIntervals is one shuffle — window and final agg share it") {
    val iv = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val plan = Events.mergeIntervals(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    val tree = plan.split("\n\n").head
    assert("Exchange".r.findAllIn(tree).length == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("overlapJoin: multi-bin overlaps count once, touching counts zero") {
    // bin = 10. l1 [0, 35] spans 4 bins; r1 [5, 32] overlaps in every
    // one — the later-start rule must accept exactly one pair copy.
    // r2 [35, 40] touches l1's endpoint (overlap 0); r3 [50, 60] misses.
    val l = Seq((1L, 1L, 0L, 35L)).toDF("l_id", "k", "ls", "le")
    val r = Seq((10L, 1L, 5L, 32L), (20L, 1L, 35L, 40L),
      (30L, 1L, 50L, 60L), (40L, 2L, 0L, 100L)) // other key never joins
      .toDF("r_id", "k", "rs", "re")
    val out = Events.overlapJoin(l, r, "k", "ls", "le", "rs", "re",
        binUs = 10L, leftOut = Seq("l_id"), rightOut = Seq("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        x.getAs[Long]("overlap_us")).toMap
    assert(out == Map((1L, 10L) -> 27L, (1L, 20L) -> 0L))
    val plan = Events.overlapJoin(l, r, "k", "ls", "le", "rs", "re",
        binUs = 10L, leftOut = Seq("l_id"), rightOut = Seq("r_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("retentionCohorts: cohort = first week, gaps stay gaps") {
    // Mondays: 2024-01-01, -08, -15. u1 joins wk0, skips wk1, returns
    // wk2; u2 joins wk0, returns wk1; u3 joins wk1 only. Multiple
    // events in one (user, week) count once.
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-02 10:00:00")), (1L, t("2024-01-03 10:00:00")),
      (1L, t("2024-01-16 10:00:00")),
      (2L, t("2024-01-01 00:00:00")), (2L, t("2024-01-08 23:59:59")),
      (3L, t("2024-01-10 12:00:00")))
      .toDF("user_id", "ts")
    val out = Events.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, // u1 + u2 join week 0
      ("2024-01-01", 1L) -> 1L, // only u2 returns in week 1
      ("2024-01-01", 2L) -> 1L, // only u1 returns in week 2
      ("2024-01-08", 0L) -> 1L)) // u3's own cohort
  }

  test("transitionCounts: bigram counts and exact permille rates") {
    // user 1: a→b→b→c ; user 2: a→c ; user 3: lone event (no pairs).
    // Tie at user 1 ts=2 broken by event id: b(id=12) before b(id=13).
    val ev = Seq(
      (11L, 1L, 1L, "a"), (12L, 1L, 2L, "b"), (13L, 1L, 2L, "b"),
      (14L, 1L, 3L, "c"), (21L, 2L, 1L, "a"), (22L, 2L, 2L, "c"),
      (31L, 3L, 1L, "b"))
      .toDF("event_id", "user_id", "t", "event_type")
    val out = Events.transitionCounts(ev, "user_id", "t", "event_id",
        "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("permille"))).toMap
    // from a: a→b 1, a→c 1 (500‰ each); from b: b→b 1, b→c 1
    assert(out == Map(
      ("a", "b") -> ((1L, 500L)), ("a", "c") -> ((1L, 500L)),
      ("b", "b") -> ((1L, 500L)), ("b", "c") -> ((1L, 500L))))
  }

  test("cusumPeaks: hand-run CUSUM fold, densified zero hours, first peak") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 0$h%d:$m%02d:00")
    // type x hourly counts [1, 1, 4, 2]: mean 2, S = [0, 0, 8, 8] (×H);
    // type y [2, 0, 0, 0] — hours 1-3 exist only via densification:
    // S = [6, 4, 2, 0], peak at hour 0
    val ev = (
      Seq(ts(0, 5) -> "x", ts(1, 5) -> "x") ++
      (1 to 4).map(i => ts(2, i) -> "x") ++ Seq(ts(3, 5) -> "x") ++
      Seq(ts(3, 6) -> "x") ++
      Seq(ts(0, 1) -> "y", ts(0, 2) -> "y"))
      .toDF("ts", "event_type")
    val out = Events.cusumPeaks(ev, "ts", "event_type")
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("total_events"),
          r.getAs[Long]("peak_cusum"), r.getAs[Long]("peak_window"))).toMap
    def hourUs(h: Int) =
      Timestamp.valueOf(f"2024-01-01 0$h%d:00:00").getTime * 1000L
    assert(out("x") == ((4L, 8L, 8L, hourUs(2))))
    // peak 8 is REACHED at hour 2 and only equalled at hour 3 — the
    // first attainment wins
    assert(out("y") == ((4L, 2L, 6L, hourUs(0))))
    // the output key column carries the CALLER's name, not a hardcoded one
    val renamed = Events.cusumPeaks(
      ev.withColumnRenamed("event_type", "tenant"), "ts", "tenant")
    assert(renamed.columns.contains("tenant"), renamed.columns.toSeq)
    // the "bounded by construction" claim is ENFORCED: a span wider than
    // maxWindows fails fast instead of densifying multi-MB per-key rows
    // (here: 4 hourly windows against a bound of 2)
    val e = intercept[IllegalArgumentException] {
      Events.cusumPeaks(ev, "ts", "event_type", maxWindows = 2L)
    }
    assert(e.getMessage.contains("maxWindows"), e.getMessage)
    // an EMPTY input returns zero rows with the full schema (the span
    // guard must not NPE on a null min/max)
    val empty = Events.cusumPeaks(
      ev.filter(lit(false)), "ts", "event_type")
    assert(empty.isEmpty && empty.columns.toSeq ==
      Seq("event_type", "n_windows", "total_events", "peak_cusum",
        "peak_window"))
  }

  test("nearestJoin: closer side wins, before breaks ties, tol binds") {
    import graft.operators.Events
    val left = Seq(
      (1L, 1L, ts(100)),   // before at 90 (d=10), after at 130 → before
      (2L, 1L, ts(125)),   // before 90 (35), after 130 (5) → after
      (3L, 1L, ts(110)),   // before 90 (20), after 130 (20) → tie→before
      (4L, 2L, ts(100)),   // only right at 500 → outside tol 60 → null
      (5L, 3L, ts(100)))   // no right rows at all → null
      .toDF("id", "k", "t")
    val right = Seq(
      (1L, ts(90), 901L), (1L, ts(130), 902L), (2L, ts(500), 903L))
      .toDF("k", "t", "pid")
    val out = Events.nearestJoin(left, right, "k", "t", "t", Seq("pid"),
        toleranceUs = 60L * 1000000L)
      .collect().map { r =>
        def opt(c: String) = if (r.isNullAt(r.fieldIndex(c))) None
          else Some(r.getLong(r.fieldIndex(c)))
        r.getLong(0) -> ((opt("near_pid"), opt("near_delta_us"),
          Option(r.getString(r.fieldIndex("near_direction")))))
      }.toMap
    assert(out(1L) == ((Some(901L), Some(10000000L), Some("before"))))
    assert(out(2L) == ((Some(902L), Some(5000000L), Some("after"))))
    assert(out(3L) == ((Some(901L), Some(20000000L), Some("before"))))
    assert(out(4L) == ((None, None, None)))
    assert(out(5L) == ((None, None, None)))
  }

  test("gapFill: interiors interpolate, edges carry, guard binds") {
    import graft.operators.Events
    // key a: observed (0,10), (4,2) → 1..3 interpolate with slope -2
    // (10 + (2-10)*t div 4: t=1 → 8, t=2 → 6, t=3 → 4)
    // key b: single point → span 1, no fill
    val s = Seq(("a", 0L, 10L), ("a", 4L, 2L), ("b", 7L, 5L))
      .toDF("k", "t", "v")
    val out = Events.gapFill(s, "k", "t", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("a", 0L) -> ((10L, 1L)), ("a", 1L) -> ((8L, 0L)),
      ("a", 2L) -> ((6L, 0L)), ("a", 3L) -> ((4L, 0L)),
      ("a", 4L) -> ((2L, 1L)), ("b", 7L) -> ((5L, 1L))))
    val e = intercept[IllegalArgumentException](
      Events.gapFill(Seq(("a", 0L, 1L), ("a", 9L, 1L)).toDF("k", "t", "v"),
        "k", "t", "v", maxSpan = 5L))
    assert(e.getMessage.contains("maxSpan"), e.getMessage)
  }

  test("frequentSequences: session-scoped grams, session-distinct support") {
    // user 1 session A: a b a b a  → "a>b>a" ×2, "b>a>b" ×1
    // user 1 session B (2h later): a b a → "a>b>a" ×1
    // user 2 one session: a b a → "a>b>a" ×1
    // cross-session grams (…a | a b…) must NOT appear.
    val ev = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(60), "b"), (3L, 1L, ts(120), "a"),
      (4L, 1L, ts(180), "b"), (5L, 1L, ts(240), "a"),
      (6L, 1L, ts(7500), "a"), (7L, 1L, ts(7560), "b"),
      (8L, 1L, ts(7620), "a"),
      (9L, 2L, ts(0), "a"), (10L, 2L, ts(60), "b"), (11L, 2L, ts(120), "a"))
      .toDF("event_id", "user_id", "t", "et")
    val out = Events.frequentSequences(ev, "user_id", "t", "event_id",
        "et", k = 3, minSupport = 1, gapMinutes = 30)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      "a>b>a" -> ((3L, 4L)),   // 3 sessions, 4 occurrences (2 in A)
      "b>a>b" -> ((1L, 1L))))
    // minSupport prunes by SESSIONS, not occurrences
    val pruned = Events.frequentSequences(ev, "user_id", "t", "event_id",
        "et", k = 3, minSupport = 2, gapMinutes = 30)
      .collect().map(_.getString(0)).toSet
    assert(pruned == Set("a>b>a"))
    intercept[IllegalArgumentException](
      Events.frequentSequences(ev, "user_id", "t", "event_id", "et", k = 1))
  }

  test("seasonalAnomalies flags only cells beating the leave-one-out bar") {
    // slot S = hour 10 of epoch-week; weeks w, w+1, w+2 carry 2, 2, 9
    // events → only the 9 is > 2× its leave-one-out baseline (rest=4,
    // weeks=3: 9·2 > 4·2). A cell seen in ONE week only is never
    // flagged (no baseline), regardless of size.
    def at(week: Long, hourInWeek: Long, n: Int, key: String) =
      (0 until n).map(i =>
        (key, ts((week * 168L + hourInWeek) * 3600L + i)))
    val ev = (at(100, 10, 2, "a") ++ at(101, 10, 2, "a") ++
      at(102, 10, 9, "a") ++ at(100, 20, 50, "b"))
      .toDF("k", "t")
    val out = Events.seasonalAnomalies(ev, "k", "t", multiple = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet == Set(("a", 10L, 102L)))
    // obs=9, rest=4, weeks=3, score = 9·2·1000 div 4 = 4500
    assert(out(("a", 10L, 102L)) == ((9L, 4L, 3L, 4500L)))
    intercept[IllegalArgumentException](
      Events.seasonalAnomalies(ev, "k", "t", multiple = 0))
  }

  test("beaconingSignals: mode share, smallest-delta ties, singletons") {
    import graft.operators.Events
    val rows = Seq(
      // beacon: u1/hb every 60, 5 events → 4 intervals all 60
      ("u1", "hb", 0L, 1L), ("u1", "hb", 60L, 2L), ("u1", "hb", 120L, 3L),
      ("u1", "hb", 180L, 4L), ("u1", "hb", 240L, 5L),
      // organic: u2/click deltas 10, 30, 10 → mode 10 ×2 of 3
      ("u2", "click", 0L, 1L), ("u2", "click", 10L, 2L),
      ("u2", "click", 40L, 3L), ("u2", "click", 50L, 4L),
      // singleton: no intervals, mode columns NULL out loud
      ("u3", "x", 7L, 1L),
      // tie: deltas 5 and 9 once each → mode = the SMALLER delta
      ("u4", "y", 0L, 1L), ("u4", "y", 5L, 2L), ("u4", "y", 14L, 3L)
    ).toDF("u", "t", "ts", "id")
    val r = Events.beaconingSignals(rows, Seq("u", "t"), "ts", "id")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val b = r(("u1", "hb"))
    assert(b.getLong(2) == 5L && b.getLong(3) == 4L &&
      b.getLong(4) == 60L && b.getLong(5) == 4L &&
      b.getLong(6) == 1000L && b.getLong(7) == 240L)
    val c = r(("u2", "click"))
    assert(c.getLong(4) == 10L && c.getLong(5) == 2L &&
      c.getLong(6) == 666L)
    val s1 = r(("u3", "x"))
    assert(s1.getLong(2) == 1L && s1.getLong(3) == 0L &&
      s1.isNullAt(4) && s1.isNullAt(6) && s1.getLong(7) == 0L)
    val t4 = r(("u4", "y"))
    assert(t4.getLong(4) == 5L && t4.getLong(5) == 1L &&
      t4.getLong(6) == 500L)
    intercept[IllegalArgumentException](
      Events.beaconingSignals(rows, Seq(), "ts", "id"))
  }

  test("sessionizeDelta: fuse / fresh / pass-through / new-user ≡ rebuild") {
    // gap = 30 min. user 1: old sessions at [0,10m] and [60m,70m]; batch
    // at 80m (fuses into session 2) then 130m (fresh session 3).
    // user 2: old [0,5m]; batch at 120m (fresh session 2 only, no fuse).
    // user 3: old only — must pass through untouched.
    // user 4: batch only — numbered from 1.
    def m(min: Long) = ts(min * 60L)
    val oldEvents = Seq(
      (1L, 1L, m(0)), (2L, 1L, m(10)), (3L, 1L, m(60)), (4L, 1L, m(70)),
      (5L, 2L, m(0)), (6L, 2L, m(5)),
      (7L, 3L, m(0)))
      .toDF("event_id", "user_id", "t")
    val batch = Seq(
      (8L, 1L, m(80)), (9L, 1L, m(130)),
      (10L, 2L, m(120)),
      (11L, 4L, m(40)), (12L, 4L, m(200)))
      .toDF("event_id", "user_id", "t")
    val old = Events.sessionize(oldEvents, "user_id", "t", "event_id")
    val delta =
      Events.sessionizeDelta(old, batch, "user_id", "t", "event_id")
    val full = Events.sessionize(oldEvents.unionByName(batch),
      "user_id", "t", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"session_seq",
        $"session_start", $"session_end", $"n_events")
        .collect().map(_.toSeq).toSet
    assert(canon(delta) == canon(full))
    // spot-check the fuse: user 1 session 2 now spans 60m..80m, 3 events
    val u1s2 = delta.filter($"user_id" === 1L && $"session_seq" === 2L)
      .collect().head
    assert(u1s2.getAs[Timestamp]("session_start") == m(60) &&
      u1s2.getAs[Timestamp]("session_end") == m(80) &&
      u1s2.getAs[Long]("n_events") == 3L)
    // a batch event at/before a user's stored session_end is refused
    val bad = Seq((13L, 1L, m(70))).toDF("event_id", "user_id", "t")
    val e = intercept[IllegalArgumentException] {
      Events.sessionizeDelta(old, bad, "user_id", "t", "event_id").count()
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }
}
