package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.SessionEvent

/** Streaming analytics: watermarked windows and flatMapGroupsWithState
  * sessionization driven through MemoryStream micro-batches. */
class StreamingAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling windows finalize after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingAnalytics.windowedCounts(
      stream.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", windowDuration = "1 hour", lateness = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("win_test").start()
    stream.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.50),
      (ts("2024-01-01 10:45:00"), "click", 2.25))
    q.processAllAvailable()
    // advance event time far past 10:00-11:00 + lateness -> window emits
    stream.addData((ts("2024-01-01 13:00:00"), "click", 9.99))
    q.processAllAvailable()
    val rows = spark.table("win_test").collect()
    q.stop()
    assert(rows.length == 1) // the 13:00 window is still open
    assert(rows.head.getAs[Long]("n_events") == 2L)
    assert(rows.head.getAs[Long]("sum_value_cents") == 375L)
    assert(rows.head.getAs[Timestamp]("window_start") == ts("2024-01-01 10:00:00"))
  }

  test("watermarked sliding windows: 4 overlapping windows per event, finalized in order") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingAnalytics.slidingCounts(
      stream.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", windowDuration = "1 hour",
      slideDuration = "15 minutes", lateness = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("slide_test").start()
    stream.addData((ts("2024-01-01 10:05:00"), "click", 1.00))
    q.processAllAvailable()
    // advance event time far enough that all four containing windows
    // (09:15..10:00 starts) are past watermark and finalize
    stream.addData((ts("2024-01-01 13:00:00"), "click", 9.99))
    q.processAllAvailable()
    val rows = spark.table("slide_test").collect()
    q.stop()
    val starts = rows.map(_.getAs[Timestamp]("window_start")).sorted
    assert(starts.toSeq == Seq(ts("2024-01-01 09:15:00"),
      ts("2024-01-01 09:30:00"), ts("2024-01-01 09:45:00"),
      ts("2024-01-01 10:00:00")))
    assert(rows.forall(_.getAs[Long]("n_events") == 1L))
    assert(rows.forall(_.getAs[Long]("sum_value_cents") == 100L))
  }

  test("curation columns are stateless: PII redaction + quality run on a stream") {
    // redactPii/qualityColumns/repetitionColumns are narrow per-row
    // expressions, so the same Columns run unchanged in append-mode
    // streaming — this guards against a refactor sneaking an aggregation
    // into them (which would need watermarks and break ingest-time use)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = stream.toDF().toDF("id", "text").select(
      org.apache.spark.sql.functions.col("id") +:
        (graft.operators.Curation.redactPii(
          org.apache.spark.sql.functions.col("text")) ++
          graft.operators.Curation.repetitionColumns(
            org.apache.spark.sql.functions.col("text"))): _*)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("curation_stream").start()
    stream.addData((1L, "ping admin@host.example.net from 10.1.2.3 now"))
    q.processAllAvailable()
    val rows = spark.table("curation_stream").collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("redacted") ==
      "ping <EMAIL> from <IP> now")
    assert(rows.head.getAs[Long]("n_emails") == 1L)
    assert(rows.head.getAs[Long]("n_2grams") == 4L)
  }

  test("streaming delta-dedup: stream-static LSH join flags corpus dups per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingAnalytics.streamingDeltaDedup(
      corpus, stream.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("delta_stream").start()
    stream.addData((10L, "alpha beta gamma delta epsilon zeta")) // dup of 1
    q.processAllAvailable()
    stream.addData(
      (11L, "nothing similar to the corpus whatsoever right"),
      (12L, "one two three four five six")) // dup of 2, later batch
    q.processAllAvailable()
    val rows = spark.table("delta_stream").collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"),
        r.getAs[Double]("jaccard"))).toSet
    q.stop()
    assert(rows == Set((10L, 1L, 1.0), (12L, 2L, 1.0)))
  }

  test("streaming exact dedup: first occurrence per content survives across batches") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingAnalytics.DocHash
    val stream = MemoryStream[DocHash]
    val out = StreamingAnalytics.streamingExactDedup(stream.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_test").start()
    // batch 1: hash A twice (min id wins), hash B once
    stream.addData(DocHash(12L, "A"), DocHash(5L, "A"), DocHash(9L, "B"))
    q.processAllAvailable()
    // batch 2: A again (duplicate of an earlier batch) + new hash C
    stream.addData(DocHash(1L, "A"), DocHash(3L, "C"))
    q.processAllAvailable()
    val rows = spark.table("dedup_test").as[DocHash].collect()
    q.stop()
    assert(rows.toSet == Set(DocHash(5L, "A"), DocHash(9L, "B"),
      DocHash(3L, "C")))
  }

  test("streamingDecontaminate flags eval-gram hits at ingest time") {
    implicit val sqlCtx = spark.sqlContext
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val out = StreamingAnalytics.streamingDecontaminate(
      stream.toDF().toDF("doc_id", "text"), evalSet, "text", "doc_id", n = 4)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("decon_stream").start()
    stream.addData(
      (10L, "x alpha beta gamma delta y"),      // one eval 4-gram inside
      (11L, "alpha beta x gamma delta y"))      // words shared, no 4-gram
    q.processAllAvailable()
    stream.addData((12L, "clean text with no overlap at all"))
    q.processAllAvailable()
    val rows = spark.table("decon_stream").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("gram"))).toSet
    q.stop()
    assert(rows == Set((10L, "alpha beta gamma delta")))
  }

  test("kmv sketch aggregates across streaming micro-batches (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[(String, String)]
    // per-group distinct-count sketch over an unbounded stream: the
    // TypedImperativeAggregate buffer is the state — O(k) per group
    val agg = stream.toDF().toDF("grp", "v")
      .groupBy(col("grp"))
      .agg(graft.operators.Curation.kmvDistinct(col("v"), 8).as("nd"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream").start()
    stream.addData(("a", "x"), ("a", "y"), ("b", "x"))
    q.processAllAvailable()
    stream.addData(("a", "y"), ("a", "z"), ("b", "x")) // dups across batches
    q.processAllAvailable()
    val rows = spark.table("kmv_stream").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(rows == Map("a" -> 3L, "b" -> 1L)) // exact below k
  }

  test("decayedCounts runs as streaming state: weights accumulate exactly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val asOf = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    // fixed asOf → the decayed sum is a plain associative aggregate:
    // sum + count state per key, O(1), any output mode
    val agg = graft.operators.Events.decayedCounts(
      stream.toDF().toDF("k", "ts"), "k", "ts", lit(asOf))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("decay_stream").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    stream.addData(("a", t("2024-06-01 00:00:00")))
    q.processAllAvailable()
    stream.addData(("a", t("2024-05-25 00:00:00")), // exactly 1 half-life
      ("b", t("2024-05-18 00:00:00")))              // exactly 2
    q.processAllAvailable()
    val rows = spark.table("decay_stream").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("decayed_weight"), r.getAs[Long]("n_events"))).toMap
    q.stop()
    assert(rows == Map(
      "a" -> (((1L << 30) + (1L << 29), 2L)),
      "b" -> (((1L << 28), 1L))))
  }

  test("phraseHits filters a document stream statelessly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[(Long, String)]
    // narrow per-row phrase matching = a plain append-mode filter with
    // ZERO state — the streaming form the positional join cannot take
    val out = stream.toDF().toDF("doc_id", "text")
      .withColumn("hits",
        graft.operators.TextAnalysis.phraseHits(col("text"),
          Seq("data", "leak")))
      .filter(col("hits") > 0)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("phrase_stream").start()
    stream.addData((1L, "no match here"), (2L, "a data leak happened"),
      (3L, "leak data reversed order"), (4L, "data leak data leak"))
    q.processAllAvailable()
    val rows = spark.table("phrase_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    q.stop()
    assert(rows == Map(2L -> 1L, 4L -> 2L))
  }

  test("windowed topKPairs: leaderboard state merges inside streaming windows") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[(java.sql.Timestamp, Long, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // ONE stateful aggregation (a chained per-user pre-agg would trip
    // Spark's multi-stateful-operator correctness check): the bounded
    // buffer IS the per-window state, merged across micro-batches
    val agg = stream.toDF().toDF("ts", "user_id", "n")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.operators.Curation
        .topKPairs(col("n"), col("user_id"), 2).as("t"))
      .select(col("w.start").as("ws"), col("t"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("wtopk_stream").start()
    stream.addData((t("2024-06-01 10:05:00"), 1L, 5L),
      (t("2024-06-01 10:10:00"), 2L, 3L))
    q.processAllAvailable()
    stream.addData((t("2024-06-01 10:20:00"), 3L, 4L), // displaces user 2
      (t("2024-06-01 10:25:00"), 2L, 9L))              // new top value
    q.processAllAvailable()
    val rows = spark.table("wtopk_stream").collect()
      .map(r => r.getTimestamp(0).toString ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getLong(0), s.getLong(1))))
      .groupBy(_._1).map { case (k, v) => k -> v.last._2 }
    q.stop()
    // values seen: (5,u1), (3,u2), (4,u3), (9,u2) → top-2 = (9,u2),(5,u1)
    assert(rows == Map("2024-06-01 10:00:00.0" ->
      Seq((9L, 2L), (5L, 1L))))
  }

  test("windowed kmvDistinct: sketch state merges inside streaming windows") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val agg = stream.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.operators.Curation
        .kmvDistinct(col("user_id").cast("string"), 8).as("est"))
      .select(col("w.start").as("ws"), col("est"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("wkmv_stream").start()
    stream.addData((t("2024-06-01 10:05:00"), 1L),
      (t("2024-06-01 10:10:00"), 2L))
    q.processAllAvailable()
    // watermark is 10:09:50 — the same-window batch-2 rows are on time
    stream.addData((t("2024-06-01 10:20:00"), 3L), // same window, new user
      (t("2024-06-01 10:25:00"), 1L),              // duplicate across batches
      (t("2024-06-01 11:05:00"), 9L))
    q.processAllAvailable()
    val rows = spark.table("wkmv_stream").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    q.stop()
    // unsaturated sketches are exact: 3 distinct users at 10:00, 1 at 11:00
    assert(rows == Map("2024-06-01 10:00:00.0" -> 3L,
      "2024-06-01 11:00:00.0" -> 1L))
  }

  test("streaming mergeIntervals: spans extend across batches, close on jump and watermark") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingAnalytics.{SpanInterval, SpanOut}
    val stream = MemoryStream[SpanInterval]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val q = graft.streaming.StreamingAnalytics
      .mergeIntervals(stream.toDS(), lateness = "5 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("span_stream").start()
    // batch 1: key 1 opens [00:00, 10:00); a contained interval merges
    stream.addData(
      SpanInterval(1L, t("2024-06-01 10:00:00"), t("2024-06-01 10:10:00")),
      SpanInterval(1L, t("2024-06-01 10:02:00"), t("2024-06-01 10:05:00")))
    q.processAllAvailable()
    // batch 2: touching endpoint EXTENDS the stored span; then a jump
    // past the max end closes it in-stream and opens a new one
    stream.addData(
      SpanInterval(1L, t("2024-06-01 10:10:00"), t("2024-06-01 10:20:00")),
      SpanInterval(1L, t("2024-06-01 10:30:00"), t("2024-06-01 10:31:00")))
    q.processAllAvailable()
    // batch 3: advance the watermark far past 10:31 → timeout closes
    // the open span
    stream.addData(
      SpanInterval(2L, t("2024-06-01 12:00:00"), t("2024-06-01 12:01:00")))
    q.processAllAvailable()
    stream.addData(
      SpanInterval(2L, t("2024-06-01 12:30:00"), t("2024-06-01 12:31:00")))
    q.processAllAvailable()
    val spans = spark.table("span_stream").as[SpanOut].collect()
      .filter(_.key == 1L).map(s => (s.span_start.toString,
        s.span_end.toString, s.n_intervals)).toSet
    q.stop()
    assert(spans == Set(
      ("2024-06-01 10:00:00.0", "2024-06-01 10:20:00.0", 3L),
      ("2024-06-01 10:30:00.0", "2024-06-01 10:31:00.0", 1L)))
  }

  test("streaming mergeIntervals: on-time backfill extends span_start down") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingAnalytics.{SpanInterval, SpanOut}
    val stream = MemoryStream[SpanInterval]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val q = graft.streaming.StreamingAnalytics
      .mergeIntervals(stream.toDS(), lateness = "5 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("span_bf_stream").start()
    // batch 1: span opens at 10:10; watermark advances to 10:09:55
    stream.addData(
      SpanInterval(1L, t("2024-06-01 10:10:00"), t("2024-06-01 10:20:00")))
    q.processAllAvailable()
    // batch 2: an ON-TIME interval (s >= watermark) that starts BEFORE
    // the open span's start and overlaps it — the merged span's start
    // must move DOWN (the close-on-arrival-order design got this wrong)
    stream.addData(
      SpanInterval(1L, t("2024-06-01 10:09:56"), t("2024-06-01 10:11:00")))
    q.processAllAvailable()
    // advance the watermark past the span end to close it
    stream.addData(
      SpanInterval(2L, t("2024-06-01 11:00:00"), t("2024-06-01 11:00:01")))
    q.processAllAvailable()
    stream.addData(
      SpanInterval(2L, t("2024-06-01 11:30:00"), t("2024-06-01 11:30:01")))
    q.processAllAvailable()
    val spans = spark.table("span_bf_stream").as[SpanOut].collect()
      .filter(_.key == 1L)
      .map(s => (s.span_start.toString, s.span_end.toString,
        s.n_intervals)).toSet
    q.stop()
    assert(spans == Set(
      ("2024-06-01 10:09:56.0", "2024-06-01 10:20:00.0", 2L)))
  }

  test("transitionPairs: O(1) last-event state bridges micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingAnalytics.{TransitionPair, TypedEvent}
    val stream = MemoryStream[TypedEvent]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val q = graft.streaming.StreamingAnalytics
      .transitionPairs(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_stream").start()
    // batch 1: user 1 a→b (tie at :01 broken by event_id), user 2 lone
    stream.addData(
      TypedEvent(1L, 11L, t("2024-06-01 00:00:01"), "a"),
      TypedEvent(1L, 12L, t("2024-06-01 00:00:01"), "b"),
      TypedEvent(2L, 21L, t("2024-06-01 00:00:05"), "a"))
    q.processAllAvailable()
    // batch 2: user 1's stored "b" pairs with the arriving "c";
    // user 2's stored "a" with "c" — state crossed the batch boundary
    stream.addData(
      TypedEvent(1L, 13L, t("2024-06-01 00:00:09"), "c"),
      TypedEvent(2L, 22L, t("2024-06-01 00:00:09"), "c"))
    q.processAllAvailable()
    val pairs = spark.table("trans_stream")
      .as[TransitionPair].collect().toSet
    q.stop()
    assert(pairs == Set(
      TransitionPair(1L, "a", "b"), TransitionPair(1L, "b", "c"),
      TransitionPair(2L, "a", "c")))
  }

  test("multiPatternCounts filters a document stream statelessly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[(Long, String)]
    // the streaming blocklist: one automaton pass per arriving doc,
    // plain append-mode projection+filter with ZERO state
    val out = graft.operators.TextAnalysis.multiPatternHits(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      Seq("leak", "breach"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mp_stream").start()
    stream.addData((1L, "clean"), (2L, "leak then breach then leak"))
    q.processAllAvailable()
    val rows = spark.table("mp_stream").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()
    assert(rows == Map((2L, "leak") -> 2L, (2L, "breach") -> 1L))
  }

  test("topKPairs leaderboard maintains itself across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[(String, Long, Long)]
    // per-group live top-k over an unbounded stream: the bounded buffer
    // IS the streaming state — O(k) per group forever, where the window
    // formulation cannot run on a stream at all
    val agg = stream.toDF().toDF("grp", "v", "id")
      .groupBy(col("grp"))
      .agg(graft.operators.Curation.topKPairs(col("v"), col("id"), 2).as("t"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("topk_stream").start()
    stream.addData(("a", 5L, 1L), ("a", 9L, 2L), ("b", 1L, 3L))
    q.processAllAvailable()
    stream.addData(("a", 7L, 4L), ("a", 3L, 5L)) // 7 displaces 5
    q.processAllAvailable()
    val rows = spark.table("topk_stream").collect().map { r =>
      r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getLong(0), s.getLong(1)))
    }.toMap
    q.stop()
    assert(rows == Map(
      "a" -> Seq((9L, 2L), (7L, 4L)),
      "b" -> Seq((1L, 3L))))
  }

  test("count-min sketch aggregates across streaming micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[String]
    // the O(d·w) matrix is the streaming state; elementwise-sum merge
    // means batch boundaries can never change the final sketch
    val agg = stream.toDF().toDF("v")
      .agg(graft.operators.Curation.cmSketch(col("v"), d = 2, w = 64).as("m"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("cm_stream").start()
    stream.addData("x", "y", "x")
    q.processAllAvailable()
    stream.addData("x", "z")
    q.processAllAvailable()
    val m = spark.table("cm_stream").head.getSeq[Long](0).toArray
    q.stop()
    val batch = Seq("x", "y", "x", "x", "z").toDF("v")
      .agg(graft.operators.Curation.cmSketch(col("v"), d = 2, w = 64))
      .head.getSeq[Long](0).toArray
    assert(m.toSeq == batch.toSeq) // stream ≡ batch, bit for bit
    assert(org.apache.spark.sql.graft.CmSketch.estimate(m, 2, 64, "x") >= 3L)
  }

  test("flatMapGroupsWithState sessionization: gap closes a session in-stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val out = StreamingAnalytics.sessionize(stream.toDS(), gapMinutes = 30)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_test").start()
    // batch 1: two events 10 min apart (one session so far)
    stream.addData(
      SessionEvent(7L, 1L, ts("2024-01-01 10:00:00")),
      SessionEvent(7L, 2L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // batch 2: an event 2h later -> the first session closes immediately
    stream.addData(SessionEvent(7L, 3L, ts("2024-01-01 12:10:00")))
    q.processAllAvailable()
    val rows = spark.table("sess_test")
      .as[StreamingAnalytics.SessionOut].collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.user_id == 7L)
    assert(rows.head.n_events == 2L)
    assert(rows.head.session_start == ts("2024-01-01 10:00:00"))
    assert(rows.head.session_end == ts("2024-01-01 10:10:00"))
  }

  test("stream-stream interval join equals the batch rangeJoin") {
    implicit val sqlCtx = spark.sqlContext
    val impRows = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 10:20:00")),
      (2L, 102L, ts("2024-01-01 10:00:00")))
    val clickRows1 = Seq((1L, 900L, ts("2024-01-01 10:05:00")))
    val clickRows2 = Seq(
      (1L, 901L, ts("2024-01-01 10:25:00")),  // pairs with 101 (Δ5m)
      (2L, 902L, ts("2024-01-01 10:08:00")),  // pairs with 102 (Δ8m)
      (3L, 903L, ts("2024-01-01 10:01:00")))  // no impression on key 3
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamingAnalytics.streamStreamRangeJoin(
      imps.toDF().toDF("k", "imp_id", "its"),
      clicks.toDF().toDF("k", "click_id", "cts"),
      "k", "its", "cts", windowUs = 600000000L /* 10 min */,
      lateness = "5 minutes",
      leftOut = Seq("imp_id"), rightOut = Seq("click_id"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    // clicks arrive SPLIT across micro-batches, some before their
    // impression's batch-mate — matches still emit exactly once
    imps.addData(impRows: _*)
    clicks.addData(clickRows1: _*)
    q.processAllAvailable()
    clicks.addData(clickRows2: _*)
    q.processAllAvailable()
    val got = spark.table("ssj_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    // the batch twin over the SAME rows must answer identically
    val want = graft.operators.Events.rangeJoin(
      impRows.toDF("k", "imp_id", "its"),
      (clickRows1 ++ clickRows2).toDF("k", "click_id", "cts"),
      "k", "its", "cts", windowUs = 600000000L,
      leftOut = Seq("imp_id"), rightOut = Seq("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == want, s"stream=$got batch=$want")
    assert(got == Set((100L, 900L, 300000000L), (101L, 901L, 300000000L),
      (102L, 902L, 480000000L)))
  }
}
