package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over event streams: watermarked windowed
  * aggregation and custom-state sessionization — the streaming twins of
  * the batch operators in [[graft.operators.Events]].
  *
  * The reference needs none of this (its aggregation is unwindowed and
  * order-insensitive, SURVEY §2.5); these are the training-data-pipeline
  * extensions where event-time semantics DO matter, built on Structured
  * Streaming's state store so they scale with keys × open windows, not
  * with history.
  */
object StreamingAnalytics {

  /** Watermarked tumbling-window counts/sums per key. Late events beyond
    * `lateness` are dropped and their windows finalized (append mode
    * emits each window exactly once). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).cast("long")
          .as("sum_value_cents"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value_cents"))

  /** Watermarked SLIDING-window counts/sums per key — the streaming twin
    * of [[graft.operators.Events.slidingAgg]]: each event lands in
    * window/slide overlapping windows (planned as an Expand before ONE
    * stateful aggregation), each window finalized once its end passes
    * the watermark. State is keys × open windows — window/slide times
    * the tumbling state, bounded, never stream-length. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String = "1 hour",
      slideDuration: String = "15 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration, slideDuration).as("w"),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).cast("long")
          .as("sum_value_cents"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value_cents"))

  /** Stream-STREAM interval join — the impression⋈click correlation
    * shape, live on BOTH sides: right events pair with left events on
    * the key when the right event lands in `(left_t, left_t +
    * windowUs]`, exactly [[graft.operators.Events.rangeJoin]]'s
    * semantics (spec-pinned stream ≡ batch). Both inputs carry
    * watermarks and the join condition bounds event-time in BOTH
    * directions, so Spark derives a state watermark per side and
    * evicts buffered rows once they can no longer match — state is
    * (lateness + window)-bounded per key, never stream-length. Inner
    * join in append mode: each matched pair emits exactly once.
    *
    * `leftOut`/`rightOut` must be disjoint (pre-rename collisions
    * away, the rangeJoin contract); `delta_us` rides along. */
  def streamStreamRangeJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      windowUs: Long, lateness: String,
      leftOut: Seq[String], rightOut: Seq[String]): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val l = left.select((leftOut.map(col) :+ col(keyCol).as("_k") :+
        col(leftTimeCol).cast("timestamp").as("_lt")): _*)
      .withWatermark("_lt", lateness)
    val r = right.select((rightOut.map(col) :+ col(keyCol).as("_rk") :+
        col(rightTimeCol).cast("timestamp").as("_rt")): _*)
      .withWatermark("_rt", lateness)
    l.join(r, col("_k") === col("_rk") &&
        col("_rt") > col("_lt") &&
        col("_rt") <= col("_lt") +
          expr(s"INTERVAL '$windowUs' MICROSECOND"))
      .select((leftOut ++ rightOut).map(col) :+
        (unix_micros(col("_rt")) - unix_micros(col("_lt")))
          .as("delta_us"): _*)
  }

  final case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)

  final case class SessionState(
      sessionStart: Long, lastSeen: Long, nEvents: Long)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  final case class DocHash(doc_id: Long, content_hash: String)

  /** Streaming incremental exact dedup: emits only the FIRST document
    * seen per content hash, across micro-batches — the streaming twin of
    * [[graft.operators.Dedup.exactDuplicates]] for continuous corpus
    * ingestion. State is one long (the keeper id) per distinct content:
    * bounded by corpus cardinality, not stream length. Within a batch the
    * min doc_id wins (deterministic under batch-boundary changes only for
    * ties within one batch — same guarantee the batch operator gives).
    * At 100 TB, distinct-content state shards across the state store by
    * the groupBy key; if unbounded retention is a concern, front it with
    * a TTL timeout and accept re-admission after expiry. */
  def streamingExactDedup(docs: Dataset[DocHash]): Dataset[DocHash] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, DocHash](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, batch: Iterator[DocHash], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty // duplicate of an earlier batch
          else {
            val first = batch.minBy(_.doc_id)
            state.update(first.doc_id)
            Iterator(DocHash(first.doc_id, hash))
          }
      }
  }

  /** Custom-state gap sessionization (`flatMapGroupsWithState`): a user's
    * session closes when the EVENT-TIME watermark passes `lastSeen + gap`
    * (EventTimeTimeout; a processing-time timeout would keep the
    * micro-batch engine re-triggering forever and is wall-clock-dependent
    * anyway). The streaming counterpart of
    * [[graft.operators.Events.sessionize]]. State per user is O(1): three
    * longs, regardless of session length. */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      lateness: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen+gap: close and clear
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastSeen), s.nEvents))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1))
                case Some(s) =>
                  // in-stream gap: close the old session immediately
                  closed ::= SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastSeen), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class SpanInterval(key: Long, s: Timestamp, e: Timestamp)

  final case class SpanState(start: Long, maxEnd: Long, n: Long)

  final case class SpansState(spans: List[SpanState])

  final case class SpanOut(key: Long, span_start: Timestamp,
      span_end: Timestamp, n_intervals: Long)

  /** Streaming twin of [[graft.operators.Events.mergeIntervals]]: per
    * key the list of OPEN spans as state, each three longs. A span
    * closes ONLY when the event-time watermark passes its max end — at
    * that point no on-time interval can still touch it (any future
    * on-time `s ≥ watermark > maxEnd`), so the close is safe AND
    * out-of-order on-time intervals are handled exactly: one that
    * back-fills before an open span extends its `start` downward, one
    * that bridges two open spans merges them (closing on arrival order
    * instead would emit spans that later on-time data legally
    * extends — a correctness bug, not a trade).
    *
    * State is bounded by the number of DISJOINT spans the watermark
    * has not yet passed — for interval length ≤ L and lateness W,
    * O((W + L) / min-gap) per key, typically a handful; a key's state
    * clears entirely once all its spans close (EventTimeTimeout wakes
    * quiet keys — [[sessionize]]'s stance on processing-time). Late
    * intervals beyond the watermark are dropped by the engine like any
    * watermarked source. Append-only output of closed spans;
    * `end < start` intervals behave as the batch operator's sort
    * places them (their extent never grows the running max). */
  def mergeIntervals(intervals: Dataset[SpanInterval],
      lateness: String = "10 seconds"): Dataset[SpanOut] = {
    import intervals.sparkSession.implicits._
    intervals
      .withWatermark("s", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SpansState, SpanOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[SpanInterval],
         state: GroupState[SpansState]) =>
          // one unified path: merge stored spans with the batch's
          // intervals (empty on a pure timeout wake), then close
          // whatever the watermark has passed
          val wm = state.getCurrentWatermarkMs()
          val incoming = batch
            .map(iv => SpanState(iv.s.getTime, iv.e.getTime, 1L)).toList
          val all = (state.getOption.map(_.spans).getOrElse(Nil) ++
            incoming).sortBy(sp => (sp.start, sp.maxEnd))
          val merged = all.foldLeft(List.empty[SpanState]) { (acc, sp) =>
            acc match {
              case h :: t if sp.start <= h.maxEnd =>
                h.copy(maxEnd = math.max(h.maxEnd, sp.maxEnd),
                  n = h.n + sp.n) :: t
              case _ => sp :: acc
            }
          }.reverse
          val (closed, open) = merged.partition(_.maxEnd < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SpansState(open))
            // strictly after the current watermark, or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(open.map(_.maxEnd).min, wm + 1L))
          }
          closed.iterator.map(sp => SpanOut(key, new Timestamp(sp.start),
            new Timestamp(sp.maxEnd), sp.n))
      }
  }

  final case class TypedEvent(
      user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  final case class LastEvent(ts: Long, event_id: Long, event_type: String)

  final case class TransitionPair(
      user_id: Long, prev_type: String, next_type: String)

  /** Streaming twin of [[graft.operators.Events.transitionCounts]]'
    * pair extraction: per user, each arriving event pairs with the
    * user's PREVIOUS event type — `mapGroupsWithState` holding exactly
    * one (ts, id, type) triple per user, O(1) state forever (the batch
    * lag() window cannot run on a stream; a self-join would buffer the
    * stream). Emitted pairs are append-only facts; the transition
    * matrix / permille table is then any downstream count over the
    * pair sink ([[graft.operators.Events.transitionCounts]]' second
    * half, which never touches event-sized data).
    *
    * In-batch order is `(ts, event_id)` ([[sessionize]]'s stance);
    * across micro-batches events are paired in ARRIVAL order — the
    * stream's own order is the sequence being modeled.
    *
    * State per key is O(1), but the KEY SPACE is not: with no TTL, a
    * user seen once holds a LastEvent forever. `idleTimeout` bounds
    * total state for unbounded user-id spaces (processing-time TTL —
    * a user idle that long starts a fresh chain, losing exactly the
    * one pair that would span the gap); `None` keeps the
    * retain-forever semantics for bounded key spaces. */
  def transitionPairs(events: Dataset[TypedEvent],
      idleTimeout: Option[java.time.Duration] = None)
      : Dataset[TransitionPair] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionPair](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[TypedEvent],
         state: GroupState[LastEvent]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // idle past the TTL: drop the retained LastEvent
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var last = state.getOption
            val out = List.newBuilder[TransitionPair]
            sorted.foreach { e =>
              last.foreach(l =>
                out += TransitionPair(userId, l.event_type, e.event_type))
              last = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
            }
            last.foreach(state.update)
            idleTimeout.foreach(d =>
              state.setTimeoutDuration(d.toMillis))
            out.result().iterator
          }
      }
  }

  /** Streaming decontamination: flag arriving documents that share a
    * full word n-gram with a STATIC eval/benchmark set — the
    * [[graft.operators.Curation.decontaminate]] semantics applied at
    * ingest time, before a contaminated document ever reaches the
    * training corpus. Stream-static inner-equi-join on the gram key
    * against the (tiny, broadcastable) distinct eval-gram set; emits the
    * (doc, gram) hit pairs themselves — the forensic evidence, and
    * append-mode-safe without a watermark (per-doc grams are distinct by
    * construction, so no dedup state is needed either). */
  def streamingDecontaminate(stream: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    import graft.operators.Dedup
    val evalGrams = evalSet
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    stream
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .select(col("doc_id"), col("gram"))
  }

  /** Streaming delta-dedup: near-duplicate-match a document STREAM
    * against a STATIC corpus via a stream-static equi-join on MinHash-LSH
    * band keys — the continuous-ingestion twin of
    * [[graft.operators.Dedup.crossCorpusNearDuplicates]]. The corpus band
    * index is computed once (at scale: precomputed, stored partitioned by
    * band); each micro-batch joins only its own bands against it, and the
    * exact-Jaccard verify runs on candidates only. Stateless — no
    * watermark needed; a pair can be emitted once per matching band, so
    * downstream either tolerates multiplicity or drops duplicates per
    * (batch_id, corpus_id) (state bounded by MATCHED pairs, not the
    * stream). Output: (batch_id, corpus_id, jaccard ≥ threshold). */
  def streamingDeltaDedup(corpus: DataFrame, stream: DataFrame,
      textCol: String, idCol: String, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    import graft.operators.Dedup
    val rowsPerBand = numHashes / bands
    // same shape as a persisted index: this argument can equally be
    // Dedup.loadBandIndex(...) of a precomputed corpus. PERSISTED: the
    // static side of a stream-static join re-executes on every
    // micro-batch unless cached — without this, each trigger re-runs
    // shingling + MinHash over the whole corpus
    val corpusBands = Dedup.buildBandIndex(corpus, textCol, idCol,
      numHashes, bands).persist()
    val streamBands = stream.select(col(idCol).as("batch_id"),
        Dedup.shingles(col(textCol)).as("sh_b"))
      .withColumn("sig", Dedup.minhashSignature(col("sh_b"), numHashes))
      .select(col("batch_id"), col("sh_b"),
        posexplode(Dedup.lshBands(col("sig"), bands, rowsPerBand))
          .as(Seq("s_band_idx", "s_band_hash")))
    streamBands
      .join(corpusBands,
        col("s_band_idx") === col("band_idx") &&
          col("s_band_hash") === col("band_hash"))
      // dedupe candidates BEFORE the verify (a true duplicate matches on
      // every band) — same reshaping as deltaDedupAgainstIndex
      .select(col("batch_id"), col("sh_b"), col("corpus_id"), col("sh_c"))
      .dropDuplicates("batch_id", "corpus_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_b"), col("sh_c"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }
}
