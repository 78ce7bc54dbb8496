package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Every persisted artifact a forgotten document set must be erased
  * from. Text-keyed artifacts (BM25, positional, band, n-gram LM) and
  * vector indexes (IVF / IVF-PQ — one tombstone contract) are addressed
  * by path and keyed by the SAME document id the pipeline indexed them
  * under; observation stores are keyed by their own seven columns, so
  * each store target carries the caller's explicit predicate mapping
  * the request into that key space (a sensor decommission, a key
  * pattern — the [[ObservationStore.deleteWhere]] surface). */
final case class ForgetTargets(
    bm25: Seq[String] = Nil,
    positional: Seq[String] = Nil,
    bandIndex: Seq[String] = Nil,
    vectorIndex: Seq[String] = Nil,
    ngramLm: Seq[String] = Nil,
    store: Seq[(String, Column)] = Nil) {
  def isEmpty: Boolean =
    bm25.isEmpty && positional.isEmpty && bandIndex.isEmpty &&
      vectorIndex.isEmpty && ngramLm.isEmpty && store.isEmpty
}

/** The composed "forget everywhere" entry point — what a pipeline
  * operator actually calls on a GDPR erasure or takedown: ONE document
  * set fans out to every artifact's own retraction with a consistent id
  * mapping, instead of the caller hand-sequencing six delete APIs (and
  * inevitably missing one). Pure composition: each artifact keeps its
  * own delete semantics, crash story, and vacuum.
  *
  * Ordering is the crash story: the idempotent TOMBSTONE APPENDS run
  * first (BM25, positional, band, vector — re-deleting an id is a
  * documented no-op on all four), then the staged-swap store deletes
  * (replay-safe: an already-applied predicate matches nothing), and the
  * n-gram LM LAST — count subtraction is the one delete-ONCE mutation
  * (a replayed subtraction would drive counts negative, and
  * [[Curation.deleteFromLm]] refuses loudly rather than corrupt). So a
  * crash anywhere mid-fan-out retries clean: everything before the LM
  * re-applies as a no-op, and if the crash hit after the LM's own
  * commit, the retry's ONLY failure is the LM step's loud refusal —
  * drop `ngramLm` from the retry's targets once its generation shows
  * the delete landed.
  *
  * Deletion here means what it means per artifact: tombstoned indexes
  * mask immediately and fold on their next vacuum ([[vacuumForgotten]]
  * runs them all); the LM and store rewrite their data in place. At
  * 100 TB nothing in this path scales with corpus size — each delete
  * costs O(deleted) appends or touched-partition rewrites. */
object Forget {

  /** Fan the document set out to every target. `docs` must carry
    * `idCol` and `textCol` (the text is required by the statistics-
    * exact artifacts — BM25 recomputes dl, the LM recomputes the
    * subtracted counts — under the SAME text the documents were
    * indexed with). Returns the artifact labels applied, in order —
    * the caller's audit record.
    *
    * `batchId` makes the WHOLE fan-out replay-safe (the foreachBatch
    * exactly-once contract): the tombstone appends and store predicate
    * were always idempotent, and with an id the LM's delete-once
    * subtraction skips on replay instead of refusing — so a crashed
    * fan-out retries clean end to end, which is what [[streamForget]]
    * relies on. */
  def forgetDocuments(spark: SparkSession, docs: DataFrame,
      textCol: String, idCol: String, targets: ForgetTargets,
      batchId: Option[Long] = None): Seq[String] = {
    require(!targets.isEmpty, "forgetDocuments: no targets")
    // ONE snapshot feeds every artifact: the fan-out must not re-read a
    // live source that could change between steps (ids deleted from the
    // band index but not BM25 is exactly the inconsistency this
    // operator exists to prevent)
    val d = docs.select(col(idCol), col(textCol)).localCheckpoint(false)
    require(!d.isEmpty, "forgetDocuments: nothing to forget")
    val ids = d.select(col(idCol))
    // Everything BEFORE the LM is idempotent or replay-safe on its own
    // (tombstone re-appends no-op, an applied store predicate matches
    // nothing), and the targets are DISJOINT artifact paths — so those
    // deletions run on overlapping threads (the vacuumForgotten /
    // stageMerge move: each mutation is a handful of small jobs, and
    // serializing them leaves the cluster idle between job launches).
    // The crash-ordering contract only requires the LM's delete-once
    // subtraction to start strictly AFTER every idempotent mutation
    // committed, and that barrier (the Await) is preserved.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val idempotent: Seq[Future[String]] =
      targets.bm25.map(p => Future {
        Retrieval.deleteFromIndex(spark, p, d, textCol, idCol)
        s"bm25:$p"
      }) ++
      targets.positional.map(p => Future {
        Retrieval.deleteFromPositionalIndex(spark, p, ids)
        s"positional:$p"
      }) ++
      targets.bandIndex.map(p => Future {
        Dedup.deleteFromBandIndex(spark, p, ids)
        s"band:$p"
      }) ++
      targets.vectorIndex.map(p => Future {
        Similarity.deleteFromIvfIndex(spark, p, ids)
        s"vector:$p"
      }) ++
      targets.store.map { case (p, pred) => Future {
        ObservationStore.deleteWhere(spark, p, pred): Unit
        s"store:$p"
      }}
    val done = Seq.newBuilder[String]
    done ++= Await.result(Future.sequence(idempotent),
      scala.concurrent.duration.Duration.Inf)
    // LAST: the one non-idempotent mutation (see the ordering contract
    // in the object scaladoc) — replay-safe when batchId is supplied
    targets.ngramLm.foreach { p =>
      Curation.deleteFromLm(spark, p, d, textCol, batchId)
      done += s"lm:$p"
    }
    done.result()
  }

  /** Continuous retraction: every micro-batch of deletion REQUESTS
    * (rows carrying `idCol` + `textCol`) fans out through
    * [[forgetDocuments]] with the micro-batch id as the exactly-once
    * token — the [[graft.operators.Curation.streamLm]] /
    * `Retrieval.streamIndex` maintenance lifecycle applied to the GDPR
    * path, so a Spark-retried batch replays as a no-op on every
    * artifact (including the LM's counted subtraction). Empty batches
    * skip. Tombstoned indexes still vacuum on their own cadence
    * ([[vacuumForgotten]]). */
  def streamForget(requests: DataFrame, textCol: String, idCol: String,
      targets: ForgetTargets, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty)
          forgetDocuments(batch.sparkSession, batch, textCol, idCol,
            targets, Some(bid)): Unit
      }
      .start()

  /** Fold every tombstoned target's deletions in — the maintenance half
    * of the lifecycle, composed the same way. Store and LM targets have
    * nothing to vacuum (their deletes rewrite in place). Returns rows
    * removed per artifact label. */
  def vacuumForgotten(spark: SparkSession,
      targets: ForgetTargets): Map[String, Long] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    // independent staged mutations of DISJOINT artifact paths — overlap
    // them (the writeIndex/stageMerge move); each vacuum keeps its own
    // crash contract
    val futs =
      targets.bm25.map(p => Future(
        s"bm25:$p" -> Retrieval.vacuumIndex(spark, p))) ++
      targets.positional.map(p => Future(
        s"positional:$p" -> Retrieval.vacuumPositionalIndex(spark, p))) ++
      targets.bandIndex.map(p => Future(
        s"band:$p" -> Dedup.vacuumBandIndex(spark, p))) ++
      targets.vectorIndex.map(p => Future(
        s"vector:$p" -> Similarity.vacuumIvfIndex(spark, p)))
    Await.result(Future.sequence(futs),
      scala.concurrent.duration.Duration.Inf).toMap
  }
}
