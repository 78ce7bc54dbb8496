package graft.operators

import org.apache.spark.sql.SparkSession

/** Persisted BPE merge-table artifact — the bridge between training
  * ([[TextAnalysis.bpeTrain]] / [[Curation.bpeTrain]], which return a
  * driver-sized learned table) and every consumer that tokenizes under
  * it ([[TextAnalysis.bpeSegment]]/`bpeTokenCount`, sequence packing,
  * context budgeting): ONE on-disk vocabulary (`(rank, a, b, n)`
  * parquet, rank = 1-based learned order) that tokenization jobs load
  * instead of re-training or hard-coding.
  *
  * Lifecycle is the store/index house pattern ([[StagedCommit]]): a
  * rewrite stages the new table under `_staging_<epoch>`, commits by
  * manifest, swaps in by idempotent rename and bumps the epoch LAST —
  * readers never see a half-written vocabulary, a crash anywhere
  * replays or discards cleanly, and the epoch lets caches (and
  * provenance records) tell two vocabularies apart.
  *
  * Scale: a merge table is k-entries (the tokenizer's merge count) —
  * driver-sized by construction, the same class as IVF centroids. The
  * parquet coalesces to one file; `load` collects it whole. */
object BpeVocab {

  /** Write `merges` (learned order, as returned by the trainers) as the
    * vocabulary at `path`, replacing any previous table atomically. */
  def write(spark: SparkSession, merges: Seq[(String, String, Long)],
      path: String): Unit = {
    require(merges.nonEmpty, "BpeVocab.write: empty merge table")
    // a writer resolves committed leftovers first (the writeIndex rule:
    // a stale committed staging must not replay over the new table)
    if (ObservationStore.pathExists(spark, path))
      recover(spark, path, deleteUncommitted = true)
    val targetEpoch = readEpoch(spark, path).getOrElse(0L) + 1L
    val staging = s"$path/_staging_$targetEpoch"
    val (f, sp) = ObservationStore.fs(spark, staging)
    if (f.exists(sp)) f.delete(sp, true)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b, n), i) => (i + 1L, a, b, n) }
      .toDF("rank", "a", "b", "n")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$staging/merges")
    val (mf, mp) = ObservationStore.fs(spark, s"$staging/_manifest.json")
    val out = mf.create(mp, true)
    try out.write(
      s"""{"target_epoch":$targetEpoch,"staged_tables":"merges"}"""
        .getBytes("UTF-8"))
    finally out.close()
    applyStaged(spark, path, staging)
  }

  /** Load the vocabulary back in learned order, `(a, b, n)` — the exact
    * shape the trainers return, so `write(load(...))` is identity and
    * [[loadMerges]] feeds the segmenters directly. Resolves any
    * committed-but-unapplied staging first (reader path). */
  def load(spark: SparkSession, path: String): Seq[(String, String, Long)] = {
    recover(spark, path, deleteUncommitted = false)
    spark.read.parquet(s"$path/merges")
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("n")))
      .toIndexedSeq
  }

  /** The `(a, b)` pair list [[TextAnalysis.bpeSegment]] and friends
    * take. */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    load(spark, path).map { case (a, b, _) => (a, b) }

  /** Vocabulary generation: advanced once per committed [[write]]. */
  def readEpoch(spark: SparkSession, path: String): Option[Long] = {
    val (f, p) = ObservationStore.fs(spark, s"$path/_graft_meta.json")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val content =
        try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      """"epoch"\s*:\s*(\d+)""".r.findFirstMatchIn(content)
        .map(_.group(1).toLong)
    }
  }

  private def writeMeta(spark: SparkSession, path: String,
      epoch: Long): Unit = {
    val (f, p) = ObservationStore.fs(spark, s"$path/_graft_meta.json")
    val out = f.create(p, true)
    try out.write(s"""{"epoch":$epoch}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def recover(spark: SparkSession, path: String,
      deleteUncommitted: Boolean): Unit =
    StagedCommit.recover(spark, path, deleteUncommitted)(
      staging => applyStaged(spark, path, staging))

  private def applyStaged(spark: SparkSession, path: String,
      staging: String): Unit = {
    val manifest = StagedCommit.readManifest(spark, staging)
    val targetEpoch = StagedCommit.numField(manifest, "target_epoch")
    val pieces = StagedCommit.listField(manifest, "staged_tables")
      .getOrElse(throw new StagedCommit.TornManifest(
        s"staged vocab manifest missing staged_tables: $manifest"))
    StagedCommit.applyPieces(spark, path, staging, pieces, targetEpoch,
      () => readEpoch(spark, path),
      gen => writeMeta(spark, path, gen))
  }
}
