package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.operators.TextAnalysis

/** Streaming training-data curation — the ingest glue from a raw
  * document stream to a growing, deduplicated corpus, composed from the
  * batch operators so stream and batch share ONE set of semantics:
  *
  *  1. quality gate: token-count bounds ([[TextAnalysis.tokenCount]] —
  *     swap in `qualityColumns`/`gopherColumns` predicates as needed);
  *  2. within-batch dedup: exact content hash + MinHash near-dup,
  *     lowest-id survivor ([[Dedup.minhashNearDuplicates]]);
  *  3. cross-corpus delta dedup: the batch joins the LIVE corpus
  *     through the banded LSH index — increments never re-join the
  *     corpus against itself ([[Dedup.crossCorpusNearDuplicates]]);
  *  4. accepted docs append to the corpus, rejects (with a `reason`)
  *     to a quarantine sink.
  *
  * EXACTLY-ONCE shape: each micro-batch writes to its OWN partition
  * directory (`batch=<id>`, mode overwrite), so a Spark-retried batch
  * overwrites its previous attempt instead of double-appending — the
  * idempotent-rewrite analogue of the store's batch-id marker, chosen
  * here because the corpus is append-only partitioned data, not a
  * merged index. The corpus read (`spark.read.parquet(corpusDir)`)
  * sees each batch exactly once via partition discovery, and batch N's
  * dedup sees batches 0..N−1 as its static side.
  *
  * At scale the cross-corpus join is the banded LSH equi-join (never
  * all-pairs); for corpora too large to re-index per trigger, persist
  * the band index once and swap [[Dedup.crossCorpusNearDuplicates]]
  * for `deltaDedupAgainstIndex` — same contract, precomputed side. */
object CurationPipeline {

  def start(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String, corpusDir: String, rejectDir: String,
      checkpointDir: String, minTokens: Int = 3, maxTokens: Int = 100000,
      threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty)
          curateBatch(spark, batch, textCol, idCol, corpusDir, rejectDir,
            bid, minTokens, maxTokens, threshold)
      }
      .start()

  /** [[start]] with a PERSISTED, incrementally-maintained band index —
    * the corpora-too-large-to-re-index-per-trigger path the [[start]]
    * scaladoc promises: cross-corpus dedup reads
    * [[Dedup.loadBandIndex]] (signatures paid once per document ever)
    * and each batch's accepted docs fold in through
    * [[Dedup.mergeBandIndex]]'s staged commit under the MICRO-BATCH id,
    * so a Spark-retried batch re-writes its corpus partition
    * (idempotent overwrite) but merges the index exactly once. Order
    * inside the batch is corpus-then-index: a crash between the two
    * replays both (the merge is the unmarked one), never double-merges.
    * The first non-empty batch builds the index (overwrite —
    * retry-idempotent like the store's initial build). */
  def startIndexed(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String, corpusDir: String, rejectDir: String,
      indexDir: String, checkpointDir: String, minTokens: Int = 3,
      maxTokens: Int = 100000, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty)
          curateBatchIndexed(spark, batch, textCol, idCol, corpusDir,
            rejectDir, indexDir, bid, minTokens, maxTokens, threshold)
      }
      .start()

  /** One micro-batch of [[startIndexed]]. */
  def curateBatchIndexed(spark: SparkSession, batch: DataFrame,
      textCol: String, idCol: String, corpusDir: String,
      rejectDir: String, indexDir: String, bid: Long, minTokens: Int,
      maxTokens: Int, threshold: Double): Unit = {
    val indexExists = graft.operators.ObservationStore
      .pathExists(spark, indexDir) &&
      Dedup.readBandParams(spark, indexDir).isDefined
    val crossDedup: DataFrame => DataFrame =
      if (!indexExists) af => af.limit(0).select(col(idCol))
      else { af =>
        val (nh, nb) = Dedup.readBandParams(spark, indexDir).get
        Dedup.deltaDedupAgainstIndex(Dedup.loadBandIndex(spark, indexDir),
            af, textCol, idCol, nh, nb, threshold)
          .select(col("batch_id").as(idCol)).distinct()
      }
    val accepted = curateCore(spark, batch, textCol, idCol, corpusDir,
      rejectDir, bid, minTokens, maxTokens, threshold, crossDedup)
    if (!accepted.isEmpty) {
      if (!indexExists)
        // record THIS batch id as the high-water mark: a foreachBatch
        // retry of the index-creating batch must no-op in mergeBandIndex
        // (index now exists), not fold the same documents in again
        Dedup.writeBandIndex(accepted, textCol, idCol, indexDir,
          batchId = Some(bid))
      else
        Dedup.mergeBandIndex(spark, indexDir, accepted, textCol, idCol,
          bid): Unit
    }
  }

  /** One micro-batch of the pipeline (factored out so batch backfills
    * can reuse it with an explicit batch id). */
  def curateBatch(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, corpusDir: String, rejectDir: String, bid: Long,
      minTokens: Int, maxTokens: Int, threshold: Double): Unit = {
    // cross-corpus delta re-joins the live corpus per trigger — the
    // small-corpus mode; [[curateBatchIndexed]] swaps in the persisted
    // band index
    val crossDedup: DataFrame => DataFrame = af => {
      val corpusExists = graft.operators.ObservationStore
        .pathExists(spark, corpusDir)
      if (!corpusExists) af.limit(0).select(col(idCol))
      else Dedup.crossCorpusNearDuplicates(
          spark.read.parquet(corpusDir), af, textCol, idCol,
          threshold = threshold)
        .select(col("batch_id").as(idCol)).distinct()
    }
    curateCore(spark, batch, textCol, idCol, corpusDir, rejectDir, bid,
      minTokens, maxTokens, threshold, crossDedup): Unit
  }

  /** The shared batch body: quality gate, within-batch dedup, the
    * caller-supplied cross-corpus dedup, idempotent per-batch corpus and
    * quarantine writes. Returns the accepted docs MATERIALIZED
    * (localCheckpoint), so index maintenance can reuse them without
    * re-running the dedup chain. */
  private def curateCore(spark: SparkSession, batch: DataFrame,
      textCol: String, idCol: String, corpusDir: String,
      rejectDir: String, bid: Long, minTokens: Int, maxTokens: Int,
      threshold: Double,
      crossDedup: DataFrame => DataFrame): DataFrame = {
    val toks = TextAnalysis.tokenCount(col(textCol))
    val graded = batch
      .withColumn("_n_tokens", toks)
      .localCheckpoint(false) // consumed by pass + reject + dedup joins
    val qualityReject = graded
      .filter(col("_n_tokens") < minTokens || col("_n_tokens") > maxTokens)
      .withColumn("reason", lit("quality:token_count"))
    val pass = graded
      .filter(col("_n_tokens") >= minTokens && col("_n_tokens") <= maxTokens)

    // within-batch: exact + near-dup, lowest-id survivor
    // (exactDuplicates yields one (content_hash, keep_id) row per
    // distinct content — every id that is not its hash's keeper drops)
    val exactDups = pass.withColumn("_h", md5(col(textCol)))
      .join(Dedup.exactDuplicates(pass, textCol, idCol),
        col("_h") === col("content_hash"))
      .filter(col(idCol) =!= col("keep_id"))
      .select(col(idCol)).distinct()
    val nearDups = Dedup.minhashNearDuplicates(pass, textCol, idCol,
        threshold = threshold)
      .select(greatest(col("id_a"), col("id_b")).as(idCol)).distinct()
    val withinDrop = exactDups.unionByName(nearDups).distinct()
      .withColumn("reason", lit("dup:within_batch"))

    val afterWithin = pass.join(withinDrop.select(idCol), Seq(idCol),
      "left_anti")

    val crossDrop = crossDedup(afterWithin)
    val accepted = afterWithin.join(crossDrop, Seq(idCol), "left_anti")
      .drop("_n_tokens")
      .localCheckpoint(false)
    val rejected = qualityReject
      .unionByName(graded.join(withinDrop, Seq(idCol), "left_semi")
        .withColumn("reason", lit("dup:within_batch")))
      .unionByName(graded.join(crossDrop, Seq(idCol), "left_semi")
        .withColumn("reason", lit("dup:cross_corpus")))
      .drop("_n_tokens")

    // idempotent per-batch partitions (see scaladoc)
    accepted.write.mode("overwrite").parquet(s"$corpusDir/batch=$bid")
    rejected.write.mode("overwrite").parquet(s"$rejectDir/batch=$bid")
    accepted
  }
}
