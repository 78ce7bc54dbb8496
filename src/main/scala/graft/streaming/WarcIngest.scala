package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis
import graft.sources.Warc

/** Streaming WARC ingestion — closes the crawl→corpus loop under
  * Structured Streaming: a `binaryFile` file-source stream DISCOVERS
  * archives as they land in a directory (a crawler drops finished
  * `.warc.gz` segments; the checkpoint remembers which were consumed),
  * and each micro-batch decodes only the NEW archives and feeds their
  * extracted documents through [[CurationPipeline.curateBatch]] — the
  * same quality/dedup/quarantine semantics as the batch path, because
  * it IS the batch path.
  *
  * Scale shape: the stream carries archive PATHS, not archive bytes —
  * the `binaryFile` source's `content` column is never selected, so
  * column pruning keeps the per-trigger driver traffic to file
  * metadata (k paths — the same k-sized-driver-list stance as the ANN
  * centroid collects). The actual record decode runs in
  * [[Warc.read]]'s one-task-per-archive streaming iterator (O(record)
  * memory), and everything downstream is the curation pipeline's
  * broadcast/banded join algebra. Exactly-once: archive discovery is
  * checkpointed by the file source; corpus writes are idempotent
  * per-batch partitions (`batch=<id>`, see [[CurationPipeline]]). */
object WarcIngest {

  /** Start the stream: watch `warcDir` for `*.warc`/`*.warc.gz`,
    * curate each discovered archive's documents into `corpusDir` (+
    * quarantine in `rejectDir`). */
  def start(spark: SparkSession, warcDir: String, corpusDir: String,
      rejectDir: String, checkpointDir: String, minTokens: Int = 3,
      maxTokens: Int = 100000, threshold: Double = 0.8): StreamingQuery =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      // the binaryFile source's fixed schema, stated explicitly
      // (streaming file sources don't infer); only `path` is ever
      // selected, so `content` is pruned and never read
      .schema(new org.apache.spark.sql.types.StructType()
        .add("path", org.apache.spark.sql.types.StringType)
        .add("modificationTime", org.apache.spark.sql.types.TimestampType)
        .add("length", org.apache.spark.sql.types.LongType)
        .add("content", org.apache.spark.sql.types.BinaryType))
      .load(warcDir)
      .select(col("path"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        ingestBatch(spark, batch, corpusDir, rejectDir, bid, minTokens,
          maxTokens, threshold)
      }
      .start()

  /** One micro-batch: decode the batch's archives, extract documents,
    * curate. Factored out so backfills can replay archive lists with
    * explicit batch ids. */
  def ingestBatch(spark: SparkSession, pathsBatch: DataFrame,
      corpusDir: String, rejectDir: String, bid: Long, minTokens: Int,
      maxTokens: Int, threshold: Double): Unit = {
    // k archive paths per trigger — driver metadata, not data
    val paths = pathsBatch.select("path").collect().map(_.getString(0))
    if (paths.nonEmpty)
      CurationPipeline.curateBatch(spark,
        extractDocs(spark, paths), "text", "url", corpusDir, rejectDir,
        bid, minTokens, maxTokens, threshold)
  }

  /** Archive paths → extracted document frame `(url, ts, title, text)`:
    * the warc_pipeline gate's decode+extract chain (response records
    * only, boilerplate stripped). */
  def extractDocs(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val html = col("payload").cast("string")
    Warc.read(spark, paths.mkString(","))
      .filter(col("warc_type") === "response")
      .select(col("url"), col("ts"),
        TextAnalysis.htmlTitle(html).as("title"),
        TextAnalysis.htmlExtract(html).as("text"))
  }
}
