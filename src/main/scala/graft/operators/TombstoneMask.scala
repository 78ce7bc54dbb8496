package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Query-time tombstone masking shared by every tombstoned artifact
  * (BM25, positional, band, IVF, IVF-PQ — the LSM delete/fold split's
  * read side): deleted ids anti-join out of every probe until vacuum
  * folds them in.
  *
  * The mask frame normally rides the plan as a BROADCAST — deletion
  * sets are small relative to the corpus — but the broadcast
  * materializes on the driver, so an unbounded one is a driver OOM
  * waiting for one oversized takedown between vacuums. This object is
  * the bound: past `graft.tombstone.maxBroadcastIds` raw tombstone rows
  * (counted from parquet FOOTERS alone — a driver-side metadata walk,
  * no Spark job; an upper bound on distinct ids, so the guard can only
  * demote to shuffle early, never broadcast late) the anti-join runs
  * SHUFFLED instead. Queries stay correct either way; they just stop
  * betting the driver on the mask staying small. The documented cadence
  * (vacuum before ~10⁷ un-vacuumed ids) still applies — a shuffled
  * mask costs an exchange per query, the signal to vacuum. */
object TombstoneMask {
  /** Max raw tombstone rows the mask may broadcast; past it the
    * anti-join shuffles. Session-configurable. */
  val MaxBroadcastIdsKey = "graft.tombstone.maxBroadcastIds"
  val MaxBroadcastIdsDefault = 1000000L

  def maxBroadcastIds(spark: SparkSession): Long =
    spark.conf.getOption(MaxBroadcastIdsKey).map(_.toLong)
      .getOrElse(MaxBroadcastIdsDefault)

  /** Raw tombstone ROW count summed from parquet footer metadata —
    * no data pages read, no job scheduled. Missing path counts 0. */
  def footerRowCount(spark: SparkSession, path: String): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val (f, p) = ObservationStore.fs(spark, path)
    if (!f.exists(p)) return 0L
    val conf = spark.sessionState.newHadoopConf()
    val it = f.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(st.getPath, conf))
        try n += r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally r.close()
      }
    }
    n
  }

  /** `base` LEFT ANTI the distinct tombstoned ids at `tombPath`
    * (`srcCol` in the tombstone table, renamed to `asKey` — `base`'s
    * key column). No-op when no tombstone table exists. */
  def antiJoin(spark: SparkSession, base: DataFrame, tombPath: String,
      srcCol: String, asKey: String): DataFrame = {
    val (f, p) = ObservationStore.fs(spark, tombPath)
    if (!f.exists(p)) return base
    val ids = spark.read.parquet(tombPath)
      .select(col(srcCol).as(asKey)).distinct()
    base.join(hinted(spark, ids, footerRowCount(spark, tombPath)),
      Seq(asKey), "left_anti")
  }

  /** The already-built mask frame, broadcast-hinted only under the
    * bound — for callers (the vacuums) that hold the frame and the raw
    * count already. */
  def hinted(spark: SparkSession, mask: DataFrame,
      rawCount: Long): DataFrame =
    if (rawCount <= maxBroadcastIds(spark)) broadcast(mask) else mask
}
