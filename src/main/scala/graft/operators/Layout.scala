package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Physical-layout maintenance: multi-dimensional clustering for parquet
  * data that must serve selective filters on MORE THAN ONE column from a
  * single physical copy (the [[ObservationStore]] solves the same problem
  * for its two key columns by writing two sorted copies; Z-ordering is
  * the one-copy alternative when doubling storage is not on the table —
  * the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  */
object Layout {

  /** Upper bound (exclusive) both Z dimensions must stay under so the
    * interleaved key is non-negative and orders identically as signed
    * BIGINT in every engine. */
  val MaxDim: Long = 1L << 31

  /** Write `df` as parquet clustered by the Morton key of
    * (`xCol`, `yCol`): range-partition into `nFiles` z-runs, sort within
    * each, and persist the key as column `zkey` (8 bytes/row buys
    * z-range scans later; drop it on read if unwanted).
    *
    * Row groups then cover compact z-ranges ≈ axis-aligned rectangles,
    * so parquet min/max stats stay tight on BOTH x and y and a selective
    * filter on either prunes most row groups — where a single-column
    * sort leaves the second column full-range in every file. At 100 TB:
    * `nFiles` scales with data (files ≈ data / target-file-size); the
    * one shuffle here is the range partition, which samples the zkey
    * distribution, so skewed dimensions still split into balanced runs.
    *
    * Both dimensions MUST be integers in `[0, MaxDim)` — coarsen wider
    * domains first (a Z-key is a locality key, so bucketing is free).
    * Violations fail the write loudly (a silently wrapped key would
    * cluster garbage). */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      nFiles: Int = 64): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val inRange = (c: String) =>
      col(c).isNotNull && col(c) >= 0 && col(c) < MaxDim
    df.withColumn("zkey",
        ZOrder.interleave(col(xCol), col(yCol)))
      .withColumn("_zchk", assert_true(inRange(xCol) && inRange(yCol),
        concat_ws(" ", lit(s"zorderWrite: $xCol/$yCol out of [0, 2^31):"),
          col(xCol), col(yCol))))
      // assert_true is always NULL (or throws): the filter keeps every
      // row while forcing the check to actually evaluate
      .where(col("_zchk").isNull).drop("_zchk")
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compaction bin planner: assign a file inventory to output bins of
    * ~`targetBytes` each by cumulative size over the (size desc, id)
    * order — the planning step in front of any small-file compaction
    * (the operational problem every long-lived partitioned store
    * grows): `bin = exclusive-prefix-sum div target`. Size-descending
    * order is the decreasing heuristic — large files land first and
    * alone, the small-file tail fills bins evenly; every bin's payload
    * is within one file of `targetBytes` (a file straddling a boundary
    * joins the earlier bin — planner semantics, documented).
    *
    * Scale shape: the global prefix sum is NOT a single-partition
    * window — one range shuffle on the order key, per-partition running
    * sums, and broadcast per-partition byte offsets (partition-count
    * driver rows), the same distributed-rank idiom as
    * `Dedup.sortedNeighborhood`. Output: `(idCol, size_bytes, bin)`. */
  def packFiles(files: DataFrame, idCol: String, sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes >= 1, got $targetBytes")
    val base = files.select(col(idCol).as("_id"),
      col(sizeCol).cast("long").as("size_bytes"))
    graft.operators.DistributedOrder.withGlobalExclusiveSum(base, "_excl",
        col("size_bytes"), col("size_bytes").desc, col("_id"))
      .select(col("_id").as(idCol), col("size_bytes"),
        expr(s"_excl div $targetBytes").as("bin"))
  }
}
