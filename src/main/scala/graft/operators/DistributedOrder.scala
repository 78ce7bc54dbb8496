package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global order statistics WITHOUT a single-partition window — the
  * shared engine behind sorted-neighborhood blocking, the compaction bin
  * planner, and rank correlation (ONE definition of the
  * rank/offset arithmetic so the three cannot drift).
  *
  * The trap this exists to close: `Window.orderBy(...)` with no
  * partitioning collapses the whole dataset onto one task — the
  * textbook formulation that silently serializes at scale. Instead:
  * one RANGE shuffle on the order key, a per-partition window (sorted
  * locally, spillable), and per-partition totals folded into exclusive
  * offsets on the driver side of a broadcast (partition-count rows —
  * the only driver-sized piece). Ranks are a property of the total
  * order alone, so the result is independent of where the range
  * boundaries land. The order must be TOTAL (include a tie-breaking id
  * column) for cross-engine determinism.
  */
object DistributedOrder {

  /** Appends `rankCol` = exact 1-based global rank over `order`. */
  def withGlobalRank(df: DataFrame, rankCol: String,
      order: Column*): DataFrame =
    attach(df, order, rankCol,
      w => row_number().over(w).cast("long"), count(lit(1)))

  /** Appends `outCol` = exact exclusive global prefix sum of `valueCol`
    * over `order` (0 for the first row). */
  def withGlobalExclusiveSum(df: DataFrame, outCol: String,
      valueCol: Column, order: Column*): DataFrame =
    attach(df, order, outCol,
      w => coalesce(sum(valueCol).over(
        w.rowsBetween(Long.MinValue, -1)), lit(0L)),
      sum(valueCol))

  private def attach(df: DataFrame, order: Seq[Column], outCol: String,
      localOver: org.apache.spark.sql.expressions.WindowSpec => Column,
      perPartitionTotal: Column): DataFrame = {
    val local = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lv", localOver(
        Window.partitionBy(col("_pid")).orderBy(order: _*)))
    val offsets = local.groupBy(col("_pid"))
      .agg(perPartitionTotal.as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(
        Window.orderBy(col("_pid")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(outCol, col("_lv") + col("_off"))
      .drop("_pid", "_lv")
  }
}
