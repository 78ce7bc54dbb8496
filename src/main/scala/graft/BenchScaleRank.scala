package graft

import org.apache.spark.sql.functions._

/** Scale-stress lab for [[operators.DistributedOrder.withGroupRank]]
  * (not part of the driver contract — the [[BenchScale]] /
  * [[BenchScaleJoins]] sibling for the grouped order engine): ranks a
  * wide frame within a handful of data-sized groups two ways —
  *
  *  - the grouped order engine (range shuffle on (group, order keys),
  *    per-(partition, group) local windows, broadcast offsets), and
  *  - the textbook `Window.partitionBy(group)` formulation, which
  *    hash-routes each ENTIRE group into one task — with 5 groups on
  *    32 cores, 27 cores idle while 5 tasks sort 1/5 of the data each.
  *
  * The few-huge-groups regime is exactly the multi-source corpus shape
  * `rank_normalize` runs on (rank-per-source over a 100 TB corpus with
  * a handful of sources). Both paths compute identical ranks (asserted
  * per run on the max, and property-pinned exhaustively in
  * CurationSpec).
  *
  *   SPARK_GRAFT_RANK_N=4000000 SPARK_GRAFT_RANK_G=5 \
  *     sbt "runMain graft.BenchScaleRank"
  */
object BenchScaleRank {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_RANK_N", "4000000").toLong
    val groups = sys.env.getOrElse("SPARK_GRAFT_RANK_G", "5").toInt
    val spark = Graft.localSession("graft-bench-scale-rank", "32")
    val rows = spark.range(n).select(
        concat(lit("g"), col("id") % groups).as("g"),
        md5(col("id").cast("string")).as("v"), col("id"))
      .localCheckpoint(true)
    def time(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale-rank] $tag: $sec%.2f s (max rank $r)")
      require(r == (n + groups - 1) / groups ||
        n % groups == 0 && r == n / groups,
        s"rank must be the largest group size, got $r")
      sec
    }
    val engine = time("grouped-order engine") {
      operators.DistributedOrder.withGroupRank(rows, "r", Seq("g"),
          col("v").asc, col("id").asc)
        .agg(max(col("r"))).head().getLong(0)
    }
    val trap = time("Window.partitionBy trap") {
      import org.apache.spark.sql.expressions.Window
      rows.withColumn("r", row_number().over(
          Window.partitionBy(col("g"))
            .orderBy(col("v").asc, col("id").asc)).cast("long"))
        .agg(max(col("r"))).head().getLong(0)
    }
    println(f"""{"metric":"scale_rank","n":$n,"groups":$groups,"engine_sec":$engine%.2f,"window_sec":$trap%.2f}""")
    spark.stop()
  }
}
