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

  /** Zone-map catalog of a partitioned parquet store: per data file,
    * the row count and the min/max of `keyCol` read from FOOTER
    * METADATA ONLY — zero data pages touched. The user-facing face of
    * the pruning machinery the serving path already exploits
    * internally: a catalog query ("which buckets could hold key k",
    * "how skewed are bucket row counts") should cost footer reads, not
    * a store scan. Spec-pinned: footer stats ≡ a full data scan, per
    * file.
    *
    * Scale shape: the driver only LISTS files (names, not contents);
    * footers are read ON EXECUTORS, one task per file batch — a store
    * of 10⁵ files costs 10⁵ footer reads spread across the cluster.
    * Requires the key column to carry parquet min/max statistics
    * (graft store copies always do). Row-group bounds merge in the
    * column's TYPED order (Binary/Long/...), then render to strings —
    * a lexicographic merge would corrupt numeric keys ("100" < "99").
    * Output: `(file, n_rows, min_key, max_key)`. */
  def zoneMap(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        files += f.getPath.toString
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val bc = spark.sparkContext.broadcast(serConf)
    val rows = spark.sparkContext
      .parallelize(files.toSeq.sorted,
        math.max(1, math.min(files.size, 64)))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), bc.value.value)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala
          var n = 0L
          // merge row-group bounds in the column's OWN order (typed
          // Comparable — Binary/Long/Int/...), never lexicographically:
          // string-comparing "100" < "99" would corrupt numeric keys
          var mnV: AnyRef = null
          var mxV: AnyRef = null
          var render: AnyRef => String = _.toString
          def cmp(a: AnyRef, b: AnyRef): Int =
            a.asInstanceOf[Comparable[AnyRef]].compareTo(b)
          blocks.foreach { b =>
            n += b.getRowCount
            b.getColumns.asScala
              .filter(_.getPath.toDotString == keyCol)
              .foreach { c =>
                val st = c.getStatistics
                if (st != null && st.hasNonNullValue) {
                  val lo = st.genericGetMin.asInstanceOf[AnyRef]
                  val hi = st.genericGetMax.asInstanceOf[AnyRef]
                  render = {
                    case bin: org.apache.parquet.io.api.Binary =>
                      bin.toStringUsingUTF8
                    case other => other.toString
                  }
                  if (mnV == null || cmp(lo, mnV) < 0) mnV = lo
                  if (mxV == null || cmp(hi, mxV) > 0) mxV = hi
                }
              }
          }
          (f, n,
            if (mnV == null) null else render(mnV),
            if (mxV == null) null else render(mxV))
        } finally reader.close()
      }
    spark.createDataFrame(rows)
      .toDF("file", "n_rows", "min_key", "max_key")
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
