package graft

import org.apache.spark.sql.functions._

/** Scale-stress lab for the text/sketch operator family (not part of
  * the driver contract — [[BenchScale]]'s sibling for the curation
  * side): multiplies the sf documents corpus `xN` with id perturbation
  * and measures the Aho-Corasick scan, the bottom-k quantile sketch,
  * and percentile-bucket scoring at the larger size — the local
  * evidence that the narrow passes scale linearly in corpus bytes and
  * the O(k) sketch aggregations stay flat.
  *
  *   SPARK_GRAFT_SCALE_X=10 sbt "runMain graft.BenchScaleText"
  *
  * Round-8 measurements (sf0.1 base = 5k docs, local[32]):
  *   x1  /   5k docs: scan 0.36 s, sketch 0.98 s, buckets 0.57 s
  *   x10 /  50k docs: scan 0.52 s, sketch 1.13 s, buckets 0.64 s
  *   x30 / 150k docs: scan 0.77 s, sketch 1.26 s, buckets 0.73 s
  * i.e. a 30× corpus costs ~1.3-2× wall-clock at this size (fixed
  * job overhead dominates; the per-row work is a small fraction and
  * grows linearly), and the sketch aggregations are nearly FLAT —
  * their state is k pairs per mapper whatever the input, which is the
  * property the operators' 100 TB claims rest on. */
object BenchScaleText {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.localSession("graft-bench-scale-text", "32")

    val base = Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val docs = base.crossJoin(
        spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"),
        col("text"), col("n_chars"))
      .persist()
    val nDocs = docs.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val patterns = Seq("scan", "can", "table", "able", "merge batch", "as")
    val (scanSec, nHits) = timed(
      operators.TextAnalysis.multiPatternHits(docs, "doc_id", "text",
        patterns).count())
    val (sketchSec, _) = timed(
      operators.Curation.sketchQuantiles(docs, "doc_id", "n_chars",
        k = 256).count())
    val (bucketSec, nRows) = timed(
      operators.Curation.quantileBuckets(docs, "doc_id", "n_chars",
        nBuckets = 10, k = 256).count())

    println(s"""{"metric":"scale_text","x":$mult,"n_docs":$nDocs,""" +
      s""""scan_sec":$scanSec,"n_hits":$nHits,""" +
      s""""sketch_sec":$sketchSec,"bucket_sec":$bucketSec,""" +
      s""""n_bucket_rows":$nRows}""")
    spark.stop()
  }
}
