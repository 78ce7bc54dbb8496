package graft

import org.apache.spark.sql.functions._

/** Scale-stress lab for the bounded-fan-out JOIN family (not part of the
  * driver contract — [[BenchScale]]/[[BenchScaleText]]'s sibling for the
  * bin-replication operators): multiplies the sf inputs `xN` while
  * holding PER-KEY density constant (keys are perturbed with the
  * replica index, the way a larger corpus has more users/docs/vectors,
  * not denser ones), and measures the four operators whose 100 TB story
  * is "blocked equi-join, never a per-key cartesian":
  *
  *  - `Events.rangeJoin`   (events_range_join) — time-binned
  *  - `Events.overlapJoin` (interval_overlap)  — interval-binned
  *  - `Retrieval.nearSearch` (near_search)     — position-binned
  *  - `Similarity.knnJoin` (knn_join)          — IVF-cluster-blocked;
  *    centroid count scales WITH the corpus (fixed centroids over a
  *    growing corpus densify every cluster — the quadratic trap the
  *    IVF layout exists to avoid; at 100 TB centroid count follows
  *    corpus size by construction, so the harness mirrors that)
  *
  *   SPARK_GRAFT_SCALE_X=10 sbt "runMain graft.BenchScaleJoins"
  *
  * Round-9 measurements (sf0.1 base = 100k events / 5k docs / 2k
  * vectors, local[32], seconds):
  *   x1 : range 1.21  overlap 0.79  near 1.28  knn 1.79
  *   x10: range 2.11  overlap 3.28  near 2.42  knn 9.17
  *   x30: range 2.76  overlap 4.01  near 3.75  knn 26.3
  * A 30× input costs ×2.3 (range) to ×5 (overlap/near) wall-clock —
  * fixed job overhead dominates the small end and the per-row cost is
  * flat. knn is ×14.7: candidate-pair count per vector stays bounded
  * by cluster size × nprobe, but the seeded clusters (first-N ids over
  * perturbed replicas) are UNEVEN, and Σ size² grows with skew — the
  * persisted-IVF path (`ann_ivf_index`, true k-means centroids) is the
  * production layout. Still nowhere near the naive quadratic (×900).
  *
  * Round-12 additions (x10 → x30, i.e. 3× input): `hllEstimates`
  * 0.84 → 1.81 s, exact countDistinct 0.33 → 0.80 s, `cusumPeaks`
  * 1.00 → 2.47 s — all linear-or-better in input. Honest reading of
  * hll-vs-exact: at 3 M rows / 300 k distinct the EXACT path is still
  * faster on wall clock — the md5 portability hash costs more per row
  * than the shuffle it saves; the sketch's claim is the 256-byte
  * per-key state bound and flat partial size where exact distinct's
  * first shuffle carries every distinct (key, user) pair (the gap that
  * matters at billions of distincts per key, where the exact path's
  * reducer state is the failure). Swapping md5 for xxhash64 is one
  * line when engine-portability of the registers stops mattering.
  * CUSUM's fold state is HOURS (fixed by the shared time axis), so its
  * cost tracks the hourly-count shuffle, as designed.
  *
  * This harness exposed and fixed three real defects in round 9:
  * AQE's size-based shuffle coalescing serializing the expanding
  * candidate join (fixed with numbered repartitions in knnJoin), the
  * probe crossJoin shuffling N×centroids vector arrays (replaced by the
  * narrow CosineTopClusters reference-object pass), and the 128-key
  * ObjectHashAggregate sort-fallback negating every bounded-heap
  * aggregate (raised in Graft.configure; 24 s → 6.6 s on the x10 knn). */
object BenchScaleJoins {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.localSession("graft-bench-scale-joins", "32")

    val rep = spark.range(mult).select(col("id").as("rep"))

    // events ×N: user key space scales with the input (constant per-key
    // density), ids kept unique
    val ev0 = Graft.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val ev = ev0.crossJoin(rep)
      .select((col("event_id") * mult + col("rep")).as("event_id"),
        (col("user_id") * mult + col("rep")).as("user_id"),
        col("ts"), col("event_type"))
      .persist()
    val nEvents = ev.count()

    val docs0 = Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = docs0.crossJoin(rep)
      .select((col("doc_id") * mult + col("rep")).as("doc_id"), col("text"))
      .persist()
    val nDocs = docs.count()

    val emb0 = Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // replicas are PERTURBED per rep: byte-identical copies would make
    // every centroid replica coincide, ties would collapse assignment
    // onto the lowest-id copies, and cluster sizes would stop being
    // constant (the degenerate skew this harness is not measuring)
    val embs = emb0.crossJoin(rep)
      .select((col("vec_id") * mult + col("rep")).as("vec_id"),
        transform(col("embedding"),
          x => x + col("rep").cast("float") * lit(0.01f)).as("embedding"))
      .persist()
    val nVecs = embs.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // range join: purchases within 24 h after a view, same user
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val (rangeSec, nRange) = timed(
      operators.Events.rangeJoin(views, purchases, "user_id", "ts", "ts",
        windowUs = 24L * 3600 * 1000000,
        leftOut = Seq("view_id"), rightOut = Seq("purchase_id")).count())

    // overlap join: 1 h activity intervals per event vs per-user
    // incident windows
    def us(c: org.apache.spark.sql.Column) =
      unix_micros(c.cast("timestamp_ltz"))
    val spans = ev.select(col("user_id"), col("event_id"),
      us(col("ts")).as("s"), (us(col("ts")) + 3600000000L).as("e"))
    val incidents = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("incident_id"),
        us(col("ts")).as("is_"), (us(col("ts")) + 1800000000L).as("ie"))
    val (overlapSec, nOverlap) = timed(
      operators.Events.overlapJoin(spans, incidents, "user_id",
        "s", "e", "is_", "ie", binUs = 3600000000L,
        leftOut = Seq("event_id", "s", "e"),
        rightOut = Seq("incident_id")).count())

    // positional proximity: two mid-frequency terms within 3 tokens
    val (nearSec, nNear) = timed(
      operators.Retrieval.nearSearch(docs, "text", "doc_id",
        "data", "table", window = 3).count())

    // kNN graph: centroid count ∝ corpus, constant cluster size (see
    // scaladoc)
    val nCentroids = 8L * mult
    val (knnSec, nKnn) = timed(
      operators.Similarity.knnJoin(embs, "vec_id", "embedding",
        centroidIds = 0L until nCentroids, nprobe = 2, k = 3).count())

    // distinct-count at scale: the HLL shuffle is (key, 256-byte
    // register) PARTIALS regardless of user count, where exact
    // countDistinct's first shuffle carries every distinct (key, user)
    // pair — the sketch's claim is the flat shuffle, measure both
    val (hllSec, nHll) = timed(
      operators.Curation.hllEstimates(
        ev.select(col("event_type"), col("user_id").cast("string").as("v")),
        "event_type", "v").count())
    val (exactSec, nExactD) = timed(
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id"))).count())

    // CUSUM: per-key fold state = HOURS in the span (fixed as the corpus
    // multiplies — the replicas share the time axis), not events; the
    // wall cost must track the hourly-count shuffle, not the fold
    val (cusumSec, nCusum) = timed(
      operators.Events.cusumPeaks(ev, "ts", "event_type").count())

    println(s"""{"metric":"scale_joins","x":$mult,""" +
      s""""n_events":$nEvents,"n_docs":$nDocs,"n_vecs":$nVecs,""" +
      s""""range_sec":$rangeSec,"n_range":$nRange,""" +
      s""""overlap_sec":$overlapSec,"n_overlap":$nOverlap,""" +
      s""""near_sec":$nearSec,"n_near":$nNear,""" +
      s""""knn_sec":$knnSec,"n_knn":$nKnn,""" +
      s""""hll_sec":$hllSec,"n_hll":$nHll,""" +
      s""""exact_distinct_sec":$exactSec,"n_exact":$nExactD,""" +
      s""""cusum_sec":$cusumSec,"n_cusum":$nCusum}""")
    spark.stop()
  }
}
