package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the link-authority side of
  * corpus curation (rank hosts/documents by reference structure before
  * sampling). Companion to the pair-graph machinery in [[Dedup]]
  * (connected components / label propagation); this file holds the
  * fixed-iteration numeric walks.
  *
  * Determinism: all arithmetic is exact-integer (scaled ranks, `div`
  * divisions, long sums — order-independent), so every engine computes
  * the identical fixed point prefix. That is what makes a hash-stable
  * DuckDB oracle possible where float PageRank would drift.
  */
object Graphs {

  /** Fixed-iteration integer PageRank.
    *
    * Semantics: ranks are scaled to `scale` (sum ≈ scale before dangling
    * loss); per round,
    * `pr'(v) = (scale·(100−dampPct)/100) div N + (dampPct · Σ_{u→v} pr(u) div outdeg(u)) div 100`.
    * Parallel edges are collapsed (DISTINCT); dangling nodes (no
    * out-edges) simply drop their mass each round — the common
    * simplification, documented rather than hidden, and exactly what the
    * oracle mirrors. Ranks are relative ordering signals; absolute mass
    * conservation is not needed for ranking.
    *
    * Scale shape per round: one equi-join of the (persisted,
    * degree-annotated) edge list against the current rank vector + one
    * map-side-combined sum to in-neighbors — the canonical PageRank
    * shuffle pair, cost linear in |E|. The rank vector is eagerly
    * checkpointed each round so lineage stays flat over any iteration
    * count. At 100 TB-of-edges scale, pre-partition the edge list by
    * `src` once (bucketed table) and both joins co-locate; no step here
    * collects more than scalars to the driver.
    *
    * `checkpointDir` picks the lineage-cut durability trade:
    * None (default) = `localCheckpoint` — blocks live on executors, no
    * extra I/O, right for local mode and short interactive runs, but an
    * executor loss mid-iteration kills the job unrecoverably (the blocks
    * are the ONLY copy of the rank vector). Some(dir) = reliable
    * `checkpoint` to that directory (HDFS/object store on a real
    * cluster) — each round pays a durable write, and the job survives
    * executor loss; the right setting for long iterative jobs at cluster
    * scale. CAVEATS of Some(dir): `setCheckpointDir` is SESSION-GLOBAL
    * (later checkpointing jobs in the same session inherit it), and
    * Spark does not delete reliable checkpoint files by default — clean
    * the directory after the job, or run with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
    *
    * `seeds` switches to SEEDED (personalized) PageRank — the TrustRank
    * construction (Gyöngyi et al. 2004): teleport mass lands only on the
    * seed set instead of uniformly, so rank measures authority AS SEEN
    * FROM trusted nodes — the standard link-spam demotion signal (spam
    * farms rank each other, but cannot attract trust flow from seeds).
    * Initial mass likewise starts on the seeds. Duplicate seed ids are
    * collapsed; a seed id absent from the graph simply never receives
    * its share (mass lost — the dangling stance, and the oracle mirrors
    * it because its node set lacks the id too). */
  /** Run `body` with adaptive execution OFF and the shuffle width
    * pinned (both restored after) — the iterative-loop execution
    * contract every round-checkpointing walk here shares. AQE buys an
    * iterative loop nothing (each round is a fresh small query over
    * checkpointed inputs) and actively costs it the ONE thing that
    * matters at scale: a checkpoint taken under AQE records
    * `UnknownPartitioning` (the adaptive plan's output partitioning is
    * unknown at plan time), so every round re-shuffles the big reused
    * frames — measured: a PageRank round executes 4 exchanges
    * (edge-list sized) under AQE and exactly 1 (the node-sized dst
    * transpose) with AQE off and all widths aligned. Width alignment
    * is load-bearing: a reused frame checkpointed at width W co-locates
    * with round exchanges only when they also run at W.
    *
    * Session-conf save/restore is visible to concurrent queries on the
    * SAME SparkSession for the duration of the loop — run iterative
    * graph jobs on their own session (`spark.newSession()`) when
    * sharing a session with latency-sensitive queries. */
  private[operators] def pinnedLoop[T](
      spark: org.apache.spark.sql.SparkSession, width: Int)(body: => T): T = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val sp = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", width.toString)
    try body
    finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.shuffle.partitions", sp)
    }
  }

  def pageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampPct: Int = 85,
      scale: Long = 1000000000L,
      checkpointDir: Option[String] = None,
      seeds: Seq[Long] = Seq.empty): DataFrame =
    pinnedLoop(edges0.sparkSession,
      edges0.sparkSession.sessionState.conf.numShufflePartitions) {
      pageRankBody(edges0, srcCol, dstCol, iters, dampPct, scale,
        checkpointDir, seeds)
    }

  private def pageRankBody(edges0: DataFrame, srcCol: String,
      dstCol: String, iters: Int, dampPct: Int, scale: Long,
      checkpointDir: Option[String], seeds: Seq[Long]): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct in [0,100], got $dampPct")
    require(scale % 100 == 0, s"scale must be divisible by 100, got $scale")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val edges = edges0
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
    // the seed flag rides the node table (computed once, reused every
    // round): a broadcast join, NOT an isin literal — a real trust seed
    // set is 10⁴-10⁶ hosts, and an In-expression that size bloats the
    // plan and falls out of codegen. Duplicate seed ids are collapsed
    // BEFORE sizing the teleport shares, or each duplicate would
    // silently shrink every share.
    val seedIds = seeds.distinct
    val nodesBase = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    // explicit (id)-repartition before the cut: the checkpoint records
    // this HashPartitioning (AQE is off under pinnedLoop) and every
    // round's node-side join co-locates against it for free
    val nodes = cut(
      (if (seedIds.isEmpty) nodesBase.withColumn("is_seed", lit(true))
      else {
        val seedsDf = edges0.sparkSession
          .createDataset(seedIds)(org.apache.spark.sql.Encoders.scalaLong)
          .toDF("id").withColumn("s", lit(true))
        nodesBase.join(broadcast(seedsDf), Seq("id"), "left")
          .select(col("id"), coalesce(col("s"), lit(false)).as("is_seed"))
      }).repartition(col("id")))
      // the per-round left join re-reads it
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    // quantization floor: initial ranks are scale/n and the teleport
    // term is basePart/n — if either truncates toward 0, rank mass
    // vanishes within a round or two and the ordering is garbage with
    // no error. Rather than cliff-failing on big graphs at the default
    // scale, raise it deterministically to keep ≥ 1000 units/node
    // (rounded up to a multiple of 100 so the damping split stays
    // exact); the effective scale is a pure function of (scale, n), so
    // results remain engine- and rerun-stable.
    val effScale =
      if (scale / n >= 1000) scale
      else ((1000L * n + 99) / 100) * 100
    // (src)-partitioned at the pinned width: the per-round edge⋈rank
    // join reuses it — the edge list NEVER re-shuffles after this cut
    // (the pinnedLoop contract; 4 exchanges/round → 1 measured)
    val withDeg = cut(edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")))
      // reused every round: pay the join once
    val basePart = effScale / 100 * (100 - dampPct)
    // teleport targets: everyone (uniform) or the seed set (TrustRank).
    // Long division on constants matches the SQL `div` the oracle uses.
    val nTele = if (seedIds.isEmpty) n else seedIds.size.toLong
    var pr = nodes.select(col("id"),
      when(col("is_seed"), lit(effScale / nTele)).otherwise(lit(0L))
        .as("pr"))
    for (_ <- 1 to iters) {
      pr = cut(pageRankRound(nodes, withDeg, pr, dampPct, basePart, nTele))
    }
    pr
  }

  /** One PageRank round over checkpointed loop state — package-visible
    * so PlanSpec can pin its shuffle budget on the EXECUTED plan (the
    * [[graft.operators.Dedup.starRound]] discipline): one edge⋈rank
    * equi-join + one map-side-combined sum + the node-table left join,
    * nothing that grows with the iteration count. */
  private[graft] def pageRankRound(nodes: DataFrame, withDeg: DataFrame,
      pr: DataFrame, dampPct: Int, basePart: Long,
      nTele: Long): DataFrame = {
    val contrib = withDeg.join(pr, col("src") === col("id"))
      .select(col("dst"), expr("pr div outdeg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("c"))
    nodes.join(contrib, nodes("id") === contrib("dst"), "left")
      .select(col("id"),
        (when(col("is_seed"), lit(basePart / nTele)).otherwise(lit(0L)) +
          expr(s"($dampPct * coalesce(c, CAST(0 AS BIGINT))) div 100"))
          .as("pr"))
  }

  /** Canonical undirected simple-graph edge list shared by the
    * degree-based operators: self-loops dropped, parallel edges and both
    * directions collapsed to one `(a, b) = (min, max)` edge. ONE
    * definition so a semantics change (e.g. null-endpoint policy)
    * reaches every operator at once. */
  private def canonicalEdges(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges0
      .select(col(srcCol).cast("long").as("x"),
        col(dstCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()

  /** Per-node degree of a canonical edge list (map-side-combined). */
  private def degreesOf(e: DataFrame): DataFrame =
    e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).cast("long").as("deg"))

  /** Fixed-round k-core peeling — the degeneracy-based denoising step of
    * graph curation (keep only nodes embedded in a dense-enough
    * neighborhood; peel away the low-degree fringe that dominates raw
    * crawl graphs).
    *
    * Semantics: undirected simple graph (canonicalized like
    * [[triangleCounts]]); each round removes every node whose CURRENT
    * degree is below `k` and drops its edges, `rounds` times. Output is
    * `(id, deg)` for every node still present after the last peel, with
    * its post-peel degree. The true k-core is the fixed point; a fixed
    * round count is the deterministic prefix (same stance as
    * [[pageRank]]'s fixed iterations — an oracle can mirror R rounds
    * exactly, where "loop until converged" would make the gate depend on
    * engine iteration order). Callers wanting the fixed point raise
    * `rounds` until the output stops changing between two calls.
    *
    * Scale shape per round: one map-side-combined degree aggregation +
    * two LEFT SEMI equi-joins of the edge list against the ≥k node set —
    * all linear in surviving edges, no products, lineage cut per round
    * (`checkpointDir` trade documented at [[pageRank]]). Deliberately
    * NOT under [[pinnedLoop]]: the edge set itself mutates every round
    * (peeling) and the two semi-joins key on different columns, so
    * there is no stable frame whose partitioning a pin could reuse. */
  def kcorePeel(edges0: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    var e = cut(canonicalEdges(edges0, srcCol, dstCol))
    for (_ <- 1 to rounds) {
      e = cut(kcoreRound(e, k))
    }
    degreesOf(e)
  }

  /** One k-core peel round over a checkpointed edge frame —
    * package-visible so PlanSpec can pin its shuffle budget on the
    * EXECUTED plan: one map-side-combined degree aggregation + two
    * left-semi equi-joins, linear in surviving edges. */
  private[graft] def kcoreRound(e: DataFrame, k: Int): DataFrame = {
    val keep = degreesOf(e).filter(col("deg") >= k).select(col("id"))
    e.join(keep.select(col("id").as("a")), Seq("a"), "leftsemi")
      .join(keep.select(col("id").as("b")), Seq("b"), "leftsemi")
  }

  /** Fixed-round multi-source BFS hop distances — the reachability /
    * seed-proximity signal of corpus curation (how many link hops is a
    * page from a trusted seed set; the discrete companion to
    * [[pageRank]]'s `seeds` teleport vector).
    *
    * Semantics: `dist(v)` = the minimum number of edge hops from any seed
    * to `v`, computed for `rounds` expansion rounds — nodes first reached
    * in round r get `dist = r`; nodes not reached within `rounds` are
    * absent from the output (callers left-join and treat null as
    * "farther than rounds"). Seeds themselves are at distance 0, whether
    * or not they appear in the edge list (a seed is trivially reachable
    * from itself). `directed = false` (the default) walks edges both
    * ways. Duplicate seed ids are collapsed.
    *
    * Scale shape: textbook frontier iteration — per round ONE equi-join
    * of the current frontier against the (persisted) adjacency list, one
    * DISTINCT, and one LEFT ANTI join against the visited set; cost is
    * proportional to the edges incident to the frontier, not to the
    * whole graph, and every step is a shuffle equi-join (nothing
    * broadcasts a growing set, nothing collects). Lineage is cut per
    * round; the `checkpointDir` durability trade is documented at
    * [[pageRank]]. */
  def bfsDistances(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[Long], rounds: Int = 3, directed: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame =
    pinnedLoop(edges0.sparkSession,
      edges0.sparkSession.sessionState.conf.numShufflePartitions) {
      bfsDistancesBody(edges0, srcCol, dstCol, seeds, rounds, directed,
        checkpointDir)
    }

  /** Canonical (src)-partitioned adjacency at the pinned width — the
    * shared front half of every frontier-walk ([[bfsDistances]],
    * [[closenessFromSeeds]]): self-loops dropped, optionally
    * symmetrized, checkpointed once so the per-round frontier⋈adjacency
    * join reuses the partitioning and the adjacency NEVER re-shuffles
    * (the pinnedLoop contract); only the frontier side exchanges per
    * round. */
  private def pinnedAdjacency(edges0: DataFrame, srcCol: String,
      dstCol: String, directed: Boolean,
      cut: DataFrame => DataFrame): DataFrame = {
    val fwd = edges0
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
    cut(
      (if (directed) fwd
       else fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))
        .filter(col("src") =!= col("dst")).distinct()
        .repartition(col("src")))
  }

  private def bfsDistancesBody(edges0: DataFrame, srcCol: String,
      dstCol: String, seeds: Seq[Long], rounds: Int, directed: Boolean,
      checkpointDir: Option[String]): DataFrame = {
    require(seeds.nonEmpty, "bfsDistances: empty seed set")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val adj = pinnedAdjacency(edges0, srcCol, dstCol, directed, cut)
    val spark = edges0.sparkSession
    var dist = spark
      .createDataset(seeds.distinct)(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("id").withColumn("dist", lit(0L))
    var frontier = dist.select(col("id"))
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val next = cut(frontier
        .join(adj, frontier("id") === adj("src"))
        .select(col("dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("dist", lit(r.toLong)))
      // early out on an empty frontier: the remaining rounds cannot add
      // nodes, and each would still cost a full join over the adjacency
      if (next.isEmpty) exhausted = true
      else {
        dist = cut(dist.union(next))
        frontier = next.select(col("id"))
      }
      r += 1
    }
    dist
  }

  /** Seed-set closeness/harmonic centrality via MULTI-SOURCE BFS: per
    * node, how many of the `seeds` reach it within `rounds` hops, the
    * total hop distance, and the harmonic sum — the landmark-based
    * centrality estimate (exact closeness is all-pairs; every practical
    * system samples landmark sources — this is that operator, exact
    * over the chosen landmarks). Harmonic form handles disconnection
    * (unreached seeds contribute 0 rather than ∞):
    * `harmonic_milli = Σ_{0<dist} 1000 div dist` — the per-term floor
    * is the documented fixed-point semantics, oracle-mirrored.
    *
    * Scale shape: ONE frontier frame keyed (seed, id) walks all seeds
    * simultaneously — k seeds cost one loop, not k loops; per round one
    * frontier-sized exchange against the never-re-shuffled adjacency
    * ([[pinnedAdjacency]], pinnedLoop width), lineage cut per round,
    * early-out on an exhausted frontier. State is (reached pairs), at
    * most |seeds|·|V| — choose landmark counts accordingly (the
    * standard trade; 16–64 landmarks rank well in practice). */
  def closenessFromSeeds(edges0: DataFrame, srcCol: String,
      dstCol: String, seeds: Seq[Long], rounds: Int = 3,
      directed: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame =
    pinnedLoop(edges0.sparkSession,
      edges0.sparkSession.sessionState.conf.numShufflePartitions) {
      closenessBody(edges0, srcCol, dstCol, seeds, rounds, directed,
        checkpointDir)
    }

  private def closenessBody(edges0: DataFrame, srcCol: String,
      dstCol: String, seeds: Seq[Long], rounds: Int, directed: Boolean,
      checkpointDir: Option[String]): DataFrame = {
    require(seeds.nonEmpty, "closenessFromSeeds: empty seed set")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val adj = pinnedAdjacency(edges0, srcCol, dstCol, directed, cut)
    val spark = edges0.sparkSession
    var dist = spark
      .createDataset(seeds.distinct)(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("seed")
      .select(col("seed"), col("seed").as("id"), lit(0L).as("dist"))
    var frontier = dist.select(col("seed"), col("id"))
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val next = cut(closenessRound(adj, dist, frontier, r.toLong))
      if (next.isEmpty) exhausted = true
      else {
        dist = cut(dist.union(next))
        frontier = next.select(col("seed"), col("id"))
      }
      r += 1
    }
    dist.groupBy(col("id"))
      .agg(count(lit(1)).as("n_seeds_reached"),
        sum(col("dist")).as("total_dist"),
        sum(when(col("dist") > 0L, expr("1000 div dist"))
          .otherwise(0L)).as("harmonic_milli"))
  }

  /** Bounded weighted shortest paths (Bellman–Ford prefix) from a
    * source set: after `rounds` relaxations, `dist(v)` = the cheapest
    * path from any source using AT MOST `rounds` edges — the weighted
    * answer [[bfsDistances]] (hop counts) and [[closenessFromSeeds]]
    * (landmarks) cannot give, for cost-bearing graphs (latency maps,
    * toll routing, weighted citation chains). Weights are integer ≥ 0;
    * parallel edges collapse to their MINIMUM weight; the k-edge
    * truncation is the documented semantics (and exactly what the
    * unrolled oracle computes), not an approximation of something else.
    *
    * Scale shape: per round ONE equi-join of the (pinned, min-collapsed)
    * adjacency against the current distance vector + one
    * map-side-combined min — the pageRank shuffle pair, linear in |E|;
    * lineage cut per round under the pinnedLoop width contract. */
  def shortestPaths(edges0: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: Seq[Long], rounds: Int = 3,
      directed: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame =
    pinnedLoop(edges0.sparkSession,
      edges0.sparkSession.sessionState.conf.numShufflePartitions) {
      shortestPathsBody(edges0, srcCol, dstCol, weightCol, sources,
        rounds, directed, checkpointDir)
    }

  private def shortestPathsBody(edges0: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, sources: Seq[Long], rounds: Int,
      directed: Boolean, checkpointDir: Option[String]): DataFrame = {
    require(sources.nonEmpty, "shortestPaths: empty source set")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val fwd = edges0.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(weightCol).cast("long").as("w"))
    val adj = cut(
      (if (directed) fwd
       else fwd.union(fwd.select(col("dst").as("src"),
         col("src").as("dst"), col("w"))))
        .filter(col("src") =!= col("dst") && col("w").isNotNull &&
          col("w") >= 0L)
        .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
        .repartition(col("src")))
    val spark = edges0.sparkSession
    var dist = spark
      .createDataset(sources.distinct)(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("id").withColumn("dist", lit(0L))
    var r = 1
    while (r <= rounds) {
      dist = cut(ssspRound(adj, dist))
      r += 1
    }
    dist
  }

  /** One multi-source frontier expansion — exposed so PlanSpec can pin
    * the round body's runtime shuffle budget (the r13 drift lesson). */
  private[graft] def closenessRound(adj: DataFrame, dist: DataFrame,
      frontier: DataFrame, round: Long): DataFrame =
    frontier.join(adj, frontier("id") === adj("src"))
      .select(col("seed"), col("dst").as("id")).distinct()
      .join(dist, Seq("seed", "id"), "left_anti")
      .withColumn("dist", lit(round))

  /** One min-plus relaxation — exposed so PlanSpec can pin the round
    * body's runtime shuffle budget (the r13 drift lesson). */
  private[graft] def ssspRound(adj: DataFrame, dist: DataFrame): DataFrame = {
    val cand = dist.join(adj, dist("id") === adj("src"))
      .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
    dist.union(cand).groupBy(col("id")).agg(min(col("dist")).as("dist"))
  }

  /** Fixed-round synchronous label propagation — community detection
    * over an undirected simple graph (mirror farms, boilerplate rings
    * and topic clusters surface as label-consensus groups; the
    * community-structure companion to [[triangleCounts]]' local density
    * and [[kcorePeel]]'s degeneracy).
    *
    * Semantics: every node starts with its own id as label; each round,
    * SYNCHRONOUSLY, every node adopts the most frequent label among its
    * neighbors' previous-round labels, ties broken by the SMALLEST
    * label — a total order, so the result is a pure function of the
    * graph (classic async LPA is visit-order-dependent and would be
    * un-oracle-able). Output is `(id, label)` for every node with at
    * least one edge after canonicalization ([[canonicalEdges]] drops
    * self-loops and parallel edges).
    *
    * Fixed `rounds` is the deterministic prefix of the fixed point, the
    * same stance as [[pageRank]] / [[kcorePeel]] (synchronous LPA can
    * 2-cycle on bipartite structures, so "until converged" is not even
    * well-defined). Scale shape per round: one equi-join of the
    * adjacency against the label vector + one (node, label) count + one
    * arg-max aggregation — all map-side-combinable shuffle equi-joins
    * linear in |E|; the arg-max is `max(struct(n, -label))`, a single
    * aggregate, never a window sort. Lineage cut per round;
    * `checkpointDir` as at [[pageRank]]. */
  def labelPropagation(edges0: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 2,
      checkpointDir: Option[String] = None): DataFrame =
    pinnedLoop(edges0.sparkSession,
      edges0.sparkSession.sessionState.conf.numShufflePartitions) {
      labelPropagationBody(edges0, srcCol, dstCol, rounds, checkpointDir)
    }

  private def labelPropagationBody(edges0: DataFrame, srcCol: String,
      dstCol: String, rounds: Int,
      checkpointDir: Option[String]): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val e = canonicalEdges(edges0, srcCol, dstCol)
    // (nbr)-partitioned at the pinned width: every round's
    // adjacency⋈label join reuses it — the adjacency never re-shuffles
    // (the pinnedLoop contract), and the label side arrives partitioned
    // by its own id (= the join key) from the previous round's arg-max
    val adj = cut(e.select(col("a").as("id"), col("b").as("nbr"))
      .union(e.select(col("b").as("id"), col("a").as("nbr")))
      .repartition(col("nbr")))
    var lab = adj.select(col("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to rounds) {
      lab = cut(lpaRound(adj, lab))
    }
    lab
  }

  /** One label-propagation round over checkpointed loop state —
    * package-visible so PlanSpec can pin its shuffle budget on the
    * EXECUTED plan: one adjacency⋈label equi-join + two
    * map-side-combined aggregations (neighbor-label count, then the
    * per-node arg-max), linear in |E|. Arg-max by (count, -label):
    * struct ordering is field-by-field, so max picks the highest count
    * and, among ties, the SMALLEST label. (-label overflows only at
    * Long.MinValue — not a node id that survives `canonicalEdges`'
    * arithmetic anyway.) */
  private[graft] def lpaRound(adj: DataFrame, lab: DataFrame): DataFrame = {
    val nbrLab = adj
      .join(lab.select(col("id").as("nbr"), col("label")), "nbr")
      .groupBy(col("id"), col("label")).agg(count(lit(1)).as("n"))
    nbrLab
      .groupBy(col("id"))
      .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("top"))
      .select(col("id"), (-col("top.neg")).as("label"))
  }

  /** Fixed-round integer HITS (Kleinberg 1999) — hubs and authorities
    * over a DIRECTED edge list: a good hub points at good authorities,
    * a good authority is pointed at by good hubs. The two-sided
    * companion to [[pageRank]]'s single authority walk — on link graphs
    * it separates directories/portals (hubs) from endorsed content
    * (authorities); on a bipartite interaction graph (customer→supplier,
    * user→domain) it scores the two sides against each other.
    *
    * Semantics per round: `auth'(v) = Σ_{u→v} hub(u)`, then auth
    * renormalizes to sum `scale` by exact integer division
    * (`raw·scale div Σraw` — the L1 normalization; classic HITS uses
    * L2, which needs a square root and would not be bit-portable);
    * `hub'(u) = Σ_{u→v} auth(v)` likewise renormalized. Parallel edges
    * collapse (DISTINCT); nodes without in-edges hold authority 0,
    * without out-edges hub 0. Fixed `rounds` is the deterministic
    * prefix of the fixed point ([[pageRank]]'s stance). Output:
    * `(id, hub, auth)` for every node.
    *
    * Exactness: sums of longs and a DECIMAL(38,0) multiply-then-`div`
    * for the normalization — the renormalized scores are a pure
    * integer function of the graph, so a DuckDB oracle (HUGEINT
    * arithmetic) matches bit-for-bit; truncation loss just leaves the
    * total a hair under `scale`, identically in every engine.
    *
    * Scale shape per round: two {equi-join against the persisted edge
    * list + map-side-combined sum} passes — the same shuffle profile as
    * one PageRank round, cost linear in |E| — plus a 1-row total
    * BROADCAST cross join for the normalization (the total stays in the
    * plan; nothing collects to the driver). Lineage cut per round;
    * `checkpointDir` durability trade as documented at [[pageRank]]. */
  def hits(edges0: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 2, scale: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame =
    pinnedLoop(edges0.sparkSession,
      edges0.sparkSession.sessionState.conf.numShufflePartitions) {
      hitsBody(edges0, srcCol, dstCol, rounds, scale, checkpointDir)
    }

  private def hitsBody(edges0: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, scale: Long,
      checkpointDir: Option[String]): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(scale >= 1000 && scale <= 1000000000L,
      s"scale in [1e3, 1e9], got $scale")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    // HITS alternates the join key (auth gathers over src, hub over
    // dst), so ONE edge partitioning cannot serve both half-rounds —
    // keep both orientations checkpointed (the adjacency-both-ways
    // move labelPropagation already makes) and neither ever
    // re-shuffles (the pinnedLoop contract). The dst copy derives from
    // the src copy's checkpoint blocks: one extra setup exchange
    // instead of a third full materialization of the deduped edges.
    val edgesBySrc = cut(edges0
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct().repartition(col("src")))
    val edgesByDst = cut(edgesBySrc.repartition(col("dst")))
    val nodes = cut(edgesBySrc.select(col("src").as("id"))
      .union(edgesBySrc.select(col("dst").as("id"))).distinct()
      .repartition(col("id")))
    var hub = cut(nodes.select(col("id"), lit(scale).as("hub")))
    var auth: DataFrame = null // rounds >= 1: assigned every round
    // The RAW gather is cut before normalizing: `total` and the scores
    // both read it, and without the cut that subtree (an |E|-sized join
    // + aggregation) would execute twice per half-round
    for (_ <- 1 to rounds) {
      auth = hitsNormalize(
        cut(hitsGather(nodes, edgesBySrc, hub, "hub", "src", "dst")),
        scale, "auth")
      hub = hitsNormalize(
        cut(hitsGather(nodes, edgesByDst, auth, "auth", "dst", "src")),
        scale, "hub")
    }
    hub.join(auth, "id")
  }

  /** HITS half-round, gather side: raw Σ over the edge list, 0 for
    * nodes the join misses — package-visible so PlanSpec can pin its
    * shuffle budget on the EXECUTED plan: one edge⋈score equi-join +
    * one map-side-combined sum + the node-table left join, the same
    * profile as one PageRank round. */
  private[graft] def hitsGather(nodes: DataFrame, edges: DataFrame,
      score: DataFrame, scoreCol: String, from: String,
      to: String): DataFrame =
    nodes.join(
      edges.join(score, col(from) === score("id"))
        .select(col(to), col(scoreCol))
        .groupBy(col(to)).agg(sum(col(scoreCol)).as("raw")),
      nodes("id") === col(to), "left")
      .select(nodes("id"), coalesce(col("raw"), lit(0L)).as("raw"))

  /** HITS half-round, normalize side over the CHECKPOINTED raw gather:
    * renormalize to sum ≈ scale with a DECIMAL(38,0) multiply then
    * integer div — overflow-free for any graph size, and the 1-row
    * total rides the plan as a BROADCAST, not a driver collect.
    * Package-visible so PlanSpec can pin: zero data shuffles (the only
    * exchange is the 1-row broadcast). */
  private[graft] def hitsNormalize(raw: DataFrame, scale: Long,
      outCol: String): DataFrame = {
    val total = raw.agg(sum(col("raw")).as("t"))
    raw.crossJoin(broadcast(total))
      .select(col("id"),
        when(col("t").isNull || col("t") === 0L, lit(0L))
          .otherwise(expr(
            s"cast(cast(raw as decimal(38,0)) * $scale div t as bigint)"))
          .as(outCol))
  }

  /** Skip-gram pair counts from a walk corpus — the step between
    * [[randomWalks]] and an embedding trainer (DeepWalk trains
    * word2vec on exactly these (center, context) pairs): for every
    * walk sequence, each ordered pair of nodes within `window` steps
    * of each other counts once. Symmetric by construction (both
    * directions emit). Only SAME-POSITION pairing is excluded (offset
    * 0): a walk that backtracks (1→2→1, routine on an undirected
    * graph) legitimately emits node_a == node_b at distance 2 —
    * exactly as word2vec emits (w, w) for a word repeated within a
    * text window. Filter `node_a =!= node_b` downstream if a trainer
    * wants the diagonal gone.
    *
    * Scale shape: each walk row fans out to ≤ 2·window context
    * PROBES (an explode of step offsets — never a self-join on an
    * inequality), which resolve through ONE (start, walk, step)
    * equi-join against the corpus; the pair count folds map-side to
    * the distinct-pair frame. Output: `(node_a, node_b, n_pairs)`. */
  def skipGramPairs(walks: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val offsets = (-window to window).filter(_ != 0).map(d => lit(d.toLong))
    val probes = walks.select(col("start"), col("walk"),
      col("node").as("node_a"),
      explode(array(offsets: _*)).as("_d"),
      col("step").as("_s"))
      .select(col("start"), col("walk"), col("node_a"),
        (col("_s") + col("_d")).as("step"))
    probes.join(walks.select(col("start"), col("walk"), col("step"),
        col("node").as("node_b")),
        Seq("start", "walk", "step"))
      .groupBy(col("node_a"), col("node_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Newman modularity of a community assignment — the quality score
    * that makes [[labelPropagation]]'s output judgeable (communities
    * are only as good as "more intra-edges than a degree-preserving
    * random graph would give"; Q ∈ [−0.5, 1), > ~0.3 is real
    * structure): `Q = Σ_c [e_c/m − (d_c/2m)²]` over the canonical
    * undirected simple graph — computed EXACTLY as
    * `q_micro = Σ_c (4·m·e_c − d_c²) · 10⁶ div (4·m²)` in
    * DECIMAL(38) (Q can be negative: the div truncates toward zero,
    * the one negative-division semantics both engines share — the
    * [[Curation.raterAgreement]] stance). Edges with either endpoint
    * unlabeled count toward m and degrees but no community (partial
    * labelings score what they cover; dropping the edges would
    * flatter them).
    *
    * Scale shape: one canonical-edge pass, two label equi-joins
    * (node-sized label side), then everything folds map-side to
    * |communities| rows before one tiny total. Output one row:
    * `(n_edges, n_communities, q_micro)`; an empty graph scores
    * NULL. */
  def modularity(edges0: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val canon = canonicalEdges(edges0, srcCol, dstCol)
      .localCheckpoint(false) // feeds m, e_c, and the degree fold
    val lab = labels.select(col(idCol).as("_lid"),
      col(labelCol).as("_lab"))
    val labeled = canon
      .join(lab.withColumnRenamed("_lab", "_la"),
        canon("a") === lab("_lid"), "left").drop("_lid")
      .join(lab.withColumnRenamed("_lab", "_lb"),
        col("b") === lab("_lid"), "left").drop("_lid")
    val ec = labeled
      .filter(col("_la").isNotNull && col("_la") === col("_lb"))
      .groupBy(col("_la").as("_c")).agg(count(lit(1)).as("_e"))
    val dc = canon.select(explode(array(col("a"), col("b"))).as("_id"))
      .groupBy(col("_id")).agg(count(lit(1)).as("_d"))
      .join(lab, col("_id") === col("_lid"))
      .groupBy(col("_lab").as("_c")).agg(sum(col("_d")).as("_dc"))
    val m = canon.agg(count(lit(1)).as("_m"))
    dc.join(ec, Seq("_c"), "left")
      .select(col("_c"), coalesce(col("_e"), lit(0L)).as("_e"),
        col("_dc"))
      .crossJoin(m)
      .agg(first(col("_m")).as("n_edges"),
        count(lit(1)).as("n_communities"),
        sum(expr("4 * cast(_m as decimal(38,0)) * _e - " +
          "cast(_dc as decimal(38,0)) * _dc")).as("_num"))
      .select(col("n_edges"), col("n_communities"),
        when(col("n_edges") > 0L,
          expr("cast(_num * 1000000 div " +
            "(4 * cast(n_edges as decimal(38,0)) * n_edges) as bigint)"))
          .as("q_micro"))
  }

  /** Deterministic "random" walks — the DeepWalk/node2vec corpus
    * generator (walk sequences feed a skip-gram embedder exactly like
    * sentences feed word2vec; Perozzi et al., KDD'14): `walksPerNode`
    * walks start at EVERY node and take up to `steps` steps; at each
    * step the walker at `u` moves to the out-neighbor `v` minimizing
    * `md5(start:walk:step:v)` — hash-uniform over the neighbor set,
    * fully deterministic (same graph → same corpus on any cluster, the
    * reproducibility real RNG walks can't give), and replayable by an
    * oracle. Walks stop early at a sink (no out-neighbors). Tie-break
    * inside one hash value is by dst string — a total order, so even a
    * hash collision is deterministic.
    *
    * Scale shape: the walk frontier is ONE frame keyed (start, walk) —
    * all walks advance together, one node-sized frontier exchange per
    * step against the never-re-shuffled [[pinnedAdjacency]] plus the
    * argmin's (start, walk)-sized combine; per-step lineage cut, early
    * exit when every walk has died ([[pinnedLoop]] contract — AQE off,
    * width aligned). Output `(start, walk, step, node)`: step 0 is the
    * start itself; the per-walk sequence is the training sentence. */
  def randomWalks(edges0: DataFrame, srcCol: String, dstCol: String,
      walksPerNode: Int, steps: Int, directed: Boolean = false,
      checkpointDir: Option[String] = None,
      maxDegree: Int = 1 << 20): DataFrame =
    pinnedLoop(edges0.sparkSession,
      edges0.sparkSession.sessionState.conf.numShufflePartitions) {
      randomWalksBody(edges0, srcCol, dstCol, walksPerNode, steps,
        directed, checkpointDir, maxDegree)
    }

  private def randomWalksBody(edges0: DataFrame, srcCol: String,
      dstCol: String, walksPerNode: Int, steps: Int, directed: Boolean,
      checkpointDir: Option[String], maxDegree: Int): DataFrame = {
    require(walksPerNode >= 1,
      s"walksPerNode must be >= 1, got $walksPerNode")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(maxDegree >= 1, s"maxDegree must be >= 1, got $maxDegree")
    checkpointDir.foreach(edges0.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val adj = pinnedAdjacency(edges0, srcCol, dstCol, directed, cut)
    // Hub cap, ENFORCED (was prose): a node keeps at most `maxDegree`
    // neighbors — the deterministic hash-ranked sample (ascending
    // md5(src:dst), dst breaking exact-collision ties), so one
    // celebrity node cannot silently materialize a multi-GB array row
    // below. Applied IN-ROW after the collect (r16 optimization): the
    // old row_number window paid a per-edge md5 plus an in-partition
    // sort on EVERY edge even when no node was near the cap; the
    // argmin below is order-independent over the neighbor SET, so
    // under-cap rows keep their collected array untouched and only
    // over-cap rows pay the hash-ranked struct sort — the selected
    // subset (and every walk) is bit-identical to the window form.
    // Same shuffle count: groupBy(src) consumes the checkpointed
    // src-partitioning directly.
    //
    // Neighbor ARRAYS, built once: the per-step argmin then runs
    // inside one row (transform + array_min) instead of a fan-out
    // join + a (start, walk) combine — a walker at a degree-d node
    // costs O(d) compute in its own task, not d shuffled rows. The
    // hub trade is bounded by the cap.
    val adjList = cut(adj.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("_all"))
      .select(col("src"),
        when(size(col("_all")) <= maxDegree, col("_all"))
          .otherwise(expr(
            s"""transform(slice(array_sort(transform(_all,
               x -> struct(md5(concat_ws(':', src, x)) AS h,
                           x AS d))), 1, $maxDegree), s -> s.d)"""))
          .as("_nbrs")))
    val starts = cut(adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node"))).distinct()
      .select(col("node").as("start"),
        explode(array((0 until walksPerNode).map(k => lit(k.toLong)): _*))
          .as("walk"))
      .withColumn("step", lit(0L))
      .withColumn("node", col("start")))
    val rounds = scala.collection.mutable.ListBuffer(starts)
    var frontier = starts
    var t = 1
    var dead = false
    while (t <= steps && !dead) {
      val nxt = cut(walkRound(adjList, frontier, t.toLong))
      if (nxt.isEmpty) dead = true
      else { rounds += nxt; frontier = nxt }
      t += 1
    }
    rounds.reduce(_ unionByName _)
  }

  /** One hash-argmin walk step over the neighbor-array adjacency —
    * exposed so PlanSpec can pin the round body's runtime shuffle
    * budget (the r13 drift lesson). The argmin is min over the
    * 32-hex-digit `md5(start:walk:step:dst)` concatenated with
    * ':' + dst — lexicographic on the hash first, dst breaks
    * exact-collision ties; dst is recovered from char 34. ONE
    * frontier-sized exchange (the equi-join against the checkpointed
    * (src, neighbors) frame); the argmin is a narrow array pass. */
  private[graft] def walkRound(adjList: DataFrame, frontier: DataFrame,
      step: Long): DataFrame =
    frontier
      .join(adjList, frontier("node") === adjList("src"))
      .select(col("start"), col("walk"), lit(step).as("step"),
        expr(s"""cast(substring(array_min(transform(_nbrs, x ->
          concat(md5(concat_ws(':', start, walk, ${step}L, x)),
                 ':', cast(x as string)))), 34) as bigint)""")
          .as("node"))

  /** Degree-distribution audit — the first question asked of any graph
    * before running anything iterative on it (a hub whose degree is
    * 10⁶ changes which algorithms are safe — the randomWalks maxDegree
    * cap, the bipartite context cap and the skew-join salting all key
    * off exactly this shape): per direction ('out' = src side, 'in' =
    * dst side) the count of nodes at each distinct degree over the
    * DISTINCT edge set. The histogram is degree-count-sized — the
    * power-law head is immediately visible, and `max(degree)` is the
    * number the caps above are set from.
    *
    * Scale shape: one distinct, two map-side-combined degree
    * aggregates (shuffle carries node keys), two map-side histogram
    * folds (shuffle carries distinct degrees), one tiny union. */
  def degreeProfile(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges0.select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .distinct()
      .localCheckpoint(false) // feeds both direction censuses
    def side(c: String, tag: String): DataFrame =
      e.groupBy(col(c)).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(tag).as("direction"), col("degree"), col("n_nodes"))
    side("_s", "out").unionByName(side("_d", "in"))
  }

  /** Directed-edge reciprocity — the one-number structure probe beside
    * [[degreeProfile]] (Garlaschelli & Loffredo, PRL 93 2004: the
    * share of directed links whose reverse also exists separates
    * mutual-exchange networks from broadcast/hierarchy ones; for a
    * hunting graph, high reciprocity in a "who resolves whom" or
    * referral projection flags peer-to-peer structure that one-way
    * crawl/serving graphs never show): over the DISTINCT edge set
    * with self-loops excluded, `n_edges`, `n_reciprocal` (edges whose
    * reverse is present — a mutual pair contributes 2), and the
    * permille share. One row.
    *
    * Scale shape: one distinct, then ONE left equi-join against the
    * reversed pair set — keyed on (src, dst) vs (dst, src), co-located
    * by the join hash, never a product; the reversed side is distinct
    * so the join cannot fan out — and a single 1-row fold. */
  def reciprocity(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges0.select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .filter(col("_s") =!= col("_d"))
      .distinct()
      .localCheckpoint(false) // probe AND build side of the self-join
    val rev = e.select(col("_d").as("_s2"), col("_s").as("_d2"),
      lit(1L).as("_m"))
    e.join(rev,
        col("_s") === col("_s2") && col("_d") === col("_d2"),
        "left_outer")
      .agg(count(lit(1)).as("n_edges"),
        coalesce(sum(col("_m")), lit(0L)).as("n_reciprocal"))
      .withColumn("reciprocity_permille", expr(
        "case when n_edges > 0" +
          " then n_reciprocal * 1000 div n_edges end"))
  }

  /** Thresholded bipartite projection — the co-occurrence graph builder
    * (items linked when they share enough contexts: suppliers serving
    * the same orders, terms in the same documents, hosts in the same
    * crawl sessions). The projection step every co-citation /
    * co-engagement analysis starts from — and the quadratic bomb when
    * done naively: one context with 10⁵ members emits 10¹⁰ pairs.
    *
    * Semantics: distinct (context, item) incidences; contexts with more
    * than `maxContextDegree` distinct items are DROPPED ENTIRELY before
    * pairing (the similarity-join stopword stance: a context shared by
    * everything carries no co-occurrence signal, exactly like "the"
    * carries no term-similarity signal — documented semantics, not an
    * approximation, and the oracle applies the same filter); item pairs
    * sharing ≥ `minShared` surviving contexts come back as
    * `(a, b, n_shared)` with `a < b`.
    *
    * Scale shape: one map-side-combined degree aggregation + a LEFT
    * SEMI join to keep small contexts, then the pair self-join
    * CO-LOCATES on the context key (one shuffle each side) with
    * fan-out bounded by `maxContextDegree²` per context — never a
    * hub's squared degree; the final count is map-side combinable.
    * `minShared` prunes the long tail before anything persists. */
  def bipartiteProject(edges0: DataFrame, contextCol: String,
      itemCol: String, minShared: Long = 2,
      maxContextDegree: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxContextDegree >= 2,
      s"maxContextDegree must be >= 2, got $maxContextDegree")
    val e = prunedIncidence(edges0, contextCol, itemCol, maxContextDegree)
    pairsByContext(e, minShared)
  }

  /** Distinct (ctx, item) incidences with over-degree contexts dropped —
    * the shared front half of [[bipartiteProject]] and
    * [[commonNeighbors]] (ONE definition so the stopword-pruning
    * semantics cannot drift between the pair counts and the Jaccard
    * denominators). */
  private def prunedIncidence(edges0: DataFrame, contextCol: String,
      itemCol: String, maxContextDegree: Int): DataFrame = {
    val inc = edges0
      .select(col(contextCol).as("ctx"), col(itemCol).as("item"))
      .distinct()
    val keep = inc.groupBy(col("ctx"))
      .agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxContextDegree)
      .select(col("ctx"))
    inc.join(keep, Seq("ctx"), "leftsemi")
  }

  /** Item pairs (a < b) sharing ≥ `minShared` contexts of a pruned
    * incidence list — the co-located context self-join both projection
    * faces run. */
  private def pairsByContext(e: DataFrame, minShared: Long): DataFrame =
    e.join(e.select(col("ctx"), col("item").as("item2")), Seq("ctx"))
      .filter(col("item") < col("item2"))
      .groupBy(col("item").as("a"), col("item2").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Per-node triangle counts — the clustering-structure signal (spam
    * farms and boilerplate mirror rings show up as dense triangles in a
    * host/co-occurrence graph; the "local clustering" half of the
    * curation graph toolkit next to [[pageRank]]'s global authority).
    *
    * Semantics: the input edge list is treated as an UNDIRECTED simple
    * graph — self-loops dropped, parallel edges and both directions
    * collapsed to one canonical `(min, max)` edge. Output is one row per
    * node that closes at least one triangle: `(id, n_triangles)`, the
    * number of distinct triangles containing that node (zero-triangle
    * nodes drop out rather than emitting 0 — callers left-join if they
    * need the zeros).
    *
    * Algorithm (node-iterator with degree orientation, the standard
    * distributed formulation — Suri & Vassilvitskii 2011, "Counting
    * Triangles and the Curse of the Last Reducer"): orient every edge
    * from its lower-(degree, id) endpoint to the higher; each triangle
    * then has exactly ONE node with out-edges to the other two, so
    * wedges `u→v, u→w` (ranked v < w) semi-closed against the oriented
    * edge `v→w` count each triangle exactly once.
    *
    * Scale shape: orientation caps out-degree at O(√|E|) for any degree
    * distribution, so the wedge self-join — the step that explodes on a
    * raw edge list when one hub has 10⁷ neighbors — generates
    * Σ outdeg² = O(|E|^1.5) wedges worst-case instead of Σ deg². Both
    * joins (wedge generation on `u`, closure on `(v, w)`) are plain
    * shuffle equi-joins; nothing broadcasts, nothing is collected.
    * Everything is exact integer counting — no floats, hash-stable. */
  def triangleCounts(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonicalEdges(edges0, srcCol, dstCol)
    val deg = degreesOf(canon).withColumnRenamed("deg", "d")
    // orient a→b iff (deg a, a) < (deg b, b); (deg, id) is a total
    // order, so exactly one direction survives per edge
    val aFirst = canon
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .withColumn("fwd",
        col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")))
    val oriented = aFirst.select(
        when(col("fwd"), col("a")).otherwise(col("b")).as("u"),
        when(col("fwd"), col("b")).otherwise(col("a")).as("v"),
        when(col("fwd"), col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint(false) // feeds both wedge sides and the closure
    // wedges u→v, u→w with (dv, v) < (dw, w): each candidate triangle
    // proposed once, closed by the oriented edge v→w
    val w2 = oriented.select(col("u").as("u2"), col("v").as("w"),
      col("dv").as("dw"))
    val wedges = oriented.join(w2, col("u") === col("u2"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"), "leftsemi")
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
  }

  /** Common-neighbor link prediction over a bipartite edge list
    * (src → middle): for every src pair sharing ≥ `minCommon` middles,
    * the shared-middle count and the exact-integer neighborhood Jaccard
    * (`1000·|∩| div |∪|` — fixed-point, order-independent, identical in
    * every engine where a float ratio would drift).
    *
    * The classic "users who touched the same items" / "hosts cited by
    * the same pages" candidate generator: common neighbors and Jaccard
    * are the standard first-line link-prediction scores (Liben-Nowell &
    * Kleinberg 2003) — [[bipartiteProject]]'s SCORED face, and in a
    * curation pipeline the co-access blocking step before an expensive
    * pairwise model.
    *
    * Semantics and scale shape are [[bipartiteProject]]'s — the same
    * [[prunedIncidence]] / [[pairsByContext]] engine (cost Σ_m d(m)²
    * bounded by `maxMiddleDegree²` per middle, never |V|²; over-degree
    * middles are stopword-dropped and leave the Jaccard DENOMINATORS
    * too, keeping ∩/∪ consistent) — plus per-src degrees joined back at
    * pair-count size. The deduped incidence feeds three consumers, so
    * it is locally checkpointed once. No driver materialization. */
  def commonNeighbors(edges: DataFrame, srcCol: String, midCol: String,
      minCommon: Long = 2, maxMiddleDegree: Int = 1000): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(maxMiddleDegree >= 2,
      s"maxMiddleDegree must be >= 2, got $maxMiddleDegree")
    val e = prunedIncidence(edges, midCol, srcCol, maxMiddleDegree)
      .localCheckpoint(false)
    val deg = e.groupBy(col("item")).agg(count(lit(1)).as("_d"))
    pairsByContext(e, minCommon)
      .select(col("a").as("u"), col("b").as("v"),
        col("n_shared").as("common_cnt"))
      .join(deg.select(col("item").as("u"), col("_d").as("_du")), Seq("u"))
      .join(deg.select(col("item").as("v"), col("_d").as("_dv")), Seq("v"))
      .withColumn("_num", col("common_cnt") * 1000L)
      .withColumn("_den", col("_du") + col("_dv") - col("common_cnt"))
      .select(col("u"), col("v"), col("common_cnt"),
        // exact floor division in long arithmetic (operands positive)
        ((col("_num") - pmod(col("_num"), col("_den"))) / col("_den"))
          .cast("long").as("jaccard_permille"))
  }
}
