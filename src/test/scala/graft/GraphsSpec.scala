package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graphs

/** Integer PageRank against hand-computed fixed points on a 3-node graph
  * (1→2, 1→3, 2→3; node 3 dangling). */
class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(iters: Int): Map[Long, Long] =
    Graphs.pageRank(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"),
      "src", "dst", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one round matches the hand-computed integer fixed point") {
    // pr0 = 1e9 div 3 = 333333333; base = 150000000 div 3 = 50000000
    // contrib(2) = 333333333 div 2; contrib(3) = 166666666 + 333333333
    assert(ranks(1) == Map(
      1L -> 50000000L, // dangling-in: no in-edges, base only
      2L -> (50000000L + 85L * 166666666L / 100L),
      3L -> (50000000L + 85L * 499999999L / 100L)))
  }

  test("two rounds keep exact-integer semantics (mass drops at dangling 3)") {
    assert(ranks(2) == Map(
      1L -> 50000000L,
      2L -> 71250000L, // 5e7 + 85*(5e7 div 2) div 100
      3L -> 234166666L)) // 5e7 + 85*(25000000 + 191666666) div 100
  }

  test("reliable checkpointDir path: identical ranks, durable checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val reliable = Graphs.pageRank(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"),
      "src", "dst", iters = 2, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == ranks(2)) // the durability switch never changes values
    // per-round state actually landed in the reliable store (the blocks
    // an executor loss cannot take down)
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
    assert(anyFile(new java.io.File(dir)), s"no checkpoint files under $dir")
    // connectedComponents shares the switch
    val comp = graft.operators.Dedup.connectedComponents(
      Seq(1L, 2L, 3L, 9L).toDF("id"), "id",
      Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"),
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("seeded pageRank (TrustRank): teleport mass lands only on seeds") {
    val seeded = Graphs.pageRank(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"),
      "src", "dst", iters = 1, seeds = Seq(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pr0 = (1e9, 0, 0); contrib: 2 and 3 each get 1e9 div 2;
    // base hits only the seed
    assert(seeded == Map(
      1L -> 150000000L,
      2L -> (85L * 500000000L / 100L),
      3L -> (85L * 500000000L / 100L)))
    // a seed absent from the graph forfeits its mass — ranks all zero
    val ghost = Graphs.pageRank(
      Seq((1L, 2L)).toDF("src", "dst"), "src", "dst",
      iters = 2, seeds = Seq(9L))
      .collect().map(_.getLong(1)).toSet
    assert(ghost == Set(0L))
  }

  private def kcore(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] =
    Graphs.kcorePeel(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kcorePeel: pendant chain peels inward one round at a time") {
    // path 1-2-3-4-5 with a triangle 3-4-6: 2-core is the triangle,
    // reached after two peels of the path's fringe
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L), (4L, 6L))
    // round 1 removes 1 and 5; round 2 removes 2 (degree fell to 1)
    assert(kcore(g, 2, 1) == Map(2L -> 1L, 3L -> 3L, 4L -> 2L, 6L -> 2L))
    assert(kcore(g, 2, 2) == Map(3L -> 2L, 4L -> 2L, 6L -> 2L))
    assert(kcore(g, 2, 3) == Map(3L -> 2L, 4L -> 2L, 6L -> 2L)) // fixed point
  }

  test("kcorePeel: everything below k empties the graph; params checked") {
    assert(kcore(Seq((1L, 2L), (2L, 3L)), 3, 1) == Map.empty)
    intercept[IllegalArgumentException](kcore(Seq((1L, 2L)), 0, 1))
    intercept[IllegalArgumentException](kcore(Seq((1L, 2L)), 1, 0))
  }

  test("triangleCounts: K4 = 4 triangles, 3 per node") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: one triangle plus a pendant edge") {
    // pendant node 4 closes nothing and is absent from the output
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: direction, duplicates, and self-loops collapse") {
    // same triangle stated with reversed/parallel/self-loop noise
    assert(tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L),
      (2L, 2L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: triangle-free graph returns no rows") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == Map.empty)
  }

  test("parallel edges collapse; bad parameters rejected") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    assert(Graphs.pageRank(dup, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == ranks(1))
    intercept[IllegalArgumentException](
      Graphs.pageRank(dup, "src", "dst", iters = 0))
    intercept[IllegalArgumentException](
      Graphs.pageRank(dup, "src", "dst", dampPct = 101))
  }

  test("hits: one round matches the hand-computed integer normalization") {
    // 1→3, 2→3, 2→4: hubs {1,2}, authorities {3,4}
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val out = Graphs.hits(e, "src", "dst", rounds = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
    // authRaw = (3: 2e6, 4: 1e6), total 3e6 → auth = (666666, 333333)
    // hubRaw = (1: 666666, 2: 999999), total 1666665 → hub = (400000, 600000)
    assert(out == Map(
      1L -> ((400000L, 0L)), 2L -> ((600000L, 0L)),
      3L -> ((0L, 666666L)), 4L -> ((0L, 333333L))))
  }

  test("hits: renormalization keeps scores bounded over many rounds") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val out = Graphs.hits(e, "src", "dst", rounds = 6)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
    assert(out.size == 3)
    // L1 renormalization: each side sums to scale minus truncation loss
    val hubSum = out.values.map(_._1).sum
    val authSum = out.values.map(_._2).sum
    assert(hubSum <= 1000000L && hubSum > 999900L, s"hub sum $hubSum")
    assert(authSum <= 1000000L && authSum > 999900L, s"auth sum $authSum")
    intercept[IllegalArgumentException](Graphs.hits(e, "src", "dst", rounds = 0))
    intercept[IllegalArgumentException](
      Graphs.hits(e, "src", "dst", scale = 10L))
  }

  test("bipartiteProject: hub guard, minShared, duplicate incidences") {
    // contexts: c1 {1,2}, c2 {1,2,3}, c3 {1,2,3,4} (degree 4 > cap 3 —
    // dropped whole), c4 {2} — duplicate (c1, 1) incidence collapses
    val inc = Seq(
      (10L, 1L), (10L, 2L), (10L, 1L),
      (20L, 1L), (20L, 2L), (20L, 3L),
      (30L, 1L), (30L, 2L), (30L, 3L), (30L, 4L),
      (40L, 2L))
      .toDF("ctx", "item")
    val out = Graphs.bipartiteProject(inc, "ctx", "item",
        minShared = 2, maxContextDegree = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // (1,2) shares c1+c2 = 2; (1,3)/(2,3) share only c2 → below
    // minShared; c3's pairs (incl. every pair with 4) never counted
    assert(out == Map((1L, 2L) -> 2L))
    // with the guard loose and minShared 1, c3's pairs appear
    val loose = Graphs.bipartiteProject(inc, "ctx", "item",
        minShared = 1, maxContextDegree = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(loose((1L, 4L)) == 1L && loose((1L, 2L)) == 3L)
    intercept[IllegalArgumentException](
      Graphs.bipartiteProject(inc, "ctx", "item", minShared = 0))
  }

  test("shortestPaths: weighted relaxation beats hop-shortest routes") {
    // 1→2 costs 10; 1→3→2 costs 2+3=5: the weighted answer (5) differs
    // from the hop answer (direct edge). Parallel 1→3 edges collapse to
    // their min (2, not 7); 4 is beyond 3 relaxations' reach from 1 via
    // cheapest chain? No: 1→3→2→4 uses 3 edges, cost 5+1=6.
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 2L), (1L, 3L, 7L), (3L, 2L, 3L),
      (2L, 4L, 1L), (9L, 9L, 5L))
      .toDF("s", "d", "w")
    val out = Graphs.shortestPaths(edges, "s", "d", "w",
        sources = Seq(1L), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> 2L, 4L -> 6L))
    // rounds bind: with 1 round the relaxed 2-hop path can't exist
    val one = Graphs.shortestPaths(edges, "s", "d", "w",
        sources = Seq(1L), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(2L) == 10L && one(3L) == 2L)
    intercept[IllegalArgumentException](
      Graphs.shortestPaths(edges, "s", "d", "w", Seq.empty))
  }

  test("closenessFromSeeds: path graph, per-seed distances and floors") {
    // path 1-2-3-4-5, seeds {1, 5}, 3 rounds: node 1 only reaches seed
    // 1 (seed 5 is 4 hops away); node 2 → dists 1 and 3 → harmonic
    // 1000 + 333; node 3 → 2 and 2 → 500 + 500
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val out = Graphs.closenessFromSeeds(edges, "s", "d",
        seeds = Seq(1L, 5L), rounds = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((1L, 0L, 0L)))
    assert(out(2L) == ((2L, 4L, 1333L)))
    assert(out(3L) == ((2L, 4L, 1000L)))
    assert(out(4L) == ((2L, 4L, 1333L)))
    assert(out(5L) == ((1L, 0L, 0L)))
    intercept[IllegalArgumentException](
      Graphs.closenessFromSeeds(edges, "s", "d", seeds = Seq.empty))
  }

  test("commonNeighbors scores pairs with exact-integer Jaccard") {
    // src 1 → {a,b,c}; src 2 → {a,b,d}; src 3 → {z}; duplicates collapse
    val edges = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "d"),
      (3L, "z"))
      .toDF("src", "mid")
    val out = Graphs.commonNeighbors(edges, "src", "mid", minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // |∩|=2 (a,b); |∪|=4 (a,b,c,d) → 500‰; pair (1,3)/(2,3) share nothing
    assert(out == Map((1L, 2L) -> ((2L, 500L))))
    // a hub middle above the cap is stopword-dropped and leaves the
    // DENOMINATORS too: with cap 2, middle 'a' (deg 3 incl. src 4) is
    // gone → ∩={b}, ∪={b,c,d} → 333‰ at minCommon 1
    val hub = edges.unionByName(Seq((4L, "a")).toDF("src", "mid"))
    val capped = Graphs.commonNeighbors(hub, "src", "mid",
        minCommon = 1, maxMiddleDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(capped((1L, 2L)) == ((1L, 333L)))
    assert(!capped.contains((1L, 4L)), capped)
    intercept[IllegalArgumentException](
      Graphs.commonNeighbors(edges, "src", "mid", minCommon = 0))
  }

  test("skipGramPairs: window pairing within walks, never across") {
    // two walks: (10, w0) = 1→2→3, (10, w1) = 7→8; window 1 pairs only
    // adjacent steps, symmetric, never across walks
    val walks = Seq(
      (10L, 0L, 0L, 1L), (10L, 0L, 1L, 2L), (10L, 0L, 2L, 3L),
      (10L, 1L, 0L, 7L), (10L, 1L, 1L, 8L))
      .toDF("start", "walk", "step", "node")
    val w1 = Graphs.skipGramPairs(walks, window = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(w1 == Map((1L, 2L) -> 1L, (2L, 1L) -> 1L, (2L, 3L) -> 1L,
      (3L, 2L) -> 1L, (7L, 8L) -> 1L, (8L, 7L) -> 1L))
    // window 2 adds the distance-2 pair (1,3) both ways
    val w2 = Graphs.skipGramPairs(walks, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(w2((1L, 3L)) == 1L && w2((3L, 1L)) == 1L && w2.size == 8)
    intercept[IllegalArgumentException](
      Graphs.skipGramPairs(walks, window = 0))
  }

  test("modularity: hand-checked two-community score, trivial cases") {
    // two triangles bridged by one edge: m=7, perfect labels →
    // Q = 2·(3/7 − (7/14)²) = 5/14 → 357142 micro (truncating)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labs = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("id", "label")
    val r = Graphs.modularity(edges, "src", "dst", labs, "id", "label")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((7L, 2L, 357142L)))
    // one community holding everything scores exactly 0
    val one = labs.withColumn("label",
      org.apache.spark.sql.functions.lit(9L))
    val r1 = Graphs.modularity(edges, "src", "dst", one, "id", "label")
      .collect().head
    assert(r1.getLong(2) == 0L)
    // every node its own community: Q < 0 (no intra edges at all)
    val solo = labs.withColumn("label",
      org.apache.spark.sql.functions.col("id"))
    val r2 = Graphs.modularity(edges, "src", "dst", solo, "id", "label")
      .collect().head
    assert(r2.getLong(1) == 6L && r2.getLong(2) < 0L)
    // partial labeling: unlabeled endpoints keep their edges in m
    val partial =
      labs.filter(org.apache.spark.sql.functions.col("id") <= 3L)
    val r3 = Graphs.modularity(edges, "src", "dst", partial, "id",
      "label").collect().head
    assert(r3.getLong(0) == 7L && r3.getLong(1) == 1L)
  }

  test("degreeProfile: per-direction histograms over distinct edges") {
    val e = Seq((1L, 10L), (1L, 11L), (1L, 10L), (2L, 10L))
      .toDF("s", "d")
    val out = Graphs.degreeProfile(e, "s", "d").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // distinct edges (1,10),(1,11),(2,10): out degrees 1→2, 2→1;
    // in degrees 10→2, 11→1
    assert(out == Map(("out", 2L) -> 1L, ("out", 1L) -> 1L,
      ("in", 2L) -> 1L, ("in", 1L) -> 1L))
  }

  test("reciprocity: mutual-edge share, loops and dups excluded") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L),
      (5L, 5L), (1L, 2L)).toDF("src", "dst")
    // distinct non-loop: (1,2)(2,1)(1,3)(3,4)(4,3) → 5 edges,
    // 4 with a reverse present → 800‰
    val r = Graphs.reciprocity(e, "src", "dst").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((5L, 4L, 800L)))
  }

  test("randomWalks: chain determinism, sink stop, neighbor validity") {
    // directed chain 1→2→3→4: every step has exactly one choice, so
    // the hash argmin is forced and the corpus is fully hand-checkable
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graphs.randomWalks(chain, "src", "dst",
        walksPerNode = 1, steps = 3, directed = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(out((1L, 0L, 0L)) == 1L && out((1L, 0L, 1L)) == 2L &&
      out((1L, 0L, 2L)) == 3L && out((1L, 0L, 3L)) == 4L)
    // node 4 is a sink: its walk is step 0 only
    assert(out.contains((4L, 0L, 0L)) && !out.contains((4L, 0L, 1L)))
    // node 3 reaches the sink at step 1 and stops
    assert(out((3L, 0L, 1L)) == 4L && !out.contains((3L, 0L, 2L)))

    // branching graph: choices are hash-driven but must be (a) valid
    // out-neighbors, (b) identical across runs, (c) walk-dependent
    // somewhere (two walks per node cover different hash draws)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L),
      (3L, 2L)).toDF("src", "dst")
    def run() = Graphs.randomWalks(g, "src", "dst",
        walksPerNode = 2, steps = 4, directed = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val a = run()
    assert(a == run()) // bit-stable across executions
    val adj = Map(1L -> Set(2L, 3L), 2L -> Set(1L, 3L), 3L -> Set(1L, 2L))
    a.foreach { case ((s, w, t), n) =>
      if (t > 0) assert(adj(a((s, w, t - 1))).contains(n), ((s, w, t), n))
    }
    // every (start, walk) runs the full 4 steps (no sinks here)
    assert(a.size == 3 * 2 * 5)
    intercept[IllegalArgumentException](
      Graphs.randomWalks(g, "src", "dst", walksPerNode = 0, steps = 1))
    intercept[IllegalArgumentException](
      Graphs.randomWalks(g, "src", "dst", walksPerNode = 1, steps = 0))

    // maxDegree hub cap (enforced in r16; was prose): a cap above every
    // degree is bit-identical to the default, cap 1 keeps exactly one
    // hash-chosen neighbor per node — walks stay valid, full length
    // (out-degree 1 ≥ 1, no sinks appear), and deterministic
    val bigCap = Graphs.randomWalks(g, "src", "dst", walksPerNode = 2,
        steps = 4, directed = true, maxDegree = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(bigCap == a)
    def runCapped() = Graphs.randomWalks(g, "src", "dst",
        walksPerNode = 1, steps = 2, directed = true, maxDegree = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val c = runCapped()
    assert(c == runCapped())
    assert(c.size == 3 * 1 * 3)
    c.foreach { case ((s, w, t), n) =>
      if (t > 0) assert(adj(c((s, w, t - 1))).contains(n), ((s, w, t), n))
    }
    // the cap is per SOURCE node: each node's surviving neighbor is
    // fixed, so any two walks passing through the same node at any
    // step must take the same transition
    val nextOf = c.toSeq.flatMap { case ((s, w, t), n) =>
      c.get((s, w, t + 1)).map(n -> _)
    }.groupMap(_._1)(_._2).map { case (k, vs) => k -> vs.distinct }
    assert(nextOf.values.forall(_.size == 1), nextOf)
    intercept[IllegalArgumentException](Graphs.randomWalks(g, "src",
      "dst", walksPerNode = 1, steps = 1, maxDegree = 0))
  }
}
