package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Graphs}

/** Round-6 operator invariants, property-tested over random inputs:
  *  - triangleCounts equals the naive brute-force count on random graphs
  *    (the degree-oriented plan is an optimization, never a semantics
  *    change);
  *  - kcorePeel run to convergence equals the classic sequential k-core
  *    (peel-one-at-a-time) algorithm's surviving node set;
  *  - topKPairs equals the sorted-take reference per group under random
  *    duplicates and ties, in both directions;
  *  - seeded pageRank with the seed set = ALL nodes equals uniform
  *    pageRank (the teleport vector is the only difference).
  */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(r.passed, r.status.toString)
  }

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
      for { a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L) } yield (a, b)))

  private def canon(edges: List[(Long, Long)]): Set[(Long, Long)] =
    edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

  test("triangleCounts equals the brute-force count on random graphs") {
    check(Prop.forAll(genEdges) { edges =>
      val e = canon(edges)
      val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val nodes = adj.keys.toSeq.sorted
      val naive = nodes.map { v =>
        val ns = adj(v).toSeq
        v -> (for {
          i <- ns.indices; j <- ns.indices if i < j
          if e.contains((math.min(ns(i), ns(j)), math.max(ns(i), ns(j))))
        } yield 1).size.toLong
      }.filter(_._2 > 0).toMap
      val got = Graphs.triangleCounts(
          (if (edges.isEmpty) List((1L, 1L)) else edges) // non-empty DF
            .toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == naive
    })
  }

  test("kcorePeel at convergence equals the sequential k-core") {
    check(Prop.forAll(genEdges, Gen.choose(1, 4)) { (edges, k) =>
      val e0 = canon(edges)
      // classic sequential peel: repeatedly delete ANY node with
      // degree < k (order-independent result)
      var e = e0
      var changed = true
      while (changed) {
        val deg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (n, v) => n -> v.size }
        val kill = deg.collect { case (n, d) if d < k => n }.toSet
        changed = kill.nonEmpty
        e = e.filter { case (a, b) => !kill(a) && !kill(b) }
      }
      val expect = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
      // enough rounds to certainly converge on <= 12 nodes
      val got = Graphs.kcorePeel(
          (if (edges.isEmpty) List((1L, 1L)) else edges)
            .toDF("src", "dst"), "src", "dst", k, rounds = 13)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    })
  }

  test("topKPairs equals sorted-take per group, ties and duplicates included") {
    val genRows: Gen[List[(String, Long, Long)]] =
      Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2", "g3")
        v <- Gen.choose(0L, 5L) // tight ranges force ties and duplicates
        id <- Gen.choose(0L, 5L)
      } yield (g, v, id)))
    check(Prop.forAll(genRows, Gen.choose(1, 5),
        Gen.oneOf(true, false)) { (rows, k, largest) =>
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sorted(
          if (largest) Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse
          else Ordering.Tuple2(Ordering.Long, Ordering.Long))
        g -> sorted.take(k)
      }.filter(_._2.nonEmpty)
      val got =
        (if (rows.isEmpty) List(("gX", 0L, 0L)) else rows)
          .toDF("g", "v", "id").repartition(5)
          .groupBy(col("g"))
          .agg(Curation.topKPairs(col("v"), col("id"), k, largest).as("t"))
          .collect().map { r =>
            r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
              .map(s => (s.getLong(0), s.getLong(1))).toList
          }.toMap
      val want =
        if (rows.isEmpty) Map("gX" -> List((0L, 0L))) else expect
      got == want
    })
  }

  test("bfsDistances equals naive BFS at convergence, directed and not") {
    check(Prop.forAll(genEdges, Gen.nonEmptyListOf(Gen.choose(1L, 12L)),
        Gen.oneOf(true, false)) { (edges, seeds0, directed) =>
      val seeds = seeds0.distinct
      val adj = edges.filter(e => e._1 != e._2)
        .flatMap { case (a, b) =>
          if (directed) Seq(a -> b) else Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
      // naive frontier BFS to the fixed point
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds.toSet
      var r = 1L
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Nil))
          .diff(dist.keySet)
        next.foreach(n => dist += n -> r)
        frontier = next
        r += 1
      }
      val got = Graphs.bfsDistances(
          (if (edges.isEmpty) List((1L, 1L)) else edges)
            .toDF("src", "dst"), "src", "dst", seeds,
          rounds = 13, directed = directed)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      got == dist
    })
  }

  test("labelPropagation equals naive synchronous LPA, min-label ties") {
    check(Prop.forAll(genEdges.suchThat(_.exists(e => e._1 != e._2)),
        Gen.choose(1, 3)) { (edges, rounds) =>
      val e = canon(edges)
      val adj = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      var lab: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
      for (_ <- 1 to rounds) {
        lab = adj.map { case (v, ns) =>
          val counts = ns.map(lab).groupBy(identity)
            .map { case (l, occ) => l -> occ.size }
          val mx = counts.values.max
          v -> counts.collect { case (l, n) if n == mx => l }.min
        }
      }
      val got = Graphs.labelPropagation(edges.toDF("src", "dst"),
          "src", "dst", rounds)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      got == lab
    })
  }

  test("hits equals the naive integer HITS, arithmetic included") {
    check(Prop.forAll(genEdges.suchThat(_.nonEmpty),
        Gen.choose(1, 3)) { (edges0, rounds) =>
      val scale = 1000000L
      val e = edges0.distinct
      val nodes = e.flatMap { case (a, b) => Seq(a, b) }.distinct
      var hub = nodes.map(_ -> scale).toMap
      var auth = nodes.map(_ -> 0L).toMap
      def norm(raw: Map[Long, Long]): Map[Long, Long] = {
        val t = raw.values.sum
        if (t == 0L) raw
        else raw.map { case (k, v) =>
          k -> (BigInt(v) * scale / t).toLong }
      }
      for (_ <- 1 to rounds) {
        auth = norm(nodes.map(v =>
          v -> e.collect { case (u, w) if w == v => hub(u) }.sum).toMap)
        hub = norm(nodes.map(u =>
          u -> e.collect { case (v, w) if v == u => auth(w) }.sum).toMap)
      }
      val got = Graphs.hits(edges0.toDF("src", "dst"), "src", "dst",
          rounds)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
      got == nodes.map(v => v -> ((hub(v), auth(v)))).toMap
    })
  }

  test("bipartiteProject equals the brute-force capped pair count") {
    val genInc: Gen[List[(Long, Long)]] =
      Gen.choose(1, 50).flatMap(n => Gen.listOfN(n,
        for { c <- Gen.choose(1L, 8L); i <- Gen.choose(1L, 10L) }
          yield (c, i)))
    check(Prop.forAll(genInc, Gen.choose(1L, 3L),
        Gen.choose(2, 5)) { (inc0, minShared, cap) =>
      val inc = inc0.distinct
      val byCtx = inc.groupBy(_._1).filter(_._2.size <= cap)
        .map { case (c, xs) => c -> xs.map(_._2).sorted }
      val naive = byCtx.values.toList
        .flatMap(items => for {
          i <- items.indices; j <- items.indices
          if i < j && items(i) != items(j)
        } yield (items(i), items(j)))
        .groupBy(identity).map { case (p, occ) => p -> occ.size.toLong }
        .filter(_._2 >= minShared)
      val got = Graphs.bipartiteProject(inc0.toDF("ctx", "item"),
          "ctx", "item", minShared, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      got == naive
    })
  }

  test("seeded pageRank with all nodes as seeds equals uniform pageRank") {
    check(Prop.forAll(genEdges.suchThat(_.exists(e => e._1 != e._2))) {
      edges =>
        val df = edges.toDF("src", "dst")
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val uniform = Graphs.pageRank(df, "src", "dst", iters = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val seeded = Graphs.pageRank(df, "src", "dst", iters = 2,
            seeds = nodes)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        uniform == seeded
    })
  }
}
