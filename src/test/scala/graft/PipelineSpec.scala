package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SimHash64

/** Unit semantics for the training-data pipeline operators. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),   // near-dup of 1
    (3L, "one two three four five six"),
    (4L, "alpha beta gamma delta epsilon zeta"),  // exact dup of 1
    (5L, "completely different words here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val d = Dedup.exactDuplicates(corpus, "text", "doc_id")
    val dup = d.filter(col("n_copies") === 2).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keep_id") == 1L)
    assert(d.count() == 4) // 4 distinct contents
  }

  test("minhash LSH and ngram jaccard find the near-dup pair") {
    // docs 1,2 share 3 of 5 distinct shingles -> jaccard 3/5; 1,4 identical.
    // The inverted-index ngram join is EXACT: both pairs must appear.
    val exact = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", threshold = 0.4)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(exact((1L, 4L)) == 1.0)
    assert(math.abs(exact((1L, 2L)) - 3.0 / 5.0) < 1e-12)
    // MinHash-LSH is approximate below ~0.8 similarity: identical docs are
    // always caught (identical signatures); any pair it does report must
    // carry the exact verified jaccard.
    val lsh = Dedup.minhashNearDuplicates(corpus, "text", "doc_id", threshold = 0.4)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(lsh((1L, 4L)) == 1.0)
    assert(lsh.forall { case (k, j) => exact(k) == j })
  }

  test("simhash: identical text -> identical fingerprint, hamming pairing works") {
    val fp = corpus.select(col("doc_id"),
      TextAnalysis.simhash64(col("text")).as("f"))
    val m = fp.as[(Long, String)].collect().toMap
    assert(m(1L) == m(4L))
    assert(m(1L).length == 64 && m(1L).forall(c => c == '0' || c == '1'))
    assert(m(1L) != m(3L))
    // native expression matches the reference Scala definition
    assert(m(5L) == SimHash64.compute("completely different words here now"))
    val pairs = Dedup.simhashNearDuplicates(fp, "doc_id", "f", maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("cosine topK: exact ranking with deterministic arithmetic") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.topK(vecs, "vec_id", "embedding", queryId = 0L, k = 3)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(top.head._2 > 0.99)
    assert(top.last._2 == -1.0)
  }

  test("cosine LSH pairs: near-identical vectors found, verified exactly") {
    val base = Array.tabulate(16)(i => 0.1f * ((i % 5) - 2))
    val nearDup = base.clone(); nearDup(0) = base(0) + 0.001f
    val vecs = (Seq((0L, base), (1L, nearDup)) ++
      (2L to 40L).map { i =>
        val rnd = new scala.util.Random(i)
        (i, Array.fill(16)(rnd.nextFloat() - 0.5f))
      })
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineLshPairs(vecs, "vec_id", "embedding",
      threshold = 0.99, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    // every reported pair is exactly-verified >= 0.99: the random fillers
    // must not appear
    assert(pairs.forall { case (a, b) => a == 0L && b == 1L })
  }

  test("connected components: chains collapse transitively, singletons keep their id") {
    // chain 1-2, 2-6, plus pair 3-5; 4 and 7 isolated; min id wins
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 6L), (3L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 6L -> 1L, // chain: 6 never saw 1
      3L -> 3L, 5L -> 3L, 4L -> 4L, 7L -> 7L))
  }

  test("connected components: driver union-find fast path ≡ distributed loop") {
    // the size-gated small-graph path and the label-propagation loop must
    // agree label-for-label; random graph with chains, cliques, singletons
    val rnd = new scala.util.Random(42)
    val n = 200L
    val ids = (0L until n).toDF("doc_id")
    val pairs = Seq.fill(150)((rnd.nextLong(n), rnd.nextLong(n)))
      .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(ids, "doc_id", pairs,
        smallGraphMaxEdges = -1L) // force the distributed loop
      .as[(Long, Long)].collect().toMap
    assert(fast == dist)
    assert(fast.keySet == (0L until n).toSet)
  }

  test("connected components: distributed loop collapses chains (forced)") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 6L), (3L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(ids, "doc_id", pairs,
        smallGraphMaxEdges = -1L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 6L -> 1L,
      3L -> 3L, 5L -> 3L, 4L -> 4L, 7L -> 7L))
  }

  test("star contraction ≡ union-find ≡ label propagation; chains beyond maxIter") {
    val rnd = new scala.util.Random(11)
    val n = 300L
    val ids = (0L until n).toDF("doc_id")
    val pairs = Seq.fill(220)((rnd.nextLong(n), rnd.nextLong(n)))
      .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val uf = Dedup.connectedComponents(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(star == uf)
    // a 49-deep chain: label propagation needs diameter rounds and
    // throws at the default budget; star contraction converges in
    // O(log n) alternations
    val chainIds = (0L until 50L).toDF("doc_id")
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chainIds, "doc_id", chain,
        smallGraphMaxEdges = -1L) // force the distributed loop
    }
    val got = Dedup.connectedComponentsStar(chainIds, "doc_id", chain)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L until 50L).map(_ -> 0L).toMap)
  }

  test("connected components: duplicate-free corpus (no pairs) is all singletons") {
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(ids, "doc_id", noPairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("cosine LSH pairs are a subset of the exact all-pairs truth") {
    // the all-pairs cartesian stays as the TEST-ONLY truth oracle for the
    // shipped bucketed path (VERDICT r1 #1): every LSH-reported pair must
    // exist in the exact result with an identical cosine
    val vecs = (0L to 60L).map { i =>
      val rnd = new scala.util.Random(i % 7) // collisions -> real near-dups
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val exact = Similarity
      .nearDuplicatePairs(vecs, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b", "cos_sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val lsh = Similarity
      .cosineLshPairs(vecs, "vec_id", "embedding", threshold = 0.9, dim = 16)
      .select("id_a", "id_b", "cos_sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(lsh.nonEmpty) // the planted identical-seed groups are found
    assert(lsh.forall { case (k, c) => exact.get(k).contains(c) })
  }

  test("winnowing fingerprints: shared substring guarantees a shared fingerprint") {
    // k=5, w=4: any common substring of length >= 8 must share a print
    val df = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "XYZW quick brown fox QQQQ PPPP RR"), // shares ' quick brown fox '
      (3L, "completely unrelated words banana"),
      (4L, "tiny") // shorter than k: no fingerprints, no crash
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      graft.operators.TextAnalysis.winnowingFingerprints(col("text")).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty)
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty)
    assert(fps(4L).isEmpty)
    // deterministic: recomputation is identical
    assert(fps(1L) == df.filter(col("doc_id") === 1L).select(
      graft.operators.TextAnalysis.winnowingFingerprints(col("text")))
      .as[Seq[Long]].head)
  }

  test("winnow overlap pairs: planted shared paragraph found, short docs safe") {
    val boiler = "every document carries this exact legal boilerplate line"
    val df = Seq(
      (1L, s"first document body $boiler trailing words here"),
      (2L, s"unrelated second text $boiler and more content"),
      (3L, "no overlap with anything else in this corpus at all"),
      (4L, "tiny") // < k+w-1: zero fingerprints, must not crash the join
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .winnowOverlapPairs(df, "text", "doc_id", minShared = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 3)
  }

  test("language id: marker argmax with und fallback") {
    val df = Seq(
      (1L, "the cat of the house and not a dog"),
      (2L, "der hund und die katze nicht das haus"),
      (3L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.detectedLang(col("text")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("quality metrics") {
    val r = Seq((1L, "the quick fox!"))
      .toDF("doc_id", "text")
      .select(col("doc_id") +: TextAnalysis.qualityColumns(col("text"),
        Seq("the", "a", "of", "and", "not")): _*)
      .collect().head
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 1.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 1.0 / 14.0) < 1e-12)
  }

  test("leakageSafeSplit: transitively connected docs share one split") {
    import graft.operators.Dedup
    val ids = (1L to 50L).toDF("doc_id")
    // chain 1-2-3 plus pair 10-11; everything else isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.leakageSafeSplit(ids, "doc_id", pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    assert(out.size == 50)
    assert(Set(out(1L), out(2L), out(3L)).size == 1) // one cluster, one split
    assert(out(10L) == out(11L))
    assert(out(1L)._1 == 1L && out(10L)._1 == 10L) // min-id cluster label
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the 45 singleton docs spread over more than one split
    assert(out.filterNot(k => Set(1L, 2L, 3L, 10L, 11L)(k._1))
      .values.map(_._2).toSet.size > 1)
  }

  test("plan shape: decontaminate broadcasts eval grams; quantized ANN TakeOrders") {
    import graft.operators.{Curation, Similarity}
    def explainOf(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }
    val corpus = (1 to 50).map(i => (i.toLong, s"w$i x y z a b c d e f g h i j k l m"))
      .toDF("doc_id", "text")
    val ev = Seq((0L, "x y z a b c d e f g h i j k l m n")).toDF("doc_id", "text")
    val dc = explainOf(Curation.decontaminate(corpus, ev, "text", "doc_id"))
    // the corpus gram stream must probe a broadcast, never sort-merge
    assert(dc.contains("BroadcastHashJoin"), dc)
    assert(!dc.contains("SortMergeJoin"), dc)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => (i * 7 + d).toFloat / 100).toSeq))
      .toDF("vec_id", "embedding")
    val q8 = explainOf(Similarity.quantizedTopK(vecs, "vec_id", "embedding",
      0L, k = 5, rerank = 10))
    // both top-ks are heap-based TakeOrdered, not global sorts
    assert(q8.contains("TakeOrderedAndProject"), q8)
    assert(!q8.contains("CartesianProduct"), q8)
  }

  test("bestSurvivors: complete original beats a truncated lower-id copy") {
    import graft.operators.Dedup
    val docsDf = Seq(
      (5L, "a b c d e f g h i j"),   // complete original
      (1L, "a b c d e f g h i"),     // truncated copy, LOWER id
      (9L, "totally different text entirely")) // singleton
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.bestSurvivors(docsDf, "text", "doc_id", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("survivor_id"), r.getAs[Long]("is_survivor"))).toMap
    assert(out(5L) == (5L, 1L)) // longest wins, despite higher id
    assert(out(1L) == (5L, 0L)) // min-id policy would have kept this one
    assert(out(9L) == (9L, 1L)) // singleton survives itself
  }

  test("quantizedTopK: codes bounded to ±127, exact re-rank recovers exact top-k") {
    import graft.operators.Similarity
    // deterministic pseudo-random vectors, dim 16
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (((i * 31 + d * 17) % 97) - 48) / 48.0f).toSeq)
    }.toDF("vec_id", "embedding")
    // codes stay in the int8 range
    val base = Similarity.topK(vecs, "vec_id", "embedding", 0L, 119)
      .collect().map(r => r.getAs[Long]("id")).toSeq
    val quant = Similarity.quantizedTopK(vecs, "vec_id", "embedding", 0L,
      k = 10, rerank = 119)
      .collect()
    quant.foreach { r =>
      assert(math.abs(r.getAs[Long]("approx_dot")) <= 127L * 127 * 16)
    }
    // rerank = all candidates → the exact re-rank must equal exact top-10
    assert(quant.map(_.getAs[Long]("id")).toSeq == base.take(10))
    // with a narrow rerank window the quantized ranking still recovers
    // most of the exact top-10 (recall property, not exactness)
    val narrow = Similarity.quantizedTopK(vecs, "vec_id", "embedding", 0L,
      k = 10, rerank = 30).collect().map(_.getAs[Long]("id")).toSet
    assert(base.take(10).count(narrow) >= 8, s"recall too low: $narrow")
  }

  test("knnJoin: neighbors stay in probed clusters, ranks are dense per id") {
    import graft.operators.Similarity
    // two well-separated bundles around orthogonal axes: ids 0..9 near
    // e1, ids 10..19 near e2 — each vector's top neighbors must come
    // from its own bundle
    val vecs = (0 until 20).map { i =>
      val axis = if (i < 10) 0 else 1
      (i.toLong, Array.tabulate(4)(d =>
        (if (d == axis) 1.0f else 0.001f * (i + d))).toSeq)
    }.toDF("vec_id", "embedding")
    val out = Similarity.knnJoin(vecs, "vec_id", "embedding",
      centroidIds = Seq(0L, 10L), nprobe = 1, k = 3).collect()
    val byId = out.groupBy(_.getAs[Long]("id"))
    assert(byId.keySet == (0L until 20L).toSet)
    byId.foreach { case (id, rows) =>
      assert(rows.length == 3, s"id $id")
      // dense ranks 1..3, neighbors from the same bundle
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
      val sameBundle = (n: Long) => (id < 10) == (n < 10)
      assert(rows.forall(r => sameBundle(r.getAs[Long]("neighbor_id"))),
        s"id $id crossed bundles: ${rows.mkString(",")}")
      assert(rows.forall(r => r.getAs[Long]("neighbor_id") != id))
    }
    // plan: candidate generation is an equi-join on the cluster key —
    // the only nested-loop is the tiny broadcast centroid pass
    val plan = {
      val outDf = Similarity.knnJoin(vecs, "vec_id", "embedding",
        centroidIds = Seq(0L, 10L), nprobe = 1, k = 3)
      val o = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(o)) {
        outDf.explain("formatted")
      }
      o.toString
    }
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hammingTopK: known sign words, full rerank recovers exact top-k") {
    import graft.operators.Similarity
    // dim 4: signs chosen so Hamming distances to query 0 are known.
    // q = (+,+,-,+); v1 = (+,+,+,+) → hamming 1; v2 = (-,-,+,-) → 4;
    // v3 = (+,-,-,+) → 1; v4 = (+,+,-,+) → 0 (same signs, scaled copy)
    val vecs = Seq(
      (0L, Seq(0.5f, 0.2f, -0.3f, 0.1f)),
      (1L, Seq(0.5f, 0.2f, 0.3f, 0.1f)),
      (2L, Seq(-0.5f, -0.2f, 0.3f, -0.1f)),
      (3L, Seq(0.4f, -0.2f, -0.3f, 0.2f)),
      (4L, Seq(1.0f, 0.4f, -0.6f, 0.2f))).toDF("vec_id", "embedding")
    val all = Similarity.hammingTopK(vecs, "vec_id", "embedding", 0L,
      k = 4, rerank = 4, dim = 4).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("hamming")).toMap
    assert(all == Map(1L -> 1L, 2L -> 4L, 3L -> 1L, 4L -> 0L))
    // dim 40 (> one word): full-rerank two-stage == exact brute force
    val big = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(40)(d =>
        (((i * 31 + d * 17) % 97) - 48) / 48.0f).toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.topK(big, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    val ham = Similarity.hammingTopK(big, "vec_id", "embedding", 0L,
      k = 10, rerank = 119, dim = 40)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(ham == exact)
    // narrow window keeps useful recall (property, not exactness)
    val narrow = Similarity.hammingTopK(big, "vec_id", "embedding", 0L,
      k = 10, rerank = 30, dim = 40)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(exact.count(narrow) >= 5, s"recall too low: $narrow")
    intercept[IllegalArgumentException] {
      Similarity.hammingTopK(big, "vec_id", "embedding", 0L, 10, 5, 40)
    }
  }

  test("gopherColumns: each rule trips on its designed fixture") {
    import graft.operators.TextAnalysis
    val stop = Seq("the", "a", "of", "and", "not")
    val good = ("the quick brown fox jumps over a lazy dog and " * 3)
      .trim // 30 words, 108 chars (mean 3.6), all alpha, stopword-rich
    val rows = Seq(
      (1L, good),
      (2L, "too short text"),                                // word count
      (3L, ("a " * 30).trim),                                 // mean len < 3
      (4L, Array.fill(30)("##########").mkString(" ")),       // symbols+alpha
      (5L, (1 to 30).map(i => s"- bullet $i the a").mkString("\n")), // bullets
      (6L, (1 to 30).map(i => s"the a line $i...").mkString("\n")),  // ellipses
      (7L, ("12345 9876 " * 15).trim + " the a"))             // alpha words
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id") +:
        TextAnalysis.gopherColumns(col("text"), stop): _*)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("gopher_keep") == 1L)
    assert(out(2L).getAs[Long]("ok_word_count") == 0L)
    assert(out(3L).getAs[Long]("ok_mean_word_len") == 0L)
    assert(out(4L).getAs[Long]("ok_symbol_ratio") == 0L)
    assert(out(4L).getAs[Long]("ok_alpha_words") == 0L)
    assert(out(5L).getAs[Long]("ok_bullet_lines") == 0L)
    assert(out(6L).getAs[Long]("ok_ellipsis_lines") == 0L)
    assert(out(7L).getAs[Long]("ok_alpha_words") == 0L)
    // every rule failure forces the conjunction off
    (2L to 7L).foreach(i =>
      assert(out(i).getAs[Long]("gopher_keep") == 0L, s"doc $i"))
  }

  test("staged IVF-PQ merge: crash fully applies or discards; adds use stored codebooks") {
    import graft.operators.Similarity
    def vecs(ids: Range) = ids.map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val all = vecs(0 to 40)
    def freshIndex(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-crash")
        .toString
      Similarity.writeIvfPqIndex(vecs(0 to 20), "vec_id", "embedding",
        0L to 3L, dir, m = 4, ks = 4, iters = 1, dim = 16)
      dir
    }
    val q = all.filter(col("vec_id") === 5)
      .select(col("embedding")).head.getSeq[Float](0)
    def top(path: String): Seq[Seq[Any]] =
      Similarity.ivfPqTopK(spark, path, q, queryId = 5L, k = 5,
        nprobe = 2, rerank = 10).collect().map(_.toSeq).toSeq

    // control: uninterrupted merge (write gen 1, merge gen 2)
    val control = freshIndex()
    Similarity.mergeIvfPqIndex(spark, control, vecs(21 to 40),
      "vec_id", "embedding")
    val expected = top(control)
    assert(graft.operators.Retrieval.readIndexEpoch(spark, control)
      .contains(2L))
    // merged rows are queryable (ids > 20 can appear; at minimum the
    // index now holds all 41 vectors — count via the vectors table)
    assert(spark.read.parquet(s"$control/vectors").count() == 41L)

    // crash AFTER the manifest: a plain reader replays the whole swap
    val post = freshIndex()
    Similarity.stageIvfPqMerge(spark, post, vecs(21 to 40),
      "vec_id", "embedding")
    assert(new java.io.File(s"$post/_staging_2/_manifest.json").exists())
    assert(top(post) == expected) // ivfPqTopK recovers, then queries
    assert(!new java.io.File(s"$post/_staging_2").exists())

    // manifest-less staging: readers leave it; the next merge cleans it
    val pre = freshIndex()
    assert(new java.io.File(s"$pre/_staging_2/vectors/cluster=0").mkdirs())
    top(pre) // reader-safe recovery
    assert(new java.io.File(s"$pre/_staging_2").exists())
    Similarity.mergeIvfPqIndex(spark, pre, vecs(21 to 40),
      "vec_id", "embedding")
    assert(top(pre) == expected)
    assert(!new java.io.File(s"$pre/_staging_2").exists())
  }

  test("fuzzyTermPairs finds exactly the distance-1 pairs") {
    val vocab = Seq("scan", "scat", "sca", "scans", "span", "table",
      "tabel", "", "scan", null).toDF("term")
    val got = TextAnalysis.fuzzyTermPairs(vocab, "term")
      .as[(String, String)].collect().toSet
    // substitutions (scan~scat, scan~span), deletions (sca~scan,
    // sca~scat, scan~scans) are IN; the transposition table~tabel is a
    // shared-variant candidate ("tabl") at distance 2 — verified OUT;
    // null/empty/duplicate inputs are dropped, not paired
    assert(got == Set(("sca", "scan"), ("sca", "scat"),
      ("scan", "scans"), ("scan", "scat"), ("scan", "span")))
  }

  test("fuzzyFold folds edit-chains to one canonical spelling") {
    // cat—cart—carts is a CHAIN: lev(cat, carts) = 2, only single
    // edits connect them — the component fold must still unify all 3
    val vocab = Seq("cat", "cart", "carts", "dog", "dig")
      .toDF("term")
    val got = TextAnalysis.fuzzyFold(vocab, "term")
      .as[(String, String)].collect().toMap
    assert(got == Map("cat" -> "cart", "cart" -> "cart",
      "carts" -> "cart", "dog" -> "dig", "dig" -> "dig"))
  }

  test("multiPatternRedact: union of spans, overlaps merge, UTF-8 safe") {
    def redact(text: String, pats: Seq[String]): String =
      Seq(text).toDF("t")
        .select(TextAnalysis.multiPatternRedact(col("t"), pats))
        .collect().head.getString(0)
    // nested dictionary suffixes merge into ONE covered region
    assert(redact("scan table", Seq("scan", "can", "able")) ==
      "**** t****")
    // overlapping occurrences cover their union ("aaaa" via "aa")
    assert(redact("xaaaax", Seq("aa")) == "x****x")
    // cross-word phrase masks the space too
    assert(redact("x merge batch y", Seq("merge batch")) ==
      "x *********** y")
    // a multi-byte char inside a matched span masks byte-per-byte;
    // one outside survives untouched
    assert(redact("café can", Seq("can")) == "café ***")
    assert(redact("café", Seq("café")) == "*****") // 5 UTF-8 bytes
    // no match: identical text back
    assert(redact("clean text", Seq("zzz")) == "clean text")
    // registered SQL face agrees with the Column form
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT multi_pattern_redact('scan it', array('scan'))")
      .head().getString(0) == "**** it")
  }

  test("multiPatternCounts: overlap, dict-suffix outputs, fail links, UTF-8") {
    def counts(text: String, pats: Seq[String]): Seq[Long] =
      Seq(Option(text)).toDF("t")
        .select(TextAnalysis.multiPatternCounts(col("t"), pats).as("c"))
        .collect().head.getSeq[Long](0)
    // overlapping occurrences all count: "aaaa" has three "aa"
    assert(counts("aaaa", Seq("aa")) == Seq(3L))
    // nested patterns fire via dictionary-suffix outputs in one pass
    assert(counts("scan table", Seq("scan", "can", "table", "able", "as"))
      == Seq(1L, 1L, 1L, 1L, 0L))
    // failure-link walk: after "abcab" the suffix "cab" has also matched
    assert(counts("abcab", Seq("abcab", "cab")) == Seq(1L, 1L))
    // cross-word phrase is just bytes
    assert(counts("x merge batch y", Seq("merge batch")) == Seq(1L))
    // multi-byte UTF-8 matches as its byte sequence; no false hits
    // inside unrelated multi-byte chars
    assert(counts("café café", Seq("café", "é", "e"))
      == Seq(2L, 2L, 0L))
    // null text → null counts row (nullable expression)
    val withNull = Seq(Some("can"), None).toDF("t")
      .select(TextAnalysis.multiPatternCounts(col("t"), Seq("can")).as("c"))
      .collect()
    assert(withNull.count(_.isNullAt(0)) == 1)
    intercept[IllegalArgumentException](
      TextAnalysis.multiPatternCounts(col("t"), Seq.empty))
    intercept[IllegalArgumentException](
      Seq("x").toDF("t").select(TextAnalysis.multiPatternCounts(col("t"),
        Seq("a", "a")).as("c")).collect())
  }

  test("multiPatternHits: hit rows only, zero shuffles, in codegen") {
    val docs = Seq((1L, "scan the table"), (2L, "nothing here"),
      (3L, "can can")).toDF("doc_id", "text")
    val out = TextAnalysis.multiPatternHits(docs, "doc_id", "text",
      Seq("scan", "can", "able"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows == Map((1L, "scan") -> 1L, (1L, "can") -> 1L,
      (1L, "able") -> 1L, (3L, "can") -> 2L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1)"), plan) // whole-stage codegen span
  }

  test("multiPatternSpans: exact offsets, overlaps both emitted, narrow") {
    val docs = Seq((1L, "scan the table"), (2L, "nothing here"),
      (3L, "can can")).toDF("doc_id", "text")
    val out = TextAnalysis.multiPatternSpans(docs, "doc_id", "text",
      Seq("scan", "can", "able"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // 'can' inside 'scan' is its own span; 'able' inside 'table' too
    assert(rows == Set((1L, "scan", 0L), (1L, "can", 1L),
      (1L, "able", 10L), (3L, "can", 0L), (3L, "can", 4L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // spans agree with the counts face on every (doc, pattern)
    val viaCounts = TextAnalysis.multiPatternHits(docs, "doc_id", "text",
      Seq("scan", "can", "able")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaSpans = rows.groupBy(t => (t._1, t._2))
      .view.mapValues(_.size.toLong).toMap
    assert(viaSpans == viaCounts)
  }

  test("normalizeText: NFC composes, controls strip, whitespace collapses") {
    val out = Seq(
      "cafe\u0301 x",              // decomposed -> composed
      "a\u0007b\u0000c",           // controls stripped, no space added
      "  a\t\tb \n\n c  ",         // runs collapse, ends trim
      "café",                 // already NFC: unchanged
      "",                          // empty stays empty
      "keep � here"           // U+FFFD is NOT a control
    ).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")),
        TextAnalysis.replacementCount(col("t")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out(0) == ("café x", 0L))
    assert(out(1) == ("abc", 0L))
    assert(out(2) == ("a b c", 0L))
    assert(out(3) == ("café", 0L))
    assert(out(4) == ("", 0L))
    assert(out(5) == ("keep � here", 1L))
    // the expression stays inside whole-stage codegen (range leaf — a
    // local Seq would constant-fold to a LocalTableScan)
    val plan = spark.range(1)
      .select(TextAnalysis.nfcNormalize(col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("codeColumns: signals and verdict on code vs prose") {
    val code = "def load(x): { a = camelValue ; }\n\treturn a ;\n  done"
    val prose = "plain sentences about nothing much at all"
    val out = Seq((1L, code), (2L, prose)).toDF("id", "t")
      .select(col("id") +: TextAnalysis.codeColumns(col("t")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val (sym, indent, kw, camel, isCode) = out(1L)
    assert(sym >= 6L)          // (){};= twice ;
    assert(indent == 2L)       // \t line + two-space line
    assert(kw == 2L)           // def, return
    assert(camel == 1L)        // camelValue
    assert(isCode == 1L)
    assert(out(2L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("scriptColumns: counts, first-wins argmax, mixed flag") {
    val rows = Seq(
      (1L, "hello world"),                      // pure latin
      (2L, "привет ok"), // cyrillic > latin
      (3L, "你好世界"),         // pure han
      (4L, "12345 !!"),                         // no script at all
      (5L, "abcd ΑΒΓ")           // latin 4, greek 3 -> mixed
    ).toDF("id", "t")
      .select(col("id") +: TextAnalysis.scriptColumns(col("t")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("script"), r.getAs[Long]("script_mixed"),
          r.getAs[Long]("n_latin"), r.getAs[Long]("n_cjk"))).toMap
    assert(rows(1L) == (("latin", 0L, 10L, 0L)))
    assert(rows(2L)._1 == "cyrillic" && rows(2L)._2 == 1L) // ok = 2/6 > 25%
    assert(rows(3L) == (("cjk", 0L, 0L, 4L)))
    assert(rows(4L)._1 == "zzzz" && rows(4L)._2 == 0L)
    assert(rows(5L)._1 == "latin" && rows(5L)._2 == 1L)
  }

  test("sentenceSplit: boundary rule, no split before lower-case") {
    val out = Seq(
      "One two. Three four! Five? 6 six. and lower e.g. stays. End")
      .toDF("t").select(TextAnalysis.sentenceSplit(col("t")))
      .collect().head.getSeq[String](0)
    assert(out == Seq(
      "One two.", "Three four!", "Five?",
      "6 six. and lower e.g. stays.", "End"))
    // no terminators: one sentence, not zero
    val one = Seq("no boundary here").toDF("t")
      .select(TextAnalysis.sentenceSplit(col("t")))
      .collect().head.getSeq[String](0)
    assert(one == Seq("no boundary here"))
  }

  test("dedupSentences: first occurrence wins, order kept, counts exact") {
    def run(t: String): (String, Long, Long) = {
      val r = TextAnalysis.dedupSentences(
        Seq((1L, t)).toDF("id", "t"), "t", "id").collect().head
      (r.getAs[String]("text_dedup"), r.getAs[Long]("n_sentences"),
        r.getAs[Long]("n_removed"))
    }
    // the repeated sentence drops at its SECOND occurrence; order of
    // the survivors is the original order, re-joined with one space
    assert(run("A b. C d! A b. E f.") == (("A b. C d! E f.", 4L, 1L)))
    // all distinct: text survives verbatim up to the consumed spaces
    assert(run("One two. Three four!") == (("One two. Three four!", 2L, 0L)))
    // a doc that is one sentence repeated collapses to one copy
    assert(run("Same. Same. Same.") == (("Same.", 3L, 2L)))
    // no boundary: the whole text is one (trivially unique) sentence
    assert(run("no boundary here") == (("no boundary here", 1L, 0L)))
    // near-duplicates differing by one char both survive (EXACT match)
    assert(run("A b. A c. A b.") == (("A b. A c.", 3L, 1L)))
  }

  test("dedupSentences: zero shuffles, in codegen") {
    // range source (not a local Seq): a LocalTableScan constant-folds
    // the whole projection at plan time and proves nothing
    val docs = spark.range(3).select(col("id"),
      concat(lit("A b. C d! A b. Doc "), col("id").cast("string"),
        lit(".")).as("t"))
    val out = TextAnalysis.dedupSentences(docs, "t", "id")
    assert(out.collect().forall(_.getAs[Long]("n_removed") == 1L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1)"), plan) // whole-stage codegen span
  }

  test("chunkSentences: greedy budget, no mid-sentence cut, oversize") {
    def chunks(t: String, b: Int): Seq[String] =
      Seq(t).toDF("t").select(TextAnalysis.chunkSentences(col("t"), b))
        .collect().head.getSeq[String](0)
    // sentences of 8/9/7 chars: budget 20 holds two, then the third
    val c = chunks("One two. Three ok! Go now.", 20)
    assert(c == Seq("One two. Three ok!", "Go now."))
    // every chunk within budget; sentences never cut
    assert(c.forall(_.length <= 20))
    // a single oversized sentence becomes its own chunk, uncut
    val big = chunks("Tiny. " +
      "This single sentence is far longer than the budget allows", 20)
    assert(big == Seq("Tiny.",
      "This single sentence is far longer than the budget allows"))
    // budget larger than the text: one chunk, original joining
    assert(chunks("A b. C d! E f.", 200) == Seq("A b. C d! E f."))
    // empty text: no chunks at all
    assert(chunks("", 20).isEmpty)
  }

  test("htmlLinks extracts hrefs in document order; empty when none") {
    val html = """<a href="/a">x</a><p><A Href="http://h/">y</A>""" +
      """<a data-href="/no">z</a><a href="#f">w</a>"""
    val links = Seq(html, "<p>no links</p>").toDF("t")
      .select(TextAnalysis.htmlLinks(col("t")))
      .collect().map(_.getSeq[String](0))
    assert(links(0) == Seq("/a", "http://h/", "#f"))
    assert(links(1) == Seq.empty)
  }

  test("readability: hand-counted sentences, words, vowel groups") {
    val df = Seq(
      (1L, "The cat sat. It purred!"), // 2 sentences, 5 words
      (2L, ""), (3L, "fragment without end"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_syllable_groups"), r.getAs[Long]("wps_ppm"),
          r.getAs[Long]("spw_ppm"))).toMap
    // vowel groups in "the cat sat. it purred!": e,a,a,i,u,e = 6
    assert(out(1L) == ((2L, 5L, 6L, 2500000L, 1200000L)))
    assert(out(2L) == ((1L, 0L, 0L, 0L, 0L)))     // empty doc visible
    assert(out(3L) == ((1L, 3L, 5L, 3000000L, 1666666L)))
  }

  test("htmlAnchors pairs hrefs with trimmed labels; nested markup skipped") {
    val html = """<a href="/a"> click me </a><A Href="http://h/">Y</A>""" +
      """<a data-href="/no">z</a><a href="/rich"><b>bold</b></a>""" +
      """<a href="/empty"></a>"""
    val out = Seq(html).toDF("t")
      .select(TextAnalysis.htmlAnchors(col("t")).as("a"))
      .selectExpr("explode(a) AS p").select(col("p.href"), col("p.anchor"))
      .as[(String, String)].collect().toSeq
    // data-href is not a link; the nested-<b> anchor is out of scope
    assert(out == Seq("/a" -> "click me", "http://h/" -> "Y",
      "/empty" -> ""))
  }

  test("anchorTextAgg: majority anchor, lexicographic tie-break") {
    val a = Seq(
      ("t1", "home"), ("t1", "home"), ("t1", "start"),
      ("t2", "beta"), ("t2", "alpha")) // tie at 1 → 'alpha' wins
      .toDF("href", "anchor")
    val out = TextAnalysis.anchorTextAgg(a, "href", "anchor")
      .collect().map(r => r.getAs[String]("target") ->
        (r.getAs[Long]("n_links"), r.getAs[Long]("n_unique_anchors"),
          r.getAs[String]("top_anchor"), r.getAs[Long]("top_anchor_n")))
      .toMap
    assert(out("t1") == ((3L, 2L, "home", 2L)))
    assert(out("t2") == ((2L, 2L, "alpha", 1L)))
  }

  test("fuzzyTermPairs matches the brute-force levenshtein join") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 150)
      .map(_ => (1 to (2 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .distinct.toDF("term")
    val got = TextAnalysis.fuzzyTermPairs(vocab, "term")
      .as[(String, String)].collect().toSet
    val brute = vocab.as("x").join(vocab.as("y"),
        col("x.term") < col("y.term") &&
          levenshtein(col("x.term"), col("y.term")) <= 1)
      .select(col("x.term"), col("y.term"))
      .as[(String, String)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("bpeSegment applies merges in table order, leftmost-nonoverlapping") {
    import graft.operators.TextAnalysis
    def seg(text: String, merges: Seq[(String, String)]): Seq[String] =
      Seq(text).toDF("t")
        .select(TextAnalysis.bpeSegment(col("t"), merges).as("s"))
        .head.getSeq[String](0)
    // later merges consume earlier symbols: i+n -> in, j+o -> jo, jo+in
    val m = Seq(("i", "n"), ("j", "o"), ("jo", "in"))
    assert(seg("join in jon", m) == Seq("join", "in", "jo", "n"))
    // order matters: without the i+n rule first, jo+in never forms
    assert(seg("join", Seq(("j", "o"), ("jo", "in"), ("i", "n"))) ==
      Seq("jo", "in"))
    // leftmost-nonoverlapping on runs: 'aaa' with a+a -> aa, not a|aa
    assert(seg("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // untouched words stay fully character-segmented
    assert(seg("xy", m) == Seq("x", "y"))
    // count helper agrees
    val n = Seq("join in").toDF("t")
      .select(TextAnalysis.bpeTokenCount(col("t"), m)).head.getLong(0)
    assert(n == 2L)
    intercept[IllegalArgumentException](seg("x", Seq(("a b", "c"))))
  }

  test("bpeTrain learns the most frequent pair per round, ties by symbol") {
    import graft.operators.TextAnalysis
    // 'abab abq' + 'ab': pairs round 1: (a,b) x4, (b,a) x1, (b,q) x1
    val df = Seq("abab abq", "ab").toDF("text")
    val learned = TextAnalysis.bpeTrain(df, "text", nMerges = 2)
    assert(learned.head == ("a", "b", 4L))
    // round 2 operates on merged symbols: 'ab ab', 'ab q', 'ab' →
    // pairs: (ab,ab) x1, (ab,q) x1 → tie on count, 'ab ab' < 'ab q'
    assert(learned(1) == ("ab", "ab", 1L))
    // exhaustion: a corpus of single-char words has no pairs to learn
    assert(TextAnalysis.bpeTrain(Seq("a b c").toDF("text"), "text", 5)
      .isEmpty)
  }

  test("bpeTrain over the type table equals direct per-document training") {
    import graft.operators.TextAnalysis
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // plain-Scala reference: per-document char split + the same
    // leftmost-nonoverlapping replace chain bpeSegment uses, counted
    // WITHOUT the word-type pre-aggregation — the trainer must be
    // bit-identical (pair counting distributes over word multiplicity)
    def reference(corpus: Seq[String], n: Int): Seq[(String, String, Long)] = {
      var merges = Vector.empty[(String, String)]
      val out = Vector.newBuilder[(String, String, Long)]
      var done = false
      for (_ <- 1 to n if !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        corpus.foreach(_.split(" ", -1).foreach { w =>
          val seg0 = w.toCharArray.map(_.toString).mkString(" ")
          val seg = merges.foldLeft(seg0) { case (s, (a, b)) =>
            s.replace(s"$a $b", a + b) }
          val sym = if (seg.isEmpty) Array.empty[String] else seg.split(" ")
          sym.lazyZip(sym.drop(1)).foreach { (a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + 1 }
        })
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) =>
            (-c, a, b) }
          out += ((a, b, c)); merges :+= ((a, b))
        }
      }
      out.result()
    }
    val genWord = Gen.oneOf("ab", "aba", "abab", "aaa", "aaaa", "xy",
      "abq", "a", "")
    val genDoc = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, genDoc))
    val prop = Prop.forAll(genCorpus) { corpus =>
      TextAnalysis.bpeTrain(corpus.toDF("text"), "text", 3) ==
        reference(corpus, 3)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(r.passed, r.status.toString)
  }

  test("privacyAudit: under-k and under-l groups flagged, nulls partition") {
    import graft.operators.Curation
    val df = Seq(
      ("en", "a", 1L), ("en", "a", 2L), ("en", "a", 3L),  // k=3 ok, l=3 ok
      ("en", "b", 1L), ("en", "b", 1L), ("en", "b", 1L),  // l: 1 distinct
      ("de", "c", 1L),                                    // k: size 1
      (null, "d", 1L), (null, "d", 2L), (null, "d", 3L))  // null QI group
      .toDF("lang", "src", "sens")
    val out = Curation.privacyAudit(df, Seq("lang", "src"), "sens",
        k = 3, l = 3)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(!out.contains((Some("en"), "a")))
    assert(out((Some("en"), "b")) == ((3L, 1L, 0L, 1L)))
    assert(out((Some("de"), "c")) == ((1L, 1L, 1L, 1L)))
    assert(!out.contains((None, "d"))) // 3 members, 3 distinct → clean
    intercept[IllegalArgumentException](
      Curation.privacyAudit(df, Seq.empty, "sens", 3, 3))
  }

  test("benfordDigits: fixed table, zero digits present, positives only") {
    import graft.operators.Curation
    // log10(2) = 0.30103 → 301029
    assert(Curation.benfordMicro.head == 301029L)
    assert(Curation.benfordMicro.sum >= 999990L) // ≈ 1e6 minus floors
    val vals = Seq(1L, 19L, 150L, 2L, 2000L, -5L, 0L)
      .toDF("v") // digits: 1,1,1,2,2; non-positives dropped
    val out = Curation.benfordDigits(vals, "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out.size == 9)
    assert(out(1L)._1 == 3L && out(2L)._1 == 2L && out(9L)._1 == 0L)
    assert(out(1L)._2 == 5L) // n counts only positives
    // deviation: 3e6 − 5·301029 = 1494855
    assert(out(1L)._3 == 1494855L)
  }

  test("tableChecksum: order/partition independent, null-distinct") {
    import graft.operators.Tools
    val a = Seq((1L, "x"), (2L, "y"), (3L, null)).toDF("id", "s")
    val cs1 = Tools.tableChecksum(a, Seq("id", "s")).collect().head
    // same rows, reversed order, different partitioning → same checksum
    val b = Seq((3L, null), (2L, "y"), (1L, "x")).toDF("id", "s")
      .repartition(7)
    val cs2 = Tools.tableChecksum(b, Seq("id", "s")).collect().head
    assert(cs1.getLong(0) == 3L && cs1.getLong(1) == cs2.getLong(1))
    // a literal "null" string is NOT a null
    val c = Seq((3L, "null"), (2L, "y"), (1L, "x")).toDF("id", "s")
    val cs3 = Tools.tableChecksum(c, Seq("id", "s")).collect().head
    assert(cs3.getLong(1) != cs1.getLong(1))
    // the token encoding is uniquely decodable: shifting a boundary
    // separator between fields must CHANGE the checksum
    val e1 = Tools.tableChecksum(
      Seq(("a\u0001b", "c")).toDF("x", "y"), Seq("x", "y")).collect().head
    val e2 = Tools.tableChecksum(
      Seq(("a", "b\u0001c")).toDF("x", "y"), Seq("x", "y")).collect().head
    assert(e1.getLong(1) != e2.getLong(1))
    val empty = Tools.tableChecksum(a.limit(0), Seq("id", "s"))
      .collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
    intercept[IllegalArgumentException](Tools.tableChecksum(a, Seq.empty))
  }

  test("refIntegrity: orphans, null FKs, exact permille") {
    import graft.operators.Curation
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq(Some(10L), Some(10L), Some(20L), Some(99L),
      Some(99L), Some(98L), None).toDF("fk")
    val r = Curation.refIntegrity(child, "fk", parent, "pk")
      .collect().head
    // 6 non-null FKs, 1 null, 3 orphan rows over 2 orphan keys,
    // 3·1000 div 6 = 500‰
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((6L, 1L, 3L, 2L, 500L)))
  }

  test("fieldSurvivorship: majority, recency tie-break, null drop") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // cluster 1: name votes ann×2, anne×1, bob×1 → "ann"; city votes
    // sfo×2 (latest t=10), nyc×1 → "sfo"; the null city row drops
    val recs = Seq(
      (1L, t(10), "ann", "sfo"),
      (1L, t(20), "ann", null),
      (1L, t(30), "anne", "nyc"),
      (1L, t(5), "bob", "sfo"),
      (2L, t(1), "zed", "ber"))
      .toDF("cl", "ts", "name", "city")
    val out = graft.operators.Dedup.fieldSurvivorship(recs, "cl", "ts",
        Seq("name", "city"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, "name")) == (("ann", 2L, 3L)))
    // city: sfo ×2 (last t=10) beats nyc ×1 → majority wins
    assert(out((1L, "city")) == (("sfo", 2L, 2L)))
    assert(out((2L, "name")) == (("zed", 1L, 1L)))
    // recency tie-break: equal counts → latest ts wins
    val tie = Seq((9L, t(1), "x"), (9L, t(9), "y"))
      .toDF("cl", "ts", "f")
    val w = graft.operators.Dedup.fieldSurvivorship(tie, "cl", "ts",
        Seq("f")).collect().head
    assert(w.getString(2) == "y" && w.getLong(4) == 2L)
    intercept[IllegalArgumentException](
      graft.operators.Dedup.fieldSurvivorship(recs, "cl", "ts", Seq.empty))
  }

  test("functionalDependencies: holds/violations/null semantics") {
    import graft.operators.Curation
    val df = Seq(
      ("b1", "m1", "x"), ("b1", "m1", "y"),   // b1 → m1 consistently
      ("b2", "m2", "x"), ("b2", "m2", "x"),
      ("b3", null, "z"),                       // null rhs ≠ second value
      (null, "m3", "w"))                       // null lhs row excluded
      .toDF("brand", "mfgr", "c")
    val out = Curation.functionalDependencies(df,
        Seq("brand", "mfgr", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // brand → mfgr holds over 3 brand keys, 0 violations
    assert(out(("brand", "mfgr")) == ((3L, 0L, 1L)))
    // mfgr → brand holds too here (m1→b1, m2→b2, m3→null-lhs rows
    // still count: m3's brand is null → countDistinct 0 → no violation)
    assert(out(("mfgr", "brand")) == ((3L, 0L, 1L)))
    // c → brand violated at c=x (b1, b2)
    assert(out(("c", "brand")) == ((4L, 1L, 0L)))
    assert(out.size == 6)
    intercept[IllegalArgumentException](
      Curation.functionalDependencies(df, Seq("brand")))
  }

  test("rankCorrelation: perfect, inverted, and null-row handling") {
    import graft.operators.Curation
    def rho(rows: Seq[(Long, java.lang.Double, java.lang.Double)]) = {
      val r = Curation.rankCorrelation(rows.toDF("id", "x", "y"),
        "id", "x", "y").collect().head
      (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    val d = (v: Double) => java.lang.Double.valueOf(v)
    // monotone together → ρ = 1000
    assert(rho(Seq((1L, d(1), d(10)), (2L, d(2), d(20)),
      (3L, d(3), d(30)), (4L, d(4), d(40)))) == ((4L, Some(1000L))))
    // perfectly inverted → ρ = −1000 (Σd² = 20, 6·20·1000 div 60 = 2000)
    assert(rho(Seq((1L, d(1), d(40)), (2L, d(2), d(30)),
      (3L, d(3), d(20)), (4L, d(4), d(10)))) == ((4L, Some(-1000L))))
    // null on either side drops the ROW before ranking
    assert(rho(Seq((1L, d(1), d(1)), (2L, null, d(2)),
      (3L, d(3), null), (4L, d(4), d(4)))) == ((2L, Some(1000L))))
    // a single surviving row has no defined ρ
    assert(rho(Seq((1L, d(1), d(1)))) == ((1L, None)))
  }

  test("giniDiversity: monoculture 0, even split, null categories drop") {
    import graft.operators.Curation
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "a"),            // monoculture
      ("g2", "a"), ("g2", "b"),                         // even 2-way
      ("g3", "a"), ("g3", "b"), ("g3", "b"), ("g3", null)) // null drops
      .toDF("g", "c")
    val out = Curation.giniDiversity(df, "g", "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("g1") == ((3L, 1L, 0L)))
    // 1 - (1+1)/4 = 1/2 → 500‰
    assert(out("g2") == ((2L, 2L, 500L)))
    // n=3 (null dropped): 1 - (1+4)/9 = 4/9 → 1000 - 5000 div 9 = 445
    assert(out("g3") == ((3L, 2L, 445L)))
  }

  test("raterAgreement: hand-checked kappa incl. negative and undefined") {
    import graft.operators.Curation
    def kappa(pairs: Seq[(String, String)]) = {
      val r = Curation.raterAgreement(pairs.toDF("r1", "r2"), "r1", "r2")
        .collect().head
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    // N=6, A=4, P=20 → κ = 4000 div 16 = 250‰
    assert(kappa(Seq(("a", "a"), ("a", "a"), ("a", "a"), ("b", "b"),
      ("a", "b"), ("b", "a"))) == ((6L, 4L, Some(250L))))
    // worse than chance → NEGATIVE, trunc-toward-zero on both engines
    assert(kappa(Seq(("a", "b"), ("b", "a"), ("a", "a"))) ==
      ((3L, 1L, Some(-500L))))
    // both raters constant and equal: p_e = 1 → κ undefined (null)
    assert(kappa(Seq(("x", "x"), ("x", "x"))) == ((2L, 2L, None)))
    // null labels drop from N
    assert(kappa(Seq(("a", "a"), (null, "a"), ("b", null),
      ("b", "b")))._1 == 2L)
  }

  test("chi2Terms: hand-checked 2x2 chi-square, floors and drops") {
    val df = Seq(
      ("x a common", Some(true)), ("x b common", Some(true)),
      ("x c common", Some(true)), ("x d common", Some(true)),
      ("y a common", Some(false)), ("y b common", Some(false)),
      ("y c common", Some(false)), ("y d common", None))
      .toDF("text", "pos")
    val out = TextAnalysis.chi2Terms(df, "text", "pos", minDf = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // "x": a=4 b=0 c=0 d=4 → χ²=8 → 800 centi (null class = negative)
    assert(out("x") == ((4L, 0L, 0L, 4L, 800L)))
    assert(out("y") == ((0L, 4L, 4L, 0L, 800L)))
    // "common" is in every doc → dropped (χ² undefined);
    // "a".."d" have df 2 each, χ²=0
    assert(!out.contains("common"))
    assert(out("a") == ((1L, 1L, 3L, 3L, 0L)))
    // duplicate terms in one doc count once: df("x a x") has a once
    val dup = Seq(("x x x", Some(true)), ("q", Some(false)))
      .toDF("text", "pos")
    val d2 = TextAnalysis.chi2Terms(dup, "text", "pos", minDf = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d2("x") == 1L)
    intercept[IllegalArgumentException](
      TextAnalysis.chi2Terms(df, "text", "pos", minDf = 0))
  }

  test("sortedNeighborhood matches the naive windowed formulation") {
    val recs = Seq(
      (1L, "alpha"), (2L, "alphb"), (3L, "alpzz"), (4L, "beta"),
      (5L, "betaa"), (6L, "gamma"), (7L, "gamna"), (8L, "delta"),
      (9L, "zzzz"), (10L, "alpha"))
      .toDF("id", "nm")
    val out = Dedup.sortedNeighborhood(recs, "id", "nm", "nm",
        window = 3, maxEdits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sorted = recs.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(t => (t._2, t._1))
    val expect = (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + 3, sorted.length)
    } yield (sorted(i)._1, sorted(j)._1,
        lev(sorted(i)._2, sorted(j)._2).toLong))
      .filter(_._3 <= 2L).toSet
    // the 32-way shuffle over 10 rows forces window spans ACROSS range
    // partitions — the offset arithmetic, not luck, must close them
    assert(out == expect && expect.nonEmpty)
    intercept[IllegalArgumentException](
      Dedup.sortedNeighborhood(recs, "id", "nm", "nm", 1, 2))
    intercept[IllegalArgumentException](
      Dedup.sortedNeighborhood(recs, "id", "nm", "nm", 3, -1))
  }

  test("removeBoilerplateLines: per-group df threshold, order kept") {
    val df = Seq(
      (1L, "s1", "banner\nunique one\nfooter"),
      (2L, "s1", "banner\nunique two\nfooter"),
      (3L, "s1", "banner\nfooter\nunique three\nbanner"),
      (4L, "s2", "banner\nunique four"), // s2: banner only 1 doc → kept
      (5L, "s2", "  \nunique five"))     // blank line never flagged
      .toDF("doc_id", "source", "page")
    val out = TextAnalysis.removeBoilerplateLines(
        df, "page", "doc_id", "source", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // s1: banner in 3 docs, footer in 3 docs → both stripped
    assert(out(1L) == (("unique one", 3L, 2L)))
    assert(out(2L) == (("unique two", 3L, 2L)))
    // doc 3 has banner twice — both copies go (4 lines, 3 removed)
    assert(out(3L) == (("unique three", 4L, 3L)))
    // s2 is its own group: nothing reaches 3 docs
    assert(out(4L) == (("banner\nunique four", 2L, 0L)))
    assert(out(5L) == (("  \nunique five", 2L, 0L)))
    intercept[IllegalArgumentException](
      TextAnalysis.removeBoilerplateLines(df, "page", "doc_id",
        "source", minDocs = 1))
  }

  test("removeBoilerplateLines: all lines dropped → empty text") {
    val df = Seq(
      (1L, "g", "x"), (2L, "g", "x"), (3L, "g", "x"))
      .toDF("doc_id", "source", "page")
    val rows = TextAnalysis.removeBoilerplateLines(
        df, "page", "doc_id", "source", minDocs = 3)
      .collect()
    assert(rows.forall(r => r.getString(1) == "" &&
      r.getLong(2) == 1L && r.getLong(3) == 1L))
  }

  test("dnsAnalytics: hand-checked label signals and tunnel aggregates") {
    import graft.operators.DnsAnalytics
    val df = Seq(
      ("deadbeef01.tun1.com", 1L),
      ("deadbeef01.tun1.com", 1L), // repeat lookup
      ("cafe1234ff.tun1.com", 1L),
      ("www.corp1.com", 1L),
      ("www.corp1.com", 1L),
      ("", 1L))
      .toDF("name", "cnt")
    val sig = DnsAnalytics.labelSignals(
        df.select(col("name")).distinct().filter(col("name") =!= ""),
        "name")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // 17 chars; digits 3 → 176‰; hex 12 → 705‰; vowels 6 → 352‰
    assert(sig("deadbeef01.tun1.com") == ((3L, 10L, 17L, 176L, 705L, 352L)))
    // 11 chars; digit 1 → 90‰; hex {c,1,c} → 272‰; vowels {o,o} → 181‰
    assert(sig("www.corp1.com") == ((3L, 5L, 11L, 90L, 272L, 181L)))
    // empty name: one empty label, zero chars, null permilles
    val empty = DnsAnalytics.labelSignals(
        df.select(col("name")).filter(col("name") === "").limit(1),
        "name")
      .collect().head
    assert(empty.getLong(1) == 1L && empty.getLong(3) == 0L &&
      empty.isNullAt(4) && empty.isNullAt(5) && empty.isNullAt(6))
    val tun = DnsAnalytics.tunnelAggregates(df, "name", "cnt")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // tun1.com: 2 unique over 3 lookups → 666‰ fresh; 19+19+19 chars
    assert(tun("tun1.com") == ((2L, 3L, 19L, 57L, 666L)))
    assert(tun("corp1.com") == ((1L, 2L, 13L, 26L, 500L)))
    assert(tun("") == ((1L, 1L, 0L, 0L, 1000L)))
    // approxDistinct = true swaps countDistinct for the KMV sketch —
    // exact below k, so on this fixture the whole output (including
    // the derived uniq_permille) is identical to the exact path
    val approx = DnsAnalytics.tunnelAggregates(df, "name", "cnt",
        approxDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(approx == tun)
    intercept[IllegalArgumentException](
      DnsAnalytics.tunnelAggregates(df, "name", "cnt", parentLabels = 0))
  }

  test("lineLanguages: per-doc majority, minority share, blanks skipped") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "the cat of doom\n\nel la de y no\nthe a of and"),
      (2L, "xyzzy qwerty")).toDF("id", "t")
    val out = TextAnalysis.lineLanguages(df, "t", "id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toMap
    // 3 non-blank lines: en, es, en → majority en, minority 333‰
    assert(out(1L) == ((3L, "en", 2L, 333L)))
    assert(out(2L) == ((1L, "und", 1L, 0L)))
  }

  test("bracketBalance: deltas, parity, positive-only flag") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "f(x) { a[0] = \"ok\" }"), // balanced → no flag
      (2L, "f(x { a[0"),              // ( { [ all open → flag
      (3L, "weird ) } ]"),            // negative deltas → NO flag
      (4L, "say \"un terminated")     // odd quotes → flag
    ).toDF("id", "t")
    val out = TextAnalysis.bracketBalance(df, "t", "id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(out(2L) == ((1L, 1L, 1L, 0L, 1L)))
    assert(out(3L) == ((-1L, -1L, -1L, 0L, 0L)))
    assert(out(4L) == ((0L, 0L, 0L, 1L, 1L)))
  }

  test("delimitedAudit: modal width, ragged share, determinism") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a,b,c\n1,2,3\nx,y\nq,w,e"), // 3,3,2,3 → modal 3, ragged 250
      (2L, "a,b\nc,d"),                 // uniform
      (3L, "a,b\nc,d,e")                // 1-1 tie → smaller width wins
    ).toDF("id", "t")
    val out = TextAnalysis.delimitedAudit(df, "t", "id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((4L, 3L, 3L, 250L)))
    assert(out(2L) == ((2L, 2L, 2L, 0L)))
    assert(out(3L) == ((2L, 2L, 1L, 500L)))
  }

  test("embeddingNorms: exact buckets, planted zero") {
    import graft.operators.Similarity
    // scaled by 1e5: [0.01, 0] → n2 = 1000² = 1e6 → bucket 0;
    // [1.0, 0] → 1e10 → bucket 1 at width 1e10; [0,0] → 0 → bucket 0
    val df = Seq(
      (1L, Array(0.01f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingNorms(df, "vec_id", "embedding",
        bucketWidth = 10000000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 0L, 1000000L)))
    assert(out(1L) == ((1L, 10000000000L, 10000000000L)))
    intercept[IllegalArgumentException](
      Similarity.embeddingNorms(df, "vec_id", "embedding", 0L))
  }

  test("typoNames: distance-1 hits, exact + confusable excluded") {
    import graft.operators.DnsAnalytics
    val names = Seq("pypal.evil.com", "payypal.x.net", "paypal.com",
      "paypa1.z.org", "unrelated.site").toDF("name")
    val brands = Seq("paypal").toDF("brand")
    val hits = DnsAnalytics.typoNames(names, "name", brands, "brand")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(hits == Set(
      ("pypal.evil.com", "pypal", "paypal", 1L),
      ("payypal.x.net", "payypal", "paypal", 1L)))
    // the exact brand and the leetsquat (skeleton-equal) stay out
    assert(!hits.exists(_._1 == "paypal.com"))
    assert(!hits.exists(_._1 == "paypa1.z.org"))
  }

  test("htmlTables: addressing, strip, trim, case, flat-subset") {
    import graft.operators.TextAnalysis
    val html = "<table><tr><th>a</th><th> b </th></tr>" +
      "<tr><td><i>x</i></td></tr></table>" +
      "<TABLE><tr><td>q</td></tr></TABLE>"
    val out = TextAnalysis.htmlTables(
        Seq((1L, html)).toDF("id", "h"), "h", "id")
      .collect().map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getString(4))
      .toMap
    assert(out((1L, 1L, 1L)) == "a" && out((1L, 1L, 2L)) == "b") // trim
    assert(out((1L, 2L, 1L)) == "x") // inner tag stripped, ragged row
    assert(out((2L, 1L, 1L)) == "q") // case-insensitive tags
    assert(out.size == 4)
  }

  test("fenceLanguages: labeled openers only, lowercased") {
    import graft.operators.TextAnalysis
    val df = Seq("```Python\nx\n```\ntext\n```c++\ny\n```",
      "```\nbare\n```", "no fences ``` inline").toDF("t")
    val out = TextAnalysis.fenceLanguages(df, "t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // bare fences and the labeled blocks' closers never count; the
    // mid-line ``` is not a fence (line-start anchor)
    assert(out == Map("python" -> 1L, "c++" -> 1L))
  }

  test("blockingQuality: counted candidates, coverage, reduction") {
    import graft.operators.Dedup
    // first-letter blocks: {1,2,3}=a {4,5}=b {6}=c → candidates 3+1+0
    val recs = Seq((1L, "ax"), (2L, "ay"), (3L, "az"), (4L, "bx"),
      (5L, "by"), (6L, "cx")).toDF("id", "t")
    // (1,2) covered; (3,4),(5,6) cross-block; (7,8) ids absent → drop
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("a", "b")
    val r = Dedup.blockingQuality(recs, "id",
      substring(col("t"), 1, 1), truth, "a", "b").collect().head
    // pc = 1/3 → 333‰; rr = 1000 − 4·1000 div C(6,2)=15 → 734‰
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((6L, 3L, 4L, 3L, 1L, 333L, 734L)))
  }

  test("fastFluxSignals: ip volume, /24 spread, co-tenant max") {
    import graft.operators.DnsAnalytics
    val df = Seq(
      // flux.bad: 3 IPs across 2 /24s; 10.0.0.1 also hosts corp.com
      ("flux.bad", "10.0.0.1"), ("flux.bad", "10.0.0.2"),
      ("flux.bad", "10.9.9.9"), ("flux.bad", "10.0.0.1"), // dup incidence
      ("corp.com", "10.0.0.1"),
      ("solo.org", "192.168.1.5")).toDF("name", "ip")
    val r = DnsAnalytics.fastFluxSignals(df, "name", "ip")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("flux.bad") == ((3L, 2L, 2L))) // 10.0.0.1 shared by 2 names
    assert(r("corp.com") == ((1L, 1L, 2L)))
    assert(r("solo.org") == ((1L, 1L, 1L)))
  }

  test("coverageGaps: day census, missing days, longest dark run") {
    import graft.operators.Events
    val D = 86400000000L
    val df = Seq(
      ("s1", 1 * D), ("s1", 1 * D + 5), // day 1 (dup collapses)
      ("s1", 2 * D),                    // day 2
      ("s1", 5 * D),                    // 2-day gap (3, 4)
      ("s1", 9 * D),                    // 3-day gap (6, 7, 8) — longest
      ("s2", 4 * D)                     // single-day key
    ).toDF("k", "ts")
    val r = Events.coverageGaps(df, "k", "ts").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // span 1..9 = 9 days, 4 observed, 5 missing, longest run 3
    assert(r("s1") == ((1L, 9L, 4L, 3L, 5L)))
    assert(r("s2") == ((4L, 4L, 1L, 0L, 0L)))
  }

  test("coTenancy: tenant census, dominant share, tie to smallest") {
    import graft.operators.DnsAnalytics
    val df = Seq(
      ("10.0.0.1", "a.com", 3L), ("10.0.0.1", "b.com", 1L),
      ("10.0.0.1", "a.com", 2L), // a.com mass 5 of 6
      ("10.0.0.2", "x.com", 2L), ("10.0.0.2", "w.com", 2L), // tie → w
      ("10.0.0.3", "solo.org", 4L)
    ).toDF("ip", "name", "cnt")
    val r = DnsAnalytics.coTenancy(df, "ip", "name", "cnt").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getString(3), x.getLong(4))).toMap
    assert(r("10.0.0.1") == ((2L, 6L, "a.com", 833L)))
    assert(r("10.0.0.2") == ((2L, 4L, "w.com", 500L)))
    assert(r("10.0.0.3") == ((1L, 4L, "solo.org", 1000L)))
  }

  test("nodRollup: day census split by parent novelty") {
    import graft.operators.DnsAnalytics
    val D = 86400000000L
    val df = Seq(
      ("a.new.com", 10 * D + 5), // new name, parent new.com also new
      ("b.new.com", 11 * D),     // new name, same new parent, next day
      ("c.old.com", 10 * D + 7), // new name under the ESTABLISHED parent
      ("z.old.com", 2 * D),      // pre-window; establishes old.com
      ("z.old.com", 12 * D),     // later dup — min fold keeps 2*D
      ("solo", 10 * D + 1)       // single label: its own parent, new
    ).toDF("name", "ts")
    val r = DnsAnalytics.nodRollup(df, "name", "ts", fromMicros = 10 * D)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(
      10L -> ((3L, 2L, 666L)), // a + solo new-parent, c established
      11L -> ((1L, 1L, 1000L))))
    intercept[IllegalArgumentException] {
      DnsAnalytics.nodRollup(df, "name", "ts", 0L, parentLabels = 0)
    }
  }

  test("lookalike: skeleton folds leet + hyphens, self-excluded") {
    import graft.operators.DnsAnalytics
    val names = Seq("paypa1.evil.com", "g00gle.x.net", "pay-pal.z.org",
      "paypal.com", "amaz0n.shop", "unrelated.site")
      .toDF("name")
    val brands = Seq("PayPal", "google", "amazon").toDF("brand")
    val hits = DnsAnalytics.lookalikeNames(names, "name", brands, "brand")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(hits == Set(
      ("paypa1.evil.com", "paypa1", "paypal"),
      ("g00gle.x.net", "g00gle", "google"),
      ("pay-pal.z.org", "pay-pal", "paypal"),
      ("amaz0n.shop", "amaz0n", "amazon")))
    // "paypal.com" label == brand → self-excluded, NOT a lookalike
    assert(!hits.exists(_._1 == "paypal.com"))
  }

  test("newlyObserved: name-grain min, window filter, day bucket") {
    import graft.operators.DnsAnalytics
    val agg = Seq(
      ("a.com", 100L), ("a.com", 50L), // name min 50 < 60 → filtered
      ("b.com", 86400000005L),         // lands in UTC day 1
      ("c.com", 60L))                  // exactly at the boundary: kept
      .toDF("rrname", "first_seen")
    val out = DnsAnalytics.newlyObserved(agg, "rrname", "first_seen",
        fromMicros = 60L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("b.com" -> ((86400000005L, 1L)),
      "c.com" -> ((60L, 0L))))
  }

  test("imputeMedian: lower median, empty group keeps nulls") {
    import graft.operators.Curation
    def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val df = Seq(
      ("a", L(1L)), ("a", L(3L)), ("a", L(9L)),      // odd: median 3
      ("a", null.asInstanceOf[java.lang.Long]),
      ("b", L(2L)), ("b", L(4L)), ("b", L(6L)), ("b", L(8L)), // even:
      ("b", null.asInstanceOf[java.lang.Long]),      // lower median 4
      ("c", null.asInstanceOf[java.lang.Long]))      // no values
      .toDF("g", "v")
    val out = Curation.imputeMedian(df, "g", "v")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    assert(out(("a", -1L)) == List(Some(3L)))
    assert(out(("b", -1L)) == List(Some(4L)))
    assert(out(("c", -1L)) == List(None)) // no invented global fill
    assert(out(("a", 9L)) == List(Some(9L))) // non-nulls untouched
  }

  test("winsorize: exact bounds, clamping, null passthrough") {
    import graft.operators.Curation
    val df = (1L to 10L).map(i => (i, java.lang.Double.valueOf(i * 10.0)))
      .toDF("id", "v")
      .unionByName(Seq((99L, null.asInstanceOf[java.lang.Double]))
        .toDF("id", "v"))
    // n=10 non-null: p20 → rank (20*10+99)//100 = 2 → 20.0;
    // p80 → rank 8 → 80.0
    val out = Curation.winsorize(df, "v", "id", pLow = 20, pHigh = 80)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(1L) == Some(20.0) && out(2L) == Some(20.0))
    assert(out(5L) == Some(50.0))
    assert(out(8L) == Some(80.0) && out(10L) == Some(80.0))
    assert(out(99L).isEmpty) // null rides through
    intercept[IllegalArgumentException](
      Curation.winsorize(df, "v", "id", 80, 20))
  }

  test("pdfTextColumns: dehyphenate, ligatures, reflow, counts") {
    val raw = "A ﬁne ﬂow of exam-\nple text\u0007 here.\n\n" +
      "Second para starts\nand wraps on."
    val r = Seq((1L, raw)).toDF("id", "t")
      .select(col("id") +: TextAnalysis.pdfTextColumns(col("t")): _*)
      .collect().head
    assert(r.getString(1) ==
      "A fine flow of example text here.\n\n" +
        "Second para starts and wraps on.")
    assert(r.getLong(2) == 1L) // hyphen join
    assert(r.getLong(3) == 2L) // ligatures
    assert(r.getLong(4) == 1L) // BEL control
    // clean text passes through untouched (modulo nothing)
    val plain = Seq((1L, "already clean text")).toDF("id", "t")
      .select(col("id") +: TextAnalysis.pdfTextColumns(col("t")): _*)
      .collect().head
    assert(plain.getString(1) == "already clean text" &&
      (2 to 4).forall(i => plain.getLong(i) == 0L))
    // an UPPER-case or digit hyphen line-break is a real compound
    // (e.g. "X-\nray" could be a name): rule only joins [a-z]-\n[a-z]
    val keep = Seq((1L, "the X-\nray case")).toDF("id", "t")
      .select(col("id") +: TextAnalysis.pdfTextColumns(col("t")): _*)
      .collect().head
    assert(keep.getString(1) == "the X- ray case" &&
      keep.getLong(2) == 0L)
  }

  test("splitTurns: roles, preamble, mid-line markers, train mask") {
    val t1 = "User: hi\nAssistant: quoting User: x here\nstays one " +
      "turn\nUser: ok\nAssistant: done"
    val t2 = "preamble line\nUser: q\nAssistant: a"
    val out = Seq((1L, t1), (2L, t2)).toDF("id", "t")
    val rows = TextAnalysis.splitTurns(out, "t", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3), r.getLong(4))).toMap
    // doc 1 starts with a marker: empty preamble piece dropped, turns
    // are 1..4; the mid-line "User:" stays inside turn 2's content
    assert(rows((1L, 1L)) == (("User", "hi", 0L)))
    assert(rows((1L, 2L)) ==
      (("Assistant", "quoting User: x here\nstays one turn", 1L)))
    assert(rows((1L, 3L)) == (("User", "ok", 0L)))
    assert(rows((1L, 4L)) == (("Assistant", "done", 1L)))
    assert(!rows.contains((1L, 0L)))
    // doc 2: non-empty preamble kept at idx 0 with empty role
    assert(rows((2L, 0L)) == (("", "preamble line", 0L)))
    assert(rows((2L, 1L)) == (("User", "q", 0L)))
    assert(rows((2L, 2L)) == (("Assistant", "a", 1L)))
    assert(rows.size == 7)
  }

  test("markdownColumns: rewrite chain, counts, order of operations") {
    val md = "## Title\n\nSee [docs](http://d) and ![logo](http://i) " +
      "with `x = 1` then\n```\nfenced [not a link](x) ` \n```\n" +
      "**bold** and _soft_ end"
    val r = Seq((1L, md)).toDF("id", "t")
      .select(col("id") +: TextAnalysis.markdownColumns(col("t")): _*)
      .collect().head
    assert(r.getString(1) ==
      "Title See docs and logo with x = 1 then bold and soft end")
    assert(r.getLong(2) == 1L) // code block (its link never counts)
    assert(r.getLong(3) == 1L) // inline span
    assert(r.getLong(4) == 1L) // image
    assert(r.getLong(5) == 1L) // link (image not double-counted)
    assert(r.getLong(6) == 1L) // header
    // plain text passes through untouched
    val plain = Seq((1L, "no markdown at all")).toDF("id", "t")
      .select(col("id") +: TextAnalysis.markdownColumns(col("t")): _*)
      .collect().head
    assert(plain.getString(1) == "no markdown at all" &&
      (2 to 6).forall(i => plain.getLong(i) == 0L))
  }

  test("aucEval: hand-checked wins/ties, degenerate classes, exclusion") {
    import graft.operators.Curation
    def auc(rows: Seq[(Long, Long)]) = {
      val r = Curation.aucEval(rows.toDF("y", "s"), "y", "s")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }
    // perfect separation: every positive above every negative
    assert(auc(Seq((1L, 10L), (1L, 9L), (0L, 2L), (0L, 1L))) ==
      ((2L, 2L, 0L, Some(1000L))))
    // inverted
    assert(auc(Seq((0L, 10L), (1L, 1L))) == ((1L, 1L, 0L, Some(0L))))
    // ties count half: pos@5, neg@5, neg@1 → wins 1, ties 1 →
    // (2+1)*1000 div (2*1*2) = 750
    assert(auc(Seq((1L, 5L), (0L, 5L), (0L, 1L))) ==
      ((1L, 2L, 0L, Some(750L))))
    // one class empty → NULL auc
    assert(auc(Seq((1L, 5L), (1L, 1L))) == ((2L, 0L, 0L, None)))
    // non-binary labels counted out loud, not folded
    assert(auc(Seq((1L, 5L), (0L, 1L), (7L, 3L))) ==
      ((1L, 1L, 1L, Some(1000L))))
    // labels that FAIL the long cast (string "yes") must ALSO land in
    // n_excluded — before the r16 fix the cast ran inside the null
    // filter and such rows vanished silently (r15 advice)
    val sr = Curation.aucEval(
      Seq(("1", 5L), ("0", 1L), ("yes", 3L)).toDF("y", "s"), "y", "s")
      .collect().head
    assert((sr.getLong(0), sr.getLong(1), sr.getLong(2), sr.getLong(3)) ==
      ((1L, 1L, 1L, 1000L)))
  }

  test("calibrationBins/Ece: hand-checked bins, hygiene, clamping") {
    import graft.operators.Curation
    val rows = Seq(
      (1L, 950L), (1L, 920L), (0L, 910L), // bin 9: 2/3 pos, mean 926
      (0L, 50L), (0L, 80L), (1L, 20L),    // bin 0: 1/3 pos, mean 50
      (7L, 990L),                          // bin 9: non-binary, excluded
      (1L, 1500L), (0L, -10L)              // clamp → bin 9 / bin 0
    ).toDF("y", "score")
    val bins = Curation.calibrationBins(rows, "y", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // bin 9: binary rows (1,950)(1,920)(0,910)(1,1000-clamped) →
    // n=4 pos=3 excl=1 mean=(950+920+910+1000)/4=945 pos‰=750 gap=195
    assert(bins(9L) == ((4L, 3L, 1L, 945L, 750L, 195L)))
    // bin 0: (0,50)(0,80)(1,20)(0,0-clamped) → n=4 pos=1 mean=37
    // pos‰=250 gap=213
    assert(bins(0L) == ((4L, 1L, 0L, 37L, 250L, 213L)))
    assert(bins.size == 2)
    // ECE = (4·195 + 4·213) div 8 = 204
    val e = Curation.calibrationEce(rows, "y", "score").collect().head
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) == ((8L, 1L, 204L)))
    // string labels that fail the cast → n_excluded (aucEval stance)
    val s2 = Curation.calibrationEce(
      Seq(("yes", 500L), ("1", 500L), ("0", 400L)).toDF("y", "score"),
      "y", "score").collect().head
    assert((s2.getLong(0), s2.getLong(1)) == ((2L, 1L)))
    intercept[IllegalArgumentException](
      Curation.calibrationBins(rows, "y", "score", nBins = 0))
  }

  test("vocabRichness: chao1 from hand-built frequency head") {
    import graft.operators.Curation
    // tokens: a a a b b c d e → D=5, f1=3 (c,d,e), f2=1 (b), n=8
    // chao1 = 5 + 3·2 div (2·2) = 5 + 1 = 6
    val df = Seq("a a a b", "b c", " d  e ").toDF("text")
    val r = Curation.vocabRichness(df, "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((8L, 5L, 3L, 1L, 6L)))
    // no doubletons: f2=0 → bias-corrected denominator 2·1
    // tokens: x y → chao1 = 2 + 2·1 div 2 = 3
    val r2 = Curation.vocabRichness(Seq("x y").toDF("text"), "text")
      .collect().head
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3),
      r2.getLong(4)) == ((2L, 2L, 0L, 3L)))
  }

  test("cdcChunks: boundaries match the replayed predicate, tiling") {
    // replay the boundary rule in plain Scala — the test derives its
    // own expectation instead of trusting hand-picked magic strings
    def cuts(text: String, d: Long): Seq[Long] =
      (8 to text.length).filter { i =>
        (0 until 8).map(j =>
          text(i - j - 1).toLong * math.pow(31.0, j).toLong).sum % d == 0
      }.map(_.toLong)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps going " +
        "until the text is long enough to cut somewhere",
      "short",   // < 8 chars: one chunk, no cut possible
      "")        // empty: no chunks at all
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Dedup.cdcChunks(df, "text", "doc_id", divisor = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3))).toList).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val bs = (0L +: cuts(t, 4L) :+ t.length.toLong).distinct
      val expect = bs.zip(bs.tail).filter(p => p._2 > p._1)
        .map(p => (p._1, p._2 - p._1)).toList
      assert(out.getOrElse(i.toLong, Nil) == expect, s"doc $i")
    }
    // divisor 4 on a 100+ char doc must actually cut (sanity that the
    // test exercises multi-chunk tiling, not just the whole-doc case)
    assert(out(0L).size > 1)
    intercept[IllegalArgumentException](
      Dedup.cdcChunks(df, "text", "doc_id", divisor = 1))
  }

  test("agreementPatterns: levels, nulls, tolerance, block cap") {
    val recs = Seq(
      // block A: 3 records → 3 pairs
      (1L, "A", "x", java.lang.Long.valueOf(10L)),
      (2L, "A", "x", java.lang.Long.valueOf(11L)),
      (3L, "A", "y", null.asInstanceOf[java.lang.Long]),
      // block B: 1 record → no pairs
      (4L, "B", "x", java.lang.Long.valueOf(5L)),
      // null block key drops
      (5L, null, "x", java.lang.Long.valueOf(5L)))
      .toDF("id", "blk", "f", "v")
    val out = Dedup.agreementPatterns(recs, "id", Seq("blk"),
        Seq("f"), Seq(("v", 1L)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // (1,2): f agree, v within 1 → "21"; (1,3)/(2,3): f disagree,
    // v missing → "0-"
    assert(out == Map("21" -> 1L, "0-" -> 2L))
    // cap 2 drops block A entirely → no pairs anywhere
    assert(Dedup.agreementPatterns(recs, "id", Seq("blk"), Seq("f"),
      Seq(("v", 1L)), maxBlockSize = 2).isEmpty)
    intercept[IllegalArgumentException](
      Dedup.agreementPatterns(recs, "id", Seq(), Seq("f"), Seq()))
    intercept[IllegalArgumentException](
      Dedup.agreementPatterns(recs, "id", Seq("blk"), Seq(), Seq()))
    intercept[IllegalArgumentException](
      Dedup.agreementPatterns(recs, "id", Seq("blk"), Seq("blk"), Seq()))
  }

  test("inclusionDependencies: direction, string unify, null drop") {
    import graft.operators.Curation
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq[(java.lang.Long)](1L, 1L, 2L, null)
      .toDF("fk")
    val asText = Seq("1", "2", "3", "9").toDF("s")
    val out = Curation.inclusionDependencies(Seq(
        ("parent.pk", parent, "pk"),
        ("child.fk", child, "fk"),
        ("other.s", asText, "s")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // child.fk ⊆ parent.pk: 2 distinct non-null fk values, both present
    assert(out(("child.fk", "parent.pk")) == ((2L, 0L, 1L)))
    // parent.pk ⊄ child.fk: pk=3 has no child
    assert(out(("parent.pk", "child.fk")) == ((3L, 1L, 0L)))
    // string '1','2','3' unify with bigint 1,2,3 (SINDY normalization);
    // '9' is missing from parent
    assert(out(("parent.pk", "other.s")) == ((3L, 0L, 1L)))
    assert(out(("other.s", "parent.pk")) == ((4L, 1L, 0L)))
    assert(out.size == 6)
    intercept[IllegalArgumentException](
      Curation.inclusionDependencies(Seq(("a", parent, "pk"))))
    intercept[IllegalArgumentException](
      Curation.inclusionDependencies(Seq(
        ("a", parent, "pk"), ("a", child, "fk"))))
  }

  test("vocabGrowth: first occurrences, cumulative Heaps curve") {
    import graft.operators.Curation
    val df = Seq(
      (0L, "a b a"),        // bucket 0: 3 tokens, types a,b new
      (1L, "b c"),          // bucket 0: c new
      (2L, "a c d d"),      // bucket 1: d new
      (5L, ""),             // bucket 2: empty text → 0 tokens
      (4L, "a b c"))        // bucket 2: no new types
      .toDF("doc_id", "text")
    val out = Curation.vocabGrowth(df, "text", "doc_id", bucketSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(0L) == ((5L, 3L, 5L, 3L)))   // a b a b c
    assert(out(1L) == ((4L, 1L, 9L, 4L)))   // a c d d
    assert(out(2L) == ((3L, 0L, 12L, 4L)))  // a b c (+ empty doc)
    assert(out.size == 3)
  }
}
