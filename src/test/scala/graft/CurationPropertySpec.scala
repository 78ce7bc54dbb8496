package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Curation-operator invariants, property-tested over random corpora:
  *  - packing offsets are gapless cumulative sums within each shard;
  *  - passage dedup conserves passages (kept across the corpus = number
  *    of DISTINCT passages; every passage kept exactly once);
  *  - hash-threshold sampling is monotone in the rate (a stricter sample
  *    is a subset of a looser one) — the property RNG-based sampling
  *    does NOT have across reruns;
  *  - cross-corpus dedup always finds exact copies (recall 1 on copies).
  */
class CurationPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genWord = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val genText: Gen[String] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, genWord)).map(_.mkString(" "))
  private def genCorpus(maxDocs: Int): Gen[List[(Long, String)]] =
    Gen.choose(1, maxDocs).flatMap(n =>
      Gen.listOfN(n, genText).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t) }))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  test("narrow phraseHits equals the positional-join phraseSearch") {
    val genPhrase = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genWord))
    check(Prop.forAll(genCorpus(25), genPhrase) { (corpus, phrase) =>
      val df = corpus.toDF("doc_id", "text")
      val narrow = df.select(org.apache.spark.sql.functions.col("doc_id"),
          graft.operators.TextAnalysis.phraseHits(
            org.apache.spark.sql.functions.col("text"), phrase).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .filter(_._2 > 0).toMap
      val joined = graft.operators.Retrieval.phraseSearch(
          df, "text", "doc_id", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      narrow == joined
    })
  }

  test("packForTraining offsets are gapless cumulative sums per shard") {
    check(Prop.forAll(genCorpus(40)) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val out = Curation.packForTraining(df, "text", "doc_id",
          nShards = 3, budgetTokens = 7)
        .collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("id"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("offset_tokens"),
          r.getAs[Long]("pack_id")))
      out.groupBy(_._1).values.forall { rows =>
        val sorted = rows.sortBy(_._2)
        val offsetsOk = sorted.foldLeft((true, 0L)) {
          case ((ok, expect), (_, _, n, off, pack)) =>
            (ok && off == expect && pack == off / 7, expect + n)
        }._1
        offsetsOk
      }
    })
  }

  test("passageDedup conserves passages: kept == distinct, each kept once") {
    check(Prop.forAll(genCorpus(30)) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val out = Curation.passageDedup(df, "text", "doc_id", passageTokens = 4)
        .collect()
      val totalKept = out.map(_.getAs[Long]("n_kept")).sum
      val distinctPassages = df.select(
          explode(Curation.passages(col("text"), 4)).as("p"))
        .distinct().count()
      totalKept == distinctPassages &&
        out.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_passages"))
    })
  }

  test("mixtureSample is monotone in the rate (subset property)") {
    check(Prop.forAll(genCorpus(40), Gen.choose(0, 100),
        Gen.choose(0, 100)) { (corpus, r1, r2) =>
      val (lo, hi) = (math.min(r1, r2), math.max(r1, r2))
      val df = corpus.toDF("doc_id", "text").withColumn("dom", lit("x"))
      def ids(rate: Int): Set[Long] =
        Curation.mixtureSample(df, "dom", "text", Map("x" -> rate))
          .select("doc_id").collect().map(_.getLong(0)).toSet
      ids(lo).subsetOf(ids(hi))
    })
  }

  test("bpeApply token counts match a plain-Scala canonical BPE reference") {
    // canonical sequential BPE merge (pop-and-merge left fold) in plain
    // Scala — the ground truth the Catalyst fold must reproduce
    def refMerge(toks: List[String], x: String, y: String): List[String] =
      toks.foldLeft(List.empty[String]) { (acc, t) =>
        acc match {
          case last :: rest if last == x && t == y => (x + y) :: rest
          case _ => t :: acc
        }
      }.reverse
    def refTokens(word: String, merges: Seq[String]): Int =
      merges.foldLeft(word.map(_.toString).toList) { (toks, pair) =>
        val Array(x, y) = pair.split(" ", 2)
        refMerge(toks, x, y)
      }.length
    // words with heavy runs (the case replace-based merging gets wrong)
    val genRunWord = for {
      n <- Gen.choose(1, 9)
      c <- Gen.oneOf("a", "b")
      tail <- Gen.listOfN(2, Gen.oneOf("a", "b", "c"))
    } yield c * n + tail.mkString
    val merges = Seq("a a", "b b", "aa a", "c a")
    check(Prop.forAll(Gen.listOfN(8, genRunWord)) { words =>
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = Curation.bpeApply(df, "text", "doc_id", merges)
        .collect().map(r =>
          r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
      words.zipWithIndex.forall { case (w, i) =>
        got(i.toLong) == refTokens(w, merges).toLong
      }
    })
  }

  test("crossCorpusNearDuplicates finds every exact copy (recall 1)") {
    check(Prop.forAll(genCorpus(20)) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val batch = df.select((col("doc_id") + 1000L).as("doc_id"), col("text"))
      val found = Dedup.crossCorpusNearDuplicates(df, batch, "text", "doc_id")
        .filter(col("jaccard") === 1.0)
        .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
      // every batch doc is an exact copy of its source -> must be found
      corpus.forall { case (id, _) => found.contains(id + 1000L) }
    })
  }

  test("lmScores: one row per multi-token doc, scores inside the smoothed bounds") {
    check(Prop.forAll(genCorpus(15)) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val out = Curation.lmScores(df, "text", "doc_id").collect()
      val multi = corpus.count(_._2.contains(" "))
      // every smoothed conditional is in (0, scale], so the doc sum is
      // in (0, n_bigrams·scale]
      out.length == multi && out.forall { r =>
        val n = r.getAs[Long]("n_bigrams")
        val s = r.getAs[Long]("lm_score")
        s > 0L && s <= n * 1000000000L &&
          r.getAs[Long]("lm_mean") == s / n
      }
    })
  }

  test("weightedSample: growing k extends the sample (prefix property)") {
    val genWeighted: Gen[List[(Long, Long)]] =
      Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 500L))
        .map(_.zipWithIndex.map { case (w, i) => (i.toLong, w) }))
    check(Prop.forAll(genWeighted) { rows =>
      val df = rows.map(_.swap).toDF("wt", "doc_id")
      def ids(k: Int) = Curation.weightedSample(df, "doc_id", "wt", k)
        .collect().map(_.getAs[Long]("id")).toSeq
      val k1 = math.max(1, rows.length / 2)
      // the k smallest priorities are a prefix of the 2k smallest — the
      // sample NEVER reshuffles as the budget grows (RNG-based samplers
      // do not have this property across draws)
      ids(k1) == ids(rows.length).take(k1)
    })
  }

  test("budgetSelect equals the unpartitioned window for any data/budget") {
    val genRows = Gen.choose(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 9L)).map(_.zipWithIndex.map {
        case (w, i) => (i.toLong, w) }))
    check(Prop.forAll(genRows, Gen.choose(0L, 300L)) { (rows, budget) =>
      val df = rows.toDF("id", "w").repartition(7)
      val viaWindow = {
        import org.apache.spark.sql.expressions.Window
        df.withColumn("running_total",
            sum(col("w")).over(Window.orderBy(col("id"))))
          .filter(col("running_total") - col("w") < budget)
          .collect().map(_.toSeq).toSet
      }
      val got = Curation.budgetSelect(df, "w", Seq(col("id")), budget)
        .collect().map(_.toSeq).toSet
      got == viaWindow
    })
  }

  test("heavyHitters equals the exact groupBy-count-filter for any k") {
    val genItems = Gen.choose(1, 150).flatMap(n =>
      Gen.listOfN(n, genWord))
    check(Prop.forAll(genItems, Gen.choose(2, 12)) { (items, k) =>
      val df = items.toDF("w").repartition(5)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > items.size }.toMap
      val got = Curation.heavyHitters(df, "w", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got == exact
    })
  }

  test("budgetSelectByGroup equals the per-group window for any data") {
    val genRows = Gen.choose(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0, 3)))
        .map(_.zipWithIndex.map { case ((w, g), i) =>
          (i.toLong, w, s"g$g") }))
    check(Prop.forAll(genRows, Gen.choose(0L, 80L)) { (rows, budget) =>
      val df = rows.toDF("id", "w", "grp").repartition(7)
      val viaWindow = {
        import org.apache.spark.sql.expressions.Window
        df.withColumn("running_total", sum(col("w")).over(
            Window.partitionBy(col("grp")).orderBy(col("id"))))
          .filter(col("running_total") - col("w") < budget)
          .collect().map(_.toSeq).toSet
      }
      val got = Curation.budgetSelectByGroup(df, "w", "grp",
          Seq(col("id")), budget)
        .collect().map(_.toSeq).toSet
      got == viaWindow
    })
  }

  test("pmiCollocations respects the min-count cut and the PMI upper bound") {
    check(Prop.forAll(genCorpus(15)) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val out = Curation.pmiCollocations(df, "text",
        minCount = 2L, k = 50).collect()
      // c12 ≤ min(cw1, cw2) forces pmi_scaled ≤ N·scale div c12 ≤ N·scale
      val totalBigrams = corpus.map(_._2.split(" ").length - 1)
        .map(math.max(0, _)).sum.toLong
      out.forall { r =>
        r.getAs[Long]("c12") >= 2L &&
          r.getAs[Long]("pmi_scaled") <= totalBigrams * 1000000L
      }
    })
  }

  test("cdcChunks tiles every document exactly (no gaps, no overlap)") {
    check(Prop.forAll(genCorpus(20), Gen.oneOf(4, 16, 64)) {
      (corpus, divisor) =>
        val df = corpus.toDF("doc_id", "text")
        val chunks = Dedup.cdcChunks(df, "text", "doc_id", divisor)
          .collect()
          .groupBy(_.getLong(0))
          .map { case (id, rs) =>
            id -> rs.sortBy(_.getLong(1))
              .map(r => (r.getLong(2), r.getLong(3))).toList }
        corpus.forall { case (id, text) =>
          val cs = chunks.getOrElse(id, Nil)
          if (text.isEmpty) cs.isEmpty
          else {
            // starts are consecutive: each chunk begins where the
            // previous ended, first at 0, last ends at length
            val ends = cs.scanLeft(0L) { case (p, (s, l)) =>
              assert(s == p, s"gap in doc $id"); p + l }
            cs.head._1 == 0L && ends.last == text.length.toLong &&
              cs.forall(_._2 > 0)
          }
        }
    })
  }

  test("trigramSearch equals the brute-force contains scan") {
    val genQ = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genWord))
      .map(_.mkString(" "))
    check(Prop.forAll(genCorpus(25), genQ) { (corpus, q) =>
      val df = corpus.toDF("doc_id", "text")
      val idx = graft.operators.Retrieval.trigramSearch(
          df, "text", "doc_id", Seq(q))
        .collect().map(_.getLong(1)).toSet
      val brute = corpus.filter(_._2.contains(q)).map(_._1).toSet
      idx == brute
    })
  }
}
