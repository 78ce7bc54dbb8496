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
}
