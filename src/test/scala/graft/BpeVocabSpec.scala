package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeVocab, TextAnalysis}

/** The persisted BPE vocabulary: trained-table round trip, rank-order
  * preservation, epoch lifecycle, and crash recovery of a committed
  * staging. */
class BpeVocabSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trained table round-trips; loaded segmentation is identical") {
    val corpus = Seq("the other there then", "the the other then other",
      "scan the table then").toDF("text")
    val trained = TextAnalysis.bpeTrain(corpus, "text", nMerges = 4)
    assert(trained.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpev").toString
    BpeVocab.write(spark, trained, dir)
    assert(BpeVocab.load(spark, dir) == trained.toIndexedSeq)
    assert(BpeVocab.readEpoch(spark, dir).contains(1L))

    // tokenization under the loaded table == under the in-memory one
    val inMem = corpus.select(
      TextAnalysis.bpeSegment(col("text"), trained.map(t => (t._1, t._2)))
        .as("s")).as[Seq[String]].collect().toSeq
    val loaded = corpus.select(
      TextAnalysis.bpeSegment(col("text"), BpeVocab.loadMerges(spark, dir))
        .as("s")).as[Seq[String]].collect().toSeq
    assert(loaded == inMem)

    // rewrite replaces atomically and advances the epoch; order is
    // preserved even when counts are not monotone
    val v2 = Seq(("x", "y", 1L), ("a", "b", 99L), ("ab", "c", 7L))
    BpeVocab.write(spark, v2, dir)
    assert(BpeVocab.load(spark, dir) == v2)
    assert(BpeVocab.readEpoch(spark, dir).contains(2L))
  }

  test("a committed-but-unapplied staging replays on load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpev2").toString
    BpeVocab.write(spark, Seq(("t", "h", 5L)), dir)
    // stage generation 2 by hand: data + manifest present, never applied
    // (the crash point right after the manifest write)
    val staging = s"$dir/_staging_2"
    Seq((1L, "t", "h", 5L), (2L, "th", "e", 3L))
      .toDF("rank", "a", "b", "n").coalesce(1)
      .write.parquet(s"$staging/merges2")
    new java.io.File(s"$staging/merges2").renameTo(
      new java.io.File(s"$staging/merges_staged"))
    // applyPieces swaps relative paths: rename staged dir into place
    new java.io.File(s"$staging/merges_staged").renameTo(
      new java.io.File(s"$staging/merges"))
    val out = new java.io.FileOutputStream(s"$staging/_manifest.json")
    out.write(
      """{"target_epoch":2,"staged_tables":"merges"}""".getBytes("UTF-8"))
    out.close()
    // reader path: load resolves the committed staging and sees gen 2
    assert(BpeVocab.load(spark, dir) ==
      Seq(("t", "h", 5L), ("th", "e", 3L)))
    assert(BpeVocab.readEpoch(spark, dir).contains(2L))
    assert(!new java.io.File(staging).exists())
  }
}
