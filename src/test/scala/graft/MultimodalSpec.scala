package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}

/** Multimodal plumbing semantics beyond the gates: the dHash bit
  * layout, padding, and its composition with the banded hamming join. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hash(texts: String*): Seq[String] = {
    val gray = expr("transform(sequence(1, 72), i -> " +
      "CASE WHEN i <= length(t) THEN ascii(substring(t, i, 1)) " +
      "ELSE 0 END)")
    texts.toDF("t").select(Multimodal.dHash64(gray))
      .as[String].collect().toSeq
  }

  test("dHash64: layout, padding, determinism") {
    val Seq(a, b, flat, empty) =
      hash("abcdefghij" * 8, "abcdefghij" * 8, "zzzzzzzzz" * 8, "")
    assert(a.length == 64 && a.forall(c => c == '0' || c == '1'))
    assert(a == b)       // same pixels, same hash
    assert(a != flat)
    // constant grid: no increasing neighbor anywhere -> all zeros;
    // the empty (fully padded) grid likewise
    assert(flat == "0" * 64)
    assert(empty == "0" * 64)
    // 'abcdefghi…' ascends within each row window except where the
    // repeat wraps — bit 0 (gray[0] < gray[1]) must be 1
    assert(a.head == '1')
    // padding: a 73rd character can't influence the 9x8 grid
    val Seq(h72, h73) = hash("x" * 72, "x" * 72 + "Q")
    assert(h72 == h73)
  }

  test("dHash fingerprints ride the banded hamming near-dup join") {
    val base = "the quick brown fox jumps over the lazy dog padding!!"
    val fp = Seq((1L, base), (2L, base), (3L, "completely other bytes"))
      .toDF("media_id", "t")
      .select(col("media_id"),
        Multimodal.dHash64(expr("transform(sequence(1, 72), i -> " +
          "CASE WHEN i <= length(t) THEN ascii(substring(t, i, 1)) " +
          "ELSE 0 END)")).as("f"))
    val pairs = Dedup.simhashNearDuplicates(fp, "media_id", "f",
        maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
