package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) key arithmetic as pure Column expressions — built-in
  * bitwise ops only, so the whole key stays inside whole-stage codegen
  * and the identical bit-chain is expressible in any engine (the DuckDB
  * oracle mirrors it literally; every step is exact integer, no floats).
  *
  * Why: sorting/range-partitioning 100 TB of parquet by
  * `interleave(x, y)` clusters BOTH dimensions at once, so row-group
  * min/max stats stay tight on x AND y and a selective filter on either
  * (or both) prunes most of the scan — the standard multi-dimension
  * layout trick (used by e.g. Delta/Iceberg `OPTIMIZE ZORDER BY`) for
  * stores that must serve two access paths from one physical copy.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to the even bit positions 0,2,…,62
    * (the classic mask-and-shift doubling chain). */
  private def spread(x0: Column): Column = {
    var x = x0.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton key of two non-negative dimension values: bits of `a`
    * land at even positions, bits of `b` at odd. Inputs MUST lie in
    * `[0, 2³¹)` so the interleaved key stays non-negative and orders the
    * same under signed BIGINT comparison in every engine (values above
    * that must be bucketed down by the caller — a Z-key is a locality
    * key, so coarsening is free). Masking is unconditional; range
    * enforcement is the caller's contract, checked where a layout is
    * actually written ([[graft.operators.Layout.zorderWrite]]). */
  def interleave(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** The identical spread chain as ANSI-SQL WITH-clause steps, so oracle
    * queries mirror [[spread]] literally (decimal literals — not every
    * engine lexes hex). Returns `(cteSteps, finalRel, finalCol)`: append
    * `cteSteps` to the query's WITH list, then read `finalCol` from
    * `finalRel`. Each step carries all columns of `rel` along. */
  def spreadSql(rel: String, in: String, tag: String): (String, String, String) = {
    val masks = Seq(16 -> 281470681808895L, 8 -> 71777214294589695L,
      4 -> 1085102592571150095L, 2 -> 3689348814741910323L,
      1 -> 6148914691236517205L)
    val head =
      s"${tag}0 AS (SELECT *, ($in & 4294967295) AS ${tag}_v0 FROM $rel)"
    val steps = masks.zipWithIndex.map { case ((sh, mask), i) =>
      val (p, c) = (s"${tag}_v$i", s"${tag}_v${i + 1}")
      s"${tag}${i + 1} AS (SELECT *, (($p | ($p << $sh)) & $mask) AS $c " +
        s"FROM ${tag}$i)"
    }
    ((head +: steps).mkString(",\n"), s"${tag}5", s"${tag}_v5")
  }
}
