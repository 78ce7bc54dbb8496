package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hll_sketch(value)` — HyperLogLog distinct-count sketch as the third
  * custom [[TypedImperativeAggregate]] beside [[KmvDistinct]] and
  * [[CmSketch]] (Flajolet et al., "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm", AofA 2007): the
  * constant-space (m = 256 bytes) mergeable distinct counter for 100 TB
  * streams — where KMV keeps the k smallest hashes (O(k·8) bytes, exact
  * below k), HLL keeps one max-rank byte per register and scales to
  * billions of distinct values at ~6% standard error for m = 256.
  *
  * Hashing follows the repo's engine-portable convention (the
  * [[KmvDistinct.hash60]] / [[CmSketch.pos]] idiom): `h = md5(v)` hex;
  * register = first 2 hex digits (8 bits, m = 2⁸); rho = 1 + number of
  * leading zero BITS of the next 16 hex digits (a 64-bit tail), i.e.
  * rho ∈ [1, 65]. Deterministic and mirrorable digit-for-digit in SQL —
  * unlike Spark's own `approx_count_distinct` (HLL++ with private
  * seeding) or DuckDB's, which cannot cross-check each other.
  *
  * Merge is elementwise MAX — commutative, associative, idempotent — so
  * map-side partial aggregation works like any built-in and the final
  * register array is bit-identical under ANY partitioning (what makes a
  * hash-exact DuckDB oracle possible). eval() returns the m registers as
  * `array<long>`; the estimate is a pure function of that array
  * (see `Curation.hllEstimates`), kept OUT of the aggregate so callers
  * can persist/merge registers across corpora and estimate later.
  */
case class HllSketch(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  import HllSketch.M

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (reg, rho) = HllSketch.regRho(v.asInstanceOf[UTF8String].toString)
      if (rho > (buf(reg) & 0xff)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    ArrayData.toArrayData(buf.map(b => (b & 0xff).toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  /** Register count (b = 8 index bits). Fixed rather than parameterized:
    * the register array IS the persistence format, and a corpus of
    * sketches only merges if every writer used the same m. */
  val M = 256

  private val hexDigits = "0123456789abcdef"

  /** (register, rho) of one value: register = md5 hex digits 1-2,
    * rho = 1 + leading zero bits of hex digits 3-18 (64-bit tail; an
    * all-zero tail gives the sentinel 65). Mirrors the oracle SQL's
    * strpos-hex parse digit for digit. */
  def regRho(v: String): (Int, Int) = {
    val dg = Md5Local.get().digest(v.getBytes("UTF-8"))
    val reg = dg(0) & 0xff
    // tail = bytes 1..8 as a big-endian 64-bit word
    var tail = 0L
    var i = 1
    while (i <= 8) { tail = (tail << 8) | (dg(i) & 0xffL); i += 1 }
    val rho = if (tail == 0L) 65 else java.lang.Long.numberOfLeadingZeros(tail) + 1
    (reg, rho)
  }

  /** The hex-string form of the same mapping (what the SQL oracle
    * computes), for spec cross-checks. */
  def regRhoHex(md5Hex: String): (Int, Int) = {
    val reg = hexDigits.indexOf(md5Hex(0)) * 16 + hexDigits.indexOf(md5Hex(1))
    val tail = md5Hex.substring(2, 18)
    val z = tail.takeWhile(_ == '0').length
    val rho =
      if (z == 16) 65
      else z * 4 + (Integer.numberOfLeadingZeros(hexDigits.indexOf(tail(z))) - 28) + 1
    (reg, rho)
  }
}
