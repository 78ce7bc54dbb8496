package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `f2_sums(value, k)` — the k AMS/Tug-of-War signed sums
  * `Z_j = Σ_rows s_j(value)` folded in ONE pass as the fourth custom
  * [[TypedImperativeAggregate]] (beside [[KmvDistinct]], [[CmSketch]],
  * [[HllSketch]]): the previous formulation exploded every input row
  * k ways (`explode(sequence(0, k-1))`) before aggregating — at 100 TB
  * an 8× row multiplication of the corpus through the projection and
  * hash-aggregate machinery, for k numbers a k-long buffer can carry.
  *
  * The sign function is UNCHANGED from that formulation (bit-for-bit,
  * pinned in `CurationMoreSpec`): `s_j(v) = +1` when the first hex
  * nibble of `md5(j ++ ":" ++ v)` is even, else −1 — the engine-portable
  * md5 convention every sketch here shares, so the DuckDB oracle
  * restates each Z_j value for value. NULLs are SKIPPED (the aggregate
  * null convention, and the estimator's contract: F2 is the self-join
  * size, and an equi-join never matches NULL — mapping nulls to a
  * constant −1 sign would shift every Z_j by −N and inflate every
  * Z², systematically overestimating on null-heavy columns).
  *
  * Merge is elementwise addition — commutative/associative, so map-side
  * partial aggregation applies and the sums are exactly reproducible
  * under any partitioning. |Z_j| ≤ rows fits a Long at any scale; the
  * square stays with the caller ([[graft.operators.Curation.f2Sketch]])
  * where the DECIMAL overflow discipline lives.
  */
case class F2Sums(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 1 && k <= 64, s"f2_sums: k in [1,64], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "f2_sums"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](k)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < k) {
        buf(j) += F2Sums.sign(j, s)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): F2Sums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): F2Sums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): F2Sums =
    copy(child = newChild)
}

object F2Sums {
  /** Estimator-j sign of value `v`: +1 when the first hex nibble of
    * md5("j:v") is even, −1 otherwise — matches the SQL
    * `strpos('0123…f', md5(j || ':' || v)[1]) − 1) % 2` parse exactly
    * (first hex char = high nibble of digest byte 0). */
  def sign(j: Int, v: String): Long = {
    val dg = Md5Local.get().digest(s"$j:$v".getBytes("UTF-8"))
    if (((dg(0) >> 4) & 1) == 0) 1L else -1L
  }
}
