package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cm_sketch(value, d, w)` — COUNT-MIN frequency sketch as a custom
  * [[TypedImperativeAggregate]] (the second custom aggregate beside
  * [[KmvDistinct]]): the approximate per-key counter for 100 TB streams
  * where an exact `groupBy(key).count()` would shuffle every occurrence
  * of every key.
  *
  * State = a d×w matrix of longs; each value increments one cell per
  * row `r` at `pos_r(v)` = the first 4 hex digits of `md5(r ++ ':' ++ v)`
  * mod w (the corpus-split/bloom hex idiom — deterministic, engine-
  * portable, mirrorable digit for digit in SQL). Merging is elementwise
  * addition — fully commutative/associative, so map-side partial
  * aggregation works like any built-in and the final matrix is
  * bit-identical under ANY partitioning. A point estimate is
  * `min_r matrix[r][pos_r(v)]` — never an undercount, overcounts bounded
  * by collisions (the classic CM guarantee: ε ≈ e/w with probability
  * 1−e^−d).
  *
  * Unlike Misra–Gries/SpaceSaving (whose merge is order-sensitive), CM
  * is exactly reproducible, which is what makes a hash-exact DuckDB
  * oracle possible. The buffer is O(d·w) regardless of input size.
  */
case class CmSketch(child: Expression, d: Int, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(d >= 1 && d <= 16, s"cm_sketch: d in [1,16], got $d")
  require(w >= 16 && w <= (1 << 16), s"cm_sketch: w in [16, 65536], got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < d) {
        buf(r * w + CmSketch.pos(r, s, w)) += 1L
        r += 1
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmSketch =
    copy(child = newChild)
}

object CmSketch {
  /** Row-r bucket of value `v`: first 4 hex digits (= top 2 bytes) of
    * md5("r:v") mod w — matches the SQL strpos-hex parse digit for
    * digit (the [[KmvDistinct.hash60]] / bloom convention). */
  def pos(r: Int, v: String, w: Int): Int = {
    val dg = Md5Local.get().digest(s"$r:$v".getBytes("UTF-8"))
    (((dg(0) & 0xff) << 8) | (dg(1) & 0xff)) % w
  }

  /** Point estimate from an evaluated sketch: `min_r m[r·w + pos_r(v)]`. */
  def estimate(matrix: Array[Long], d: Int, w: Int, v: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = matrix(r * w + pos(r, v, w))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
