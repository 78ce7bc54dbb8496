package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `top_k_pairs(ord, payload, k, largest)` — bounded per-group top-k as a
  * custom [[TypedImperativeAggregate]]: the scale-correct replacement for
  * the `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` pattern.
  *
  * The window form SORTS every group's full contents (one wide shuffle +
  * per-partition sort, state proportional to the group size); this
  * aggregate keeps an O(k) buffer per group and — being a real aggregate —
  * map-side COMBINES, so a 10⁹-row group crossing the shuffle shrinks to
  * k rows per mapper first. At 100 TB that is the difference between
  * ranking working and the "last reducer" holding the biggest key's whole
  * contents.
  *
  * Semantics match the window exactly on NULL-FREE inputs (and the
  * oracle is that window): rows ordered by `(ord, payload)` descending
  * when `largest` (ascending otherwise), DUPLICATE pairs kept (multiset,
  * like row_number), output the best-first `array<struct<ord, payload>>`
  * — explode + posexplode recovers (rank, row). Rows where either input
  * is NULL are IGNORED — standard SQL aggregate-function behavior, but a
  * DOCUMENTED DIVERGENCE from the window form, which ranks null rows
  * (nulls-last under DESC): coalesce the inputs first when parity with a
  * null-bearing window matters. Exact-integer inputs by design (the
  * repo's determinism convention): both columns are BIGINT.
  *
  * Merging inserts one buffer into the other and re-caps at k —
  * associative and commutative, so partial aggregation works like any
  * built-in. Buffer is a count-valued tree map ("best-first" ordering:
  * the WORST entry sits at `last`, eviction is O(log k)). */
case class TopKPairs(left: Expression, right: Expression, k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Buf]
    with ExpectsInputTypes with BinaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"top_k_pairs: k in [1, 2^20], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  // best-first: for `largest`, bigger pairs compare SMALLER so the worst
  // entry is always `last` and eviction is `pollLast`-shaped. A val, not
  // a def: insert() consults it once per input row, and rebuilding the
  // Tuple2 ordering + reverse wrapper per row is allocation on the exact
  // hot path this aggregate exists to make cheap
  @transient private lazy val ord: Ordering[(Long, Long)] = {
    val nat = Ordering.Tuple2(Ordering.Long, Ordering.Long)
    if (largest) nat.reverse else nat
  }

  override def createAggregationBuffer(): TopKPairs.Buf =
    new TopKPairs.Buf(scala.collection.mutable.TreeMap.empty[(Long, Long), Int](ord), 0)

  private def insert(buf: TopKPairs.Buf, p: (Long, Long), c: Int): Unit = {
    if (buf.n < k) {
      buf.m.updateWith(p)(v => Some(v.getOrElse(0) + c))
      buf.n += c
      if (buf.n > k) trimWorst(buf) // a multi-count insert can overshoot
    } else {
      val worst = buf.m.last._1
      if (ord.lt(p, worst)) {
        buf.m.updateWith(p)(v => Some(v.getOrElse(0) + c))
        buf.n += c
        trimWorst(buf)
      }
    }
  }

  private def trimWorst(buf: TopKPairs.Buf): Unit =
    while (buf.n > k) {
      val (wp, wc) = buf.m.last
      val drop = math.min(wc, buf.n - k)
      if (drop == wc) buf.m.remove(wp) else buf.m.update(wp, wc - drop)
      buf.n -= drop
    }

  override def update(buf: TopKPairs.Buf, input: InternalRow): TopKPairs.Buf = {
    val o = left.eval(input)
    val p = right.eval(input)
    if (o != null && p != null)
      insert(buf, (o.asInstanceOf[Long], p.asInstanceOf[Long]), 1)
    buf
  }

  override def merge(a: TopKPairs.Buf, b: TopKPairs.Buf): TopKPairs.Buf = {
    b.m.foreach { case (p, c) => insert(a, p, c) }
    a
  }

  override def eval(buf: TopKPairs.Buf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    buf.m.foreach { case ((o, p), c) =>
      var j = 0
      while (j < c) { out(i) = InternalRow(o, p); i += 1; j += 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKPairs.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 20 * buf.m.size)
    bb.putInt(buf.m.size)
    buf.m.foreach { case ((o, p), c) =>
      bb.putLong(o); bb.putLong(p); bb.putInt(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val (o, p, c) = (bb.getLong, bb.getLong, bb.getInt)
      buf.m.update((o, p), c)
      buf.n += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairs = copy(left = newLeft, right = newRight)
}

object TopKPairs {
  /** Count-valued bounded multiset: `m` maps (ord, payload) → multiplicity
    * in best-first order, `n` is the total multiplicity (≤ k after any
    * public operation). */
  final class Buf(val m: scala.collection.mutable.TreeMap[(Long, Long), Int],
    var n: Int)
}
