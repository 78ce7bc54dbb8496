package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `kmv_distinct(value, k)` — mergeable K-MINIMUM-VALUES distinct-count
  * sketch as a custom [[TypedImperativeAggregate]] (the "novel sketch"
  * extension class: a real aggregation-buffer object with
  * update/merge/serialize, not a scalar expression).
  *
  * State = the k smallest DISTINCT 60-bit hashes seen, where
  * `hash60(v)` is the first 15 hex digits of md5(v) read as an integer —
  * deterministic and engine-portable, unlike sketches seeded with RNG
  * (Spark's own HLL++ and DuckDB's approx_count_distinct cannot
  * cross-check each other; this one has a bit-exact DuckDB mirror).
  * Merging unions the sets and re-caps at k — associative and
  * commutative, so map-side partial aggregation works like any built-in.
  *
  * Estimate: exact size while fewer than k distinct hashes exist;
  * otherwise the KMV estimator `(k−1) · 2⁶⁰ / kth_smallest` (computed in
  * BigInt then narrowed — the true distinct count always fits a Long, so
  * the narrowing is safe for any physical input).
  *
  * Scale: the buffer is O(k) longs regardless of input size — the
  * distinct-count prefilter for 100 TB group-bys where exact
  * countDistinct would shuffle every value. */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"kmv_distinct: k in [2, 2^20], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, KmvDistinct.hash60(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next().longValue())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else (BigInt(k - 1) * (BigInt(1) << 60) / BigInt(buf.last().longValue()))
      .toLong

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** One digest instance per thread, reused across rows (the MinHashSig
  * convention): `getInstance("MD5")` per row is an allocation + provider
  * lookup on an aggregation hot path. Shared by every custom-aggregate
  * hash ([[KmvDistinct]], [[CmSketch]]). */
private[graft] object Md5Local {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** The calling thread's digest, reset and ready. */
  def get(): java.security.MessageDigest = {
    val md = tl.get()
    md.reset()
    md
  }
}

object KmvDistinct {
  /** First 15 hex digits of md5(v) as an integer (= top 60 bits of the
    * digest) — matches the SQL-side strpos-chain parse digit for digit. */
  def hash60(v: UTF8String): Long = {
    val d = Md5Local.get().digest(v.getBytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4) // 7 bytes + the 15th hex digit
  }
}

/** `kmv_sketch(value, k)` — the SKETCH itself rather than the estimate:
  * evaluates to the sorted array of the k smallest distinct 60-bit
  * hashes (the [[KmvDistinct]] buffer verbatim). Two sketches support
  * the theta-style SET operations a single estimate cannot: union /
  * intersection / Jaccard between corpora (see `Curation.kmvOverlap`),
  * still O(k) state and map-side combined. Same hash, same buffer, same
  * serialization as [[KmvDistinct]] — `kmv_distinct` of a column equals
  * the estimator applied to this sketch. */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"kmv_sketch: k in [2, 2^20], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  // buffer semantics shared with KmvDistinct (delegation keeps the two
  // aggregates bit-compatible; only eval differs)
  private lazy val twin = KmvDistinct(child, k)
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    twin.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    twin.update(buf, input)
  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    twin.merge(a, b)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    twin.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    twin.deserialize(bytes)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
