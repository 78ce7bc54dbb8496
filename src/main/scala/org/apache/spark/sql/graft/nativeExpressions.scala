package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) Catalyst expressions shipped by graft.
  *
  * These live under `org.apache.spark.sql` so they can use the
  * `private[sql]` pieces of the expression API (`AbstractDataType`,
  * `ExpectsInputTypes`) — the same access pattern any in-tree expression
  * uses. Only expressions on hot scan paths get this treatment; everything
  * else in graft is plain `org.apache.spark.sql.functions` composition.
  */

/** `ip_to_long(str)` — dotted-quad IPv4 → unsigned 32-bit value in a Long;
  * null for non-IPv4 input. Generated code calls the same static parser the
  * interpreted path uses, so the expression stays inside whole-stage
  * codegen (no UDF boxing) on the scan hot path.
  */
case class IpToLong(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_to_long"

  override def nullSafeEval(input: Any): Any = {
    val v = graft.functions.Net.ipv4ToLong(input.asInstanceOf[UTF8String])
    if (v < 0) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Net.ipv4ToLong($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): IpToLong =
    copy(child = newChild)
}

/** `ipv6_to_hex(str)` — textual IPv6 → 32-char lowercase hex key (the
  * fixed-width form whose string order equals unsigned 128-bit order);
  * null for non-IPv6 input. Same codegen pattern as [[IpToLong]]: the
  * generated code calls the shared static parser, staying inside
  * whole-stage codegen on the scan hot path. */
case class Ipv6ToHex(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "ipv6_to_hex"

  override def nullSafeEval(input: Any): Any =
    graft.functions.Net.ipv6ToHex(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Net.ipv6ToHex($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Ipv6ToHex =
    copy(child = newChild)
}

/** `simhash64(text)` — 64-bit SimHash of a whitespace-tokenized string,
  * rendered as a 64-char '0'/'1' string (portable across engines — no
  * int64/hex conversions needed for an oracle).
  *
  * Definition (content-derived, no RNG, reproducible anywhere with md5):
  * for each token, take md5 hex; nibble i = hexval(hex[i]), i = 0..15;
  * token bit b = (nibble[b/4] >> (b%4)) & 1; each token votes +1/-1 per
  * bit; fingerprint bit b = 1 iff the vote sum is > 0.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SimHash64.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.spark.sql.graft.SimHash64.compute($c.toString()));
    """)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `dot_d(a, b)` — dot product of two `array<double>` columns as a tight
  * primitive loop over `ArrayData` (no intermediate `zip_with` array, no
  * per-element boxing). Left-to-right summation — on graft's
  * integer-scaled embeddings the result is exact and order-independent
  * anyway, which is what keeps float similarity queries hash-stable. */
/** `robots_match(path, rule)` — does a URL path match a robots.txt rule
  * path under RFC 9309 §2.2.3 (`*` spans any run, a TRAILING `$`
  * anchors the end, otherwise the rule matches a PREFIX of the path)?
  * Equivalent to compiling the rule to `^escaped-with-.*` and running a
  * regex, but as a two-pointer greedy scan — no per-row Pattern
  * compilation, which dominated the fold when the rule arrives as data
  * (a broadcast rules array) rather than a literal. */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "robots_match"

  override def nullSafeEval(p: Any, r: Any): Any =
    RobotsMatch.compute(p.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, r) => s"""
      ${ev.value} = org.apache.spark.sql.graft.RobotsMatch.compute($p, $r);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)
}

object RobotsMatch {
  def compute(pathU: UTF8String, ruleU: UTF8String): Boolean = {
    val path = pathU.toString
    val rule0 = ruleU.toString
    val anchored = rule0.nonEmpty && rule0.charAt(rule0.length - 1) == '$'
    val rule = if (anchored) rule0.substring(0, rule0.length - 1) else rule0
    val segs = rule.split("\\*", -1) // -1: keep empty tail segments
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length) {
      val s = segs(i)
      if (i == segs.length - 1 && anchored) {
        // the anchored tail must END the path at or after pos
        if (path.length - s.length < pos || !path.endsWith(s)) return false
        pos = path.length
      } else {
        val j = path.indexOf(s, pos)
        if (j < 0) return false
        pos = j + s.length
      }
      i += 1
    }
    // no `*` at all + anchor ⇒ exact match, not prefix
    !anchored || segs.length > 1 || pos == path.length
  }
}

case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductD.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = org.apache.spark.sql.graft.DotProductD.compute($a, $b);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** `minhash_sig(shingles, k)` — MinHash signature in one pass, ONE md5
  * digest per shingle: lane j (0-based) is the minimum over shingles of
  * the 16-hex-char window starting at offset 2·j of the circular 32-char
  * md5 hex digest — i.e. `substr(md5(s) || md5(s), 2*j+1, 16)` in SQL,
  * which is exactly how the DuckDB oracles mirror it. The windows are
  * pairwise-distinct rotations of the same 128-bit digest for j < 16, so
  * each lane orders shingles differently (the MinHash requirement) while
  * the per-shingle hashing cost is one digest instead of k — the digest,
  * not the window compare, dominates at corpus scale. k > 16 would wrap
  * to duplicate lanes and is rejected. */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), IntegerType)
  // elements are null for empty/all-null shingle input (array_min
  // semantics — see compute)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(shingles: Any, k: Any): Any =
    MinHashSig.compute(shingles.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) => s"""
      ${ev.value} = org.apache.spark.sql.graft.MinHashSig.compute($s, $k);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5HexChars(bytes: Array[Byte], md: java.security.MessageDigest): Array[Char] = {
    val d = md.digest(bytes)
    md.reset()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    out
  }

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    // lanes are the 16 distinct even-offset windows of one circular
    // 32-hex-char digest; a 17th lane would alias lane 0 — fail loudly
    // rather than silently correlate bands
    if (k < 1 || k > 16) throw new IllegalArgumentException(
      s"minhash_sig: k must be in [1, 16], got $k")
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    val win = new Array[Char](16)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      // null elements are SKIPPED, and an all-null/empty input yields
      // null signature elements — exactly what the equivalent composable
      // form (transform + array_min over substr'd md5s) and the DuckDB
      // mirror produce; substituting "" here (or NPE-ing on a null) would
      // silently diverge the three definitions on degenerate inputs
      if (!shingles.isNullAt(i)) {
        val sh = shingles.getUTF8String(i).toString
        val h = md5HexChars(sh.getBytes("UTF-8"), md)
        var j = 0
        while (j < k) {
          val off = 2 * j
          // lexicographic compare of the wrapped window against the lane
          // min WITHOUT allocating the candidate string ('0'-'9' < 'a'-'f'
          // in ASCII — same ordering String.compareTo and DuckDB varchar
          // comparison use on lowercase hex)
          val cur = mins(j)
          var replace = cur == null
          if (!replace) {
            var p = 0
            var cmp = 0
            while (p < 16 && cmp == 0) {
              cmp = h((off + p) & 31) - cur.charAt(p)
              p += 1
            }
            replace = cmp < 0
          }
          if (replace) {
            var p = 0
            while (p < 16) { win(p) = h((off + p) & 31); p += 1 }
            mins(j) = new String(win)
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(m)))
  }
}

/** `winnow_fp(text)` — winnowing (MOSS) fingerprints as one O(n) JVM
  * pass: base-257 polynomial rolling hash over k-char grams (exact in a
  * Long, exact in a double for k ≤ 6 — the cross-engine contract with
  * the DuckDB oracle), then the min of each w-window of hashes,
  * first-occurrence deduplicated. The composable
  * `transform(sequence(..), aggregate(..))` form computes the identical
  * result but re-evaluates a Catalyst subtree per character — ~2 orders
  * of magnitude slower on real documents. */
case class WinnowFingerprints(child: Expression, k: Int = 5, w: Int = 4)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.WinnowFingerprints.compute(
        $c.toString(), $k, $w);
    """)

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  def compute(text: String, k: Int, w: Int): ArrayData = {
    val n = text.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var pow = 1L // 257^(k-1)
    var h = 0L
    var i = 0
    while (i < k) {
      h = h * 257L + text.charAt(i).toLong
      if (i < k - 1) pow *= 257L
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < nh) {
      h = (h - text.charAt(i - 1).toLong * pow) * 257L +
        text.charAt(i + k - 1).toLong
      hashes(i) = h
      i += 1
    }
    if (nh < w) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nh - w) {
      var m = hashes(i)
      var j = i + 1
      while (j < i + w) {
        if (hashes(j) < m) m = hashes(j)
        j += 1
      }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `cosine_argmax(v)` — (centroid id, cosine) of the nearest centroid,
  * with the centroid matrix shipped ONCE per plan as a codegen reference
  * object (`ctx.addReferenceObj`) instead of k·dim `Literal` nodes: at
  * k=64 × dim=1024 the inline-literal formulation is a ~10⁵-node
  * expression tree that blows up codegen; this is one opaque array in the
  * task closure — the same mechanics as a broadcast variable, sized
  * k·dim doubles.
  *
  * Semantics mirror the composable form exactly —
  * `greatest(cosines...)` + first-matching-id fold: per-centroid cosine
  * is [[DotProductD]]'s left-to-right sum, then sqrt/multiply/divide in
  * the same order; the winner is the FIRST id (ascending input order)
  * achieving the maximum under Spark's NaN-is-largest ordering. */
case class CosineArgMax(child: Expression, ids: Array[Long],
    centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(ids.length == centroids.length && ids.nonEmpty,
    "cosine_argmax: ids and centroids must align and be non-empty")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false)))
  override def prettyName: String = "cosine_argmax"

  // centroid self-norms are constants for the plan's lifetime: computed
  // ONCE here and shipped as a reference object, instead of k·dim
  // multiply-adds re-done for every row (which roughly doubles the
  // assignment loop at k=64 × dim=1024)
  private lazy val centroidNorms: Array[Double] =
    centroids.map { c =>
      var cc = 0.0
      var j = 0
      while (j < c.length) { cc += c(j) * c(j); j += 1 }
      math.sqrt(cc)
    }

  override def nullSafeEval(input: Any): Any =
    CosineArgMax.compute(input.asInstanceOf[ArrayData], ids, centroids,
      centroidNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cids", ids, "long[]")
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("cnorms", centroidNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.CosineArgMax.compute(
        $c, $idsRef, $cRef, $nRef);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CosineArgMax =
    copy(child = newChild)
}

object CosineArgMax {
  def compute(v: ArrayData, ids: Array[Long],
      centroids: Array[Array[Double]], norms: Array[Double]): InternalRow = {
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); vv += x * x; i += 1 }
    val normV = math.sqrt(vv)
    var bestCos = Double.NegativeInfinity
    var bestId = 0L
    var first = true
    var cidx = 0
    while (cidx < centroids.length) {
      val c = centroids(cidx)
      val m = math.min(n, c.length)
      var dvc = 0.0
      var j = 0
      while (j < m) { dvc += v.getDouble(j) * c(j); j += 1 }
      val cos = dvc / (normV * norms(cidx))
      // Spark `greatest` ordering: NaN > any value; ties keep the FIRST
      // (the composable fold resolves ties to the lowest id)
      val better =
        if (first) true
        else if (java.lang.Double.isNaN(bestCos)) false
        else java.lang.Double.isNaN(cos) || cos > bestCos
      if (better) { bestCos = cos; bestId = ids(cidx); first = false }
      cidx += 1
    }
    new GenericInternalRow(Array[Any](bestId, bestCos))
  }
}

/** `cosine_top_clusters(v)` — the `nprobe` centroid ids nearest to `v`
  * by cosine, ordered (cos desc, id asc) — [[CosineArgMax]]'s top-n
  * sibling for IVF probe lists. Centroids ride the plan as ONE
  * reference object (no k·dim literal blowup, no crossJoin+groupBy
  * shuffle carrying the vectors — the narrow-pass probe computation
  * `Similarity.knnJoin` needs to stay linear when the centroid count
  * scales with the corpus). Ordering matches the previous
  * `array_sort(struct(-cos, id))` formulation exactly, NaN cosines
  * (zero-norm vectors) least preferred, so results are bit-compatible.
  * Returns `array<long>` of `nprobe` ids (fewer iff k < nprobe). */
case class CosineTopClusters(child: Expression, ids: Array[Long],
    centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(ids.length == centroids.length && ids.nonEmpty,
    "cosine_top_clusters: ids and centroids must align and be non-empty")
  require(nprobe >= 1, "cosine_top_clusters: nprobe >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cosine_top_clusters"

  private lazy val centroidNorms: Array[Double] =
    centroids.map { c =>
      var cc = 0.0
      var j = 0
      while (j < c.length) { cc += c(j) * c(j); j += 1 }
      math.sqrt(cc)
    }

  override def nullSafeEval(input: Any): Any =
    CosineTopClusters.compute(input.asInstanceOf[ArrayData], ids,
      centroids, centroidNorms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cids", ids, "long[]")
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("cnorms", centroidNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.CosineTopClusters.compute(
        $c, $idsRef, $cRef, $nRef, $nprobe);
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CosineTopClusters = copy(child = newChild)
}

object CosineTopClusters {
  def compute(v: ArrayData, ids: Array[Long],
      centroids: Array[Array[Double]], norms: Array[Double],
      nprobe: Int): ArrayData = {
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); vv += x * x; i += 1 }
    val normV = math.sqrt(vv)
    val negCos = new Array[Double](centroids.length)
    var cidx = 0
    while (cidx < centroids.length) {
      val c = centroids(cidx)
      val m = math.min(n, c.length)
      var dvc = 0.0
      var j = 0
      while (j < m) { dvc += v.getDouble(j) * c(j); j += 1 }
      negCos(cidx) = -(dvc / (normV * norms(cidx)))
      cidx += 1
    }
    // sort centroid indexes by (negCos asc, id asc); Double.compare puts
    // NaN last, exactly like Spark's array_sort on struct(-cos, id)
    val order = Array.range(0, centroids.length)
      .map(Integer.valueOf).sortWith { (a, b) =>
        val cmp = java.lang.Double.compare(negCos(a), negCos(b))
        if (cmp != 0) cmp < 0 else ids(a) < ids(b)
      }
    val take = math.min(nprobe, order.length)
    val out = new Array[Long](take)
    var t = 0
    while (t < take) { out(t) = ids(order(t)); t += 1 }
    new GenericArrayData(out)
  }
}

/** `double_sortable_bits(x)` — order-preserving bijection double→long
  * (IEEE-754 sign-magnitude flip: positives keep their raw bits,
  * negatives flip the magnitude bits), so double orderings can ride
  * long-keyed machinery — specifically [[TopKPairs]], turning
  * `row_number() OVER (ORDER BY cos DESC)` into a bounded heap
  * aggregate. Total order matches Spark's descending-double semantics
  * (NaN greatest); the one divergence is −0.0 < +0.0 where Spark
  * compares them equal — callers ordering on computed cosines never
  * produce a signed-zero tie. [[SortableBitsToDouble]] inverts. */
case class DoubleSortableBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "double_sortable_bits"
  override def nullSafeEval(input: Any): Any =
    DoubleSortableBits.encode(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.DoubleSortableBits.encode($c);
    """)
  override protected def withNewChildInternal(
      newChild: Expression): DoubleSortableBits = copy(child = newChild)
}

object DoubleSortableBits {
  def encode(x: Double): Long = {
    val bits = java.lang.Double.doubleToRawLongBits(x)
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  }
  def decode(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))
}

/** Inverse of [[DoubleSortableBits]]. */
case class SortableBitsToDouble(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sortable_bits_to_double"
  override def nullSafeEval(input: Any): Any =
    DoubleSortableBits.decode(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.DoubleSortableBits.decode($c);
    """)
  override protected def withNewChildInternal(
      newChild: Expression): SortableBitsToDouble = copy(child = newChild)
}

/** `pq_encode(v)` — product-quantization codes: the vector is split into
  * `m` contiguous subvectors and each is assigned its nearest codebook
  * centroid by EXACT-INTEGER squared L2 (inputs are graft's integer-scaled
  * embeddings, so distances are exact longs; ties → lowest code). The
  * codebook tensor rides the plan as one reference object, like
  * [[CosineArgMax]]'s centroids. Returns `array<long>` of m codes. */
case class PqEncodeL2(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: codebooks must be non-empty")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncodeL2.compute(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.PqEncodeL2.compute($c, $cbRef);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeL2 =
    copy(child = newChild)
}

object PqEncodeL2 {
  def compute(v: ArrayData,
      codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    // bounds-check BEFORE touching elements: UnsafeArrayData.getDouble
    // does no bounds checking, so a truncated vector would silently read
    // adjacent memory and poison the index with garbage codes
    var required = 0
    var jj = 0
    while (jj < m) { required += codebooks(jj)(0).length; jj += 1 }
    if (v.numElements() < required)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} dims, " +
          s"codebooks need $required")
    val out = new Array[Long](m)
    var off = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var best = Long.MaxValue
      var bestCode = 0L
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var acc = 0L
        var d = 0
        while (d < dsub) {
          // inputs are integer-valued doubles; the difference is exact
          val diff = (v.getDouble(off + d) - cv(d)).toLong
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bestCode = c.toLong }
        c += 1
      }
      out(j) = bestCode
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `nfc_normalize(str)` — Unicode NFC normalization (canonical
  * composition: `e` + COMBINING ACUTE → `é`), the first step of corpus
  * text normalization and a direct mirror of DuckDB's `nfc_normalize`.
  * Spark ships no normalizer function, so this wraps
  * `java.text.Normalizer` as a codegen'd expression — the already-NFC
  * fast path (`isNormalized`, the overwhelming case on web text) skips
  * the copy. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.NfcNormalize.compute($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `resolve_url(base, href)` — RFC 3986 §5 reference resolution (the
  * step between `html_links`' raw hrefs and a crawl frontier: relative
  * paths, `..` segments, root-relative, scheme-relative and
  * fragment/query-only references all resolve against the page URL).
  * Wraps `java.net.URI.resolve` — the JDK's exact implementation of the
  * RFC algorithm — as a codegen'd expression; null when either side is
  * unparsable (crawlers treat those as quality rejects, not errors).
  * Fragments are dropped from the result (a frontier never keys on
  * them). */
case class ResolveUrl(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"

  override def nullSafeEval(base: Any, href: Any): Any =
    ResolveUrl.compute(base.asInstanceOf[UTF8String],
      href.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => s"""
      ${ev.value} = org.apache.spark.sql.graft.ResolveUrl.compute($b, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)
}

object ResolveUrl {
  def compute(base: UTF8String, href: UTF8String): UTF8String =
    try {
      val resolved = new java.net.URI(base.toString)
        .resolve(href.toString).toString
      // drop the fragment: the frontier never keys on it
      val cut = resolved.indexOf('#')
      UTF8String.fromString(
        if (cut < 0) resolved else resolved.substring(0, cut))
    } catch {
      case _: java.net.URISyntaxException | _: IllegalArgumentException =>
        null
    }
}

object SimHash64 {
  def compute(text: String): String = {
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    val n = text.length
    while (start <= n) {
      val end0 = text.indexOf(' ', start)
      val end = if (end0 < 0) n else end0
      // split-on-space semantics incl. empty tokens, matching
      // split(text, ' ') in SQL engines
      val token = text.substring(start, end)
      val digest = md.digest(token.getBytes("UTF-8"))
      md.reset()
      var b = 0
      while (b < 64) {
        // nibble i corresponds to hex char i of the md5 string:
        // even i -> high nibble of byte i/2, odd i -> low nibble
        val byteV = digest(b / 8) & 0xff
        val nibble = if ((b / 4) % 2 == 0) byteV >> 4 else byteV & 0xf
        val bit = (nibble >> (b % 4)) & 1
        votes(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      if (end0 < 0) start = n + 1 else start = end + 1
    }
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < 64) {
      sb.append(if (votes(b) > 0) '1' else '0')
      b += 1
    }
    sb.toString
  }
}

/** `multi_pattern_counts(text, patterns)` — per-pattern OVERLAPPING
  * occurrence counts from one Aho-Corasick pass over the row
  * ([[graft.functions.AhoCorasick]]): `array<long>` index-aligned with
  * the pattern list. One byte-at-a-time scan whatever the pattern
  * count — the blocklist/lexicon primitive where k `contains` passes
  * (or one alternation regex, which backtracks) cost k·len.
  *
  * Codegen keeps the scan inside whole-stage codegen: the automaton
  * rides the generated class as a reference object (built once per
  * task from the serialized word list, shared across rows), the
  * generated code is a single virtual call per row — no UDF boxing,
  * no per-row closure dispatch.
  */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty, "multi_pattern_counts: empty pattern list")

  @transient private lazy val automaton =
    new graft.functions.AhoCorasick(patterns)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_pattern_counts"

  override def nullSafeEval(input: Any): Any =
    automaton.countsArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[graft.functions.AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ac.countsArrayData($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternCounts = copy(child = newChild)
}

/** `multi_pattern_redact(text, patterns)` — every overlapping
  * occurrence of every pattern masked to `*` in ONE Aho-Corasick pass
  * ([[graft.functions.AhoCorasick.redact]]): the blocklist SCRUB
  * beside [[MultiPatternCounts]]'s blocklist COUNT (k chained
  * `regexp_replace` calls cost k passes and disagree about overlaps;
  * here the union of the match spans masks, order-independent by
  * construction). Same codegen stance: the automaton rides the
  * generated class as a reference object, one virtual call per row. */
case class MultiPatternRedact(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty, "multi_pattern_redact: empty pattern list")

  @transient private lazy val automaton =
    new graft.functions.AhoCorasick(patterns)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_pattern_redact"

  override def nullSafeEval(input: Any): Any =
    automaton.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[graft.functions.AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ac.redact($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternRedact = copy(child = newChild)
}

/** `multi_pattern_spans(text, patterns)` — every overlapping
  * occurrence of every pattern as an exact `(pat, start)` struct in
  * ONE Aho-Corasick pass ([[graft.functions.AhoCorasick.spansArrayData]]):
  * the weak-labeling SPAN face beside [[MultiPatternCounts]]'s COUNT
  * and [[MultiPatternRedact]]'s SCRUB — gazetteer/lexicon tagging
  * where the downstream consumer needs positions, not counts. `pat` is
  * the 0-based pattern-list index, `start` the 0-based byte offset.
  * Same codegen stance: the automaton rides the generated class as a
  * reference object, one virtual call per row. */
case class MultiPatternSpans(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty, "multi_pattern_spans: empty pattern list")

  @transient private lazy val automaton =
    new graft.functions.AhoCorasick(patterns)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pat", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_pattern_spans"

  override def nullSafeEval(input: Any): Any =
    automaton.spansArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[graft.functions.AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ac.spansArrayData($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternSpans = copy(child = newChild)
}

/** `fix_mojibake(s)` — repairs UTF-8 text that was mis-decoded as
  * Latin-1 / Windows-1252 ("café" → "cafÃ©", "'" → "â€™"), the ftfy
  * class of curation fix. One round encodes the string back to its
  * single-byte form (identity for chars ≤ 0xFF, the cp1252 reverse
  * table for the 0x80–0x9F glyphs like €/™/"") and re-decodes STRICT
  * UTF-8 (overlongs, surrogates, truncations and >U+10FFFF all
  * reject); rounds repeat up to 3× so double-encoded text also
  * recovers. Deliberately conservative: a round applies only when the
  * WHOLE string survives the byte round-trip and at least one
  * multibyte sequence was decoded — mixed or already-clean text passes
  * through untouched, so the repair can never corrupt valid input. */
case class FixMojibake(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    FixMojibake.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.FixMojibake.compute($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {
  /** cp1252 0x80–0x9F glyph → byte (the slots where cp1252 differs from
    * Latin-1; the five undefined slots are absent). */
  private val cp1252Reverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83,
    '„' -> 0x84, '…' -> 0x85, '†' -> 0x86,
    '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
    'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '•' -> 0x95,
    '–' -> 0x96, '—' -> 0x97, '˜' -> 0x98,
    '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F
  ).map { case (c, b) => c -> b.toByte }

  def compute(s: UTF8String): UTF8String = {
    var cur = s.toString
    var rounds = 0
    var more = true
    while (rounds < 3 && more) {
      repairOnce(cur) match {
        case Some(next) => cur = next; rounds += 1
        case None       => more = false
      }
    }
    if (rounds == 0) s else UTF8String.fromString(cur)
  }

  /** One mojibake round, or None when the string is not a clean
    * whole-string single-byte reading of valid multi-byte UTF-8. */
  private def repairOnce(s: String): Option[String] = {
    val n = s.length
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c <= 0xFF) bytes(i) = c.toByte
      else cp1252Reverse.get(c) match {
        case Some(b) => bytes(i) = b
        case None    => return None
      }
      i += 1
    }
    decodeStrictUtf8(bytes)
  }

  /** Strict UTF-8 decode: rejects continuation errors, overlong forms,
    * surrogates, > U+10FFFF and truncation; None also when the bytes
    * are pure ASCII (no multibyte evidence → nothing to repair). */
  private def decodeStrictUtf8(b: Array[Byte]): Option[String] = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    var multibyte = false
    while (i < b.length) {
      val x = b(i) & 0xff
      if (x < 0x80) { sb.append(x.toChar); i += 1 }
      else {
        val (len, min) =
          if (x >= 0xC0 && x <= 0xDF) (2, 0x80)
          else if (x >= 0xE0 && x <= 0xEF) (3, 0x800)
          else if (x >= 0xF0 && x <= 0xF4) (4, 0x10000)
          else return None
        if (i + len > b.length) return None
        var cp = x & (0x3f >> (len - 1))
        var j = 1
        while (j < len) {
          val cont = b(i + j) & 0xff
          if (cont < 0x80 || cont > 0xBF) return None
          cp = (cp << 6) | (cont & 0x3f)
          j += 1
        }
        if (cp < min || cp > 0x10FFFF ||
            (cp >= 0xD800 && cp <= 0xDFFF)) return None
        sb.appendCodePoint(cp)
        multibyte = true
        i += len
      }
    }
    if (multibyte) Some(sb.toString) else None
  }
}

/** `registered_domain(host)` — registrable domain under a
  * public-suffix rule table ([[graft.functions.PublicSuffix]]): the
  * per-domain grouping key crawl budgets, sampling quotas and
  * host-rollup stats need, where the two-label heuristic misgroups
  * multi-label suffixes (`co.uk`) and wildcard TLDs (`*.ck`). The
  * rule table rides the generated class as a reference object (built
  * once per JVM from the serialized rule list, shared across rows);
  * lookup is O(host labels) hash probes — never O(rules). Null when
  * the host has no registrable domain (it IS a public suffix, or is
  * single-label / malformed); callers `coalesce` to the raw host for
  * a total grouping key. */
case class RegisteredDomain(child: Expression, rules: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(rules.nonEmpty, "registered_domain: empty rule list")

  @transient private lazy val table = new graft.functions.PublicSuffix(rules)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "registered_domain"

  override def nullSafeEval(input: Any): Any =
    table.registrableUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("pslTable", table,
      classOf[graft.functions.PublicSuffix].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $t.registrableUtf8($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RegisteredDomain = copy(child = newChild)
}

/** `rake_phrases(text)` — RAKE candidate-phrase extraction as ONE
  * imperative pass (the codegen'd fast path of
  * [[graft.operators.Curation.rakePhrases]]'s two-regex chain, whose
  * alternation scan dominated the x30 stress run). Semantics are
  * EXACTLY the chain's, provable on the reduced alphabet: after
  * lowercasing, pass 1 turns every `[^a-z0-9 ]+` run into a delimiter
  * — so only `[a-z0-9]`, spaces and delimiters remain — and on that
  * alphabet pass 2's `\b`-anchored stopword match reduces to "a token
  * (maximal `[a-z0-9]` run) that IS a stopword". One walk therefore
  * suffices: classify each char (word / space / delimiter), close a
  * token at every non-word char, close a phrase at every delimiter or
  * stopword token, join phrase tokens with single spaces (which is
  * what the chain's trim + space-collapse produced). A property test
  * pins native ≡ chain on adversarial inputs (underscores, digits,
  * unicode, runs of punctuation). The stopword set rides the
  * generated class as a reference object; O(len) per row, zero
  * regex. */
case class RakePhrases(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(stopwords.nonEmpty, "rake_phrases: empty stopword list")

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(w => s.add(w.toLowerCase))
    s
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rake_phrases"

  def compute(text: UTF8String): ArrayData = {
    // UTF8String.toLowerCase is what Spark's own lower() uses —
    // locale-independent, unlike String.toLowerCase
    val s = text.toLowerCase.toString
    val phrases = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val phrase = new java.lang.StringBuilder()
    val token = new java.lang.StringBuilder()
    def closeToken(): Unit = {
      if (token.length() > 0) {
        if (stopSet.contains(token.toString)) closePhrase()
        else {
          if (phrase.length() > 0) phrase.append(' ')
          phrase.append(token)
        }
        token.setLength(0)
      }
    }
    def closePhrase(): Unit = {
      if (phrase.length() > 0) {
        phrases += UTF8String.fromString(phrase.toString)
        phrase.setLength(0)
      }
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) token.append(c)
      else if (c == ' ') closeToken()
      else { closeToken(); closePhrase() } // delimiter char
      i += 1
    }
    closeToken(); closePhrase()
    new GenericArrayData(phrases.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rakeExpr", this,
      classOf[RakePhrases].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RakePhrases = copy(child = newChild)
}
