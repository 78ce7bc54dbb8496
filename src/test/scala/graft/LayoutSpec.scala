package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder
import graft.operators.Layout

/** Morton-key arithmetic against hand-computed interleavings, and the
  * layout property Z-ordering exists for: after [[Layout.zorderWrite]],
  * BOTH dimensions have tight per-file min/max ranges (what parquet
  * row-group pruning keys off), where a one-column sort leaves the other
  * dimension full-range in every file. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave matches hand-computed Morton codes") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
        (0xFFFFL, 0L), (0L, 0xFFFFL), (12345L, 54321L))
      .toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31)
        z |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      z
    }
    assert(got == Seq(0L, 1L, 2L, 3L, ref(5, 3), ref(0xFFFF, 0),
      ref(0, 0xFFFF), ref(12345, 54321)))
  }

  test("spreadSql mirrors the Scala spread chain bit for bit") {
    // the SQL chain is for DuckDB, but it is plain ANSI — run it through
    // Spark SQL against the same rows to prove both chains agree
    Seq((1L, 3L, 5L), (2L, 40000L, 70000L), (3L, 12345L, 54321L),
        (4L, 0L, 2147483647L))
      .toDF("id", "ax", "bx").createOrReplaceTempView("zsrc")
    val (aCte, _, aCol) = ZOrder.spreadSql("zsrc", "ax", "za")
    val (bCte, bRel, bCol) = ZOrder.spreadSql("za5", "bx", "zb")
    val viaSql = spark.sql(
      s"WITH $aCte,\n$bCte\nSELECT id, ($aCol | ($bCol << 1)) AS z FROM $bRel")
      .orderBy("id").select("z").as[Long].collect().toSeq
    val viaScala = spark.table("zsrc").orderBy("id")
      .select(ZOrder.interleave(col("ax"), col("bx")).as("z"))
      .as[Long].collect().toSeq
    assert(viaSql == viaScala)
  }

  test("zorderWrite: both dimensions cluster; out-of-range fails loudly") {
    val n = 64 // 64x64 grid, uniform
    val grid = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("x"),
        (col("id") % n).cast("long").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.zorderWrite(grid, "x", "y", s"$dir/z", nFiles = 16)

    // content round-trips (plus the persisted zkey column)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == n.toLong * n)
    assert(back.columns.toSet == Set("x", "y", "zkey"))
    assert(back.filter(col("zkey") =!=
      ZOrder.interleave(col("x"), col("y"))).isEmpty)

    // per-FILE ranges: z-runs ≈ squares, so each file spans about
    // n/√16 = n/4 of EACH dimension — assert a generous n/2 bound,
    // which a linear (x, y) sort cannot meet (its files span all of y)
    val files = new java.io.File(s"$dir/z").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size > 1)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).collect().head
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    assert(spans.forall { case (sx, sy) => sx <= n / 2 && sy <= n / 2 },
      s"per-file (x, y) spans not clustered: $spans")

    // negative / overflowing dimensions must fail, not wrap
    val bad = Seq((-1L, 2L)).toDF("x", "y")
    val e = intercept[Exception] {
      Layout.zorderWrite(bad, "x", "y", s"$dir/bad", nFiles = 1)
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(e).contains("zorderWrite"), chain(e))
  }

  test("zoneMap: footer stats equal a full data scan, per file") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-zm")
      .resolve("store").toString
    (1 to 500).map(i => (f"k${i % 50}%03d", i.toLong)).toDF("k", "v")
      .withColumn("b", pmod(xxhash64(col("k")), lit(8L)))
      .repartition(col("b"))
      .write.partitionBy("b").parquet(dir)
    def norm(p: String) =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val zm = Layout.zoneMap(spark2, dir, "k")
      .collect().map(r => norm(r.getString(0)) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    val scan = spark2.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("mn"),
        max(col("k")).as("mx"))
      .collect().map(r => norm(r.getString(0)) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(zm.nonEmpty && zm == scan, s"zm=$zm scan=$scan")
    // numeric keys merge in TYPED order: values 9..100 across multiple
    // row groups must report min 9 / max 100, not the lexicographic
    // "100"/"99"
    val ndir = java.nio.file.Files.createTempDirectory("graft-zm-num")
      .resolve("t").toString
    (9L to 100L).toDF("k").coalesce(1)
      .write.option("parquet.block.size", "1024").parquet(ndir)
    val nzm = Layout.zoneMap(spark2, ndir, "k").collect()
    assert(nzm.map(_.getLong(1)).sum == 92L)
    val mins = nzm.map(_.getString(2).toLong)
    val maxs = nzm.map(_.getString(3).toLong)
    assert(mins.min == 9L && maxs.max == 100L, (mins.min, maxs.max))
  }

  test("packFiles: cumulative bins in size-desc order, offsets exact") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    // sizes 90, 60, 40, 30, 30, 10 → excl sums 0, 90, 150, 190, 220,
    // 250; target 100 → bins 0, 0, 1, 1, 2, 2 (ties break on id)
    val files = Seq((1L, 90L), (2L, 60L), (3L, 40L), (4L, 30L),
      (5L, 30L), (6L, 10L)).toDF("fid", "sz")
    val out = Layout.packFiles(files, "fid", "sz", targetBytes = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L))
    intercept[IllegalArgumentException](
      Layout.packFiles(files, "fid", "sz", targetBytes = 0L))
  }
}
