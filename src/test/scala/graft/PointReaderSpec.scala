package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.operators.ObservationStore

/** The fast-path contract: `servePoint` (driver-local parquet reader)
  * must return exactly what `entries` (the Spark plan path) returns on
  * the same disk store — same rows, same types — across access paths,
  * residual filters, limits, misses, and store mutation (merge/expire
  * epoch bumps invalidating the cached bucket→file map). */
class PointReaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshStore(): (String, ObservationStore) = {
    val input = Seq(
      ("foo", "abc", "A", "1.2.3.4", 4L, ts("2018-01-01 00:00:00")),
      ("foo", "abc", "A", "1.2.3.4", 6L, ts("2018-06-01 00:00:00")),
      ("foo", "xyz", "A", "1.2.3.4", 2L, ts("2018-02-01 00:00:00")),
      ("foo", "abc", "AAAA", "::1", 1L, ts("2018-03-01 00:00:00")),
      ("bar", "abc", "A", "1.2.3.5", 10L, ts("2018-03-01 00:00:00")),
      ("baz", "abc", "A", "1.2.3.4", 1L, ts("2018-04-01 00:00:01.123456"))
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-pr").toString
    ObservationStore.writeDual(ObservationStore.aggregate(input), dir,
      numBuckets = 8)
    (dir, ObservationStore.load(spark, dir))
  }

  private def sortedSet(rows: Seq[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq).sortBy(_.mkString("\u0001"))

  private def assertSame(store: ObservationStore,
      rrname: Option[String] = None, rdata: Option[String] = None,
      rrtype: Option[String] = None, sensorId: Option[String] = None,
      limit: Int = 1000): Unit = {
    val fast = store.servePointRows(rrname, rdata, rrtype, sensorId, limit)
    assert(fast.isDefined, "fast path should be available on a disk store")
    val plan = store.entries(rrname, rdata, rrtype, sensorId, limit).collect()
    assert(sortedSet(fast.get) == sortedSet(plan.toSeq),
      s"fast=${fast.get} plan=${plan.toSeq}")
  }

  test("servePoint matches entries across access paths and residuals") {
    val (_, store) = freshStore()
    assertSame(store, rrname = Some("foo"))              // forward, 3 rows
    assertSame(store, rdata = Some("1.2.3.4"))           // inverted, 3 rows
    assertSame(store, rrname = Some("foo"), rrtype = Some("A"))
    assertSame(store, rrname = Some("foo"), sensorId = Some("xyz"))
    assertSame(store, rrname = Some("foo"), rdata = Some("1.2.3.4"),
      rrtype = Some("A"), sensorId = Some("abc"))        // fully pinned
    assertSame(store, rrname = Some("nonexistent"))      // miss
    assertSame(store, rdata = Some("9.9.9.9"))           // miss
    intercept[IllegalArgumentException](store.servePoint())
  }

  test("servePrefix matches the entriesPrefix plan scan") {
    val (_, store) = freshStore()
    def assertPrefix(prefix: String): Unit = {
      val fast = store.servePrefix(prefix, limit = Int.MaxValue)
      assert(fast.isDefined)
      val plan = store.entriesPrefix(prefix, limit = Int.MaxValue)
        .collect().toSeq
      assert(
        sortedSet(fast.get.map(o => Row(o.rrname, o.sensor_id, o.rrtype,
          o.rdata, o.count, o.first_seen, o.last_seen))) ==
          sortedSet(plan),
        s"prefix=$prefix fast=${fast.get} plan=$plan")
    }
    assertPrefix("ba")   // bar + baz, two buckets
    assertPrefix("foo")  // exact name as prefix
    assertPrefix("f")    // all the foo rows
    assertPrefix("zzz")  // miss
    assertPrefix("b")    // multi-bucket fan
    intercept[IllegalArgumentException](store.servePrefix(""))
    // limit respected
    assert(store.servePrefix("f", limit = 2).get.size == 2)
  }

  test("multi-page buckets: column-index filtering keeps rows aligned") {
    // Force MANY pages per bucket file (row-count limit 50) so the
    // column-index filter actually prunes pages and the record reader
    // must synchronize row positions across columns mid-row-group —
    // the alignment a single-page store never exercises. 2000 keys
    // across 4 buckets ≈ 10 pages per column chunk.
    val input = spark.range(2000).selectExpr(
      "concat('name-', lpad(cast(id as string), 6, '0')) as rrname",
      "cast(id % 3 as string) as sensor_id",
      "'A' as rrtype",
      "concat('addr-', cast(id % 701 as string)) as rdata",
      "1L as count",
      "timestamp'2020-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-mp").toString
    val prev = spark.conf.getOption("spark.hadoop.parquet.page.row.count.limit")
    spark.conf.set("spark.hadoop.parquet.page.row.count.limit", "50")
    try ObservationStore.writeDual(ObservationStore.aggregate(input), dir,
      numBuckets = 4)
    finally prev match {
      case Some(v) => spark.conf.set("spark.hadoop.parquet.page.row.count.limit", v)
      case None => spark.conf.unset("spark.hadoop.parquet.page.row.count.limit")
    }
    val store = ObservationStore.load(spark, dir)
    // point hits in the middle of the key range (mid-file pages)
    for (k <- Seq("name-000000", "name-000999", "name-001357", "name-001999")) {
      val fast = store.servePointRows(rrname = Some(k)).get
      val plan = store.entries(rrname = Some(k)).collect().toSeq
      assert(sortedSet(fast) == sortedSet(plan), s"key=$k")
      assert(plan.nonEmpty, s"key=$k should exist")
    }
    // inverted copy too (rdata residuals cross pages)
    val fastInv = store.servePointRows(rdata = Some("addr-42")).get
    val planInv = store.entries(rdata = Some("addr-42")).collect().toSeq
    assert(sortedSet(fastInv) == sortedSet(planInv))
    assert(planInv.size == 2000 / 701 + (if (42 < 2000 % 701) 1 else 0))
    // prefix spanning several pages and buckets
    for (p <- Seq("name-0007", "name-00", "name-001999", "zzz")) {
      val fast = store.servePrefix(p, limit = Int.MaxValue).get
      val plan = store.entriesPrefix(p, limit = Int.MaxValue).collect().toSeq
      assert(fast.size == plan.size, s"prefix=$p")
      assert(sortedSet(fast.map(o => Row(o.rrname, o.sensor_id, o.rrtype,
        o.rdata, o.count, o.first_seen, o.last_seen))) == sortedSet(plan),
        s"prefix=$p")
    }
  }

  test("servePoint preserves merge roll-up values and sub-second precision") {
    val (_, store) = freshStore()
    val foo = store.servePoint(rrname = Some("foo"), rrtype = Some("A"),
      sensorId = Some("abc")).get
    assert(foo.size == 1)
    assert(foo.head.count == 10L)
    assert(foo.head.first_seen == ts("2018-01-01 00:00:00"))
    assert(foo.head.last_seen == ts("2018-06-01 00:00:00"))
    val baz = store.servePoint(rrname = Some("baz")).get
    assert(baz.head.first_seen == ts("2018-04-01 00:00:01.123456"))
  }

  test("serveAliasRows matches the plan-path aliases self-join") {
    val (_, store) = freshStore()
    def planAliases(rrname: String, perEntryLimit: Int)
        : Map[(String, String, String), Seq[Seq[Any]]] =
      store.aliases(store.entries(rrname = Some(rrname)),
          perEntryLimit = perEntryLimit).collect().toSeq
        .groupBy(r => (r.getAs[String]("e_rrname"),
          r.getAs[String]("e_sensor_id"), r.getAs[String]("e_rdata")))
        .map { case (k, v) => k -> sortedSet(v.map(r => Row(
          r.getAs[String]("rrname"), r.getAs[String]("sensor_id"),
          r.getAs[String]("rrtype"), r.getAs[String]("rdata"),
          r.getAs[Long]("count"), r.getAs[Timestamp]("first_seen"),
          r.getAs[Timestamp]("last_seen")))) }
    def fastAliases(rrname: String, perEntryLimit: Int)
        : Map[(String, String, String), Seq[Seq[Any]]] = {
      val rows = store.servePointRows(rrname = Some(rrname)).get
      store.serveAliasRows(rows, perEntryLimit).get
        .collect { case (k, v) if v.nonEmpty => k -> sortedSet(v) }
    }
    // foo/1.2.3.4 aliases to baz (same rdata+sensor abc); the AAAA entry
    // and the xyz-sensor entry resolve their own (possibly empty) groups
    assert(fastAliases("foo", 1000) == planAliases("foo", 1000))
    assert(fastAliases("baz", 1000) == planAliases("baz", 1000))
    assert(fastAliases("foo", 1000).nonEmpty)
    // per-entry cap applies after the (rrname, rrtype) sort in both
    assert(fastAliases("foo", 1) == planAliases("foo", 1))
    // cap 0 = no aliases survive anywhere
    assert(fastAliases("foo", 0).isEmpty)
    // non-aliasable parents (rrtype not in A/AAAA) produce no groups
    val aaaaOnly = store.servePointRows(rrname = Some("foo"),
      rrtype = Some("AAAA")).get
    assert(store.serveAliasRows(aaaaOnly, 1000, aliasableTypes = Seq("A"))
      .get.isEmpty)
  }

  test("servePoint honors limit") {
    val (_, store) = freshStore()
    val limited = store.servePoint(rrname = Some("foo"), limit = 2).get
    assert(limited.size == 2)
    val one = store.servePoint(rdata = Some("1.2.3.4"), limit = 1).get
    assert(one.size == 1)
  }

  test("in-memory store has no fast path (falls back to None)") {
    val agg = ObservationStore.aggregate(
      Seq(("a", "s", "A", "1.1.1.1", 1L, ts("2020-01-01 00:00:00")))
        .toDF("rrname", "sensor_id", "rrtype", "rdata", "count", "ts"))
    assert(ObservationStore.inMemory(agg)
      .servePoint(rrname = Some("a")).isEmpty)
  }

  test("fast path sees a committed merge after the epoch check interval") {
    val (dir, store) = freshStore()
    // prime the reader's file map
    assert(store.servePoint(rrname = Some("foo")).get.size == 3)
    val batch = Seq(
      ("foo", "abc", "A", "1.2.3.4", 5L,
        ts("2019-01-01 00:00:00"), ts("2019-01-01 00:00:00")),
      ("new", "abc", "A", "7.7.7.7", 1L,
        ts("2019-02-01 00:00:00"), ts("2019-02-01 00:00:00"))
    ).toDF("rrname", "sensor_id", "rrtype", "rdata", "count",
      "timestamp_start", "timestamp_end")
    ObservationStore.mergeBatch(spark, dir, batch, numBuckets = 8)
    // wait out the epoch-check TTL so the cached map revalidates
    Thread.sleep(graft.operators.PointReader.EpochCheckMillis + 100)
    val foo = store.servePoint(rrname = Some("foo"), rrtype = Some("A"),
      sensorId = Some("abc")).get
    assert(foo.head.count == 15L, foo)
    assert(store.servePoint(rrname = Some("new")).get.size == 1)
    // and still agrees with the (re-loaded) plan path
    val re = ObservationStore.load(spark, dir)
    assert(sortedSet(store.servePointRows(rrname = Some("new")).get) ==
      sortedSet(re.entries(rrname = Some("new")).collect().toSeq))
  }

  test("servePointFanOut: bag union of per-store fast lookups, Q5 contract") {
    val (_, a) = freshStore()
    val (_, b) = freshStore() // same content → duplicates must be KEPT
    val fast = a.servePointFanOut(Seq(a, b), rrname = Some("foo"),
      rdata = None).get
    val plan = a.fanOut(Seq(a, b), rrname = Some("foo"), rdata = None)
      .collect().toSeq
    assert(fast.size == 6) // 3 matching rows × 2 stores, duplicates kept
    // same multiset as the plan-path fan-out
    assert(fast.map(o => (o.rrname, o.sensor_id, o.rrtype, o.rdata,
        o.count)).sorted ==
      plan.map(r => (r.getAs[String]("rrname"), r.getAs[String]("sensor_id"),
        r.getAs[String]("rrtype"), r.getAs[String]("rdata"),
        r.getAs[Long]("count"))).sorted)
    // any in-memory member disables the fast path
    val mem = graft.operators.ObservationStore.inMemory(
      a.forward.drop("bucket", "rdata_ip", "rdata_ip6"))
    assert(a.servePointFanOut(Seq(a, mem), Some("foo"), None).isEmpty)
  }

  test("sorted-dictionary probes: unsigned order, prefix range, fallback") {
    import graft.operators.PointReader
    def b(s: String) = s.getBytes("UTF-8")
    // unsigned byte order: bytes >= 0x80 sort AFTER ASCII — exactly how
    // the writer sorted the keys (UTF8String binary comparison)
    val entries = Array(b("abc"), b("abd"), b("b"), b("part-1"),
      b("part-10"), b("part-2"), Array(0x80.toByte, 0x01.toByte))
    assert(PointReader.isAscending(entries))
    assert(PointReader.containsSorted(entries, b("part-10")))
    assert(!PointReader.containsSorted(entries, b("part-11")))
    assert(!PointReader.containsSorted(entries, b(""))) // below all
    assert(!PointReader.containsSorted(entries, Array(0xff.toByte))) // above
    // prefix probes: lower-bound entry either starts with the prefix or
    // nothing does
    assert(PointReader.anyPrefixSorted(entries, b("part-1"))) // exact+ext
    assert(PointReader.anyPrefixSorted(entries, b("ab")))
    assert(!PointReader.anyPrefixSorted(entries, b("part-3")))
    assert(!PointReader.anyPrefixSorted(entries, b("c")))
    assert(PointReader.anyPrefixSorted(entries, Array(0x80.toByte)))
    assert(PointReader.anyPrefixSorted(entries, Array[Byte]())) // all match
    // an unsorted (foreign) dictionary is detected and the callers fall
    // back to the linear probe
    assert(!PointReader.isAscending(Array(b("b"), b("a"))))
  }

  test("servePointRows schema renders by field name (serving contract)") {
    val (_, store) = freshStore()
    val rows = store.servePointRows(rdata = Some("1.2.3.5")).get
    assert(rows.head.getAs[String]("rrname") == "bar")
    assert(rows.head.getAs[Long]("count") == 10L)
    assert(rows.head.getAs[Timestamp]("first_seen") == ts("2018-03-01 00:00:00"))
    // entriesDfFromRows round-trips into a Spark-joinable frame
    val df = store.entriesDfFromRows(rows)
    assert(df.filter(col("rrname") === "bar").count() == 1)
  }
}
