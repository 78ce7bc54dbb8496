package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.GraftFunctions

/** The SQL face of the custom expressions/aggregates: after
  * `GraftFunctions.register`, `spark.sql` reaches the same native
  * operators as the Scala API — scalar and aggregate, with literal
  * parameters validated. */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  test("scalar functions evaluate from SQL") {
    val r = spark.sql(
      """SELECT ip_to_long('10.0.0.1') AS ip,
        |       ipv6_to_hex('::1') AS v6,
        |       multi_pattern_counts('scan the table',
        |         array('scan', 'can', 'x')) AS mp,
        |       length(simhash64('a b c')) AS sh_len""".stripMargin)
      .collect().head
    assert(r.getAs[Long]("ip") == 10L * 256 * 256 * 256 + 1)
    assert(r.getAs[String]("v6") ==
      "0000000000000000" + "0000000000000001")
    assert(r.getSeq[Long](2) == Seq(1L, 1L, 0L))
    assert(r.getAs[Int]("sh_len") == 64)
  }

  test("fix_mojibake repairs strictly and conservatively") {
    def fix(s: String): String =
      Seq(s).toDF("t")
        .selectExpr("fix_mojibake(t) AS f").as[String].collect().head
    // UTF-8 read as Latin-1: caf <C3><A9> -> caf e-acute
    assert(fix("caf\u00c3\u00a9") == "caf\u00e9")
    // double-encoded (the Latin-1 reading re-encoded and re-misread:
    // <C3><83><C2><A9>) recovers in two rounds
    assert(fix("caf\u00c3\u0083\u00c2\u00a9") == "caf\u00e9")
    // cp1252 reading: <E2><80><99> displays as a-circumflex/euro/TM
    // and repairs to the right single quote
    assert(fix("it\u00e2\u20ac\u2122s") == "it\u2019s")
    // clean ASCII and clean accented text pass through untouched
    assert(fix("plain text") == "plain text")
    assert(fix("d\u00e9j\u00e0 vu ok") == "d\u00e9j\u00e0 vu ok")
    // overlong encoding (C0 AF) must NOT be accepted as UTF-8
    assert(fix("x\u00c0\u00afy") == "x\u00c0\u00afy")
    // truncated multibyte sequence rejects the round
    assert(fix("end\u00c3") == "end\u00c3")
    // chars outside Latin-1+cp1252 block the whole-string round-trip
    assert(fix("\u03bb caf\u00c3\u00a9") == "\u03bb caf\u00c3\u00a9")
  }

  test("typed aggregates run from SQL, parity with the Scala API") {
    Seq(("a", 5L, 1L), ("a", 9L, 2L), ("a", 1L, 3L), ("b", 7L, 4L))
      .toDF("k", "v", "id").createOrReplaceTempView("sqlfn_t")
    val topk = spark.sql(
      """SELECT k, top_k_pairs(v, id, 2) AS t
        |FROM sqlfn_t GROUP BY k""".stripMargin)
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getLong(0), s.getLong(1)))).toMap
    assert(topk == Map("a" -> Seq((9L, 2L), (5L, 1L)),
      "b" -> Seq((7L, 4L))))
    val kmv = spark.sql(
      "SELECT kmv_distinct(CAST(v AS STRING), 64) AS est FROM sqlfn_t")
      .collect().head.getAs[Long]("est")
    assert(kmv == 4L) // unsaturated → exact distinct of {5,9,1,7}
  }

  test("non-literal state parameters are rejected") {
    Seq(("a", 1L)).toDF("k", "v").createOrReplaceTempView("sqlfn_bad")
    val ex = intercept[Exception](
      spark.sql("SELECT kmv_distinct(CAST(v AS STRING), CAST(v AS INT)) " +
        "FROM sqlfn_bad").collect())
    assert(ex.getMessage.contains("literal"))
  }

  test("round-9 composed + codec functions evaluate from SQL") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT html_extract('<p>a &amp; b</p>') AS t,
        |       html_title('<title>T</title><p>x</p>') AS ti,
        |       url_host('https://h.x/p/q') AS h,
        |       url_path('https://h.x/p/q') AS p,
        |       sortable_bits_to_double(double_sortable_bits(-1.25D)) AS d
        |""".stripMargin).head
    assert(r.getString(0) == "a & b")
    assert(r.getString(1) == "T")
    assert(r.getString(2) == "h.x")
    assert(r.getString(3) == "/p/q")
    assert(r.getDouble(4) == -1.25)
    // codec preserves descending-double order as ascending longs
    val ord = spark.sql(
      """SELECT double_sortable_bits(x) AS s FROM VALUES (-2.0D), (-0.5D),
        |(0.0D), (3.5D) AS t(x) ORDER BY x""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(ord == ord.sorted)
  }

  test("lpmJoin picks the longest matching prefix per IP") {
    import graft.functions.Net
    val ips = Seq("10.1.2.3", "10.1.9.9", "192.168.0.1", "8.8.8.8",
      "10.1.2.3").toDF("ip")
    val routes = Seq(
      ("0.0.0.0/0", "any"),
      ("10.0.0.0/8", "ten"),
      ("10.1.0.0/16", "ten-one"),
      ("10.1.2.0/24", "ten-one-two"),
      ("10.1.2.3/32", "host"),
      ("192.168.0.0/16", "rfc1918")).toDF("cidr", "label")
    val out = Net.lpmJoin(ips, "ip", routes, "cidr", "label")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
    assert(out("10.1.2.3") == (("10.1.2.3/32", 32L, "host")))
    assert(out("10.1.9.9") == (("10.1.0.0/16", 16L, "ten-one")))
    assert(out("192.168.0.1") == (("192.168.0.0/16", 16L, "rfc1918")))
    assert(out("8.8.8.8") == (("0.0.0.0/0", 0L, "any")))
    // duplicate input rows collapse: one answer per distinct IP
    assert(out.size == 4)
    intercept[IllegalArgumentException](
      Net.lpmJoin(ips, "ip", routes.limit(0), "cidr", "label"))
  }

  test("anonymizeIpv4: prefix preservation, valid octets, malformed") {
    import graft.functions.Net
    import org.apache.spark.sql.functions.col
    val df = Seq("10.1.2.3", "10.1.2.4", "10.1.9.3", "10.200.2.3",
        "999.1.2.3", "junk")
      .toDF("ip")
      .select(col("ip"), Net.anonymizeIpv4(col("ip"), "s3cr3t").as("a"))
    val m = df.collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // malformed addresses → NULL, never a half-anonymized string
    assert(m("999.1.2.3").isEmpty && m("junk").isEmpty)
    val Seq(a1, a2, a3, a4) =
      Seq("10.1.2.3", "10.1.2.4", "10.1.9.3", "10.200.2.3")
        .map(ip => m(ip).get.split("\\.").toSeq)
    // every anonymized octet is a valid octet (mask is one byte)
    Seq(a1, a2, a3, a4).flatten.foreach(o =>
      assert(o.toInt >= 0 && o.toInt <= 255, o))
    // shared raw k-octet prefix ⇒ shared anonymized k-octet prefix,
    // and the first diverging octet diverges (same mask, different raw)
    assert(a1.take(3) == a2.take(3) && a1(3) != a2(3))
    assert(a1.take(2) == a3.take(2) && a1(2) != a3(2))
    assert(a1.take(1) == a4.take(1) && a1(1) != a4(1))
    // the rewrite actually moved the address for this secret
    assert(a1.mkString(".") != "10.1.2.3")
    // a different secret gives a different placement
    val other = Seq("10.1.2.3").toDF("ip")
      .select(Net.anonymizeIpv4(col("ip"), "other").as("a"))
      .collect().head.getString(0)
    assert(other != a1.mkString("."))
  }
}
