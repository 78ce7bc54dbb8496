package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.sources.Decoders
import util._

/** Decoder round-trip queries (SURVEY.md D1–D6): each query BUILDS wire
  * payloads from `lineitem` (JSON / `||`-text), runs the real decoder on
  * them, and emits the decoded observations; the oracle computes the
  * expected rows directly from `lineitem`. A hash match therefore proves
  * the decoder inverts the format exactly — schema, explode semantics, dot
  * trimming, and timestamp parsing included. NMSG (binary protobuf) decodes
  * a constant fixture against a constant-table oracle. */
object DecoderQueries {

  /** The testdata files are single-row-group parquet, so a narrow per-row
    * pipeline would run at scan parallelism = 1; the explicit repartition
    * spreads the CPU-bound JSON build + decode across all cores (in a real
    * deployment the spool produces many files and this is a no-op
    * concern). */
  private def li(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "lineitem")
      .repartition(s.sparkContext.defaultParallelism)

  // Timestamp renderers matching each format's wire layout.
  private def tsSuri(c: org.apache.spark.sql.Column) =
    date_format(c.cast("timestamp_ltz"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxx")
  private def tsIso(c: org.apache.spark.sql.Column) =
    date_format(c.cast("timestamp_ltz"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
  private def tsGo(c: org.apache.spark.sql.Column) =
    concat(date_format(c.cast("timestamp_ltz"),
      "yyyy-MM-dd HH:mm:ss.SSSSSS xx"), lit(" UTC"))
  private def tsPb(c: org.apache.spark.sql.Column) =
    date_format(c.cast("timestamp_ltz"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")

  /** The shared text-payload WARC archive (WITH its CDX index), built
    * once per (session, dir): decode_warc full-scans it, warc_fetch
    * random-accesses it — same fixture, two access paths. */
  private def warcTextArchive(s: SparkSession, dir: String): String = {
    val tmp = scratchDir("warc", dir)
    val docs = Graft.table(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
    buildOnce(s, dir, "warc")(graft.sources.Warc.writeWithIndex(docs.select(
      concat(lit("http://"), col("source"), lit(".example/"),
        col("doc_id")).as("url"),
      timestamp_seconds(lit(1577836800L) + col("doc_id")).as("ts"),
      lit("text/plain; charset=utf-8").as("content_type"),
      encode(col("text"), "UTF-8").as("payload")), s"$tmp/warc"))
    s"$tmp/warc"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // D1 — Suricata EVE v2 "grouped": one JSON per order, grouped map
    // rrtype -> [rdata...]; decode explodes map + arrays.
    "decode_suricata" -> ((s, dir) => {
      // two-stage rollup: max(shipdate) per order = max of per-(order,flag)
      // maxima — no separate aggregation + join needed
      val payloads = li(s, dir)
        .groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(collect_set(concat(lit("p"), col("l_partkey"))).as("rdatas"),
          max("l_shipdate").as("mx"))
        .groupBy(col("l_orderkey"))
        .agg(max("mx").as("ots"),
          map_from_entries(collect_list(struct(col("l_returnflag"), col("rdatas"))))
            .as("grouped"))
        .select(
          to_json(struct(
            lit("dns").as("event_type"),
            tsSuri(col("ots")).as("timestamp"),
            struct(lit(2).as("version"), lit("answer").as("type"),
              concat(lit("order-"), col("l_orderkey")).as("rrname"),
              col("grouped").as("grouped")).as("dns"))).as("value"),
          lit("suri").as("sensor_id"))
      Decoders.suricata(payloads)
        .select(col("rrname"), col("rrtype"), col("rdata"), col("sensor_id"),
          col("count"), micros(col("timestamp_start")).as("ts"))
    }),

    // D2 — FEVER aggregate: nested dns{rrname -> {rdata:[entries]}} per
    // part, with pre-aggregated counts and a window [min,max] shipdate.
    "decode_fever" -> ((s, dir) => {
      // fused two-stage rollup: the per-part window bounds are the
      // min-of-mins / max-of-maxes of the per-(part,order,flag) groups
      val payloads = li(s, dir)
        .groupBy(col("l_partkey"), col("l_orderkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          min("l_shipdate").as("mn"), max("l_shipdate").as("mx"))
        .groupBy(col("l_partkey"))
        .agg(collect_list(struct(
          concat(lit("o"), col("l_orderkey")).as("rdata"),
          col("cnt").as("count"),
          col("l_returnflag").as("rrtype"),
          lit("answer").as("type"))).as("rdatas"),
          min("mn").as("w_start"), max("mx").as("w_end"))
        .select(
          to_json(struct(
            map(concat(lit("part-"), col("l_partkey")),
              struct(col("rdatas").as("rdata"))).as("dns"),
            tsIso(col("w_start")).as("timestamp_start"),
            tsIso(col("w_end")).as("timestamp_end"))).as("value"),
          lit("fever").as("sensor_id"))
      Decoders.fever(payloads)
        .select(col("rrname"), col("rdata"), col("rrtype"), col("count"),
          col("sensor_id"), micros(col("timestamp_start")).as("ts_start"),
          micros(col("timestamp_end")).as("ts_end"))
    }),

    // D3 — gopassivedns: one JSON record per lineitem row.
    "decode_gopassivedns" -> ((s, dir) => {
      val payloads = li(s, dir).select(
        to_json(struct(
          concat(lit("part-"), col("l_partkey")).as("q"),
          col("l_returnflag").as("qtype"),
          concat(lit("o"), col("l_orderkey")).as("a"),
          col("l_returnflag").as("atype"),
          tsGo(col("l_shipdate")).as("tstamp"))).as("value"),
        lit("gopdns").as("sensor_id"))
      Decoders.gopassivedns(payloads)
        .select(col("rrname"), col("rdata"), col("rrtype"), col("count"),
          col("sensor_id"), micros(col("timestamp_start")).as("ts"))
    }),

    // D4 — Packetbeat: answers[] per order, names/data carry trailing dots
    // that the decoder must trim.
    "decode_packetbeat" -> ((s, dir) => {
      val payloads = li(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max("l_shipdate").as("ots"),
          collect_list(struct(
            concat(lit("part-"), col("l_partkey"), lit(".")).as("name"),
            lit("IN").as("class"),
            col("l_returnflag").as("type"),
            concat(lit("o"), col("l_orderkey"), lit(".")).as("data"),
            lit("60").as("ttl"))).as("answers"))
        .select(
          to_json(struct(
            lit("dns").as("type"),
            tsPb(col("ots")).as("@timestamp"),
            struct(col("answers").as("answers")).as("dns"))).as("value"),
          lit("pb").as("sensor_id"))
      Decoders.packetbeat(payloads)
        .select(col("rrname"), col("rdata"), col("rrtype"), col("count"),
          col("sensor_id"), micros(col("timestamp_start")).as("ts"))
    }),

    // D5 — gamelinux ||-text: one line per lineitem row; the ".408856"
    // fraction exercises the reference's nanosecond quirk (→ +408 µs).
    "decode_gamelinux" -> ((s, dir) => {
      val epochS = unix_seconds(date_trunc("second", col("l_shipdate")).cast("timestamp_ltz"))
      val payloads = li(s, dir).select(
        concat_ws("||",
          concat(epochS, lit(".408856")),
          lit("10.1.1.1"), lit("8.8.8.8"), lit("IN"),
          concat(lit("part-"), col("l_partkey"), lit(".")),
          col("l_returnflag"),
          concat(lit("o"), col("l_orderkey"), lit(".")),
          lit("60"),
          col("l_linenumber").cast("string")).as("value"),
        lit("gl").as("sensor_id"))
      Decoders.gamelinux(payloads)
        .select(col("rrname"), col("rdata"), col("rrtype"), col("count"),
          col("sensor_id"), micros(col("timestamp_start")).as("ts"))
    }),

    // D6 — NMSG protobuf: constant fixtures decoded against a constant
    // oracle (DuckDB cannot parse protobuf; the expected rows are literals).
    "decode_nmsg" -> ((s, dir) => {
      import s.implicits._
      def varint(v: Long): Seq[Byte] = {
        var x = v; val out = Seq.newBuilder[Byte]
        while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
        out += x.toByte; out.result()
      }
      def blob(field: Int, b: Seq[Byte]): Seq[Byte] =
        varint((field.toLong << 3) | 2) ++ varint(b.length.toLong) ++ b
      def vint(field: Int, v: Long): Seq[Byte] = varint(field.toLong << 3) ++ varint(v)
      def wire(labels: String*): Seq[Byte] =
        labels.flatMap(l => Seq(l.length.toByte) ++ l.getBytes.toSeq) :+ 0.toByte
      val records: Seq[Array[Byte]] = Seq(
        // A record: rdata 4 bytes -> dotted quad
        (vint(2, 1540000000L) ++ blob(3, wire("google", "com")) ++
          vint(4, 1) ++ blob(7, Seq[Byte](1, 2, 3, 4))).toArray,
        // CNAME: rdata in wire format -> domain decode
        (vint(2, 1600000000L) ++ blob(3, wire("www", "example", "org")) ++
          vint(4, 5) ++ blob(7, wire("cdn", "example", "net"))).toArray,
        // unknown rrtype -> decimal string, raw rdata
        (vint(2, 1700000000L) ++ blob(3, wire("foo", "bar")) ++
          vint(4, 999) ++ blob(7, "hello".getBytes.toSeq)).toArray
      )
      val df = records.map((_, "nmsg")).toDF("value", "sensor_id")
      Decoders.nmsg(df).select(col("rrname"), col("rrtype"), col("rdata"),
        col("sensor_id"), col("count"), micros(col("timestamp_start")).as("ts"))
    }),

    // Public CDX interchange lines (the 11-field "CDX N b a m s k r M
    // S V g" format every WARC collection ships) rendered from
    // documents — absent markers, numeric casts, the 14-digit
    // timestamp, and a planted malformed line per 97 docs that must
    // DROP; the oracle re-parses the same constructed lines honestly.
    "decode_cdx" -> ((s, dir) => {
      val d = Graft.table(s, dir, "documents")
      val line = when(col("doc_id") % 97 === 0, lit("garbage line"))
        .otherwise(concat_ws(" ",
          concat(lit("example,"), col("source"), lit(")/p"),
            col("doc_id")),
          concat(lit("202401"),
            lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            lpad((col("doc_id") % 24).cast("string"), 2, "0"),
            lit("0000")),
          concat(lit("https://"), col("source"), lit(".example/p"),
            col("doc_id")),
          when(col("doc_id") % 3 === 0, lit("text/html"))
            .when(col("doc_id") % 3 === 1, lit("application/pdf"))
            .otherwise(lit("-")),
          when(col("doc_id") % 4 === 0, lit("200"))
            .when(col("doc_id") % 4 === 1, lit("301"))
            .when(col("doc_id") % 4 === 2, lit("404"))
            .otherwise(lit("-")),
          md5(col("text")), lit("-"), lit("-"),
          col("n_chars").cast("string"),
          (col("doc_id") * 1000L).cast("string"),
          concat(lit("crawl-"), col("source"), lit(".warc.gz"))))
      graft.sources.Cdx.parse(d.select(line.as("line")), "line")
    }),

    // WARC (ISO 28500) round-trip: documents rendered as Common-Crawl-
    // style response records (one gzip member per record), streamed back
    // through the record reader. The oracle reconstructs every decoded
    // field directly from `documents` — a hash match proves header
    // parsing, the member-per-record gzip framing, payload byte
    // fidelity (UTF-8 text survives), and WARC-Date round-tripping.
    "decode_warc" -> ((s, dir) => {
      graft.sources.Warc.read(s, warcTextArchive(s, dir)).select(
        col("warc_type"), col("url"), micros(col("ts")).as("ts"),
        col("content_type"), col("content_length"),
        col("payload").cast("string").as("text"))
    }),

    // CDX random access: the archive is written WITH its record index,
    // a subset of records (doc_id % 7 = 0) is resolved through the
    // index and fetched by ranged reads ALONE — one gunzip per record,
    // no archive scan (the WARC analogue of the store's PointReader
    // serving path). Oracle reconstructs the subset from `documents`.
    "warc_fetch" -> ((s, dir) => {
      val archive = warcTextArchive(s, dir)
      val wanted = s.read.parquet(s"$archive/_cdx")
        .filter(regexp_extract(col("url"), "/([0-9]+)$", 1)
          .cast("long") % 7 === 0)
        .select("url", "file", "offset", "length").collect()
      val rows = wanted.map { r =>
        val rec = graft.sources.Warc.fetchRecord(archive,
          r.getString(1), r.getLong(2), r.getLong(3))
        (rec.url, new String(rec.payload,
          java.nio.charset.StandardCharsets.UTF_8))
      }
      import s.implicits._
      rows.toSeq.toDF("url", "text")
    }),

    // The Common-Crawl chain END TO END: documents rendered as HTML
    // pages (boilerplate + escaped body), written as member-per-record
    // WARC, read back through the record reader, boilerplate-stripped
    // (TextAnalysis.htmlExtract), tokenized. The oracle reconstructs
    // every output column directly from `documents` — one hash match
    // covers WARC framing, HTML extraction and token accounting
    // composed, the way a real ingest would run them.
    "warc_pipeline" -> ((s, dir) => {
      import graft.operators.TextAnalysis
      val tmp = scratchDir("warcpipe", dir)
      val docs = Graft.table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val page = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><script>var x = \"<b>no</b>\";</script></head>" +
          "<body><nav>Home | About</nav><p>"),
        TextAnalysis.htmlEscape(col("text")),
        lit("</p><!-- c --><footer>&amp; fin</footer></body></html>"))
      buildOnce(s, dir, "warcpipe")(graft.sources.Warc.write(docs.select(
        concat(lit("http://"), col("source"), lit(".example/"),
          col("doc_id")).as("url"),
        timestamp_seconds(lit(1577836800L) + col("doc_id")).as("ts"),
        lit("text/html; charset=utf-8").as("content_type"),
        encode(page, "UTF-8").as("payload")), s"$tmp/warc"))
      val text = graft.operators.TextAnalysis.htmlExtract(
        col("payload").cast("string"))
      graft.sources.Warc.read(s, s"$tmp/warc").select(
        col("url"),
        TextAnalysis.htmlTitle(col("payload").cast("string")).as("title"),
        text.as("text"),
        TextAnalysis.tokenCount(text).cast("long").as("n_tokens"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "decode_suricata" ->
      """WITH t AS (SELECT l_orderkey, MAX(l_shipdate) AS ots
        |           FROM lineitem GROUP BY 1),
        |d AS (SELECT DISTINCT l_orderkey, l_returnflag,
        |             'p' || CAST(l_partkey AS VARCHAR) AS rdata
        |      FROM lineitem)
        |SELECT 'order-' || CAST(d.l_orderkey AS VARCHAR) AS rrname,
        |       d.l_returnflag AS rrtype, d.rdata,
        |       'suri' AS sensor_id, CAST(1 AS BIGINT) AS "count",
        |       epoch_us(t.ots) AS ts
        |FROM d JOIN t USING (l_orderkey)
        |""".stripMargin,

    "decode_fever" ->
      """WITH e AS (SELECT l_partkey, l_orderkey, l_returnflag,
        |                  CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM lineitem GROUP BY 1, 2, 3),
        |w AS (SELECT l_partkey, epoch_us(MIN(l_shipdate)) AS ts_start,
        |             epoch_us(MAX(l_shipdate)) AS ts_end
        |      FROM lineitem GROUP BY 1)
        |SELECT 'part-' || CAST(e.l_partkey AS VARCHAR) AS rrname,
        |       'o' || CAST(e.l_orderkey AS VARCHAR) AS rdata,
        |       e.l_returnflag AS rrtype, e.cnt AS "count",
        |       'fever' AS sensor_id, w.ts_start, w.ts_end
        |FROM e JOIN w USING (l_partkey)
        |""".stripMargin,

    "decode_gopassivedns" ->
      """SELECT 'part-' || CAST(l_partkey AS VARCHAR) AS rrname,
        |       'o' || CAST(l_orderkey AS VARCHAR) AS rdata,
        |       l_returnflag AS rrtype, CAST(1 AS BIGINT) AS "count",
        |       'gopdns' AS sensor_id, epoch_us(l_shipdate) AS ts
        |FROM lineitem
        |""".stripMargin,

    "decode_packetbeat" ->
      """WITH t AS (SELECT l_orderkey, MAX(l_shipdate) AS ots
        |           FROM lineitem GROUP BY 1)
        |SELECT 'part-' || CAST(l.l_partkey AS VARCHAR) AS rrname,
        |       'o' || CAST(l.l_orderkey AS VARCHAR) AS rdata,
        |       l.l_returnflag AS rrtype, CAST(1 AS BIGINT) AS "count",
        |       'pb' AS sensor_id, epoch_us(t.ots) AS ts
        |FROM lineitem l JOIN t USING (l_orderkey)
        |""".stripMargin,

    "decode_gamelinux" ->
      """SELECT 'part-' || CAST(l_partkey AS VARCHAR) AS rrname,
        |       'o' || CAST(l_orderkey AS VARCHAR) AS rdata,
        |       l_returnflag AS rrtype,
        |       CAST(l_linenumber AS BIGINT) AS "count",
        |       'gl' AS sensor_id,
        |       epoch_us(date_trunc('second', l_shipdate)) + 408 AS ts
        |FROM lineitem
        |""".stripMargin,

    "decode_nmsg" ->
      """SELECT * FROM (VALUES
        |  ('google.com', 'A', '1.2.3.4', 'nmsg', CAST(1 AS BIGINT),
        |   CAST(1540000000 AS BIGINT) * 1000000),
        |  ('www.example.org', 'CNAME', 'cdn.example.net', 'nmsg',
        |   CAST(1 AS BIGINT), CAST(1600000000 AS BIGINT) * 1000000),
        |  ('foo.bar', '999', 'hello', 'nmsg', CAST(1 AS BIGINT),
        |   CAST(1700000000 AS BIGINT) * 1000000)
        |) AS t(rrname, rrtype, rdata, sensor_id, "count", ts)
        |""".stripMargin,

    "warc_fetch" ->
      """SELECT 'http://' || source || '.example/' || CAST(doc_id AS VARCHAR)
        |         AS url,
        |       text
        |FROM documents WHERE doc_id % 7 = 0
        |""".stripMargin,

    "warc_pipeline" ->
      """WITH x AS (
        |  SELECT doc_id, source,
        |         'Doc ' || doc_id || ' Home | About ' ||
        |           trim(regexp_replace(text, '\s+', ' ', 'g')) ||
        |           ' & fin' AS body
        |  FROM documents)
        |SELECT 'http://' || source || '.example/' || CAST(doc_id AS VARCHAR)
        |         AS url,
        |       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
        |       body AS text,
        |       CAST(len(string_split(body, ' ')) AS BIGINT) AS n_tokens
        |FROM x
        |""".stripMargin,

    "decode_cdx" ->
      """WITH lines AS (
        |  SELECT CASE WHEN doc_id % 97 = 0 THEN 'garbage line'
        |    ELSE
        |      'example,' || source || ')/p' || CAST(doc_id AS VARCHAR)
        |      || ' ' || '202401' ||
        |        lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        |        lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || '0000'
        |      || ' ' || 'https://' || source || '.example/p'
        |        || CAST(doc_id AS VARCHAR)
        |      || ' ' || CASE WHEN doc_id % 3 = 0 THEN 'text/html'
        |                     WHEN doc_id % 3 = 1 THEN 'application/pdf'
        |                     ELSE '-' END
        |      || ' ' || CASE WHEN doc_id % 4 = 0 THEN '200'
        |                     WHEN doc_id % 4 = 1 THEN '301'
        |                     WHEN doc_id % 4 = 2 THEN '404'
        |                     ELSE '-' END
        |      || ' ' || md5(text) || ' - - '
        |      || CAST(n_chars AS VARCHAR)
        |      || ' ' || CAST(doc_id * 1000 AS VARCHAR)
        |      || ' ' || 'crawl-' || source || '.warc.gz'
        |    END AS line
        |  FROM documents),
        |f AS (SELECT string_split(trim(line), ' ') AS l FROM lines),
        |ok AS (SELECT l FROM f WHERE len(l) = 11)
        |SELECT l[1] AS urlkey, l[2] AS ts_raw,
        |       epoch_us(strptime(l[2], '%Y%m%d%H%M%S')) AS ts_us,
        |       CASE WHEN l[3] = '-' THEN NULL ELSE l[3] END AS url,
        |       CASE WHEN l[4] = '-' THEN NULL ELSE l[4] END AS mime,
        |       CAST(CASE WHEN l[5] = '-' THEN NULL ELSE l[5] END
        |         AS BIGINT) AS status,
        |       CASE WHEN l[6] = '-' THEN NULL ELSE l[6] END AS digest,
        |       CASE WHEN l[7] = '-' THEN NULL ELSE l[7] END AS redirect,
        |       CASE WHEN l[8] = '-' THEN NULL ELSE l[8] END AS meta,
        |       CAST(CASE WHEN l[9] = '-' THEN NULL ELSE l[9] END
        |         AS BIGINT) AS length,
        |       CAST(CASE WHEN l[10] = '-' THEN NULL ELSE l[10] END
        |         AS BIGINT) AS offset,
        |       CASE WHEN l[11] = '-' THEN NULL ELSE l[11] END AS filename
        |FROM ok
        |""".stripMargin,

    "decode_warc" ->
      """SELECT 'response' AS warc_type,
        |       'http://' || source || '.example/' || CAST(doc_id AS VARCHAR)
        |         AS url,
        |       (1577836800 + doc_id) * 1000000 AS ts,
        |       'text/plain; charset=utf-8' AS content_type,
        |       CAST(strlen(text) AS BIGINT) AS content_length,
        |       text
        |FROM documents
        |""".stripMargin,
  )
}
