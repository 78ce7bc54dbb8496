package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Dns, NmsgCodec}

/** Source decoders D1–D6 (SURVEY.md §2.1) as pure `DataFrame => DataFrame`
  * transforms.
  *
  * Input convention: a DataFrame with `value` (one event payload per row —
  * String for the JSON/text formats, Array[Byte] for NMSG) and `sensor_id`
  * (attached by the feeder: HTTP `X-Sensor-ID` header, AMQP `sensor_id`
  * header, or `[unknown]` for sockets — `feeder/feeder_socket.go:57`).
  * Output: the InputObservation schema of [[graft.model.Model.inputSchema]].
  *
  * Scale stance: every decoder is a narrow map/flatMap over the input scan
  * (whole-stage-codegen'd, no shuffle; only NMSG uses a UDF, because its
  * payload is binary protobuf + DNS wire format).
  *
  * Performance-critical shape: decoders are FILTER-FREE. Invalid records
  * are dropped by exploding a validity-guarded array
  * (`explode(when(valid, array(row)).otherwise(empty))`) instead of a
  * `.filter`, because a filter's predicate gets pushdown-substituted with
  * the full `from_json`/`try_to_timestamp` expressions and `AND`
  * short-circuiting defeats common-subexpression elimination — measured
  * ~5× slower on the ingest path. With the generator shape each expensive
  * expression is evaluated exactly once per row.
  */
object Decoders {

  private val empty_tags = array().cast(ArrayType(StringType))

  private def obsStruct(
      count: Column, rcode: Column, rdata: Column, rrtype: Column,
      rrname: Column, ts: Column): Column = struct(
    count.cast("long").as("count"),
    rcode.cast("string").as("rcode"),
    rdata.cast("string").as("rdata"),
    rrtype.cast("string").as("rrtype"),
    rrname.cast("string").as("rrname"),
    col("sensor_id").cast("string").as("sensor_id"),
    ts.as("timestamp_start"),
    ts.as("timestamp_end"),
    empty_tags.as("tags")
  )

  /** Emit one observation per row when `valid`, none otherwise — the
    * flatMap shape (no Filter operator, see class doc). */
  private def emitWhen(df: DataFrame, valid: Column, obs: Column): DataFrame = {
    val empty = array().cast(ArrayType(graft.model.Model.inputSchema))
    df.select(explode(when(valid, array(obs)).otherwise(empty)).as("o"))
      .select("o.*")
  }

  // ---------------------------------------------------------------- D1

  val suricataSchema: DataType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("timestamp", StringType),
    StructField("dns", StructType(Seq(
      StructField("type", StringType),
      StructField("version", IntegerType),
      StructField("rrtype", StringType),
      StructField("rcode", StringType),
      StructField("rrname", StringType),
      StructField("ttl", IntegerType),
      StructField("rdata", StringType),
      StructField("answers", ArrayType(StructType(Seq(
        StructField("rrname", StringType),
        StructField("rrtype", StringType),
        StructField("ttl", IntegerType),
        StructField("rdata", StringType))))),
      StructField("grouped", MapType(StringType, ArrayType(StringType)))
    )))
  ))

  /** D1 — Suricata EVE DNS (`format/format_suricata.go:38-114`): v1 single
    * answer; v2 `answers[]` (row per answer) or `grouped` map (row per
    * (rrtype, rdata)). Only `event_type=dns` + `dns.type=answer` events
    * with a parseable timestamp survive.
    *
    * ONE pass, not a three-branch union: the v1 / v2-detailed / v2-grouped
    * cases build one observation ARRAY per input row (a `when` chain of
    * `transform`/`flatten` over the parsed struct) and explode it once.
    * A union of three selects over the same parsed frame re-executes the
    * whole upstream — including `from_json`, the hottest expression here —
    * once per branch (exchange reuse stops at the shuffle; everything
    * above it triples). Measured 3× on the decode gate. */
  def suricata(df: DataFrame): DataFrame = {
    val parsed = df
      .withColumn("j", from_json(col("value"), suricataSchema))
      .withColumn("ts",
        try_to_timestamp(col("j.timestamp"),
          lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]xx")))
    // coalesce: a missing event_type/dns.type makes the conjunction SQL
    // NULL, and `when(!NULL, …)` matches nothing — the row would fall
    // through to the emit branches instead of being dropped like the
    // reference drops it (format_suricata.go:46-51)
    val valid = coalesce(
      col("j").isNotNull && col("j.event_type") === "dns" &&
        col("j.dns.type") === "answer" && col("ts").isNotNull,
      lit(false))
    val empty = array().cast(ArrayType(graft.model.Model.inputSchema))

    val v1Obs = array(obsStruct(lit(1), col("j.dns.rcode"),
      col("j.dns.rdata"), col("j.dns.rrtype"), col("j.dns.rrname"),
      col("ts")))
    val answersObs = transform(col("j.dns.answers"), a =>
      obsStruct(lit(1), col("j.dns.rcode"), a.getField("rdata"),
        a.getField("rrtype"), a.getField("rrname"), col("ts")))
    // drop null-valued map entries BEFORE the nested transform: one null
    // rdata-list would null the outer array under flatten and silently
    // swallow the row's other rrtypes (the union shape dropped only the
    // null entry)
    val groupedObs = flatten(transform(
      filter(map_entries(col("j.dns.grouped")),
        e => e.getField("value").isNotNull),
      e => transform(e.getField("value"), d =>
        obsStruct(lit(1), col("j.dns.rcode"), d, e.getField("key"),
          col("j.dns.rrname"), col("ts")))))

    val obsArr =
      when(!valid, empty)
        .when(coalesce(col("j.dns.version"), lit(1)) =!= 2, v1Obs)
        // v2: detailed answers win; the grouped map only speaks for rows
        // with no (or an empty) answers array — same precedence as the
        // reference decoder
        .when(col("j.dns.answers").isNotNull &&
          size(col("j.dns.answers")) > 0, answersObs)
        .otherwise(coalesce(groupedObs, empty))
    parsed.select(explode(obsArr).as("o")).select("o.*")
  }

  // ---------------------------------------------------------------- D2

  val feverSchema: DataType = StructType(Seq(
    StructField("dns", MapType(StringType, StructType(Seq(
      StructField("rdata", ArrayType(StructType(Seq(
        StructField("answering_host", StringType),
        StructField("count", LongType),
        StructField("rcode", StringType),
        StructField("rdata", StringType),
        StructField("rrtype", StringType),
        StructField("type", StringType))))))))),
    StructField("timestamp_start", StringType),
    StructField("timestamp_end", StringType)
  ))

  /** D2 — FEVER aggregate (`format/format_fever.go:34-71`): nested
    * `dns{rrname → {rdata: [...]}}`, one row per (rrname, rdata entry),
    * carrying the source-side pre-aggregated count and window timestamps.
    * Malformed JSON yields a null map; exploding null emits nothing. */
  def fever(df: DataFrame): DataFrame = {
    val base = df.withColumn("j", from_json(col("value"), feverSchema))
      .withColumn("ts_start", try_to_timestamp(col("j.timestamp_start"),
        lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")))
      .withColumn("ts_end", try_to_timestamp(col("j.timestamp_end"),
        lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")))
      .select(col("sensor_id"), col("ts_start"), col("ts_end"),
        explode(col("j.dns")).as(Seq("f_rrname", "f_entry")))
      .select(col("sensor_id"), col("ts_start"), col("ts_end"),
        col("f_rrname"), explode(col("f_entry.rdata")).as("r"))
    // records with an unparseable window are dropped like every other
    // decoder's malformed lines — a null timestamp here would flow into
    // the store and 500 any query rendering time_first. The guard reads
    // already-materialized columns, so it does NOT re-substitute the
    // from_json/try_to_timestamp subtrees (the emitWhen rationale).
    val obs = struct(
      col("r.count").cast("long").as("count"),
      col("r.rcode").cast("string").as("rcode"),
      col("r.rdata").cast("string").as("rdata"),
      col("r.rrtype").cast("string").as("rrtype"),
      col("f_rrname").cast("string").as("rrname"),
      col("sensor_id").cast("string").as("sensor_id"),
      col("ts_start").as("timestamp_start"),
      col("ts_end").as("timestamp_end"),
      empty_tags.as("tags"))
    emitWhen(base, col("ts_start").isNotNull && col("ts_end").isNotNull, obs)
  }

  // ---------------------------------------------------------------- D3

  val gopassivednsSchema: DataType = StructType(Seq(
    StructField("rcode", IntegerType),
    StructField("q", StringType),
    StructField("qtype", StringType),
    StructField("a", StringType),
    StructField("atype", StringType),
    StructField("ttl", LongType),
    StructField("tstamp", StringType)
  ))

  /** D3 — gopassivedns (`format/format_gopassivedns.go:40-66`): single
    * record per line; `q`→rrname, `a`→rdata, `atype`→rrtype, count=1.
    * Timestamp is Go's default `String()` layout
    * (`2018-10-26 19:32:36.141184 +0000 UTC`) — the trailing zone
    * abbreviation is dropped before parsing the numeric offset. */
  def gopassivedns(df: DataFrame): DataFrame = {
    val withTs = df
      .withColumn("j", from_json(col("value"), gopassivednsSchema))
      .withColumn("ts", try_to_timestamp(
        regexp_replace(col("j.tstamp"), " [A-Z]+$", ""),
        lit("yyyy-MM-dd HH:mm:ss[.SSSSSS] xx")))
    emitWhen(withTs, col("j").isNotNull && col("ts").isNotNull,
      obsStruct(lit(1), col("j.rcode"), col("j.a"), col("j.atype"),
        col("j.q"), col("ts")))
  }

  // ---------------------------------------------------------------- D4

  val packetbeatSchema: DataType = StructType(Seq(
    StructField("type", StringType),
    StructField("@timestamp", StringType),
    StructField("dns", StructType(Seq(
      StructField("answers", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("class", StringType),
        StructField("type", StringType),
        StructField("data", StringType),
        StructField("ttl", StringType))))))))
  ))

  /** D4 — Packetbeat via Logstash (`format/format_packetbeat.go:33-71`):
    * `dns.answers[]`, one row per answer, trailing dots trimmed from both
    * name and data, `type=dns` required. */
  def packetbeat(df: DataFrame): DataFrame =
    df.withColumn("j", from_json(col("value"), packetbeatSchema))
      .withColumn("ts", try_to_timestamp(col("j.`@timestamp`"),
        lit("yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX")))
      .select(col("sensor_id"), col("ts"),
        explode(when(col("j").isNotNull && col("j.type") === "dns" &&
          col("ts").isNotNull, col("j.dns.answers")).otherwise(lit(null)))
          .as("a"))
      .select(obsStruct(lit(1), lit(null), rtrim(col("a.data"), "."),
        col("a.type"), rtrim(col("a.name"), "."), col("ts")).as("o"))
      .select("o.*")

  // ---------------------------------------------------------------- D5

  /** D5 — gamelinux/PassiveDNS tabular (`format/format_gamelinux.go:19-74`):
    * `||`-separated 9 columns
    * `ts||client||server||class||query||type||answer||ttl||count`; one
    * observation per well-formed line, lines with ≠9 columns skipped.
    * Timestamp parity quirk: the reference feeds the post-dot digits to
    * `time.Unix(sec, nsec)` as NANOseconds, so `1322849924.408856` means
    * 408856 ns (≈0.4 ms), not 0.408856 s — reproduced here. */
  def gamelinux(df: DataFrame): DataFrame = {
    val lines = df.select(col("sensor_id"),
      explode(split(col("value"), "\n")).as("line"))
    val withCols = lines
      .withColumn("cols", split(col("line"), "\\|\\|"))
      .withColumn("epoch", split(col("cols")(0), "\\."))
      // the fraction access MUST be guarded: a timestamp with no '.'
      // (which the reference drops with a warning) yields a 1-element
      // array, and an unguarded epoch[1] under ANSI (Spark 4's default)
      // throws INVALID_ARRAY_INDEX and kills the whole ingest job
      // instead of dropping the line
      .withColumn("nsec", when(size(col("epoch")) === 2,
        try_cast_long(element_at(col("epoch"), 2))))
      // the seconds magnitude must be bounded BEFORE the ×1e6: a crafted
      // line with sec ~1e14 passes try_cast but overflows the multiply,
      // which under ANSI (Spark 4's default) kills the job instead of
      // dropping the line. Bound = years 0001..9999, the representable
      // timestamp range.
      .withColumn("sec", try_cast_long(element_at(col("epoch"), 1)))
      .withColumn("ts", when(
        col("sec").between(-62135596800L, 253402300799L),
        timestamp_micros(col("sec") * 1000000L + expr("nsec div 1000"))))
    val valid = size(col("cols")) === 9 && size(col("epoch")) === 2 &&
      col("ts").isNotNull && try_cast_long(col("cols")(8)).isNotNull
    emitWhen(withCols, valid,
      obsStruct(col("cols")(8), lit(null), rtrim(col("cols")(6), "."),
        col("cols")(5), rtrim(col("cols")(4), "."), col("ts")))
  }

  private def try_cast_long(c: Column): Column = c.try_cast("long")

  // ---------------------------------------------------------------- D6

  private val nmsgDecode =
    udf { (bytes: Array[Byte]) =>
      val nd = NmsgCodec.decode(bytes)
      if (nd == null) null
      else (Dns.parseDomainString(nd.rrname),
        Dns.rrtypeName(nd.rrtype),
        Dns.renderRData(nd.rdataFirst, nd.rrtype),
        nd.timeSeen)
    }

  /** D6 — NMSG/SIE NewDomain protobuf (`format/format_nmsg.go:82-110`):
    * binary input; DNS wire-format name decode, numeric rrtype → mnemonic,
    * first rdata element rendered per type, `time_seen` epoch seconds. */
  def nmsg(df: DataFrame): DataFrame = {
    val withD = df.withColumn("d", nmsgDecode(col("value")))
    emitWhen(withD, col("d").isNotNull,
      obsStruct(lit(1), lit(null), col("d._3"), col("d._2"), col("d._1"),
        timestamp_seconds(col("d._4"))))
  }
}
