package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Selectors
import graft.operators.Selectors.RegexSelector
import util._

/** Selector-engine queries (SURVEY.md T1–T5): the reference's example stack
  * shape — a filter-mode selector (tags on NON-match) chained into a
  * select-mode selector triggered by the first tag — applied to the
  * aggregated observation table, plus tag-based sink routing counts. */
object SelectorQueries {

  private val stack = Seq(
    // filter mode: tag everything NOT ending in 0 or 5
    RegexSelector(patterns = Seq("^part-.*[05]$"), tags = Seq("filtered"),
      filterMode = true),
    // chained: among the filtered, tag the part-1xxx names
    RegexSelector(patterns = Seq("^part-1.*$"), tags = Seq("deep"),
      ingests = Seq("filtered"))
  )

  private def tagged(s: SparkSession, dir: String): DataFrame =
    Selectors.engine(aggMicros(s, dir), stack)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T1/T2/T4 — engine to fixed point; tags rendered as a sorted CSV for
    // a portable comparison (DuckDB has no canonical array hashing).
    "selector_engine" -> ((s, dir) =>
      tagged(s, dir).select(col("rrname"), col("sensor_id"), col("rrtype"),
        col("rdata"), col("count"),
        array_join(array_sort(col("tags")), ",").as("tag_list"))),

    // T5 — tag-routed sinks: per-sink routed row counts (tagged sinks get
    // their tag's rows, the tagless sink gets everything). One pass:
    // conditional sums instead of one scan per sink — the shape that
    // survives a 100× scale-up (route() itself is exercised in the
    // streaming ingest path).
    "tag_routing" -> ((s, dir) => {
      val counts = tagged(s, dir).agg(
        sum(when(array_contains(col("tags"), "filtered"), 1L).otherwise(0L))
          .cast("long").as("n_filtered"),
        sum(when(array_contains(col("tags"), "deep"), 1L).otherwise(0L))
          .cast("long").as("n_deep"),
        count(lit(1)).as("n_all"))
      counts.select(explode(array(
        struct(lit("sink_filtered").as("sink"), col("n_filtered").as("n")),
        struct(lit("sink_deep").as("sink"), col("n_deep").as("n")),
        struct(lit("catchall").as("sink"), col("n_all").as("n")))).as("r"))
        .select(col("r.sink").as("sink"), col("r.n").as("n"))
    }),

    // T3 for real — a Lua script (MiniLua interpreter, the reference's
    // gopher-lua process(o) contract) tags observations per row: a Lua
    // PATTERN over rrname and a plain find over rdata, each adding its
    // own tag. The oracle restates both predicates in SQL; any
    // divergence in the interpreter's pattern/string semantics breaks
    // the sorted tag CSV hash.
    "selector_lua" -> ((s, dir) => {
      val lua = Selectors.LuaScriptSelector(
        "function process(o)\n" +
          "  if o:rrname():match(\"^part%-%d*[05]$\") then\n" +
          "    o:add_tag(\"mod5ish\")\n" +
          "  end\n" +
          "  if string.find(o:rdata(), \"1\", 1, true) then\n" +
          "    o:add_tag(\"has1\")\n" +
          "  end\n" +
          "end")
      Selectors.engine(
        aggMicros(s, dir).withColumn("rcode", lit("NOERROR")), Seq(lua))
        .select(col("rrname"), col("sensor_id"), col("rrtype"),
          col("rdata"), col("count"),
          array_join(array_sort(col("tags")), ",").as("tag_list"))
    }),
  )

  private val tagCase =
    """CASE WHEN NOT regexp_matches(rrname, '^part-.*[05]$')
      |     THEN CASE WHEN regexp_matches(rrname, '^part-1.*$')
      |               THEN 'deep,filtered' ELSE 'filtered' END
      |     ELSE '' END""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "selector_engine" ->
      s"""$obsCte
         |SELECT rrname, sensor_id, rrtype, rdata, "count",
         |       $tagCase AS tag_list
         |FROM agg
         |""".stripMargin,

    "selector_lua" ->
      s"""$obsCte
         |SELECT rrname, sensor_id, rrtype, rdata, "count",
         |  COALESCE(array_to_string(list_sort(
         |    CASE WHEN regexp_matches(rrname, '^part-[0-9]*[05]$$')
         |         THEN ['mod5ish'] ELSE [] END ||
         |    CASE WHEN contains(rdata, '1') THEN ['has1'] ELSE [] END),
         |    ','), '') AS tag_list
         |FROM agg
         |""".stripMargin,

    "tag_routing" ->
      s"""$obsCte,
         |tagged AS (SELECT rrname, $tagCase AS tag_list FROM agg)
         |SELECT 'sink_filtered' AS sink, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tagged WHERE tag_list LIKE '%filtered%'
         |UNION ALL
         |SELECT 'sink_deep', CAST(COUNT(*) AS BIGINT)
         |  FROM tagged WHERE tag_list LIKE 'deep%'
         |UNION ALL
         |SELECT 'catchall', CAST(COUNT(*) AS BIGINT) FROM tagged
         |""".stripMargin,
  )
}
