package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{BalboaQueries, CurationQueries, DecoderQueries, EventQueries, MultimodalQueries, PipelineQueries, RetrievalQueries, SelectorQueries}

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2.
  *
  * The balboa operator surface is exercised against a passive-DNS-shaped
  * observation stream derived deterministically from `lineitem`
  * ([[Graft.observations]]); the oracle SQL reconstructs the same mapping
  * in a CTE so DuckDB computes on the identical parquet bytes. Decoder
  * queries round-trip generated wire payloads through the real decoders.
  *
  * Determinism rules (the driver hash-compares sorted values):
  *  - timestamps are emitted as unix-microsecond BIGINTs (`unix_micros` /
  *    DuckDB `epoch_us`) — mirrors the reference's integer-seconds JSON
  *    rendering (`observation/observation.go:26-37`) and avoids tz-repr
  *    ambiguity;
  *  - sums over doubles are cast to exact types before aggregation;
  *  - every `limit` is either preceded by a total order or chosen to not
  *    bind (selective filter « limit), matching balboa's "result order =
  *    scan order, limit rarely binds" behavior without nondeterminism.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("entries_rrname")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    distinctUnion("queries")(
      BalboaQueries.queries, DecoderQueries.queries,
      SelectorQueries.queries, PipelineQueries.queries,
      EventQueries.queries, MultimodalQueries.queries,
      CurationQueries.queries, RetrievalQueries.queries)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    distinctUnion("oracleSql")(
      BalboaQueries.oracleSql, DecoderQueries.oracleSql,
      SelectorQueries.oracleSql, PipelineQueries.oracleSql,
      EventQueries.oracleSql, MultimodalQueries.oracleSql,
      CurationQueries.oracleSql, RetrievalQueries.oracleSql)

  /** Union that fails loudly on duplicate gate keys. A plain `++` lets a
    * later map silently shadow an earlier gate (and its oracle), so the
    * driver's gate count can overstate what is actually oracle-checked —
    * exactly what happened to round 9's `bpe_train`/`bpe_encode`. */
  private def distinctUnion[V](what: String)(
      maps: Map[String, V]*): Map[String, V] = {
    val dups = maps.flatMap(_.keys).groupBy(identity)
      .collect { case (k, ks) if ks.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate $what gate keys would shadow each other: " +
        dups.toSeq.sorted.mkString(", "))
    maps.reduce(_ ++ _)
  }
}
