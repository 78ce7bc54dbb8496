package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Selector / routing dataflow T1–T5 (SURVEY.md §2.2).
  *
  * Reference semantics (`selector/selector_engine.go`): selectors with an
  * empty `ingest` list run on every observation first; tag-triggered
  * selectors run when the observation carries one of their ingest tags;
  * each selector is applied at most once per observation; the engine loops
  * to a fixed point.
  *
  * Spark mapping: each selector is a conditional `array_union` on the
  * `tags` column. Tagging is idempotent and monotone (tags are only ever
  * added), so the reference's per-row visited-set + fixed-point loop
  * collapses to at most `#selectors` unrolled passes of `withColumn` steps
  * — a pure projection chain, no shuffle, fully codegen'd, which is why it
  * scales to 100 TB ingest: cost is O(rows × selectors) map work.
  */
object Selectors {

  /** T1/T2 — a tagging rule. `mode=filter` inverts the match (tag is set
    * when NO pattern matches — `selector_regex.go:93-107`). `ingests`
    * empty ⇒ runs unconditionally (engine's `""` bucket). */
  sealed trait Selector {
    def tags: Seq[String]
    def ingests: Seq[String]
    /** Row-level predicate: does this selector's rule match? */
    def condition(df: DataFrame): Column
  }

  final case class RegexSelector(
      patterns: Seq[String],
      tags: Seq[String],
      ingests: Seq[String] = Seq.empty,
      filterMode: Boolean = false,
      column: String = "rrname"
  ) extends Selector {
    def condition(df: DataFrame): Column = {
      // One alternation keeps the whole selector a single codegen'd rlike.
      // (rlike = unanchored contains-match, same as Go regexp.Match.)
      // coalesce: rlike over a NULL column is NULL, and !NULL is still
      // NULL — a null-field row matched NO pattern, so filter mode must
      // TAG it, not silently skip the when() branch
      val matched =
        coalesce(col(column).rlike(patterns.mkString("(?:", ")|(?:", ")")),
          lit(false))
      if (filterMode) !matched else matched
    }
  }

  /** T3 — the Lua escape hatch, Spark-first: an arbitrary user-supplied
    * predicate over the observation columns (a `Column`, so it stays in
    * codegen; users needing imperative logic can pass a UDF column). */
  final case class HookSelector(
      predicate: DataFrame => Column,
      tags: Seq[String],
      ingests: Seq[String] = Seq.empty
  ) extends Selector {
    def condition(df: DataFrame): Column = predicate(df)
  }

  /** T3 for REAL: run a user's `selector.lua` per observation through
    * [[MiniLua]] (`selector/selector_lua.go:29-162`) — `process(o)` is
    * called with the observation userdata, and the script's `add_tag`
    * calls become the row's new tags. Unlike the other selectors, the
    * tag SET comes from the script, not the config — so this node
    * rewrites the tags column directly (see `applyOne`). A script error
    * on a row leaves that row's tags unchanged (the engine must not die
    * on one malformed observation). Interpreted per row — the
    * documented escape hatch; regex selectors stay the codegen'd hot
    * path. */
  final case class LuaScriptSelector(
      script: String,
      ingests: Seq[String] = Seq.empty
  ) extends Selector {
    def tags: Seq[String] = Seq.empty
    def condition(df: DataFrame): Column = lit(true)
    private[operators] val proc = new LuaProcess(script)
    private[operators] def tagsColumn: Column = {
      val p = proc
      val f = udf((rcode: String, rdata: String, rrtype: String,
          rrname: String, sensorId: String, tags: Seq[String]) =>
        p.run(rcode, rdata, rrtype, rrname, sensorId,
          Option(tags).getOrElse(Seq.empty)))
      f(coalesce(col("rcode"), lit("")), coalesce(col("rdata"), lit("")),
        coalesce(col("rrtype"), lit("")), coalesce(col("rrname"), lit("")),
        coalesce(col("sensor_id"), lit("")), col("tags"))
    }
  }

  /** One parsed Lua script, executed per observation. Serializable for
    * UDF shipping; the parse is cached per JVM ([[MiniLua.parse]] result
    * is immutable), each `run` builds a fresh environment — thread-safe
    * by construction. */
  final class LuaProcess(script: String) extends Serializable {
    @transient private lazy val chunk = MiniLua.parse(script)
    def run(rcode: String, rdata: String, rrtype: String, rrname: String,
        sensorId: String, tags: Seq[String]): Seq[String] = {
      import MiniLua._
      val cur = scala.collection.mutable.ArrayBuffer[String](tags: _*)
      def s(v: String) = Seq[LV](LStr(v))
      val obs = LUser(Map(
        "rcode" -> (_ => s(rcode)),
        "rdata" -> (_ => s(rdata)),
        "rrtype" -> (_ => s(rrtype)),
        "rrname" -> (_ => s(rrname)),
        "sensor_id" -> (_ => s(sensorId)),
        "tags" -> (_ => {
          val t = new LTable
          cur.foreach(x => t.arr += LStr(x))
          Seq(t)
        }),
        "add_tag" -> (args => {
          args.headOption match {
            case Some(LStr(tag)) => if (!cur.contains(tag)) cur += tag
            case _               => ()
          }
          Seq.empty
        })))
      try MiniLua.withFuel(1000000L) {
        val g = stdEnv()
        exec(chunk, g)
        g.lookup("process") match {
          case Some(f) => call(f, Seq(obs)): Unit
          case None => throw new LuaError("script defines no process(o)")
        }
        cur.toSeq
      } catch { case _: Exception => tags } // row-local failure: no-op
    }
  }

  private def ensureTags(df: DataFrame): DataFrame =
    if (df.columns.contains("tags")) df
    else df.withColumn("tags", array().cast("array<string>"))

  private def applyOne(df: DataFrame, s: Selector): DataFrame = {
    val triggered =
      if (s.ingests.isEmpty) lit(true)
      else arrays_overlap(col("tags"), lit(s.ingests.toArray))
    s match {
      case l: LuaScriptSelector =>
        // the script computes the row's whole tag set (monotone: it can
        // only ADD — run() unions onto the current tags), so the column
        // is rewritten rather than array_union'd with a fixed list
        df.withColumn("tags",
          when(triggered, l.tagsColumn).otherwise(col("tags")))
      case _ =>
        df.withColumn("tags",
          when(triggered && s.condition(df),
            array_union(col("tags"), lit(s.tags.toArray)))
            .otherwise(col("tags")))
    }
  }

  /** T4 — run the selector engine to its fixed point. Untagged selectors
    * first (one pass), then the tag-triggered set unrolled `n` times —
    * tagging is monotone, so n = #triggered selectors reaches the fixed
    * point the reference's while-loop reaches. */
  def engine(input: DataFrame, selectors: Seq[Selector]): DataFrame = {
    val (always, triggered) = selectors.partition(_.ingests.isEmpty)
    val afterAlways = always.foldLeft(ensureTags(input))(applyOne)
    (1 to math.max(triggered.size, 1)).foldLeft(afterAlways) { (df, _) =>
      triggered.foldLeft(df)(applyOne)
    }
  }

  /** T5 — tag-based sink routing: a sink with a tag receives observations
    * carrying it; a tagless sink receives everything. Tags are stripped
    * before the write (`db/db_remote.go:102-103`). */
  def routeTo(df: DataFrame, sinkTag: Option[String]): DataFrame = {
    val routed = sinkTag match {
      case Some(t) => df.filter(array_contains(col("tags"), t))
      case None    => df
    }
    routed.drop("tags")
  }

  /** Multi-tag routing variant (`db/db_remote.go:91-103`): a backend
    * configured with several tags receives observations carrying ANY of
    * them; tagless backends receive everything. */
  def routeToAny(df: DataFrame, sinkTags: Seq[String]): DataFrame = {
    val routed =
      if (sinkTags.isEmpty) df
      else df.filter(arrays_overlap(col("tags"), lit(sinkTags.toArray)))
    routed.drop("tags")
  }

  /** Route one micro-batch to every sink (used from `foreachBatch` in the
    * streaming path). `sinks` maps sink name → optional tag. */
  def route(df: DataFrame, sinks: Map[String, Option[String]]): Map[String, DataFrame] =
    sinks.map { case (name, tag) => name -> routeTo(df, tag) }
}
