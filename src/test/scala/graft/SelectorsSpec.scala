package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Selectors
import graft.operators.Selectors.{HookSelector, RegexSelector}
import org.apache.spark.sql.functions._

/** Selector-engine semantics per the reference's example stack
  * (`selectors.yaml` / `README.md:129-150`): a filter-mode selector tags
  * non-.de domains `filtered_tlds`; a chained select-mode selector ingests
  * that tag and adds `possible_cobaltstrike` on the stage-regex match. */
class SelectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stack = Seq(
    RegexSelector(patterns = Seq("^.*[.]de$"), tags = Seq("filtered_tlds"),
      filterMode = true),
    RegexSelector(patterns = Seq("^.*[a-z]{3}[.]stage[.][0-9]+[.].*$"),
      tags = Seq("possible_cobaltstrike"), ingests = Seq("filtered_tlds"))
  )

  private def tagsOf(rrname: String): Set[String] = {
    val df = Seq((rrname, "s1", "A", "1.2.3.4"))
      .toDF("rrname", "sensor_id", "rrtype", "rdata")
    Selectors.engine(df, stack)
      .select("tags").as[Seq[String]].head().toSet
  }

  test("filter mode tags on NON-match; chained selector fires via ingest tag") {
    assert(tagsOf("test.foobar.de") == Set.empty)
    assert(tagsOf("example.com") == Set("filtered_tlds"))
    assert(tagsOf("abc.stage.123456.endpoint.com") ==
      Set("filtered_tlds", "possible_cobaltstrike"))
    // matches the stage regex but is .de -> first selector never tags it,
    // so the chained selector is never triggered
    assert(tagsOf("abc.stage.123456.endpoint.de") == Set.empty)
  }

  test("hook selector (Lua stand-in) and multi-level chaining to fixed point") {
    val chain = Seq(
      HookSelector(df => col("count") > 5, tags = Seq("t1")),
      RegexSelector(Seq("^a"), tags = Seq("t2"), ingests = Seq("t1")),
      RegexSelector(Seq(".*"), tags = Seq("t3"), ingests = Seq("t2"))
    )
    val df = Seq(("abc", 10L), ("abc", 1L), ("xyz", 10L))
      .toDF("rrname", "count")
    val out = Selectors.engine(df, chain)
      .select("rrname", "count", "tags").as[(String, Long, Seq[String])]
      .collect().map { case (n, c, t) => (n, c) -> t.toSet }.toMap
    assert(out(("abc", 10L)) == Set("t1", "t2", "t3")) // 3-level cascade
    assert(out(("abc", 1L)) == Set.empty)
    assert(out(("xyz", 10L)) == Set("t1"))
  }

  test("tag routing: tagged sink gets matching rows, tagless sink gets all, tags stripped") {
    val df = Seq(("a", Seq("x")), ("b", Seq("y")), ("c", Seq[String]()))
      .toDF("rrname", "tags")
    val routed = Selectors.route(df,
      Map("sinkX" -> Some("x"), "catchall" -> None))
    assert(routed("sinkX").select("rrname").as[String].collect().toSeq == Seq("a"))
    assert(routed("catchall").count() == 3)
    assert(!routed("sinkX").columns.contains("tags"))
  }
}
