package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MiniLua, Selectors}
import graft.operators.Selectors.{LuaProcess, LuaScriptSelector}

/** The Lua selector surface (T3): interpreter semantics, the
  * observation API, and the reference's own example script verbatim. */
class MiniLuaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(script: String, rrname: String = "www.example.com",
      rdata: String = "1.2.3.4", rrtype: String = "A",
      rcode: String = "NOERROR", sensor: String = "s1",
      tags: Seq[String] = Seq.empty): Seq[String] =
    new LuaProcess(script).run(rcode, rdata, rrtype, rrname, sensor, tags)

  test("interpreter core: control flow, strings, tables, patterns") {
    // numeric for + concat + table length + string lib + comparisons
    val tagsOut = run("""
      local function classify(name)
        if string.find(name, "mail", 1, true) then return "mail" end
        if name:match("^www%.") then return "web" end
        return "other"
      end
      function process(o)
        local parts = {}
        local n = 0
        for i = 1, 3 do n = n + i end
        if n == 6 and #o:rrname() > 0 then
          o:add_tag(classify(o:rrname()))
        end
        local t = o:tags()
        if #t >= 1 and t[1] == "web" then o:add_tag("seen") end
        -- string stdlib round trip
        if string.upper(string.sub("abcdef", 2, 4)) == "BCD" and
           string.lower("XY") .. tostring(2) == "xy2" and
           string.rep("ab", 2) == "abab" and
           ("%d+"):len() == 3 then
          o:add_tag("stdlib")
        end
        -- Lua patterns: classes, captures, anchors, quantifiers
        local h = string.match(o:rrname(), "^([%w]+)%.(.+)$")
        if h == "www" then o:add_tag("host-" .. h) end
        while false do break end
        repeat local x = 1 until true
      end""")
    assert(tagsOut == Seq("web", "seen", "stdlib", "host-www"))

    // predicate over rdata/rrtype; numeric compare; else branch
    assert(run("""
      function process(o)
        if o:rrtype() == "A" and o:rdata():find("^1%.2%.") then
          o:add_tag("net-1-2")
        else
          o:add_tag("other")
        end
      end""") == Seq("net-1-2"))

    // existing tags are visible and preserved; add_tag dedups
    assert(run("""
      function process(o)
        o:add_tag("x")
        o:add_tag("x")
      end""", tags = Seq("pre")) == Seq("pre", "x"))
  }

  test("generic for, ipairs/pairs, gmatch and gsub") {
    assert(run("""
      function process(o)
        -- ipairs over the tags table
        local joined = ""
        for i, t in ipairs(o:tags()) do
          joined = joined .. i .. ":" .. t .. ";"
        end
        if joined == "1:a;2:b;" then o:add_tag("ipairs-ok") end
        -- pairs over a constructed table (seq + hash parts)
        local n = 0
        for k, v in pairs({10, 20, x = 30}) do n = n + v end
        if n == 60 then o:add_tag("pairs-ok") end
        -- gmatch: iterate domain labels
        local labels = {}
        for lab in string.gmatch(o:rrname(), "[^%.]+") do
          table.insert(labels, lab)
        end
        if #labels == 3 and labels[1] == "www" then
          o:add_tag("labels-" .. #labels)
        end
        -- gsub: string replacement with capture reference + count
        local dashed, cnt = o:rrname():gsub("%.", "-")
        if dashed == "www-example-com" and cnt == 2 then
          o:add_tag("gsub-ok")
        end
        local up = string.gsub("abc", "(%a)", function(c)
          return string.upper(c)
        end)
        if up == "ABC" then o:add_tag("gsub-fn") end
      end""", tags = Seq("a", "b")) ==
      Seq("a", "b", "ipairs-ok", "pairs-ok", "labels-3", "gsub-ok",
        "gsub-fn"))
  }

  test("Lua 5.1 edges: anchored gsub/gmatch, position captures") {
    assert(run("""
      function process(o)
        -- anchored gsub: ONE attempt at the subject start (lstrlib.c
        -- breaks after the first iteration when anchored)
        local s, n = string.gsub("aaa", "^a", "b")
        o:add_tag(s .. "/" .. n)            -- baa/1, never bbb/3
        local s2, n2 = string.gsub("xaa", "^a", "b")
        o:add_tag(s2 .. "/" .. n2)          -- xaa/0
        -- gmatch does NOT anchor: Lua 5.1's gmatch_aux passes the raw
        -- pattern to match(), whose switch has no '^' arm, so a leading
        -- caret is an ordinary CHARACTER (manual: "does not work as an
        -- anchor") — "aaa" contains no '^', zero matches...
        local c = 0
        for m in string.gmatch("aaa", "^a") do c = c + 1 end
        o:add_tag("g" .. c)
        -- ...and a literal '^a' in the subject IS found
        local lit = ""
        for m in string.gmatch("x^ay", "^a") do lit = m end
        o:add_tag("lit" .. lit)
        -- position capture () is a NUMBER (1-based), not ""
        local pos = string.match("hello world", "()world")
        if pos == 7 then o:add_tag("pos" .. pos) end
        local pre, post = string.match("ab", "()a()"), nil
        if pre == 1 then o:add_tag("pc-first") end
      end""") == Seq("baa/1", "xaa/0", "g0", "lit^a", "pos7", "pc-first"))
  }

  test("a script's OWN global assignment exempts an unsupported name") {
    // the evaluator creates globals on assignment, so this runs fine —
    // the parse-time walk must not reject it
    assert(run("""
      coroutine = { wrap = function(x) return x end }
      function process(o)
        o:add_tag("w" .. coroutine.wrap("ok"))
      end""") == Seq("wok"))
    // a USE with no assignment anywhere still fails at parse, named
    val e = intercept[MiniLua.LuaError](
      MiniLua.parse("local co = coroutine.create(f)"))
    assert(e.getMessage.contains("coroutines"))
  }

  test("unsupported constructs fail at parse time with their name") {
    def msgOf(src: String): String =
      intercept[MiniLua.LuaError](MiniLua.parse(src)).getMessage
    assert(msgOf("goto done") .contains("goto"))
    assert(msgOf("::done::")  .contains("labels"))
    assert(msgOf("setmetatable({}, {})").contains("setmetatable"))
    assert(msgOf("local t = getmetatable({})").contains("getmetatable"))
    assert(msgOf("local co = coroutine.create(f)").contains("coroutines"))
    assert(msgOf("rawset({}, 1, 2)").contains("rawset"))
    // every rejection points at the JVM escape hatch
    assert(msgOf("goto x").contains("HookSelector"))
    assert(msgOf("coroutine.yield()").contains("HookSelector"))
    // a shadowing local legitimately claims the name — not flagged
    MiniLua.parse("local coroutine = {} coroutine.x = 1")
    // `goto` as a plain identifier (5.1 has no goto keyword) still works
    MiniLua.parse("goto = 1")
  }

  test("totality: script errors and missing process leave tags unchanged") {
    assert(run("function process(o) error_call(nil .. 1) end",
      tags = Seq("keep")) == Seq("keep"))
    assert(run("local x = 1", tags = Seq("keep")) == Seq("keep"))
    // parse error is also row-local
    assert(run("function process(o", tags = Seq("keep")) == Seq("keep"))
    // infinite loops burn their step budget instead of hanging — the
    // empty-body forms execute zero statements per iteration, so the
    // budget must tick per ITERATION too
    assert(run("function process(o) while true do end end",
      tags = Seq("keep")) == Seq("keep"))
    assert(run("function process(o) repeat until false end",
      tags = Seq("keep")) == Seq("keep"))
    assert(run("function process(o) for i = 1, 1e18 do end end",
      tags = Seq("keep")) == Seq("keep"))
    // unbounded recursion trips the depth guard (a catchable LuaError),
    // never a task-killing StackOverflowError
    assert(run("function f() return f() end function process(o) f() end",
      tags = Seq("keep")) == Seq("keep"))
  }

  test("the reference's example selector.lua runs verbatim") {
    val ref = new java.io.File("/root/reference/selector.lua")
    assume(ref.exists(), "reference script not present in this environment")
    val script = new String(
      java.nio.file.Files.readAllBytes(ref.toPath), "UTF-8")
    // the example prints every field, iterates tags before and after,
    // and adds the tag "foo" (selector.lua:1-24)
    assert(run(script, tags = Seq("pre")) == Seq("pre", "foo"))
  }

  test("LuaScriptSelector in the engine: ingest gating + routing") {
    val df = Seq(
      ("mail.example.com", "1.1.1.1", "A", "NOERROR", "s1"),
      ("www.example.com", "2.2.2.2", "A", "NOERROR", "s1"),
      ("mail.other.org", "3.3.3.3", "AAAA", "NOERROR", "s2")
    ).toDF("rrname", "rdata", "rrtype", "rcode", "sensor_id")
    val lua = LuaScriptSelector("""
      function process(o)
        if string.find(o:rrname(), "mail", 1, true) then
          o:add_tag("mailhost")
          if o:rrtype() == "A" then o:add_tag("mail-v4") end
        end
      end""")
    // a downstream regex selector triggered BY the lua-added tag
    val downstream = Selectors.RegexSelector(Seq("other"), Seq("ext"),
      ingests = Seq("mailhost"))
    val tagged = Selectors.engine(df, Seq(lua, downstream))
    val byName = tagged.select("rrname", "tags")
      .as[(String, Seq[String])].collect().toMap
    assert(byName("mail.example.com") == Seq("mailhost", "mail-v4"))
    assert(byName("www.example.com") == Seq.empty)
    assert(byName("mail.other.org") == Seq("mailhost", "ext"))
    // routing consumes the script-added tags
    assert(Selectors.routeTo(tagged, Some("mail-v4"))
      .select("rrname").as[String].collect().toSeq ==
      Seq("mail.example.com"))
  }

  test("YAML type: lua resolves the script file and runs it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-luas")
    java.nio.file.Files.write(dir.resolve("tagger.lua"),
      """function process(o)
        |  if o:sensor_id() == "s9" then o:add_tag("sensor9") end
        |end""".stripMargin.getBytes("UTF-8"))
    val yaml =
      """selectors:
        |  - name: lua tagger
        |    type: lua
        |    script: tagger.lua
        |""".stripMargin
    val sels = graft.sources.ConfigYaml.loadSelectors(yaml, _ => Seq.empty,
      readScript =
        graft.sources.ConfigYaml.scriptFromFiles(spark, dir.toString))
    assert(sels.length == 1 && sels.head.isInstanceOf[LuaScriptSelector])
    val df = Seq(("a.example", "1.1.1.1", "A", "NOERROR", "s9"),
      ("b.example", "2.2.2.2", "A", "NOERROR", "s1"))
      .toDF("rrname", "rdata", "rrtype", "rcode", "sensor_id")
    val out = Selectors.engine(df, sels)
      .select("rrname", "tags").as[(String, Seq[String])].collect().toMap
    assert(out("a.example") == Seq("sensor9"))
    assert(out("b.example") == Seq.empty)
    // unresolvable script with no hook still fails loudly
    intercept[IllegalArgumentException](
      graft.sources.ConfigYaml.loadSelectors(yaml, _ => Seq.empty))
  }
}
