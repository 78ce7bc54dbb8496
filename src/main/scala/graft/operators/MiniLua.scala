package graft.operators

import scala.collection.mutable

/** A small Lua interpreter for the selector scripting surface (T3,
  * `selector/selector_lua.go:29-162`): the reference embeds gopher-lua
  * and calls a user-defined `process(o)` per observation, where `o`
  * exposes `rcode/rdata/rrtype/rrname/sensor_id/tags/add_tag`. This
  * implements the Lua 5.1 SUBSET those scripts use — written from the
  * published Lua reference manual, no Lua runtime needed — so a user's
  * `selector.lua` runs UNMODIFIED (the reference's own example script
  * is executed verbatim in SelectorsSpec):
  *
  *  - statements: `function name(...) end`, `local`, multiple
  *    assignment, `if/elseif/else`, numeric `for`, `while`, `repeat`,
  *    `return`, `break`, calls;
  *  - expressions: nil/booleans/numbers/strings, `..`, arithmetic,
  *    comparisons, `and/or/not`, `#`, tables (`{}` constructors, index
  *    and method sugar), anonymous `function`;
  *  - stdlib subset: `print` (swallowed — the engine has no console
  *    per row), `tostring`, `tonumber`, `type`, `table.insert`,
  *    `string.find/match/sub/lower/upper/len/rep/reverse/byte`, string
  *    method sugar (`s:find(...)`), real Lua PATTERNS (classes, sets,
  *    quantifiers, anchors, captures; `%b`/`%f` unsupported).
  *
  * Scripts run per row inside a UDF ([[LuaProcess]]); parsing is done
  * once and cached, evaluation allocates a fresh environment per call
  * (thread-safe by construction). This is the documented ESCAPE HATCH —
  * regex selectors remain the codegen'd hot path. */
object MiniLua {

  // ------------------------------------------------------------ values

  sealed trait LV
  case object LNil extends LV
  final case class LBool(b: Boolean) extends LV
  final case class LNum(d: Double) extends LV
  final case class LStr(s: String) extends LV
  final class LTable extends LV {
    val arr = mutable.ArrayBuffer.empty[LV] // 1-based sequence part
    val map = mutable.HashMap.empty[LV, LV]
    def get(k: LV): LV = k match {
      case LNum(d) if d.isWhole && d >= 1 && d <= arr.length =>
        arr(d.toInt - 1)
      case _ => map.getOrElse(k, LNil)
    }
    def set(k: LV, v: LV): Unit = k match {
      case LNum(d) if d.isWhole && d >= 1 && d <= arr.length + 1 =>
        val i = d.toInt - 1
        if (i == arr.length) { if (v != LNil) arr += v }
        else if (v == LNil && i == arr.length - 1) arr.remove(i): Unit
        else arr(i) = v
      case _ => if (v == LNil) map.remove(k): Unit else map(k) = v
    }
  }
  final case class LBuiltin(name: String, f: Seq[LV] => Seq[LV]) extends LV
  final case class LFunc(params: Seq[String], body: Seq[Stat], env: Env)
    extends LV
  /** Userdata with colon-callable methods (the observation object). */
  final case class LUser(methods: Map[String, Seq[LV] => Seq[LV]]) extends LV

  def truthy(v: LV): Boolean = v match {
    case LNil | LBool(false) => false
    case _                   => true
  }
  /** Lua 5.1 tostring for concat/print: integral numbers render bare. */
  def toStr(v: LV): String = v match {
    case LStr(s)  => s
    case LNum(d)  => if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
                     else d.toString
    case LBool(b) => b.toString
    case LNil     => "nil"
    case _: LTable => "table"
    case _         => "function"
  }
  private def toNum(v: LV): Option[Double] = v match {
    case LNum(d) => Some(d)
    case LStr(s) => s.trim.toDoubleOption
    case _       => None
  }

  final class LuaError(msg: String) extends RuntimeException(msg)

  // --------------------------------------------------------------- AST

  sealed trait Expr
  final case class ENil() extends Expr
  final case class EBool(b: Boolean) extends Expr
  final case class ENum(d: Double) extends Expr
  final case class EStr(s: String) extends Expr
  final case class EVar(n: String) extends Expr
  final case class EIndex(o: Expr, k: Expr) extends Expr
  final case class ECall(f: Expr, args: Seq[Expr]) extends Expr
  final case class EMethod(o: Expr, name: String, args: Seq[Expr]) extends Expr
  final case class EBin(op: String, l: Expr, r: Expr) extends Expr
  final case class EUn(op: String, e: Expr) extends Expr
  final case class EFunc(params: Seq[String], body: Seq[Stat]) extends Expr
  final case class ETable(items: Seq[(Option[Expr], Expr)]) extends Expr

  sealed trait Stat
  final case class SLocal(names: Seq[String], init: Seq[Expr]) extends Stat
  final case class SAssign(targets: Seq[Expr], values: Seq[Expr]) extends Stat
  final case class SIf(branches: Seq[(Expr, Seq[Stat])],
      orElse: Seq[Stat]) extends Stat
  final case class SForNum(v: String, from: Expr, to: Expr,
      step: Option[Expr], body: Seq[Stat]) extends Stat
  final case class SForIn(names: Seq[String], exprs: Seq[Expr],
      body: Seq[Stat]) extends Stat
  final case class SWhile(cond: Expr, body: Seq[Stat]) extends Stat
  final case class SRepeat(body: Seq[Stat], until: Expr) extends Stat
  final case class SReturn(values: Seq[Expr]) extends Stat
  final case class SBreak() extends Stat
  final case class SCall(call: Expr) extends Stat

  // ------------------------------------------------------------- lexer

  private final case class Tok(kind: String, text: String, pos: Int)

  private val keywords = Set("and", "break", "do", "else", "elseif", "end",
    "false", "for", "function", "if", "in", "local", "nil", "not", "or",
    "repeat", "return", "then", "true", "until", "while")

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    def err(m: String) = throw new LuaError(s"lua lex: $m at $i")
    while (i < n) {
      val c = src(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
      else if (c == '-' && i + 1 < n && src(i + 1) == '-') {
        i += 2
        if (i + 1 < n && src(i) == '[' && src(i + 1) == '[') {
          val e = src.indexOf("]]", i + 2)
          if (e < 0) err("unterminated block comment")
          i = e + 2
        } else { while (i < n && src(i) != '\n') i += 1 }
      } else if (c.isDigit ||
        (c == '.' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        while (i < n && (src(i).isDigit || src(i) == '.' || src(i) == 'x' ||
          src(i) == 'X' || ('a' <= src(i).toLower && src(i).toLower <= 'f') ||
          ((src(i) == '-' || src(i) == '+') &&
            (src(i - 1) == 'e' || src(i - 1) == 'E')))) i += 1
        out += Tok("num", src.substring(start, i), start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        val w = src.substring(start, i)
        out += Tok(if (keywords(w)) w else "name", w, start)
      } else if (c == '"' || c == '\'') {
        val q = c; i += 1
        val sb = new StringBuilder
        while (i < n && src(i) != q) {
          if (src(i) == '\\' && i + 1 < n) {
            i += 1
            sb += (src(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case 'a' => 7.toChar; case 'b' => '\b'; case 'f' => '\f'
              case 'v' => 11.toChar; case '0' => 0.toChar
              case other => other
            })
            i += 1
          } else { sb += src(i); i += 1 }
        }
        if (i >= n) err("unterminated string")
        i += 1
        out += Tok("str", sb.toString, i)
      } else if (c == '[' && i + 1 < n && src(i + 1) == '[') {
        val e = src.indexOf("]]", i + 2)
        if (e < 0) err("unterminated long string")
        out += Tok("str", src.substring(i + 2, e), i)
        i = e + 2
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (two == "==" || two == "~=" || two == "<=" || two == ">=" ||
          two == "..") {
          // `...` varargs unsupported; `..` handled here
          out += Tok(two, two, i); i += 2
        } else if ("+-*/%#<>=(){}[];:,.^".indexOf(c) >= 0) {
          out += Tok(c.toString, c.toString, i); i += 1
        } else err(s"unexpected character '$c'")
      }
    }
    out += Tok("eof", "", n)
    out.result()
  }

  // ------------------------------------------------------------ parser

  private final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def cur: Tok = toks(p)
    private def at(k: String): Boolean = cur.kind == k
    private def eat(k: String): Tok = {
      if (!at(k)) fail(s"expected '$k', found '${cur.text}'")
      val t = cur; p += 1; t
    }
    private def opt(k: String): Boolean = if (at(k)) { p += 1; true } else false
    private def fail(m: String) =
      throw new LuaError(s"lua parse: $m at offset ${cur.pos}")

    def chunk(): Seq[Stat] = {
      val b = block(Set("eof")); eat("eof"); b
    }

    private def block(stop: Set[String]): Seq[Stat] = {
      val out = Seq.newBuilder[Stat]
      while (!stop(cur.kind)) {
        if (opt(";")) ()
        else if (at("return")) {
          p += 1
          val vals =
            if (stop(cur.kind) || at(";")) Seq.empty else exprList()
          opt(";")
          out += SReturn(vals)
          if (!stop(cur.kind)) fail("statements after return")
        } else out += statement()
      }
      out.result()
    }

    private def statement(): Stat = cur.kind match {
      case "local" =>
        p += 1
        if (at("function")) { // local function f() .. end
          p += 1
          val name = eat("name").text
          val (ps, body) = funcBody()
          SLocal(Seq(name), Seq(EFunc(ps, body)))
        } else {
          val names = nameList()
          val init = if (opt("=")) exprList() else Seq.empty
          SLocal(names, init)
        }
      case "function" =>
        p += 1
        var target: Expr = EVar(eat("name").text)
        var isMethod = false
        while (at(".") || at(":")) {
          val colon = at(":")
          p += 1
          target = EIndex(target, EStr(eat("name").text))
          if (colon) { isMethod = true }
        }
        val (ps0, body) = funcBody()
        val ps = if (isMethod) "self" +: ps0 else ps0
        SAssign(Seq(target), Seq(EFunc(ps, body)))
      case "if" =>
        p += 1
        val branches = Seq.newBuilder[(Expr, Seq[Stat])]
        val c0 = expr(); eat("then")
        branches += ((c0, block(Set("elseif", "else", "end"))))
        while (at("elseif")) {
          p += 1
          val c = expr(); eat("then")
          branches += ((c, block(Set("elseif", "else", "end"))))
        }
        val els = if (opt("else")) block(Set("end")) else Seq.empty
        eat("end")
        SIf(branches.result(), els)
      case "for" =>
        p += 1
        val names = nameList()
        if (names.length == 1 && at("=")) {
          eat("=")
          val from = expr(); eat(",")
          val to = expr()
          val step = if (opt(",")) Some(expr()) else None
          eat("do")
          val body = block(Set("end")); eat("end")
          SForNum(names.head, from, to, step, body)
        } else {
          eat("in")
          val exprs = exprList()
          eat("do")
          val body = block(Set("end")); eat("end")
          SForIn(names, exprs, body)
        }
      case "while" =>
        p += 1
        val c = expr(); eat("do")
        val body = block(Set("end")); eat("end")
        SWhile(c, body)
      case "repeat" =>
        p += 1
        val body = block(Set("until")); eat("until")
        SRepeat(body, expr())
      case "do" =>
        p += 1
        val body = block(Set("end")); eat("end")
        SIf(Seq((EBool(true), body)), Seq.empty)
      case "break" => p += 1; SBreak()
      // unsupported-construct statements fail HERE with their name (not
      // as a generic "expression is not a statement" mid-row later):
      // `goto label` is two name tokens in statement position, a label
      // is `::name::`
      case "name" if cur.text == "goto" && p + 1 < toks.length &&
          toks(p + 1).kind == "name" =>
        fail(unsupportedMsg("goto"))
      case ":" if p + 1 < toks.length && toks(p + 1).kind == ":" =>
        fail(unsupportedMsg("labels (::name::)"))
      case _ =>
        val e = suffixedExpr()
        if (at("=") || at(",")) {
          val targets = Seq.newBuilder[Expr]
          targets += e
          while (opt(",")) targets += suffixedExpr()
          eat("=")
          SAssign(targets.result(), exprList())
        } else e match {
          case _: ECall | _: EMethod => SCall(e)
          case _ => fail("expression is not a statement")
        }
    }

    private def nameList(): Seq[String] = {
      val out = Seq.newBuilder[String]
      out += eat("name").text
      while (opt(",")) out += eat("name").text
      out.result()
    }
    private def exprList(): Seq[Expr] = {
      val out = Seq.newBuilder[Expr]
      out += expr()
      while (opt(",")) out += expr()
      out.result()
    }
    private def funcBody(): (Seq[String], Seq[Stat]) = {
      eat("(")
      val ps = if (at("name")) nameList() else Seq.empty
      eat(")")
      val body = block(Set("end")); eat("end")
      (ps, body)
    }

    // precedence climbing
    private def expr(): Expr = orExpr()
    private def orExpr(): Expr = {
      var l = andExpr()
      while (at("or")) { p += 1; l = EBin("or", l, andExpr()) }
      l
    }
    private def andExpr(): Expr = {
      var l = cmpExpr()
      while (at("and")) { p += 1; l = EBin("and", l, cmpExpr()) }
      l
    }
    private def cmpExpr(): Expr = {
      var l = concatExpr()
      while (at("==") || at("~=") || at("<") || at(">") || at("<=") ||
        at(">=")) {
        val op = cur.kind; p += 1
        l = EBin(op, l, concatExpr())
      }
      l
    }
    private def concatExpr(): Expr = {
      val l = addExpr()
      if (at("..")) { p += 1; EBin("..", l, concatExpr()) } // right-assoc
      else l
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      while (at("+") || at("-")) {
        val op = cur.kind; p += 1; l = EBin(op, l, mulExpr())
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = unaryExpr()
      while (at("*") || at("/") || at("%")) {
        val op = cur.kind; p += 1; l = EBin(op, l, unaryExpr())
      }
      l
    }
    private def unaryExpr(): Expr =
      if (at("not")) { p += 1; EUn("not", unaryExpr()) }
      else if (at("#")) { p += 1; EUn("#", unaryExpr()) }
      else if (at("-")) { p += 1; EUn("-", unaryExpr()) }
      else powExpr()
    private def powExpr(): Expr = {
      val l = suffixedExpr()
      if (at("^")) { p += 1; EBin("^", l, unaryExpr()) } else l
    }

    private def suffixedExpr(): Expr = {
      var e = primaryExpr()
      var done = false
      while (!done) {
        if (at(".")) { p += 1; e = EIndex(e, EStr(eat("name").text)) }
        else if (at("[")) {
          p += 1; val k = expr(); eat("]"); e = EIndex(e, k)
        } else if (at("(")) {
          p += 1
          val args = if (at(")")) Seq.empty else exprList()
          eat(")")
          e = ECall(e, args)
        } else if (at(":")) {
          p += 1
          val m = eat("name").text
          val args =
            if (at("(")) {
              p += 1
              val a = if (at(")")) Seq.empty else exprList()
              eat(")"); a
            } else if (at("str")) { val s = eat("str").text; Seq(EStr(s)) }
            else fail("method call needs arguments")
          e = EMethod(e, m, args)
        } else if (at("str")) { // f "literal" sugar
          e = ECall(e, Seq(EStr(eat("str").text)))
        } else done = true
      }
      e
    }

    private def primaryExpr(): Expr = cur.kind match {
      case "nil"   => p += 1; ENil()
      case "true"  => p += 1; EBool(true)
      case "false" => p += 1; EBool(false)
      case "num" =>
        val t = eat("num").text
        val d =
          if (t.startsWith("0x") || t.startsWith("0X"))
            java.lang.Long.parseLong(t.drop(2), 16).toDouble
          else t.toDouble
        ENum(d)
      case "str"  => EStr(eat("str").text)
      case "name" => EVar(eat("name").text)
      case "(" =>
        p += 1; val e = expr(); eat(")"); e
      case "function" =>
        p += 1
        val (ps, body) = funcBody()
        EFunc(ps, body)
      case "{" =>
        p += 1
        val items = Seq.newBuilder[(Option[Expr], Expr)]
        while (!at("}")) {
          if (at("[")) {
            p += 1; val k = expr(); eat("]"); eat("=")
            items += ((Some(k), expr()))
          } else if (at("name") && toks(p + 1).kind == "=") {
            val k = eat("name").text; eat("=")
            items += ((Some(EStr(k)), expr()))
          } else items += ((None, expr()))
          if (!opt(",") && !opt(";") && !at("}")) fail("bad table item")
        }
        eat("}")
        ETable(items.result())
      case other => fail(s"unexpected '$other'")
    }
  }

  /** The message for a construct the embedded subset deliberately lacks:
    * names the construct and points at the JVM escape hatch, so a user
    * porting a selector script learns the answer at PARSE time instead
    * of decoding a generic Lua error raised mid-row on an executor. */
  private def unsupportedMsg(construct: String): String =
    s"$construct is not supported by the embedded Lua subset; " +
      "implement this selector natively as a Selectors.HookSelector " +
      "(a Column predicate) instead"

  /** Globals whose presence means the script needs a Lua feature the
    * subset will never have — rejected at parse time by [[parse]]. */
  private val unsupportedGlobals: Map[String, String] = Map(
    "setmetatable" -> "metatables (setmetatable)",
    "getmetatable" -> "metatables (getmetatable)",
    "rawset" -> "metatables (rawset)",
    "rawget" -> "metatables (rawget)",
    "rawequal" -> "metatables (rawequal)",
    "coroutine" -> "coroutines")

  def parse(src: String): Seq[Stat] = {
    val stats = new Parser(lex(src)).chunk()
    rejectUnsupported(stats)
    stats
  }

  /** Post-parse AST walk: a reference to an unsupported global
    * (metatable functions, the coroutine library) fails with the
    * construct's name now, not as "attempt to call nil" mid-row. A
    * LOCAL of the same name shadows legitimately and is not flagged —
    * the walk only needs to be sound for scripts that would otherwise
    * die at runtime, and a shadowing local means the global is never
    * consulted. A GLOBAL ASSIGNMENT anywhere in the script likewise
    * exempts the name (e.g. `coroutine = {wrap = f}` runs fine — the
    * evaluator creates the global); assignment order vs use order is
    * dynamic, so the exemption is script-wide — under-rejecting only
    * defers a truly-nil global to the ordinary runtime error. */
  private def rejectUnsupported(chunk: Seq[Stat]): Unit = {
    val assignedGlobals = mutable.Set.empty[String]
    def scanE(e: Expr): Unit = e match {
      case EFunc(_, body) => body.foreach(scanS)
      case EIndex(o, k)   => scanE(o); scanE(k)
      case ECall(f, args) => scanE(f); args.foreach(scanE)
      case EMethod(o, _, args) => scanE(o); args.foreach(scanE)
      case EBin(_, l, r)  => scanE(l); scanE(r)
      case EUn(_, x)      => scanE(x)
      case ETable(items)  => items.foreach { case (k, v) =>
        k.foreach(scanE); scanE(v)
      }
      case EVar(_) | ENil() | EBool(_) | ENum(_) | EStr(_) => ()
    }
    def scanS(st: Stat): Unit = st match {
      case SAssign(ts, vs) =>
        ts.foreach { case EVar(n) => assignedGlobals += n
                     case t       => scanE(t) }
        vs.foreach(scanE)
      case SLocal(_, init) => init.foreach(scanE)
      case SIf(branches, orElse) =>
        branches.foreach { case (c, b) => scanE(c); b.foreach(scanS) }
        orElse.foreach(scanS)
      case SWhile(c, b)  => scanE(c); b.foreach(scanS)
      case SRepeat(b, u) => b.foreach(scanS); scanE(u)
      case SForNum(_, f, t, step, b) =>
        scanE(f); scanE(t); step.foreach(scanE); b.foreach(scanS)
      case SForIn(_, es, b) => es.foreach(scanE); b.foreach(scanS)
      case SReturn(vs)      => vs.foreach(scanE)
      case SCall(c)         => scanE(c)
      case SBreak()         => ()
    }
    chunk.foreach(scanS)
    def walkE(e: Expr, shadowed: Set[String]): Unit = e match {
      case EVar(n) if !shadowed(n) && unsupportedGlobals.contains(n) =>
        throw new LuaError(
          s"lua parse: ${unsupportedMsg(unsupportedGlobals(n))}")
      case EVar(_) | ENil() | EBool(_) | ENum(_) | EStr(_) => ()
      case EIndex(o, k) => walkE(o, shadowed); walkE(k, shadowed)
      case ECall(f, args) =>
        walkE(f, shadowed); args.foreach(walkE(_, shadowed))
      case EMethod(o, _, args) =>
        walkE(o, shadowed); args.foreach(walkE(_, shadowed))
      case EBin(_, l, r) => walkE(l, shadowed); walkE(r, shadowed)
      case EUn(_, x)     => walkE(x, shadowed)
      case EFunc(ps, body) => walkB(body, shadowed ++ ps)
      case ETable(items) => items.foreach { case (k, v) =>
        k.foreach(walkE(_, shadowed)); walkE(v, shadowed)
      }
    }
    def walkS(st: Stat, shadowed: Set[String]): Set[String] = st match {
      case SLocal(names, init) =>
        init.foreach(walkE(_, shadowed)); shadowed ++ names
      case SAssign(ts, vs) =>
        ts.foreach(walkE(_, shadowed)); vs.foreach(walkE(_, shadowed))
        shadowed
      case SIf(branches, orElse) =>
        branches.foreach { case (c, b) =>
          walkE(c, shadowed); walkB(b, shadowed)
        }
        walkB(orElse, shadowed); shadowed
      case SForNum(v, f, t, step, body) =>
        walkE(f, shadowed); walkE(t, shadowed)
        step.foreach(walkE(_, shadowed))
        walkB(body, shadowed + v); shadowed
      case SForIn(names, exprs, body) =>
        exprs.foreach(walkE(_, shadowed))
        walkB(body, shadowed ++ names); shadowed
      case SWhile(c, body) =>
        walkE(c, shadowed); walkB(body, shadowed); shadowed
      case SRepeat(body, until) =>
        walkB(body, shadowed); walkE(until, shadowed); shadowed
      case SReturn(vals) => vals.foreach(walkE(_, shadowed)); shadowed
      case SCall(c)      => walkE(c, shadowed); shadowed
      case SBreak()      => shadowed
    }
    def walkB(body: Seq[Stat], shadowed: Set[String]): Unit =
      body.foldLeft(shadowed)((sh, st) => walkS(st, sh)): Unit
    walkB(chunk, assignedGlobals.toSet)
  }

  // --------------------------------------------------------- evaluator

  final class Env(val parent: Option[Env]) {
    private val vars = mutable.HashMap.empty[String, LV]
    def declare(n: String, v: LV): Unit = vars(n) = v
    def lookup(n: String): Option[LV] =
      vars.get(n).orElse(parent.flatMap(_.lookup(n)))
    /** Assign to the nearest scope declaring `n`, else the ROOT
      * (global) scope — Lua's global assignment. */
    def assign(n: String, v: LV): Unit =
      if (vars.contains(n)) vars(n) = v
      else parent match {
        case Some(pp) => pp.assign(n, v)
        case None     => vars(n) = v
      }
  }

  private final case class BreakEx() extends RuntimeException
  private final case class ReturnEx(vals: Seq[LV]) extends RuntimeException

  /** Per-thread step budget (one step per statement AND per loop
    * iteration — iteration counting matters because an empty loop body
    * executes no statements) — a `while true do end` in a user script
    * must not hang an executor task forever. [[withFuel]] arms it
    * around a run; exhaustion raises a LuaError the selector's
    * row-local error handling absorbs. */
  private val fuel = new ThreadLocal[Long] {
    override def initialValue(): Long = Long.MaxValue
  }
  def withFuel[T](steps: Long)(f: => T): T = {
    val prev = fuel.get()
    fuel.set(steps)
    try f finally fuel.set(prev)
  }
  private def burn(): Unit = {
    val left = fuel.get() - 1
    if (left < 0) throw new LuaError("script exceeded its step budget")
    fuel.set(left)
  }

  def exec(stats: Seq[Stat], env: Env): Unit = stats.foreach(execStat(_, env))

  private def execStat(s: Stat, env: Env): Unit = { burn(); s } match {
    case SLocal(names, init) =>
      val vals = evalMulti(init, env, names.length)
      names.zip(vals).foreach { case (n, v) => env.declare(n, v) }
    case SAssign(targets, values) =>
      val vals = evalMulti(values, env, targets.length)
      targets.zip(vals).foreach {
        case (EVar(n), v) => env.assign(n, v)
        case (EIndex(o, k), v) =>
          evalOne(o, env) match {
            case t: LTable => t.set(evalOne(k, env), v)
            case other => throw new LuaError(s"cannot index ${toStr(other)}")
          }
        case (other, _) =>
          throw new LuaError(s"cannot assign to $other")
      }
    case SIf(branches, orElse) =>
      branches.find { case (c, _) => truthy(evalOne(c, env)) } match {
        case Some((_, body)) => exec(body, new Env(Some(env)))
        case None            => exec(orElse, new Env(Some(env)))
      }
    case SForNum(v, fromE, toE, stepE, body) =>
      val from = toNum(evalOne(fromE, env))
        .getOrElse(throw new LuaError("'for' initial value not a number"))
      val to = toNum(evalOne(toE, env))
        .getOrElse(throw new LuaError("'for' limit not a number"))
      val step = stepE.map(e => toNum(evalOne(e, env))
        .getOrElse(throw new LuaError("'for' step not a number")))
        .getOrElse(1.0)
      if (step == 0) throw new LuaError("'for' step is zero")
      var i = from
      try while (if (step > 0) i <= to else i >= to) {
        burn()
        val inner = new Env(Some(env))
        inner.declare(v, LNum(i))
        exec(body, inner)
        i += step
      } catch { case BreakEx() => () }
    case SForIn(names, exprs, body) =>
      // generic for (Lua 5.1 §2.4.5): explist → iterator f, state s,
      // control var c; each round calls f(s, c) until the first result
      // is nil
      val vals = evalMulti(exprs, env, 3)
      val f = vals(0); val st = vals(1); var ctrl = vals(2)
      try {
        var done = false
        while (!done) {
          burn()
          val rs = call(f, Seq(st, ctrl))
          val first = rs.headOption.getOrElse(LNil)
          if (first == LNil) done = true
          else {
            ctrl = first
            val inner = new Env(Some(env))
            names.zipWithIndex.foreach { case (n, i) =>
              inner.declare(n, if (i < rs.length) rs(i) else LNil)
            }
            exec(body, inner)
          }
        }
      } catch { case BreakEx() => () }
    case SWhile(cond, body) =>
      // burn per ITERATION, not just per statement — an empty body
      // (`while true do end`) executes no statements, so a
      // statement-only budget would never trip
      try while ({ burn(); truthy(evalOne(cond, env)) })
        exec(body, new Env(Some(env)))
      catch { case BreakEx() => () }
    case SRepeat(body, until) =>
      try {
        var done = false
        while (!done) {
          burn()
          val inner = new Env(Some(env))
          exec(body, inner)
          done = truthy(evalOne(until, inner))
        }
      } catch { case BreakEx() => () }
    case SReturn(values) => throw ReturnEx(values.flatMap(evalAll(_, env)))
    case SBreak()        => throw BreakEx()
    case SCall(c)        => evalAll(c, env): Unit
  }

  /** Evaluate an expression list Lua-style: the LAST expression expands
    * to all its results; earlier ones truncate to one. */
  private def evalMulti(exprs: Seq[Expr], env: Env, want: Int): Seq[LV] = {
    val vals =
      if (exprs.isEmpty) Seq.empty
      else exprs.init.map(evalOne(_, env)) ++ evalAll(exprs.last, env)
    vals.padTo(want, LNil)
  }

  private def evalAll(e: Expr, env: Env): Seq[LV] = e match {
    case ECall(f, args) =>
      call(evalOne(f, env), args.map(evalOne(_, env)))
    case EMethod(o, name, args) =>
      val recv = evalOne(o, env)
      val argv = args.map(evalOne(_, env))
      recv match {
        case u: LUser =>
          u.methods.getOrElse(name,
            throw new LuaError(s"unknown method '$name'")).apply(argv)
        case s: LStr =>
          stringLib.get(name) match {
            case Some(LBuiltin(_, f)) => f(s +: argv)
            case _ => throw new LuaError(s"unknown string method '$name'")
          }
        case t: LTable =>
          call(t.get(LStr(name)), recv +: argv)
        case other =>
          throw new LuaError(s"cannot call method on ${toStr(other)}")
      }
    case other => Seq(evalOne(other, env))
  }

  /** Interpreter call depth — bounded well below the JVM stack so
    * runaway recursion raises a catchable LuaError instead of a
    * StackOverflowError (an Error, which the selector's row-local
    * `case _: Exception` guard would NOT absorb). */
  private val depth = new ThreadLocal[Int] { override def initialValue = 0 }
  private val MaxDepth = 200

  def call(f: LV, args: Seq[LV]): Seq[LV] = f match {
    case LBuiltin(_, g) => g(args)
    case LFunc(params, body, closure) =>
      if (depth.get() >= MaxDepth)
        throw new LuaError("call stack too deep")
      val env = new Env(Some(closure))
      params.zipWithIndex.foreach { case (pn, i) =>
        env.declare(pn, if (i < args.length) args(i) else LNil)
      }
      depth.set(depth.get() + 1)
      try { exec(body, env); Seq.empty }
      catch { case ReturnEx(vals) => vals }
      finally depth.set(depth.get() - 1)
    case other => throw new LuaError(s"cannot call ${toStr(other)}")
  }

  private def evalOne(e: Expr, env: Env): LV = e match {
    case _: ECall | _: EMethod =>
      evalAll(e, env).headOption.getOrElse(LNil)
    case other => evalSimple(other, env)
  }

  private def evalSimple(e: Expr, env: Env): LV = e match {
    case ENil()    => LNil
    case EBool(b)  => LBool(b)
    case ENum(d)   => LNum(d)
    case EStr(s)   => LStr(s)
    case EVar(n)   => env.lookup(n).getOrElse(LNil)
    case EIndex(o, k) =>
      evalOne(o, env) match {
        case t: LTable => t.get(evalOne(k, env))
        case LStr(_)   => stringLib.getOrElse(
          evalOne(k, env) match { case LStr(s) => s; case _ => "" },
          LNil)
        case LNil => throw new LuaError("attempt to index a nil value")
        case other => throw new LuaError(s"cannot index ${toStr(other)}")
      }
    case EFunc(ps, body) => LFunc(ps, body, env)
    case ETable(items) =>
      val t = new LTable
      items.foreach {
        case (Some(k), v) => t.set(evalOne(k, env), evalOne(v, env))
        case (None, v)    => t.arr += evalOne(v, env)
      }
      t
    case EUn(op, x) =>
      val v = evalOne(x, env)
      op match {
        case "not" => LBool(!truthy(v))
        case "-" => LNum(-toNum(v).getOrElse(
          throw new LuaError("arith on non-number")))
        case "#" => v match {
          case LStr(s)   => LNum(s.length.toDouble)
          case t: LTable => LNum(t.arr.length.toDouble)
          case _ => throw new LuaError("length of non-table/string")
        }
        case other => throw new LuaError(s"bad unop $other")
      }
    case EBin(op, le, re) => op match {
      case "and" =>
        val l = evalOne(le, env)
        if (!truthy(l)) l else evalOne(re, env)
      case "or" =>
        val l = evalOne(le, env)
        if (truthy(l)) l else evalOne(re, env)
      case ".." =>
        (evalOne(le, env), evalOne(re, env)) match {
          case (a @ (LStr(_) | LNum(_)), b @ (LStr(_) | LNum(_))) =>
            LStr(toStr(a) + toStr(b))
          case (a, b) =>
            throw new LuaError(
              s"cannot concatenate ${toStr(a)} and ${toStr(b)}")
        }
      case "==" => LBool(rawEq(evalOne(le, env), evalOne(re, env)))
      case "~=" => LBool(!rawEq(evalOne(le, env), evalOne(re, env)))
      case "<" | "<=" | ">" | ">=" =>
        val (a, b) = (evalOne(le, env), evalOne(re, env))
        val r = (a, b) match {
          case (LNum(x), LNum(y)) => java.lang.Double.compare(x, y)
          case (LStr(x), LStr(y)) => x.compareTo(y)
          case _ => throw new LuaError("cannot compare mixed types")
        }
        LBool(op match {
          case "<" => r < 0; case "<=" => r <= 0
          case ">" => r > 0; case _ => r >= 0
        })
      case "+" | "-" | "*" | "/" | "%" | "^" =>
        val x = toNum(evalOne(le, env))
          .getOrElse(throw new LuaError("arith on non-number"))
        val y = toNum(evalOne(re, env))
          .getOrElse(throw new LuaError("arith on non-number"))
        LNum(op match {
          case "+" => x + y
          case "-" => x - y
          case "*" => x * y
          case "/" => x / y
          case "%" => x - math.floor(x / y) * y // Lua modulo
          case _   => math.pow(x, y)
        })
      case other => throw new LuaError(s"bad binop $other")
    }
    case other => throw new LuaError(s"unexpected expr $other")
  }

  private def rawEq(a: LV, b: LV): Boolean = (a, b) match {
    case (LNum(x), LNum(y))   => x == y
    case (LStr(x), LStr(y))   => x == y
    case (LBool(x), LBool(y)) => x == y
    case (LNil, LNil)         => true
    case (x: LTable, y: LTable) => x eq y
    case _                    => a == b
  }

  // ------------------------------------------------------ Lua patterns

  /** Lua 5.1 pattern matching (reference-manual semantics): character
    * classes (%a %c %d %l %p %s %u %w %x + complements), sets, `.`,
    * quantifiers `* + - ?`, anchors `^`/`$`, captures, position capture
    * `()`. `%b`/`%f` are not supported. Returns (start0, end0,
    * captures) with 0-based [start, end). */
  private[operators] object Pattern {
    private def classMatch(c: Char, cl: Char): Boolean = {
      val r = cl.toLower match {
        case 'a' => c.isLetter
        case 'c' => c.isControl
        case 'd' => c.isDigit
        case 'l' => c.isLower
        case 'p' => !c.isLetterOrDigit && !c.isWhitespace && c > 32 || "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".indexOf(c) >= 0
        case 's' => c.isWhitespace
        case 'u' => c.isUpper
        case 'w' => c.isLetterOrDigit
        case 'x' => c.isDigit || ('a' <= c.toLower && c.toLower <= 'f')
        case other => return c == other // escaped literal
      }
      if (cl.isUpper) !r else r
    }

    /** Does s(si) match the single pattern item starting at pat(pi)?
      * Returns the width of the item in the pattern. */
    private def itemWidth(pat: String, pi: Int): Int = pat(pi) match {
      case '%' =>
        if (pi + 1 >= pat.length) throw new LuaError("malformed pattern")
        2
      case '[' =>
        var j = pi + 1
        if (j < pat.length && pat(j) == '^') j += 1
        if (j < pat.length && pat(j) == ']') j += 1 // first ] is literal
        while (j < pat.length && pat(j) != ']') {
          if (pat(j) == '%') j += 1
          j += 1
        }
        if (j >= pat.length) throw new LuaError("malformed set")
        j - pi + 1
      case _ => 1
    }

    private def single(s: String, si: Int, pat: String, pi: Int,
        w: Int): Boolean = {
      if (si >= s.length) return false
      val c = s(si)
      pat(pi) match {
        case '.' => true
        case '%' => classMatch(c, pat(pi + 1))
        case '[' =>
          var j = pi + 1
          var neg = false
          if (pat(j) == '^') { neg = true; j += 1 }
          var found = false
          val end = pi + w - 1
          while (j < end) {
            if (pat(j) == '%' && j + 1 < end) {
              if (classMatch(c, pat(j + 1))) found = true
              j += 2
            } else if (j + 2 < end && pat(j + 1) == '-') {
              if (pat(j) <= c && c <= pat(j + 2)) found = true
              j += 3
            } else {
              if (pat(j) == c) found = true
              j += 1
            }
          }
          found != neg
        case pc => pc == c
      }
    }

    /** match pat(pi..) against s(si..); caps = open/closed captures as
      * (start, len; len = -1 while open). Returns end index or -1. */
    private def doMatch(s: String, si0: Int, pat: String, pi0: Int,
        caps: mutable.ArrayBuffer[(Int, Int)]): Int = {
      var si = si0
      var pi = pi0
      while (true) {
        if (pi >= pat.length) return si
        pat(pi) match {
          case '(' if pi + 1 < pat.length && pat(pi + 1) == ')' =>
            // position capture `()`: captures the 1-based position, not
            // a substring — marked -2 so `)` never closes it and the
            // result layer renders it as a NUMBER (Lua 5.1 manual §5.4.1)
            caps += ((si, -2))
            val r = doMatch(s, si, pat, pi + 2, caps)
            if (r < 0) caps.remove(caps.length - 1)
            return r
          case '(' =>
            caps += ((si, -1))
            val r = doMatch(s, si, pat, pi + 1, caps)
            if (r < 0) caps.remove(caps.length - 1)
            return r
          case ')' =>
            val idx = caps.lastIndexWhere(_._2 == -1)
            if (idx < 0) throw new LuaError("no open capture")
            caps(idx) = (caps(idx)._1, si - caps(idx)._1)
            val r = doMatch(s, si, pat, pi + 1, caps)
            if (r < 0) caps(idx) = (caps(idx)._1, -1)
            return r
          case '$' if pi == pat.length - 1 =>
            return if (si == s.length) si else -1
          case _ =>
            val w = itemWidth(pat, pi)
            val quant =
              if (pi + w < pat.length) pat(pi + w) else ' '
            quant match {
              case '?' =>
                if (single(s, si, pat, pi, w)) {
                  val r = doMatch(s, si + 1, pat, pi + w + 1, caps)
                  if (r >= 0) return r
                }
                pi += w + 1
              case '*' =>
                var count = 0
                while (single(s, si + count, pat, pi, w)) count += 1
                while (count >= 0) {
                  val r = doMatch(s, si + count, pat, pi + w + 1, caps)
                  if (r >= 0) return r
                  count -= 1
                }
                return -1
              case '+' =>
                var count = 0
                while (single(s, si + count, pat, pi, w)) count += 1
                while (count >= 1) {
                  val r = doMatch(s, si + count, pat, pi + w + 1, caps)
                  if (r >= 0) return r
                  count -= 1
                }
                return -1
              case '-' =>
                var k = si
                while (true) {
                  val r = doMatch(s, k, pat, pi + w + 1, caps)
                  if (r >= 0) return r
                  if (single(s, k, pat, pi, w)) k += 1 else return -1
                }
                return -1
              case _ =>
                if (!single(s, si, pat, pi, w)) return -1
                si += 1
                pi += w
            }
        }
      }
      -1
    }

    /** Captures come back as Lua VALUES: position captures `()` are
      * numbers (1-based), substring captures are strings — the caller
      * (find/match/gmatch/gsub) passes them through unconverted. */
    def find(s: String, pat0: String, init0: Int)
        : Option[(Int, Int, Seq[LV])] = {
      val anchored = pat0.nonEmpty && pat0(0) == '^'
      val pat = if (anchored) pat0.substring(1) else pat0
      var start = math.max(0, init0)
      while (start <= s.length) {
        val caps = mutable.ArrayBuffer.empty[(Int, Int)]
        val e = doMatch(s, start, pat, 0, caps)
        if (e >= 0) {
          val capVals: Seq[LV] = caps.toSeq.map { case (cs, cl) =>
            if (cl == -2) LNum(cs + 1.0) // position capture
            else if (cl == -1) throw new LuaError("unfinished capture")
            else LStr(s.substring(cs, cs + cl))
          }
          return Some((start, e, capVals))
        }
        if (anchored) return None
        start += 1
      }
      None
    }
  }

  // ------------------------------------------------------------ stdlib

  private def arg(args: Seq[LV], i: Int): LV =
    if (i < args.length) args(i) else LNil
  private def argStr(args: Seq[LV], i: Int, who: String): String =
    arg(args, i) match {
      case LStr(s) => s
      case LNum(d) => toStr(LNum(d))
      case other => throw new LuaError(
        s"$who: string expected, got ${toStr(other)}")
    }
  private def argInt(args: Seq[LV], i: Int, dflt: Int): Int =
    arg(args, i) match {
      case LNum(d) => d.toInt
      case LStr(s) => s.trim.toDoubleOption.map(_.toInt).getOrElse(dflt)
      case _       => dflt
    }

  private lazy val stringLib: Map[String, LBuiltin] = Map(
    "len" -> LBuiltin("len",
      a => Seq(LNum(argStr(a, 0, "len").length.toDouble))),
    "lower" -> LBuiltin("lower",
      a => Seq(LStr(argStr(a, 0, "lower").toLowerCase))),
    "upper" -> LBuiltin("upper",
      a => Seq(LStr(argStr(a, 0, "upper").toUpperCase))),
    "reverse" -> LBuiltin("reverse",
      a => Seq(LStr(argStr(a, 0, "reverse").reverse))),
    "rep" -> LBuiltin("rep",
      a => Seq(LStr(argStr(a, 0, "rep") * math.max(0, argInt(a, 1, 0))))),
    "byte" -> LBuiltin("byte", a => {
      val s = argStr(a, 0, "byte")
      val i = argInt(a, 1, 1)
      val idx = if (i < 0) s.length + i else i - 1
      if (idx < 0 || idx >= s.length) Seq.empty
      else Seq(LNum(s(idx).toDouble))
    }),
    "sub" -> LBuiltin("sub", a => {
      val s = argStr(a, 0, "sub")
      def norm(i: Int): Int = if (i < 0) s.length + i + 1 else i
      val i = math.max(1, norm(argInt(a, 1, 1)))
      val j = math.min(s.length, norm(argInt(a, 2, -1)))
      if (i > j) Seq(LStr("")) else Seq(LStr(s.substring(i - 1, j)))
    }),
    "find" -> LBuiltin("find", a => {
      val s = argStr(a, 0, "find")
      val pat = argStr(a, 1, "find")
      val init0 = argInt(a, 2, 1)
      val init = if (init0 < 0) math.max(0, s.length + init0) else init0 - 1
      val plain = truthy(arg(a, 3))
      if (plain) {
        val idx = s.indexOf(pat, init)
        if (idx < 0) Seq(LNil)
        else Seq(LNum(idx + 1.0), LNum(idx + pat.length.toDouble))
      } else Pattern.find(s, pat, init) match {
        case None => Seq(LNil)
        case Some((st, en, caps)) =>
          Seq(LNum(st + 1.0), LNum(en.toDouble)) ++ caps
      }
    }),
    "gmatch" -> LBuiltin("gmatch", a => {
      val s = argStr(a, 0, "gmatch")
      val pat0 = argStr(a, 1, "gmatch")
      // Lua 5.1 gmatch has NO anchor case: its match() loop sees a
      // leading '^' as an ordinary character (lstrlib.c gmatch_aux →
      // match(), whose switch has no '^' arm; the 5.1 manual:
      // "a '^' at the start does not work as an anchor, as this would
      // prevent the iteration"). Escape it so our find() — which DOES
      // anchor for string.find/match — treats it literally too.
      val pat = if (pat0.startsWith("^")) "%" + pat0 else pat0
      var pos = 0
      val iter = LBuiltin("gmatch_iter", _ =>
        if (pos > s.length) Seq(LNil)
        else Pattern.find(s, pat, pos) match {
          case None => pos = s.length + 1; Seq(LNil)
          case Some((st, en, caps)) =>
            pos = if (en > st) en else en + 1 // empty match: step forward
            if (caps.nonEmpty) caps
            else Seq(LStr(s.substring(st, en)))
        })
      Seq(iter)
    }),
    "gsub" -> LBuiltin("gsub", a => {
      val s = argStr(a, 0, "gsub")
      val pat = argStr(a, 1, "gsub")
      val repl = arg(a, 2)
      val maxN = arg(a, 3) match {
        case LNum(d) => d.toInt
        case _       => Int.MaxValue
      }
      // anchored gsub makes at most ONE attempt, at the subject start
      // (Lua 5.1 str_gsub breaks after the first iteration when
      // anchored): gsub("aaa","^a","b") is "baa"/1, never "bbb"/3
      val anchored = pat.nonEmpty && pat(0) == '^'
      val sb = new StringBuilder
      var pos = 0
      var count = 0
      var going = true
      while (going && pos <= s.length && count < maxN) {
        Pattern.find(s, pat, pos) match {
          case None => going = false
          case Some((st, en, caps)) =>
            sb.append(s.substring(pos, st))
            val whole = s.substring(st, en)
            def cap(i: Int): String =
              if (i == 0 || caps.isEmpty) whole
              else if (i <= caps.length) toStr(caps(i - 1))
              else ""
            val replaced: String = repl match {
              case LStr(r) =>
                val rb = new StringBuilder
                var j = 0
                while (j < r.length) {
                  if (r(j) == '%' && j + 1 < r.length) {
                    val c = r(j + 1)
                    if (c.isDigit) rb.append(cap(c - '0'))
                    else rb.append(c)
                    j += 2
                  } else { rb.append(r(j)); j += 1 }
                }
                rb.toString
              case f @ (_: LFunc | _: LBuiltin) =>
                val args =
                  if (caps.nonEmpty) caps else Seq(LStr(whole): LV)
                call(f, args).headOption match {
                  case Some(LStr(x)) => x
                  case Some(n: LNum) => toStr(n)
                  case _             => whole // nil/false keeps the match
                }
              case _ => whole
            }
            sb.append(replaced)
            count += 1
            if (en > st) pos = en
            else { // empty match: copy one char and advance
              if (st < s.length) sb.append(s(st))
              pos = st + 1
            }
        }
        if (anchored) going = false
      }
      if (pos <= s.length) sb.append(s.substring(math.min(pos, s.length)))
      Seq(LStr(sb.toString), LNum(count.toDouble))
    }),
    "match" -> LBuiltin("match", a => {
      val s = argStr(a, 0, "match")
      val pat = argStr(a, 1, "match")
      val init0 = argInt(a, 2, 1)
      val init = if (init0 < 0) math.max(0, s.length + init0) else init0 - 1
      Pattern.find(s, pat, init) match {
        case None => Seq(LNil)
        case Some((st, en, caps)) =>
          if (caps.nonEmpty) caps
          else Seq(LStr(s.substring(st, en)))
      }
    })
  )

  /** Fresh global environment with the stdlib subset. `print` output is
    * swallowed (there is no per-row console in a distributed engine). */
  def stdEnv(): Env = {
    val g = new Env(None)
    g.declare("print", LBuiltin("print", _ => Seq.empty))
    g.declare("tostring", LBuiltin("tostring",
      a => Seq(LStr(toStr(arg(a, 0))))))
    g.declare("tonumber", LBuiltin("tonumber", a =>
      Seq(toNum(arg(a, 0)).map(LNum(_)).getOrElse(LNil))))
    g.declare("type", LBuiltin("type", a => Seq(LStr(arg(a, 0) match {
      case LNil => "nil"; case LBool(_) => "boolean"
      case LNum(_) => "number"; case LStr(_) => "string"
      case _: LTable => "table"; case _: LUser => "userdata"
      case _ => "function"
    }))))
    g.declare("ipairs", LBuiltin("ipairs", a => a.headOption match {
      case Some(t: LTable) =>
        val iter = LBuiltin("ipairs_iter", args => {
          val i = arg(args, 1) match {
            case LNum(d) => d.toInt
            case _       => 0
          }
          if (i < t.arr.length) Seq(LNum(i + 1.0), t.arr(i)) else Seq(LNil)
        })
        Seq(iter, t, LNum(0))
      case _ => throw new LuaError("ipairs: table expected")
    }))
    g.declare("pairs", LBuiltin("pairs", a => a.headOption match {
      case Some(t: LTable) =>
        // snapshot iteration (sequence part first, then hash part) —
        // Lua leaves pairs order unspecified, so any stable order is
        // conforming
        val entries: Seq[(LV, LV)] =
          t.arr.toSeq.zipWithIndex
            .map { case (v, i) => (LNum(i + 1.0): LV, v) } ++
            t.map.toSeq
        var idx = 0
        val iter = LBuiltin("pairs_iter", _ =>
          if (idx < entries.length) {
            val (k, v) = entries(idx); idx += 1; Seq(k, v)
          } else Seq(LNil))
        Seq(iter, t, LNil)
      case _ => throw new LuaError("pairs: table expected")
    }))
    val str = new LTable
    stringLib.foreach { case (k, v) => str.set(LStr(k), v) }
    g.declare("string", str)
    val tbl = new LTable
    tbl.set(LStr("insert"), LBuiltin("insert", a => {
      arg(a, 0) match {
        case t: LTable =>
          if (a.length >= 3) {
            val pos = argInt(a, 1, t.arr.length + 1)
            t.arr.insert(math.max(0, math.min(t.arr.length, pos - 1)),
              arg(a, 2))
          } else t.arr += arg(a, 1)
          Seq.empty
        case _ => throw new LuaError("table.insert: table expected")
      }
    }))
    tbl.set(LStr("remove"), LBuiltin("remove", a => {
      arg(a, 0) match {
        case t: LTable if t.arr.nonEmpty =>
          val pos = argInt(a, 1, t.arr.length)
          if (pos >= 1 && pos <= t.arr.length)
            Seq(t.arr.remove(pos - 1))
          else Seq(LNil)
        case _ => Seq(LNil)
      }
    }))
    g.declare("table", tbl)
    g
  }
}
