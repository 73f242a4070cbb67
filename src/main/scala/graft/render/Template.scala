package graft.render

import scala.util.matching.Regex

/** Minimal Jinja-subset renderer — the template surface dbt models
  * actually exercise at run time (see SURVEY.md §7.4): `{{ ref() }}`,
  * `{{ source() }}`, `{{ this }}`, `{{ var() }}`,
  * `{% if is_incremental() %}...[{% else %}...]{% endif %}`, and
  * parse-time `{{ config(...) }}` extraction. Mirrors the reference's
  * fast static-extraction path (`dbt_extractor`,
  * `core/dbt/parser/models.py:27,385-405`) rather than full Jinja —
  * full Jinja parity is explicitly out of scope (SURVEY §7 risk 3).
  */
object Template {

  /** `ref('m')` or pinned `ref('m', v=2)` / `ref('m', version=2)`
    * (reference versioned-ref syntax) — pinned refs pass the spec
    * `m.v2` to the resolver. */
  private val refRe: Regex =
    """\{\{\s*ref\(\s*['"]([^'"]+)['"]\s*(?:,\s*(?:v|version)\s*=\s*(\d+)\s*)?\)\s*\}\}""".r

  private def refSpec(m: Regex.Match): String =
    m.group(1) + Option(m.group(2)).map(v => s".v$v").getOrElse("")
  private val sourceRe: Regex =
    """\{\{\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val thisRe: Regex = """\{\{\s*this\s*\}\}""".r
  private val varRe: Regex =
    """\{\{\s*var\(\s*['"]([^'"]+)['"]\s*(?:,\s*['"]?([^'")]*)['"]?)?\s*\)\s*\}\}""".r
  private val configRe: Regex =
    """(?s)\{\{\s*config\s*\((.*?)\)\s*\}\}""".r
  private val ifIncrRe: Regex =
    """(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)(?:\{%\s*else\s*%\}(.*?))?\{%\s*endif\s*%\}""".r

  /** A25/A16 macro subset: `{% macro name(a, b='x') %}body{% endmacro %}`.
    * Bodies are SQL text whose `{{ param }}` placeholders bind at
    * invocation (reference macro blocks,
    * `core/dbt/clients/jinja.py:191-210`; run-operation
    * `core/dbt/task/run_operation.py`).
    */
  final case class MacroDef(
      name: String,
      params: Seq[(String, Option[String])], // (name, default)
      body: String)

  private val macroRe: Regex =
    """(?s)\{%\s*macro\s+(\w+)\s*\((.*?)\)\s*%\}(.*?)\{%\s*endmacro\s*%\}""".r

  def extractMacros(text: String): Seq[MacroDef] =
    macroRe.findAllMatchIn(text).map { m =>
      val params = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { p =>
        p.split("=", 2) match {
          case Array(n, d) => n.trim -> Some(d.trim.stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\""))
          case Array(n) => n.trim -> None
        }
      }
      MacroDef(m.group(1), params, m.group(3).trim)
    }.toSeq

  /** A16 `{% call statement('name', fetch_result=true) %}sql{% endcall %}`
    * blocks (reference statement call blocks,
    * `core/dbt/clients/jinja.py` + the adapters' `statement` macro):
    * the inner SQL executes against the warehouse and its result lands
    * in the named result slot, so a later statement in the same macro
    * body can read `{{ load_result('name').rows_affected }}`.
    */
  sealed trait MacroSegment
  final case class CallStatement(slot: String, fetchResult: Boolean,
      sql: String) extends MacroSegment
  final case class SqlText(sql: String) extends MacroSegment

  private val callStatementRe: Regex =
    ("""(?s)\{%\s*call\s+statement\(\s*['"]([^'"]+)['"]\s*""" +
      """(?:,\s*fetch_result\s*=\s*(?i:(true|false))\s*)?""" +
      """(?:,\s*auto_begin\s*=\s*(?i:true|false)\s*)?\)\s*%\}""" +
      """(.*?)\{%\s*endcall\s*%\}""").r

  /** Split a macro body into an ordered sequence of call-statement
    * blocks and plain SQL text between them. Plain segments keep their
    * own `;`-separated multi-statement semantics.
    */
  def segmentMacroBody(body: String): Seq[MacroSegment] = {
    val out = scala.collection.mutable.ArrayBuffer[MacroSegment]()
    var last = 0
    for (m <- callStatementRe.findAllMatchIn(body)) {
      val before = body.substring(last, m.start).trim
      if (before.nonEmpty) out += SqlText(before)
      out += CallStatement(m.group(1),
        Option(m.group(2)).exists(_.equalsIgnoreCase("true")),
        m.group(3).trim)
      last = m.end
    }
    val tail = body.substring(last).trim
    if (tail.nonEmpty) out += SqlText(tail)
    out.toSeq
  }

  /** Bind invocation args into a macro body: params become vars-style
    * `{{ name }}` substitutions; unknown args and missing required
    * params are errors (reference kwargs validation).
    */
  def bindMacro(m: MacroDef, args: Map[String, String]): String = {
    val unknown = args.keySet -- m.params.map(_._1).toSet
    require(unknown.isEmpty, s"macro ${m.name}: unknown args ${unknown.mkString(",")}")
    val bound = m.params.map { case (n, dflt) =>
      n -> args.getOrElse(n, dflt.getOrElse(
        throw new IllegalArgumentException(s"macro ${m.name}: missing arg $n")))
    }
    bound.foldLeft(m.body) { case (sql, (n, v)) =>
      sql.replaceAll(s"""\\{\\{\\s*$n\\s*\\}\\}""", Regex.quoteReplacement(v))
    }
  }

  /** Parse-time: every `ref(...)` as a spec — `x` or `x.v2`. */
  def extractRefs(sql: String): Seq[String] =
    refRe.findAllMatchIn(sql).map(refSpec).toSeq.distinct

  /** Parse-time: every `source('a','b')` pair. */
  def extractSources(sql: String): Seq[(String, String)] =
    sourceRe.findAllMatchIn(sql).map(m => (m.group(1), m.group(2))).toSeq.distinct

  /** Parse-time: `{{ config(...) }}` kwargs, and the SQL with the
    * config call removed. Values keep their literal text (quotes
    * stripped); list values become comma-joined.
    */
  def extractConfig(sql: String): (Map[String, String], String) = {
    val kwargs = configRe.findFirstMatchIn(sql)
      .map(m => parseKwargs(m.group(1)))
      .getOrElse(Map.empty)
    (kwargs, configRe.replaceAllIn(sql, ""))
  }

  /** Tiny kwargs parser: `k='v', k2=123, k3=true, k4=['a','b']`. */
  private[render] def parseKwargs(s: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    while (i < s.length) {
      skipWs()
      val keyStart = i
      while (i < s.length && s(i) != '=') i += 1
      if (i >= s.length) return out.toMap
      val key = s.substring(keyStart, i).trim
      i += 1 // '='
      skipWs()
      val value = new StringBuilder
      if (i < s.length && (s(i) == '\'' || s(i) == '"')) {
        val q = s(i); i += 1
        while (i < s.length && s(i) != q) { value += s(i); i += 1 }
        i += 1
      } else if (i < s.length && s(i) == '[') {
        i += 1
        val items = scala.collection.mutable.ArrayBuffer[String]()
        while (i < s.length && s(i) != ']') {
          skipWs()
          if (s(i) == '\'' || s(i) == '"') {
            val q = s(i); i += 1
            val item = new StringBuilder
            while (i < s.length && s(i) != q) { item += s(i); i += 1 }
            i += 1
            items += item.toString
          } else if (s(i) == ',') i += 1
          else i += 1
        }
        i += 1
        value ++= items.mkString(",")
      } else {
        while (i < s.length && s(i) != ',') { value += s(i); i += 1 }
      }
      out(key) = value.toString.trim
      skipWs()
      if (i < s.length && s(i) == ',') i += 1
    }
    out.toMap
  }

  /** Runtime render context (reference `RuntimeRefResolver`,
    * `core/dbt/context/providers.py:498-583`).
    */
  final case class Context(
      resolveRef: String => String,
      resolveSource: (String, String) => String,
      thisRelation: String,
      vars: Map[String, String] = Map.empty,
      isIncremental: Boolean = false,
      /** context builtins (A26 subset): run_started_at, invocation_id,
        * target.name … — substituted as `{{ name }}`.
        */
      builtins: Map[String, String] = Map.empty,
      /** A27 result slots: `{{ load_result('main').rows_affected }}` —
        * slot → field → value (reference `store_result`/`load_result`,
        * `core/dbt/context/providers.py:859-981`).
        */
      results: Map[String, Map[String, String]] = Map.empty,
      /** env_var values that shadow the process environment (unit-test
        * overrides, A13).
        */
      envOverrides: Map[String, String] = Map.empty)

  /** `{% set name = <expr> %}` — literals, context calls, and `~`
    * concatenation. Non-literal pieces re-wrap as `{{ piece }}` so the
    * normal render passes (ref/source/var/env_var/builtins/…) resolve
    * them; Jinja string concatenation is exactly textual adjacency
    * once each piece renders. Query-valued sets remain out of scope
    * with the rest of full Jinja (SURVEY §7.4). A later `set` of the
    * same name wins, matching reassignment semantics.
    */
  private val setRe: Regex =
    """\{%\s*set\s+(\w+)\s*=\s*(.+?)\s*%\}""".r

  /** One set RHS → replacement text: split on top-level `~`, inline
    * literal pieces, mustache-wrap everything else.
    */
  private def setReplacement(rhs: String): String = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var q: Char = 0
    rhs.foreach { ch =>
      if (q != 0) { cur += ch; if (ch == q) q = 0 }
      else if (ch == '\'' || ch == '"') { q = ch; cur += ch }
      else if (ch == '~') { pieces += cur.toString; cur.clear() }
      else cur += ch
    }
    pieces += cur.toString
    pieces.map(_.trim).map { p =>
      if (p.length >= 2 &&
          ((p.head == '\'' && p.last == '\'') ||
            (p.head == '"' && p.last == '"')))
        p.substring(1, p.length - 1)
      else if (p.matches("""[-\d.]+""")) p
      else s"{{ $p }}"
    }.mkString
  }

  /** A25 `{% for %}` subset — the SQL-generation loop dbt models use
    * for pivot columns and shard unions (reference compiled-SQL loops;
    * full Jinja stays out of scope, SURVEY §7.4):
    * `{% for x in ['a', 'b', 2] %}…{{ x }}…{% endfor %}` and
    * `{% for x in var('xs') %}` (vars hold comma-joined lists). Inside
    * the body: `{{ x }}`, `{{ loop.index }}`/`{{ loop.index0 }}`, and
    * separator conditionals `{% if not loop.last %},{% endif %}` /
    * `{% if loop.first %}…{% endif %}` / `{% if loop.last %}…{% endif %}`.
    * Loops do not nest (single pass, like the rest of the renderer).
    */
  private val forRe: Regex =
    ("""(?s)\{%\s*for\s+(\w+)\s+in\s+""" +
      """(\[[^\]]*\]|var\(\s*['"][^'"]+['"]\s*\))\s*%\}""" +
      """(.*?)\{%\s*endfor\s*%\}""").r
  private val forVarRe: Regex = """var\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val loopCondRe: Regex =
    """(?s)\{%\s*if\s+(not\s+)?loop\.(first|last)\s*%\}(.*?)\{%\s*endif\s*%\}""".r

  private def parseListItems(src: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < src.length) {
      val ch = src(i)
      if (ch == '\'' || ch == '"') {
        val q = ch; i += 1
        val sb = new StringBuilder
        while (i < src.length && src(i) != q) { sb += src(i); i += 1 }
        i += 1
        out += sb.toString
      } else if (ch == ',' || ch.isWhitespace) i += 1
      else {
        val sb = new StringBuilder
        while (i < src.length && src(i) != ',') { sb += src(i); i += 1 }
        val bare = sb.toString.trim
        if (bare.nonEmpty) out += bare
      }
    }
    out.toSeq
  }

  private def expandFor(out: String, ctx: Context): String =
    forRe.replaceAllIn(out, m => {
      val (v, listSrc, body) = (m.group(1), m.group(2), m.group(3))
      val items =
        if (listSrc.startsWith("[")) parseListItems(listSrc.substring(1, listSrc.length - 1))
        else {
          val name = forVarRe.findFirstMatchIn(listSrc).get.group(1)
          ctx.vars.getOrElse(name,
            throw new IllegalArgumentException(s"for-loop var: undefined var $name"))
            .split(",").map(_.trim).toSeq
        }
      val expanded = items.zipWithIndex.map { case (item, idx) =>
        val (first, last) = (idx == 0, idx == items.length - 1)
        var b = body
        b = loopCondRe.replaceAllIn(b, mm => {
          val actual = if (mm.group(2) == "first") first else last
          val keep = if (mm.group(1) == null) actual else !actual
          Regex.quoteReplacement(if (keep) mm.group(3) else "")
        })
        b = b.replaceAll("""\{\{\s*""" + v + """\s*\}\}""",
          Regex.quoteReplacement(item))
        b = b.replaceAll("""\{\{\s*loop\.index\s*\}\}""", (idx + 1).toString)
        b = b.replaceAll("""\{\{\s*loop\.index0\s*\}\}""", idx.toString)
        b
      }
      Regex.quoteReplacement(expanded.mkString)
    })

  private val builtinRe: Regex =
    """\{\{\s*([a-z_][a-z0-9_.]*)\s*\}\}""".r
  private val loadResultRe: Regex =
    """\{\{\s*load_result\(\s*['"]([^'"]+)['"]\s*\)\.([a-z_]+)\s*\}\}""".r
  private val envVarRe: Regex =
    """\{\{\s*env_var\(\s*['"]([^'"]+)['"]\s*(?:,\s*['"]([^'"]*)['"])?\s*\)\s*\}\}""".r
  private val localMd5Re: Regex =
    """\{\{\s*local_md5\(\s*['"]([^'"]*)['"]\s*\)\s*\}\}""".r
  private val logRe: Regex =
    """\{\{\s*(?:log|print)\(\s*['"]([^'"]*)['"][^)]*\)\s*\}\}""".r

  /** Render a model body to executable Spark SQL. */
  def render(sql: String, ctx: Context): String = {
    var out = configRe.replaceAllIn(sql, "")
    // document order matters: a later RHS may reference an earlier set
    // variable, and a later set of the same name wins
    val orderedSets = setRe.findAllMatchIn(out)
      .map(m => m.group(1) -> m.group(2)).toSeq
    out = setRe.replaceAllIn(out, "")
    val bindings = scala.collection.mutable.LinkedHashMap.empty[String, String]
    orderedSets.foreach { case (n, rhs) =>
      var rep = setReplacement(rhs)
      bindings.foreach { case (pn, pv) =>
        rep = rep.replaceAll("""\{\{\s*""" + pn + """\s*\}\}""",
          Regex.quoteReplacement(pv))
      }
      bindings(n) = rep
    }
    bindings.foreach { case (n, v) =>
      out = out.replaceAll("""\{\{\s*""" + n + """\s*\}\}""",
        Regex.quoteReplacement(v))
    }
    out = expandFor(out, ctx)
    out = ifIncrRe.replaceAllIn(out, m => {
      val branch =
        if (ctx.isIncremental) m.group(1)
        else Option(m.group(2)).getOrElse("")
      Regex.quoteReplacement(branch)
    })
    out = refRe.replaceAllIn(out, m =>
      Regex.quoteReplacement(ctx.resolveRef(refSpec(m))))
    out = sourceRe.replaceAllIn(out, m =>
      Regex.quoteReplacement(ctx.resolveSource(m.group(1), m.group(2))))
    out = thisRe.replaceAllIn(out, Regex.quoteReplacement(ctx.thisRelation))
    out = varRe.replaceAllIn(out, m => {
      val name = m.group(1)
      val dflt = Option(m.group(2))
      Regex.quoteReplacement(
        ctx.vars.get(name).orElse(dflt).getOrElse(
          throw new IllegalArgumentException(s"undefined var: $name")))
    })
    // A26 function-style builtins (reference `core/dbt/context/base.py`)
    out = envVarRe.replaceAllIn(out, m => {
      val v = ctx.envOverrides.get(m.group(1))
        .orElse(sys.env.get(m.group(1)))
        .orElse(Option(m.group(2))).getOrElse(
          throw new IllegalArgumentException(s"env_var ${m.group(1)} is undefined"))
      Regex.quoteReplacement(v)
    })
    out = localMd5Re.replaceAllIn(out, m => Regex.quoteReplacement(
      java.security.MessageDigest.getInstance("MD5")
        .digest(m.group(1).getBytes("UTF-8")).map("%02x".format(_)).mkString))
    out = logRe.replaceAllIn(out, m => { System.err.println(s"[graft] ${m.group(1)}"); "" })
    out = loadResultRe.replaceAllIn(out, m => {
      val (slot, field) = (m.group(1), m.group(2))
      val v = ctx.results.get(slot).flatMap(_.get(field)).getOrElse(
        throw new IllegalArgumentException(
          s"load_result('$slot').$field: no such result slot/field"))
      Regex.quoteReplacement(v)
    })
    if (ctx.builtins.nonEmpty)
      out = builtinRe.replaceAllIn(out, m =>
        ctx.builtins.get(m.group(1))
          .map(Regex.quoteReplacement)
          .getOrElse(Regex.quoteReplacement(m.matched)))
    out.trim
  }
}
