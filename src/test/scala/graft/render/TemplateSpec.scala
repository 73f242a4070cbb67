package graft.render

import org.scalatest.funsuite.AnyFunSuite

class TemplateSpec extends AnyFunSuite {

  private val ctx = Template.Context(
    resolveRef = n => s"rel_$n",
    resolveSource = (a, b) => s"src_${a}_$b",
    thisRelation = "this_table",
    vars = Map("start" -> "2020-01-01"))

  test("ref and source resolution") {
    assert(Template.render("SELECT * FROM {{ ref('stg') }} JOIN {{ source('main', 'orders') }}", ctx)
      === "SELECT * FROM rel_stg JOIN src_main_orders")
  }

  test("this and var with default") {
    assert(Template.render("DELETE FROM {{ this }} WHERE d > '{{ var('start') }}'", ctx)
      === "DELETE FROM this_table WHERE d > '2020-01-01'")
    assert(Template.render("{{ var('missing', 'dflt') }}", ctx) === "dflt")
    assertThrows[IllegalArgumentException](Template.render("{{ var('nope') }}", ctx))
  }

  test("is_incremental branches") {
    val sql = "SELECT * FROM t {% if is_incremental() %}WHERE ts > (SELECT max(ts) FROM {{ this }}){% endif %}"
    assert(Template.render(sql, ctx) === "SELECT * FROM t")
    assert(Template.render(sql, ctx.copy(isIncremental = true))
      === "SELECT * FROM t WHERE ts > (SELECT max(ts) FROM this_table)")
  }

  test("if/else branches") {
    val sql = "SELECT {% if is_incremental() %}1{% else %}2{% endif %} AS x"
    assert(Template.render(sql, ctx) === "SELECT 2 AS x")
    assert(Template.render(sql, ctx.copy(isIncremental = true)) === "SELECT 1 AS x")
  }

  test("config extraction and removal") {
    val sql = "{{ config(materialized='incremental', unique_key='id', tags=['a','b'], full_refresh=true) }}\nSELECT 1"
    val (kw, rest) = Template.extractConfig(sql)
    // list values join on u0001 (items may contain commas — hook SQL)
    assert(kw === Map("materialized" -> "incremental", "unique_key" -> "id",
      "tags" -> "a\u0001b", "full_refresh" -> "true"))
    assert(rest.trim === "SELECT 1")
    assert(Template.render(sql, ctx) === "SELECT 1")
  }

  test("extract refs and sources at parse time") {
    val sql = "SELECT * FROM {{ ref('a') }}, {{ ref(\"b\") }}, {{ source('s', 't') }}, {{ ref('a') }}"
    assert(Template.extractRefs(sql) === Seq("a", "b"))
    assert(Template.extractSources(sql) === Seq(("s", "t")))
  }

  test("macro extraction and arg binding") {
    val text =
      """{% macro grant_select(rel, role='reader') %}
        |GRANT SELECT ON {{ rel }} TO {{ role }}
        |{% endmacro %}
        |{% macro vacuum(rel) %}VACUUM {{ rel }}{% endmacro %}""".stripMargin
    val ms = Template.extractMacros(text)
    assert(ms.map(_.name) === Seq("grant_select", "vacuum"))
    assert(ms.head.params === Seq("rel" -> None, "role" -> Some("reader")))
    assert(Template.bindMacro(ms.head, Map("rel" -> "t1")) ===
      "GRANT SELECT ON t1 TO reader")
    assert(Template.bindMacro(ms.head, Map("rel" -> "t1", "role" -> "admin")) ===
      "GRANT SELECT ON t1 TO admin")
    assertThrows[IllegalArgumentException](Template.bindMacro(ms.head, Map.empty))
    assertThrows[IllegalArgumentException](
      Template.bindMacro(ms.head, Map("rel" -> "t1", "nope" -> "x")))
  }

  test("env_var, local_md5 and log builtins") {
    assert(Template.render("SELECT '{{ env_var('GRAFT_NO_SUCH', 'fallback') }}'", ctx)
      === "SELECT 'fallback'")
    assertThrows[IllegalArgumentException](
      Template.render("{{ env_var('GRAFT_NO_SUCH') }}", ctx))
    val home = sys.env("HOME")
    assert(Template.render("{{ env_var('HOME') }}", ctx) === home)
    assert(Template.render("SELECT '{{ local_md5('abc') }}'", ctx)
      === "SELECT '900150983cd24fb0d6963f7d28e17f72'")
    assert(Template.render("SELECT 1 {{ log('building', info=true) }}", ctx)
      === "SELECT 1")
  }

  test("set: literal assignments substitute downstream, reassignment wins") {
    assert(Template.render(
      "{% set status = 'O' %}SELECT * FROM t WHERE s = '{{ status }}'", ctx)
      === "SELECT * FROM t WHERE s = 'O'")
    assert(Template.render(
      "{% set lim = 10 %}SELECT * FROM t LIMIT {{ lim }}", ctx)
      === "SELECT * FROM t LIMIT 10")
    // later set of the same name wins
    assert(Template.render(
      "{% set x = 'a' %}{% set x = \"b\" %}SELECT '{{ x }}'", ctx)
      === "SELECT 'b'")
  }

  test("set: expression RHS — context calls, concatenation, chaining") {
    // var() call as RHS resolves through the normal var pass
    assert(Template.render(
      "{% set d = var('start') %}SELECT * FROM t WHERE d > '{{ d }}'", ctx)
      === "SELECT * FROM t WHERE d > '2020-01-01'")
    // ref() as RHS resolves to the relation name
    assert(Template.render(
      "{% set rel = ref('stg') %}SELECT * FROM {{ rel }}", ctx)
      === "SELECT * FROM rel_stg")
    // ~ concatenation: literal and call pieces splice adjacently
    assert(Template.render(
      "{% set tbl = 'pre_' ~ var('start') ~ '_post' %}SELECT '{{ tbl }}'", ctx)
      === "SELECT 'pre_2020-01-01_post'")
    // a later set may reference an earlier one
    assert(Template.render(
      "{% set a = 'x' %}{% set b = a ~ 'y' %}SELECT '{{ b }}'", ctx)
      === "SELECT 'xy'")
    // this as RHS
    assert(Template.render(
      "{% set t = this %}DELETE FROM {{ t }}", ctx)
      === "DELETE FROM this_table")
  }

  test("for-loop expands literal lists with separator conditionals") {
    val sql =
      "SELECT {% for c in ['a', 'b', 'c'] %}sum({{ c }}) AS {{ c }}_sum{% if not loop.last %}, {% endif %}{% endfor %} FROM t"
    assert(Template.render(sql, ctx)
      === "SELECT sum(a) AS a_sum, sum(b) AS b_sum, sum(c) AS c_sum FROM t")
  }

  test("for-loop: loop.index / loop.first / loop.last and shard unions") {
    val sql =
      "{% for s in [0, 1] %}{% if not loop.first %} UNION ALL {% endif %}SELECT {{ loop.index0 }} AS shard FROM t_{{ s }}{% endfor %}"
    assert(Template.render(sql, ctx)
      === "SELECT 0 AS shard FROM t_0 UNION ALL SELECT 1 AS shard FROM t_1")
    assert(Template.render(
      "{% for x in ['p'] %}{{ loop.index }}:{{ x }}{% if loop.last %}!{% endif %}{% endfor %}", ctx)
      === "1:p!")
  }

  test("for-loop iterates a var()-held comma list; body passes still render") {
    val c = ctx.copy(vars = ctx.vars + ("cols" -> "x,y"))
    assert(Template.render(
      "{% for c in var('cols') %}{{ c }}@{{ var('start') }};{% endfor %}", c)
      === "x@2020-01-01;y@2020-01-01;")
    assertThrows[IllegalArgumentException](
      Template.render("{% for c in var('nope') %}{{ c }}{% endfor %}", ctx))
  }

  test("for-loop body can reference set vars and refs") {
    assert(Template.render(
      "{% set pre = 'col_' %}{% for c in ['a'] %}{{ pre }}{{ c }} FROM {{ ref('m') }}{% endfor %}", ctx)
      === "col_a FROM rel_m")
  }

  test("load_result renders slot fields and errors on unknown slots") {
    val c = ctx.copy(results = Map("main" -> Map("rows_affected" -> "42")))
    assert(Template.render(
      "SELECT {{ load_result('main').rows_affected }} AS n", c) === "SELECT 42 AS n")
    assertThrows[IllegalArgumentException](
      Template.render("SELECT {{ load_result('other').rows_affected }}", c))
  }

  test("secret env vars: profiles/packages only, placeholder indirection, masking") {
    // reference SECRET_ENV_PREFIX semantics: base.py:311-312 (location
    // error), secret.py:22-33 (placeholder), renderer.py:204-216
    // (post-render substitution), base.py:571-579 (log masking)
    Secrets.envSeam = Map("DBT_ENV_SECRET_TOKEN" -> "hunter2")
    try {
      // (1) model/macro context: hard error naming the var
      val e = intercept[IllegalArgumentException] {
        Template.render("{{ env_var('DBT_ENV_SECRET_TOKEN') }}", ctx)
      }
      assert(e.getMessage.contains(
        "Secret env vars are allowed only in profiles.yml or packages.yml"))
      assert(e.getMessage.contains("DBT_ENV_SECRET_TOKEN"))
      assert(!e.getMessage.contains("hunter2"))
      // (2) secret context: the RENDER sees only the placeholder —
      // a filter cannot capture or transform the value...
      val sctx = ctx.copy(secretContext = true)
      val rendered = Template.render(
        "token={{ env_var('DBT_ENV_SECRET_TOKEN') }}", sctx)
      assert(!rendered.contains("hunter2"))
      assert(rendered.contains("DBT_SECRET_START"))
      // ...and substitution resolves it after the render
      assert(Secrets.substitute(rendered) === "token=hunter2")
      // the full config-value path (what profiles/packages use)
      assert(Secrets.renderConfigValue(
        "pre_{{ env_var('DBT_ENV_SECRET_TOKEN') }}") === "pre_hunter2")
      // an upper filter manipulating the placeholder still never
      // exposes the value (jinja2 only sees the opaque tag)
      val filtered = Template.render(
        "{{ env_var('DBT_ENV_SECRET_TOKEN') | replace('hunter', 'x') }}", sctx)
      assert(!filtered.contains("hunter2"))
      // non-secret env vars are untouched by the secret machinery
      assert(Template.render("{{ env_var('GRAFT_NOT_SET', 'dflt') }}", ctx)
        === "dflt")
      // unset secret: default applies in secret contexts, named error otherwise
      assert(Template.render(
        "{{ env_var('DBT_ENV_SECRET_MISSING', 'd') }}", sctx) === "d")
      // (3) masking: scrub removes both raw values and placeholders
      assert(Secrets.scrub("select 'hunter2' as pw") === "select '*****' as pw")
      assert(Secrets.scrub("x=" + Secrets.placeholder("DBT_ENV_SECRET_TOKEN"))
        === "x=*****")
      // ...and EventLog lines pass through scrub on both formats
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      val (pf, ps, pl) = (graft.run.EventLog.format,
        graft.run.EventLog.sink, graft.run.EventLog.minLevel)
      try {
        graft.run.EventLog.format = "json"
        graft.run.EventLog.minLevel = "info"
        graft.run.EventLog.sink = s => { seen += s; () }
        graft.run.EventLog.info("boom", "msg" -> "failed near 'hunter2' token")
        graft.run.EventLog.format = "text"
        graft.run.EventLog.info("boom", "msg" -> "again hunter2")
      } finally {
        graft.run.EventLog.format = pf
        graft.run.EventLog.sink = ps
        graft.run.EventLog.minLevel = pl
      }
      assert(seen.size === 2)
      assert(seen.forall(!_.contains("hunter2")), seen.mkString("\n"))
      assert(seen.forall(_.contains("*****")))
    } finally Secrets.envSeam = Map.empty
  }
}
