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
    assert(kw === Map("materialized" -> "incremental", "unique_key" -> "id",
      "tags" -> "a,b", "full_refresh" -> "true"))
    assert(rest.trim === "SELECT 1")
    assert(Template.render(sql, ctx) === "SELECT 1")
  }

  test("extract refs and sources at parse time") {
    val sql = "SELECT * FROM {{ ref('a') }}, {{ ref(\"b\") }}, {{ source('s', 't') }}, {{ ref('a') }}"
    assert(Template.extractRefs(sql) === Seq("a", "b"))
    assert(Template.extractSources(sql) === Seq(("s", "t")))
  }
}
