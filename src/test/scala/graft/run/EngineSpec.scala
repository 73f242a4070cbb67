package graft.run

import graft.SparkSpec
import graft.core._
import graft.exec.Materializer
import java.nio.file.{Files, Paths}
import graft.render.Jinja

/** End-to-end project runs against a temp warehouse — the equivalent of
  * the reference's tests/functional suites (project fixture + run_dbt +
  * relation assertions, `core/dbt/tests/fixtures/project.py`).
  */
class EngineSpec extends SparkSpec {

  private def writeProject(files: Map[String, String]): String = {
    val dir = Paths.get(tmpDir("graft_proj"))
    files.foreach { case (rel, content) =>
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    dir.toString
  }

  private val sf = "/root/testdata/sf0.001"

  private def baseProject: Map[String, String] = Map(
    "dbt_project.yml" ->
      s"""name: demo
         |vars:
         |  cutoff: '1996-01-01'
         |""".stripMargin,
    "models/sources.yml" ->
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |        loaded_at_field: o_orderdate
         |      - name: customer
         |        path: $sf/customer.parquet
         |""".stripMargin,
    "models/stg_orders.sql" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM {{ source('main', 'orders') }}
        |WHERE o_orderdate >= '{{ var('cutoff') }}'""".stripMargin,
    "models/fct_spend.sql" ->
      """{{ config(materialized='table') }}
        |SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        |FROM {{ ref('stg_orders') }} GROUP BY o_custkey""".stripMargin,
    "models/schema.yml" ->
      """models:
        |  - name: fct_spend
        |    columns:
        |      - name: o_custkey
        |        tests: [unique, not_null]
        |""".stripMargin)

  test("view + table + tests end to end") {
    val eng = Engine.fromProject(spark, writeProject(baseProject), tmpDir("wh"))
    val results = eng.run(threads = 2)
    assert(results.forall(_.status == "success"), results.mkString("\n"))
    assert(eng.wh.isView("stg_orders"))
    assert(!eng.wh.isView("fct_spend"))
    val fct = eng.wh.read("fct_spend")
    assert(fct.count() > 0)
    val testResults = eng.test()
    assert(testResults.nonEmpty && testResults.forall(_.status == "pass"),
      testResults.mkString("\n"))
  }

  test("custom generic tests: {% test %} blocks resolve from schema YAML") {
    // reference `{% test %}` blocks register as macros named test_<name>
    // (clients/jinja.py GENERIC_TEST_KEY); schema YAML refers to them by
    // bare name with kwargs, exactly like the builtins
    val proj = baseProject +
      ("macros/my_tests.sql" ->
        """{% test positive(model, column_name) %}
          |SELECT * FROM {{ model }} WHERE {{ column_name }} <= 0
          |{% endtest %}
          |{% test at_least_rows(model, n=1) %}
          |SELECT c AS too_few FROM
          |  (SELECT COUNT(*) AS c FROM {{ model }}) t
          |WHERE t.c < {{ n }}
          |{% endtest %}""".stripMargin) +
      ("models/schema.yml" ->
        """models:
          |  - name: fct_spend
          |    tests:
          |      - at_least_rows:
          |          n: 3
          |    columns:
          |      - name: spend
          |        tests: [positive]
          |""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    eng.run()
    val res = eng.test()
    assert(res.size == 2, res.mkString("\n"))
    assert(res.forall(_.status == "pass"), res.mkString("\n"))

    // unsatisfiable kwarg → the same custom test must FAIL, proving the
    // kwargs bind into the macro body (not just render to empty SQL)
    val proj2 = proj + ("models/schema.yml" ->
      """models:
        |  - name: fct_spend
        |    tests:
        |      - at_least_rows:
        |          n: 999999
        |""".stripMargin)
    val eng2 = Engine.fromProject(spark, writeProject(proj2), tmpDir("wh"))
    eng2.run()
    val res2 = eng2.test()
    assert(res2.size == 1 && res2.head.status == "fail", res2.mkString("\n"))
  }

  test("profiles.yml: target context binds, schema namespaces, bad target errors") {
    val proj = baseProject +
      ("dbt_project.yml" -> "name: demo\nprofile: demo_profile\n") +
      ("profiles.yml" ->
        """demo_profile:
          |  target: dev
          |  outputs:
          |    dev:
          |      schema: dev_s
          |      threads: 3
          |    prod:
          |      schema: prod_s
          |""".stripMargin) +
      ("models/tgt_probe.sql" ->
        """{{ config(materialized='table') }}
          |SELECT '{{ target.name }}' AS t_name,
          |       '{{ target.schema }}' AS t_schema,
          |       {{ target.threads }} AS t_threads""".stripMargin)
    val dir = writeProject(proj)

    val dev = Engine.fromProject(spark, dir, tmpDir("wh"))
    assert(dev.contextBuiltins("target.name") === "dev")
    assert(dev.namespace === "dev_s")
    dev.run(select = Seq("tgt_probe"))
    val row = dev.wh.read("dev_s__tgt_probe").collect().head
    assert((row.getString(0), row.getString(1), row.getInt(2)) === (("dev", "dev_s", 3)))

    val prod = Engine.fromProject(spark, dir, tmpDir("wh"), target = Some("prod"))
    assert(prod.contextBuiltins("target.name") === "prod")
    assert(prod.contextBuiltins("target.threads") === "4",
      "threads unset in prod output falls back to the default")
    assert(prod.namespace === "prod_s")

    val err = intercept[IllegalArgumentException] {
      Engine.fromProject(spark, dir, tmpDir("wh"), target = Some("staging"))
    }
    assert(err.getMessage.contains("staging"))
  }

  test("profiles.yml: env_var renders; secrets legal HERE but nowhere else") {
    // reference ProfileRenderer/SecretRenderer (config/renderer.py):
    // profiles.yml is one of the two legal DBT_ENV_SECRET_* locations;
    // the same var in a model body is the base.py:311 parse error
    graft.render.Secrets.envSeam = Map("DBT_ENV_SECRET_SCHEMA" -> "sekrit_s")
    try {
      val proj = baseProject +
        ("dbt_project.yml" -> "name: demo\nprofile: demo_profile\n") +
        ("profiles.yml" ->
          """demo_profile:
            |  target: dev
            |  outputs:
            |    dev:
            |      schema: "{{ env_var('DBT_ENV_SECRET_SCHEMA') }}"
            |""".stripMargin)
      val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
      assert(eng.namespace === "sekrit_s")
      // the same env_var in a model body fails loudly at run
      val proj2 = proj +
        ("models/leak.sql" ->
          "SELECT '{{ env_var(\"DBT_ENV_SECRET_SCHEMA\") }}' AS v")
      val eng2 = Engine.fromProject(spark, writeProject(proj2), tmpDir("wh"))
      val res = eng2.run(select = Seq("leak"))
      assert(res.exists(r => r.status == "error" && r.message.contains(
        "Secret env vars are allowed only in profiles.yml or packages.yml")),
        res.mkString("\n"))
      assert(res.forall(!_.message.contains("sekrit_s")),
        "the secret value must never appear in a result message")
    } finally graft.render.Secrets.envSeam = Map.empty
  }

  test("generate_schema_name/alias_name overrides replace built-in naming") {
    val proj = baseProject +
      ("dbt_project.yml" ->
        "name: demo\nprofile: demo_profile\nvars:\n  cutoff: '1996-01-01'\n") +
      ("profiles.yml" ->
        """demo_profile:
          |  outputs:
          |    dev:
          |      schema: dev_s
          |""".stripMargin) +
      ("macros/naming.sql" ->
        // the canonical community override bodies (dbt docs): custom
        // wins bare, else target.schema — and a prefixed alias
        """{% macro generate_schema_name(custom_schema_name, node) %}
          |{% if custom_schema_name is none %}{{ target.schema }}{% else %}{{ custom_schema_name | trim }}{% endif %}
          |{% endmacro %}
          |{% macro generate_alias_name(custom_alias_name, node) %}
          |{% if custom_alias_name is none %}stg_{{ node }}{% else %}{{ custom_alias_name }}{% endif %}
          |{% endmacro %}""".stripMargin) +
      ("models/plain.sql" ->
        "{{ config(materialized='table') }}\nSELECT 1 AS x") +
      ("models/scoped.sql" ->
        "{{ config(materialized='table', schema='mart', alias='fct') }}\nSELECT 2 AS x")
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val byName = eng.manifest.nodes.values.map(n => n.name -> n).toMap
    // no custom schema → target.schema; no alias → stg_<node>
    assert(eng.relationName(byName("plain")) === "dev_s__stg_plain")
    // custom schema replaces (NOT target_schema_custom); alias wins bare
    assert(eng.relationName(byName("scoped")) === "mart__fct")
    eng.run()
    assert(eng.wh.read("dev_s__stg_plain").count() === 1)
    assert(eng.wh.read("mart__fct").count() === 1)
  }

  test("--warn-error promotes warn-severity test results to error") {
    val proj = baseProject +
      ("models/ord_status.sql" ->
        "SELECT o_orderkey, o_orderstatus FROM {{ source('main', 'orders') }}") +
      ("models/schema.yml" ->
        """models:
          |  - name: ord_status
          |    columns:
          |      - name: o_orderstatus
          |        data_tests:
          |          - accepted_values:
          |              values: ['O', 'F']
          |              severity: warn
          |""".stripMargin)
    val dir = writeProject(proj)
    val normal = Engine.fromProject(spark, dir, tmpDir("wh"))
    normal.run()
    val res = normal.test()
    assert(res.map(_.status) === Seq("warn"),
      s"'P' rows exist, severity warn → warn without the flag: ${res.mkString("; ")}")
    val strict = Engine.fromProject(spark, dir, tmpDir("wh"), warnError = true)
    strict.run()
    assert(strict.test().map(_.status) === Seq("error"))
  }

  test("failing test reports fail and failing-rows sql works") {
    val proj = baseProject + ("models/schema.yml" ->
      """models:
        |  - name: fct_spend
        |    columns:
        |      - name: n_orders
        |        tests: [unique]
        |""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    eng.run()
    val testResults = eng.test()
    assert(testResults.exists(_.status == "fail"), testResults.mkString("\n"))
  }

  test("ephemeral models inline as CTEs") {
    val proj = baseProject +
      ("models/stg_orders.sql" ->
        """{{ config(materialized='ephemeral') }}
          |SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
          |FROM {{ source('main', 'orders') }}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val fct = eng.manifest.byName("fct_spend").get
    val sql = eng.compile(fct)
    assert(sql.contains("__dbt__cte__stg_orders"))
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString("\n"))
    assert(!eng.wh.exists("stg_orders")) // never materialized
    assert(eng.wh.read("fct_spend").count() > 0)
  }

  test("incremental merge: two batches equal full rebuild") {
    val whDir = tmpDir("wh")
    val proj = Map(
      "dbt_project.yml" -> "name: incr\n",
      "models/sources.yml" ->
        s"""sources:
           |  - name: main
           |    tables:
           |      - name: orders
           |        path: $sf/orders.parquet
           |""".stripMargin,
      "models/inc_orders.sql" ->
        """{{ config(materialized='incremental', incremental_strategy='merge', unique_key='o_orderkey') }}
          |SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
          |FROM {{ source('main', 'orders') }}
          |{% if is_incremental() %}
          |WHERE o_orderdate > (SELECT max(o_orderdate) FROM {{ this }})
          |{% endif %}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), whDir)
    // batch 1: full build (first run ignores is_incremental branch)
    eng.run()
    val afterFirst = eng.wh.read("inc_orders").count()
    // batch 2: incremental run picks up nothing new (same source) but
    // must keep the table identical
    eng.run()
    val afterSecond = eng.wh.read("inc_orders").count()
    val expected = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(afterFirst === expected)
    assert(afterSecond === expected)
  }

  test("incremental append adds delta commits") {
    val whDir = tmpDir("wh")
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), whDir)
    val base = spark.range(5).select(col("id"), lit("a").as("tag"))
    eng.wh.writeTable("t_app", base)
    eng.wh.appendTable("t_app", spark.range(5, 8).select(col("id"), lit("b").as("tag")))
    assert(eng.wh.read("t_app").count() === 8)
    // replace resets the commit log
    eng.wh.writeTable("t_app", base)
    assert(eng.wh.read("t_app").count() === 5)
  }

  test("snapshot SCD2: timestamp strategy with update, insert, hard delete") {
    val whDir = tmpDir("wh")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    var t = 0L
    val clock: Materializer.Clock = () => { new java.sql.Timestamp(86400000L * (10 + t)) }
    val eng = new Engine(spark, Manifest(Map.empty), whDir, clock = clock)

    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    val day1 = Seq((1L, "alice", ts(1)), (2L, "bob", ts(1)))
      .toDF("id", "name", "updated_at")
    day1.createOrReplaceTempView("snap_src")
    Materializer.snapshot(eng.wh, "snap", "SELECT * FROM snap_src",
      Seq("id"), TimestampStrategy("updated_at"),
      invalidateHardDeletes = true, clock)
    val s1 = eng.wh.read("snap")
    assert(s1.count() === 2)
    assert(s1.filter(col("dbt_valid_to").isNull).count() === 2)

    // day 2: alice renamed (newer ts), bob unchanged, carol inserted
    t = 1
    Seq((1L, "alicia", ts(2)), (2L, "bob", ts(1)), (3L, "carol", ts(2)))
      .toDF("id", "name", "updated_at").createOrReplaceTempView("snap_src")
    Materializer.snapshot(eng.wh, "snap", "SELECT * FROM snap_src",
      Seq("id"), TimestampStrategy("updated_at"),
      invalidateHardDeletes = true, clock)
    val s2 = eng.wh.read("snap")
    assert(s2.count() === 4) // alice closed + alicia open + bob open + carol open
    assert(s2.filter(col("dbt_valid_to").isNull).count() === 3)
    val aliceRows = s2.filter(col("id") === 1).orderBy("dbt_valid_from").collect()
    assert(aliceRows.length === 2)
    assert(aliceRows(0).getAs[java.sql.Timestamp]("dbt_valid_to") === ts(2))
    assert(aliceRows(1).getAs[java.sql.Timestamp]("dbt_valid_to") === null)

    // day 3: bob hard-deleted
    t = 2
    Seq((1L, "alicia", ts(2)), (3L, "carol", ts(2)))
      .toDF("id", "name", "updated_at").createOrReplaceTempView("snap_src")
    Materializer.snapshot(eng.wh, "snap", "SELECT * FROM snap_src",
      Seq("id"), TimestampStrategy("updated_at"),
      invalidateHardDeletes = true, clock)
    val s3 = eng.wh.read("snap")
    assert(s3.filter(col("id") === 2 && col("dbt_valid_to").isNotNull).count() === 1)
    assert(s3.filter(col("dbt_valid_to").isNull).count() === 2)
  }

  test("snapshot schema evolution: new source column widens the table") {
    val whDir = tmpDir("wh")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val clock1: Materializer.Clock = () => new java.sql.Timestamp(1000000000L)
    val eng = new Engine(spark, Manifest(Map.empty), whDir, clock = clock1)
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("se_src")
    Materializer.snapshot(eng.wh, "se_snap", "SELECT * FROM se_src",
      Seq("id"), CheckStrategy(Some(Seq("v"))), invalidateHardDeletes = false, clock1)
    // source gains a column and the row changes
    val clock2: Materializer.Clock = () => new java.sql.Timestamp(2000000000L)
    Seq((1L, "y", 42L)).toDF("id", "v", "extra").createOrReplaceTempView("se_src")
    Materializer.snapshot(eng.wh, "se_snap", "SELECT * FROM se_src",
      Seq("id"), CheckStrategy(Some(Seq("v"))), invalidateHardDeletes = false, clock2)
    val out = eng.wh.read("se_snap")
    assert(out.columns.contains("extra"))
    assert(out.count() === 2)
    val open = out.filter(col("dbt_valid_to").isNull).head()
    assert(open.getAs[String]("v") === "y")
    assert(open.getAs[Long]("extra") === 42L)
    // the historical row has null for the new column
    assert(out.filter(col("dbt_valid_to").isNotNull)
      .select("extra").head().isNullAt(0))
  }

  test("snapshot check strategy detects column changes null-safely") {
    val whDir = tmpDir("wh")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val clock: Materializer.Clock = () => new java.sql.Timestamp(1000000000L)
    val eng = new Engine(spark, Manifest(Map.empty), whDir, clock = clock)
    Seq((1L, Some("x")), (2L, None: Option[String])).toDF("id", "v")
      .createOrReplaceTempView("chk_src")
    Materializer.snapshot(eng.wh, "chk", "SELECT * FROM chk_src",
      Seq("id"), CheckStrategy(Some(Seq("v"))), invalidateHardDeletes = false, clock)
    // change: null -> 'y' must register as a change (null-safe compare)
    val clock2: Materializer.Clock = () => new java.sql.Timestamp(2000000000L)
    Seq((1L, Some("x")), (2L, Some("y"))).toDF("id", "v")
      .createOrReplaceTempView("chk_src")
    Materializer.snapshot(eng.wh, "chk", "SELECT * FROM chk_src",
      Seq("id"), CheckStrategy(Some(Seq("v"))), invalidateHardDeletes = false, clock2)
    val out = eng.wh.read("chk")
    assert(out.count() === 3)
    assert(out.filter(col("id") === 2 && col("dbt_valid_to").isNotNull).count() === 1)
    assert(out.filter(col("id") === 2 && col("dbt_valid_to").isNull)
      .select("v").head().getString(0) === "y")
  }

  test("seed with column_types and delimiter") {
    val whDir = tmpDir("wh")
    val eng = new Engine(spark, Manifest(Map.empty), whDir)
    val node = SeedNode("country_codes",
      "code|name|pop\nUS|United States|331\nDE|Germany|83\n",
      delimiter = "|", columnTypes = Map("pop" -> "bigint"))
    Materializer.seed(eng.wh, node)
    val df = eng.wh.read("country_codes")
    assert(df.count() === 2)
    assert(df.schema("pop").dataType.typeName === "long")
  }

  test("unit test: fixtures replace refs, diff detected") {
    val proj = baseProject
    val eng0 = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val ut = UnitTestNode(
      name = "ut_fct_spend",
      model = "fct_spend",
      given = Map("stg_orders" -> Seq(
        Map("o_custkey" -> 7L, "o_totalprice" -> 10.0),
        Map("o_custkey" -> 7L, "o_totalprice" -> 5.0))),
      expect = Seq(Map("o_custkey" -> 7L, "n_orders" -> 2L, "spend" -> 15.0)))
    val manifest2 = Manifest(eng0.manifest.nodes + (ut.uniqueId -> ut))
    val eng = new Engine(spark, manifest2, tmpDir("wh2"))
    val res = eng.test(select = Seq("ut_fct_spend"))
    assert(res.head.status === "pass", res.mkString("\n"))

    val bad = ut.copy(name = "ut_bad",
      expect = Seq(Map("o_custkey" -> 7L, "n_orders" -> 99L, "spend" -> 15.0)))
    val eng2 = new Engine(spark,
      Manifest(eng0.manifest.nodes + (bad.uniqueId -> bad)), tmpDir("wh3"))
    assert(eng2.test(select = Seq("ut_bad")).head.status === "fail")
  }

  test("unit test failure carries row-level diff in result message + event log") {
    // reference task/test.py:236-247: a failed unit test renders the
    // daff diff (expected vs actual rows) into the failure output and
    // stores actual/expected rows in the run result
    val proj = baseProject
    val eng0 = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val bad = UnitTestNode(
      name = "ut_diff_rows",
      model = "fct_spend",
      given = Map("stg_orders" -> Seq(
        Map("o_custkey" -> 7L, "o_totalprice" -> 10.0),
        Map("o_custkey" -> 7L, "o_totalprice" -> 5.0))),
      expect = Seq(Map("o_custkey" -> 7L, "n_orders" -> 99L, "spend" -> 15.0)))
    val eng = new Engine(spark,
      Manifest(eng0.manifest.nodes + (bad.uniqueId -> bad)), tmpDir("wh2"))
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val (pf, ps, pl) = (graft.run.EventLog.format, graft.run.EventLog.sink,
      graft.run.EventLog.minLevel)
    graft.run.EventLog.format = "json"
    graft.run.EventLog.minLevel = "error"
    graft.run.EventLog.sink = l => { events.add(l); () }
    val res =
      try eng.test(select = Seq("ut_diff_rows"))
      finally { graft.run.EventLog.format = pf; graft.run.EventLog.sink = ps
        graft.run.EventLog.minLevel = pl }
    assert(res.head.status === "fail")
    val msg = res.head.message
    // the rendered daff-style block: counts + the actual rows, each side
    assert(msg.contains("actual differs from expected"), msg)
    assert(msg.contains("1 expected row(s) missing"), msg)
    assert(msg.contains("1 unexpected row(s)"), msg)
    assert(msg.contains("""- {"o_custkey":"7","n_orders":"99","spend":"15.0"}"""), msg)
    assert(msg.contains("""+ {"o_custkey":"7","n_orders":"2","spend":"15.0"}"""), msg)
    // the structured event mirrors the diff rows
    import scala.jdk.CollectionConverters._
    val ev = events.asScala.find(_.contains("\"event\": \"unit_test_diff\""))
    assert(ev.isDefined, events.asScala.mkString("\n"))
    assert(ev.get.contains("ut_diff_rows") &&
      ev.get.contains("missing_rows") && ev.get.contains("n_orders"), ev.get)
  }

  test("unit test: csv given/expect fixtures (A13 format: csv)") {
    val proj = baseProject
    val eng0 = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val ut = UnitTestNode(
      name = "ut_csv",
      model = "fct_spend",
      given = Map.empty, expect = Nil,
      givenFixtures = Map("stg_orders" -> CsvRows(
        "o_custkey,o_totalprice\n7,10.0\n7,5.0\n")),
      expectFixture = Some(CsvRows("o_custkey,n_orders,spend\n7,2,15.0\n")))
    val eng = new Engine(spark,
      Manifest(eng0.manifest.nodes + (ut.uniqueId -> ut)), tmpDir("wh2"))
    assert(eng.test(select = Seq("ut_csv")).head.status === "pass")

    val bad = ut.copy(name = "ut_csv_bad",
      expectFixture = Some(CsvRows("o_custkey,n_orders,spend\n7,99,15.0\n")))
    val eng2 = new Engine(spark,
      Manifest(eng0.manifest.nodes + (bad.uniqueId -> bad)), tmpDir("wh3"))
    assert(eng2.test(select = Seq("ut_csv_bad")).head.status === "fail")
  }

  test("unit test: sql given/expect fixtures (A13 format: sql)") {
    val proj = baseProject
    val eng0 = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val ut = UnitTestNode(
      name = "ut_sql",
      model = "fct_spend",
      given = Map.empty, expect = Nil,
      givenFixtures = Map("stg_orders" -> SqlRows(
        """SELECT CAST(7 AS BIGINT) AS o_custkey, CAST(10.0 AS DOUBLE) AS o_totalprice
          |UNION ALL
          |SELECT CAST(7 AS BIGINT), CAST(5.0 AS DOUBLE)""".stripMargin)),
      expectFixture = Some(SqlRows(
        """SELECT CAST(7 AS BIGINT) AS o_custkey, CAST(2 AS BIGINT) AS n_orders,
          |       CAST(15.0 AS DOUBLE) AS spend""".stripMargin)))
    val eng = new Engine(spark,
      Manifest(eng0.manifest.nodes + (ut.uniqueId -> ut)), tmpDir("wh2"))
    assert(eng.test(select = Seq("ut_sql")).head.status === "pass")

    // mixed formats: dict given + sql expect, and sql given can seed
    // from a csv-given sibling name without collision
    val mixed = ut.copy(name = "ut_mixed",
      given = Map.empty,
      givenFixtures = Map("stg_orders" -> CsvRows(
        "o_custkey,o_totalprice\n7,10.0\n7,5.0\n")),
      expectFixture = Some(SqlRows(
        """SELECT CAST(7 AS BIGINT) AS o_custkey, CAST(2 AS BIGINT) AS n_orders,
          |       CAST(15.0 AS DOUBLE) AS spend""".stripMargin)))
    val eng3 = new Engine(spark,
      Manifest(eng0.manifest.nodes + (mixed.uniqueId -> mixed)), tmpDir("wh4"))
    assert(eng3.test(select = Seq("ut_mixed")).head.status === "pass")
  }

  test("unit test: parsed from schema YAML (dict given, csv expect, overrides)") {
    val proj = baseProject + ("models/unit_tests.yml" ->
      """unit_tests:
        |  - name: ut_yaml_spend
        |    model: fct_spend
        |    given:
        |      - input: ref('stg_orders')
        |        rows:
        |          - {o_custkey: 7, o_totalprice: 10.0}
        |          - {o_custkey: 7, o_totalprice: 5.0}
        |    expect:
        |      format: csv
        |      rows: |
        |        o_custkey,n_orders,spend
        |        7,2,15.0
        |""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val ut = eng.manifest.unitTests.values.find(_.name == "ut_yaml_spend")
    assert(ut.isDefined, "unit_tests YAML did not parse")
    assert(ut.get.givenFixtures.contains("stg_orders"))
    // unit test depends on its model (build-edge ordering)
    assert(ut.get.dependsOn === Seq("model.graft.fct_spend"))
    val res = eng.test(select = Seq("ut_yaml_spend"))
    assert(res.size === 1 && res.head.status === "pass", res.mkString("; "))
  }

  test("run_query macro drives a data-dependent pivot model end-to-end") {
    val proj = baseProject ++ Map(
      "macros/dyn.sql" ->
        """{% macro order_statuses() %}
          |{% set q %}select distinct o_orderstatus from {{ source('main','orders') }} order by 1{% endset %}
          |{% set r = run_query(q) %}
          |{{ return(r.columns[0].values()) }}
          |{% endmacro %}""".stripMargin,
      "models/pivot_status.sql" ->
        """{{ config(materialized='table') }}
          |select {% for s in order_statuses() %}sum(case when o_orderstatus = '{{ s }}' then 1 else 0 end) as n_{{ s }}{% if not loop.last %}, {% endif %}{% endfor %}
          |from {{ source('main', 'orders') }}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val res = eng.run(threads = 2)
    assert(res.forall(_.status == "success"), res.mkString("; "))
    val out = eng.wh.read("pivot_status")
    // one pivot column per DISTINCT status actually present in the data
    val statuses = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).sorted
    assert(out.columns.toSeq === statuses.map(s => s"n_$s").toSeq)
    assert(out.count() === 1)
  }

  test("star macro over live relation metadata, end to end") {
    val proj = baseProject ++ Map(
      "macros/star.sql" ->
        """{% macro star(from, except=[]) %}
          |{%- set include_cols = [] -%}
          |{%- set cols = adapter.get_columns_in_relation(from) -%}
          |{%- set except_lower = except | map("lower") | list -%}
          |{%- for col in cols -%}
          |{%- if col.column | lower not in except_lower -%}
          |{%- do include_cols.append(col.column) -%}
          |{%- endif -%}
          |{%- endfor -%}
          |{{ return(include_cols | join(', ')) }}
          |{% endmacro %}""".stripMargin,
      "models/slim_orders.sql" ->
        """{{ config(materialized='table') }}
          |SELECT {{ star(ref('stg_orders'), except=['o_orderdate']) }}
          |FROM {{ ref('stg_orders') }}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val res = eng.run(threads = 2)
    assert(res.forall(_.status == "success"), res.mkString("; "))
    assert(eng.wh.read("slim_orders").columns.toSeq
      === Seq("o_orderkey", "o_custkey", "o_totalprice"))
  }

  test("snapshot blocks: several {% snapshot %} definitions per file") {
    val proj = baseProject + ("snapshots/snaps.sql" ->
      """{% snapshot snap_orders %}
        |{{ config(strategy='timestamp', unique_key='o_orderkey', updated_at='o_orderdate') }}
        |SELECT o_orderkey, o_orderstatus, o_orderdate FROM {{ source('main', 'orders') }}
        |{% endsnapshot %}
        |
        |{% snapshot snap_orders_check %}
        |{{ config(strategy='check', unique_key='o_orderkey', check_cols='o_orderstatus') }}
        |SELECT o_orderkey, o_orderstatus FROM {{ source('main', 'orders') }}
        |{% endsnapshot %}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val snaps = eng.manifest.snapshots.values.map(_.name).toSeq.sorted
    assert(snaps === Seq("snap_orders", "snap_orders_check"))
    val ts = eng.manifest.snapshots.values.find(_.name == "snap_orders").get
    assert(ts.strategy === TimestampStrategy("o_orderdate"))
    assert(ts.uniqueKey === Seq("o_orderkey"))
    val res = eng.run(resourceTypes = Set("model", "seed", "snapshot"), threads = 2)
    assert(res.forall(_.status == "success"), res.mkString("; "))
    val snap = eng.wh.read("snap_orders")
    assert(snap.columns.contains("dbt_valid_from"))
    assert(snap.filter("dbt_valid_to IS NULL").count() > 0)
  }

  test("json event log: run lifecycle lines parse back with statuses") {
    val captured = scala.collection.mutable.ArrayBuffer.empty[String]
    val (f0, s0, l0) = (EventLog.format, EventLog.sink, EventLog.minLevel)
    try {
      EventLog.format = "json"
      EventLog.sink = s => captured.synchronized { captured += s; () }
      EventLog.minLevel = "info"
      val eng = Engine.fromProject(spark, writeProject(baseProject), tmpDir("wh"))
      eng.run(threads = 2)
      val yaml = new org.yaml.snakeyaml.Yaml()
      val events = captured.toSeq.map(l =>
        yaml.load[java.util.Map[String, Any]](l))
      // parse-time advisories (I056 unused source, …) may precede the
      // invocation; the run lifecycle starts at invocation_started
      val names = events.map(_.get("event"))
        .dropWhile(_ != "invocation_started")
      assert(names.head === "invocation_started")
      assert(names.last === "invocation_finished")
      val finished = events.filter(_.get("event") == "node_finished")
      assert(finished.nonEmpty)
      assert(finished.forall(_.get("status") == "success"))
      assert(finished.forall(_.get("invocation_id") == eng.invocationId))
      val started = events.filter(_.get("event") == "node_started")
      assert(started.map(_.get("unique_id")).toSet
        === finished.map(_.get("unique_id")).toSet)
    } finally { EventLog.format = f0; EventLog.sink = s0; EventLog.minLevel = l0 }
  }

  test("source freshness thresholds") {
    val eng = Engine.fromProject(spark, writeProject(baseProject), tmpDir("wh"))
    // clock far in the future -> stale
    val stale = new Engine(spark, eng.manifest, tmpDir("wh2"),
      clock = () => java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    val fresh = stale.sourceFreshness()
    assert(fresh.nonEmpty)
    // orders max(o_orderdate) is ~1998; 2020 clock means very stale age
    assert(fresh.values.head._2 > 0)
    // freshness filter restricts the max to the filtered subset:
    // only pre-1995 rows considered -> strictly older max -> larger age
    val unfilteredAge = fresh.values.head._2
    val filteredAge = Materializer.freshness(stale.wh,
      stale.relationName(stale.manifest.resolveSource("main", "orders").get),
      "o_orderdate", None, None,
      () => java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      filter = Some("o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"))._2
    assert(filteredAge > unfilteredAge)
    // empty filtered subset = never loaded -> infinitely stale error
    val (emptyStatus, emptyAge) = Materializer.freshness(stale.wh,
      stale.relationName(stale.manifest.resolveSource("main", "orders").get),
      "o_orderdate", None, Some(60L),
      () => java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      filter = Some("o_orderdate < TIMESTAMP '1900-01-01 00:00:00'"))
    assert(emptyStatus === "error" && emptyAge.isPosInfinity)
  }

  test("build: failing test blocks downstream models") {
    val proj = Map(
      "dbt_project.yml" -> "name: blocky\n",
      "models/sources.yml" ->
        s"""sources:
           |  - name: main
           |    tables:
           |      - name: orders
           |        path: $sf/orders.parquet
           |""".stripMargin,
      "models/m1.sql" ->
        // o_orderstatus is NOT unique -> unique test fails
        "SELECT o_orderstatus FROM {{ source('main', 'orders') }}",
      "models/m2.sql" ->
        "{{ config(materialized='table') }}\nSELECT count(*) AS n FROM {{ ref('m1') }}",
      "models/schema.yml" ->
        """models:
          |  - name: m1
          |    columns:
          |      - name: o_orderstatus
          |        tests: [unique]
          |""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val results = eng.build()
    val byId = results.map(r => r.uniqueId -> r.status).toMap
    assert(byId.exists { case (id, st) => id.contains("unique_m1") && st == "fail" })
    assert(byId.exists { case (id, st) => id == "model.graft.m2" && st == "skipped" })
  }

  test("show with inline sql and limit") {
    val eng = Engine.fromProject(spark, writeProject(baseProject), tmpDir("wh"))
    eng.run()
    val df = eng.show("SELECT * FROM {{ ref('fct_spend') }} ORDER BY o_custkey", limit = 3)
    assert(df.count() === 3)
    assert(eng.showModel("fct_spend", limit = 4).count() === 4)
    assertThrows[IllegalArgumentException](eng.showModel("nope"))
    // compile --inline: rendered, not executed
    val sql = eng.compileInline("SELECT * FROM {{ ref('fct_spend') }}")
    assert(sql.startsWith("SELECT * FROM ") && !sql.contains("{{"), sql)
    assert(sql.toLowerCase.contains("fct_spend"), sql)
  }

  test("project-level snapshots and seeds load and run") {
    import org.apache.spark.sql.functions._
    val proj = Map(
      "dbt_project.yml" -> "name: snapproj\n",
      "models/sources.yml" ->
        s"""sources:
           |  - name: main
           |    tables:
           |      - name: orders
           |        path: $sf/orders.parquet
           |""".stripMargin,
      "seeds/regions.csv" -> "region_code,region_label\n1,east\n2,west\n",
      "snapshots/orders_snap.sql" ->
        """{{ config(strategy='timestamp', unique_key='o_orderkey', updated_at='o_orderdate') }}
          |SELECT o_orderkey, o_orderstatus, o_orderdate
          |FROM {{ source('main','orders') }}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"),
      clock = () => java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(eng.wh.read("regions").count() === 2)
    val snap = eng.wh.read("orders_snap")
    assert(snap.columns.contains("dbt_scd_id"))
    assert(snap.filter(col("dbt_valid_to").isNull).count() === snap.count())
    // second run with same source: no new versions
    eng.run()
    assert(eng.wh.read("orders_snap").count() === snap.count())
  }

  test("private model access is enforced across groups") {
    val src = SourceNode("main", "orders", s"$sf/orders.parquet")
    val priv = ModelNode("sec_private",
      "SELECT o_orderkey FROM {{ source('main','orders') }}",
      config = NodeConfig(group = Some("finance"), access = "private"),
      sources = Seq(("main", "orders")))
    val sameGroup = ModelNode("sec_same",
      "SELECT * FROM {{ ref('sec_private') }}",
      config = NodeConfig(group = Some("finance"), materialized = "table"),
      refs = Seq("sec_private"))
    val otherGroup = ModelNode("sec_other",
      "SELECT * FROM {{ ref('sec_private') }}",
      config = NodeConfig(group = Some("marketing"), materialized = "table"),
      refs = Seq("sec_private"))
    val manifest = graft.parse.ProjectLoader.link(Manifest(
      Seq[Node](src, priv, sameGroup, otherGroup).map(n => n.uniqueId -> n).toMap))
    val eng = new Engine(spark, manifest, tmpDir("wh"))
    eng.compile(sameGroup) // same group: fine
    val e = intercept[IllegalArgumentException](eng.compile(otherGroup))
    assert(e.getMessage.contains("private"))
  }

  test("protected access enforces package scope only under restrict-access (manifest.py:1451)") {
    def proj(restrict: Boolean) = Map(
      "dbt_project.yml" -> "name: rootp\n",
      "dbt_packages/extpkg/dbt_project.yml" ->
        s"name: extpkg\nrestrict-access: $restrict\n",
      "dbt_packages/extpkg/models/guarded.sql" ->
        "{{ config(access='protected') }}\nSELECT 1 AS x",
      "models/uses.sql" -> "SELECT * FROM {{ ref('guarded') }}")
    // restrict-access: true -> cross-package ref raises the reference
    // DbtReferenceError with package scope
    val engR = Engine.fromProject(spark, writeProject(proj(true)), tmpDir("wh"))
    val uses = engR.manifest.nodes.values.find(_.name == "uses").get
    val e = intercept[IllegalArgumentException](engR.compile(uses))
    assert(e.getMessage ===
      "Node model.graft.uses attempted to reference node model.extpkg.guarded, " +
        "which is not allowed because the referenced node is protected to the " +
        "'extpkg' package.")
    // without restrict-access the same ref compiles (reference default)
    val engOk = Engine.fromProject(spark, writeProject(proj(false)), tmpDir("wh"))
    val uses2 = engOk.manifest.nodes.values.find(_.name == "uses").get
    assert(engOk.compile(uses2).contains("guarded"))
  }

  test("analyses compile but never materialize") {
    val proj = baseProject + ("analyses/an_orders.sql" ->
      "SELECT count(*) FROM {{ ref('stg_orders') }}")
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val an = eng.manifest.byName("an_orders").get
    assert(eng.compile(an).contains("stg_orders"))
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(!eng.wh.exists("an_orders"))
  }

  test("incremental_predicates bound the merge-eligible target rows") {
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    import org.apache.spark.sql.functions._
    spark.sql(
      """SELECT * FROM VALUES (1, 'old', 2020), (2, 'old', 2024), (3, 'old', 2024)
        |AS t(id, v, yr)""".stripMargin).createOrReplaceTempView("ip_full")
    // delta updates keys 1 and 2 — but only yr >= 2024 target rows are
    // merge-eligible, so key 1's 2020 row must survive untouched
    spark.sql(
      """SELECT * FROM VALUES (1, 'new', 2024), (2, 'new', 2024)
        |AS t(id, v, yr)""".stripMargin).createOrReplaceTempView("ip_delta")
    Materializer.incremental(eng.wh, "ip", "SELECT * FROM ip_full",
      "SELECT * FROM ip_delta", "merge", Seq("id"), "ignore", Nil,
      fullRefresh = false, incrementalPredicates = Seq("yr >= 2024"))
    Materializer.incremental(eng.wh, "ip", "SELECT * FROM ip_full",
      "SELECT * FROM ip_delta", "merge", Seq("id"), "ignore", Nil,
      fullRefresh = false, incrementalPredicates = Seq("yr >= 2024"))
    val out = eng.wh.read("ip")
    // key1: old 2020 row kept (outside predicate) + new 2024 row inserted
    assert(out.filter(col("id") === 1).count() === 2)
    // key2: replaced in place
    assert(out.filter(col("id") === 2).count() === 1)
    assert(out.filter(col("id") === 2).select("v").head().getString(0) === "new")
    // key3: untouched
    assert(out.filter(col("id") === 3 && col("v") === "old").count() === 1)
  }

  test("store_failures persists failing rows to the audit table") {
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    import org.apache.spark.sql.functions._
    spark.range(6).select((col("id") % 3).as("k"))
      .createOrReplaceTempView("sf_dup")
    val t = TestNode("dupes",
      Materializer.genericTestSql("unique", "sf_dup", "k", Map.empty),
      NodeConfig(materialized = "test", severity = "warn", storeFailures = true))
    val (status, failures) = Materializer.runTest(eng.wh, t)
    assert(status === "warn")
    assert(failures === 3)
    val audit = eng.wh.read("dbt_test__audit__dupes")
    assert(audit.count() === 3)
  }

  test("on_schema_change sync_all_columns adopts the delta's schema") {
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    import org.apache.spark.sql.functions._
    spark.range(3).select(col("id"), lit("x").as("a"), lit(9L).as("gone"))
      .createOrReplaceTempView("sync_src1")
    spark.range(3, 5).select(col("id"), lit("y").as("a"), lit(1L).as("b"))
      .createOrReplaceTempView("sync_src2")
    Materializer.incremental(eng.wh, "sync1", "SELECT * FROM sync_src1",
      "SELECT * FROM sync_src2", "append", Nil, "sync_all_columns", Nil, fullRefresh = false)
    Materializer.incremental(eng.wh, "sync1", "SELECT * FROM sync_src1",
      "SELECT * FROM sync_src2", "append", Nil, "sync_all_columns", Nil, fullRefresh = false)
    val out = eng.wh.read("sync1")
    assert(out.columns.toSet === Set("id", "a", "b")) // 'gone' dropped, 'b' added
    assert(out.count() === 5)
  }

  test("context builtins render in model SQL") {
    val clock: Materializer.Clock =
      () => java.sql.Timestamp.valueOf("2001-02-03 04:05:06")
    val src = SourceNode("main", "orders", s"$sf/orders.parquet")
    val m = ModelNode("bi_model",
      "SELECT '{{ invocation_id }}' AS inv, '{{ run_started_at }}' AS started, count(*) AS n FROM {{ source('main','orders') }}",
      config = NodeConfig(materialized = "table"), sources = Seq(("main", "orders")))
    val manifest = graft.parse.ProjectLoader.link(Manifest(
      Seq(src: graft.core.Node, m: graft.core.Node).map(n => n.uniqueId -> n).toMap))
    val eng = new Engine(spark, manifest, tmpDir("wh"), clock = clock)
    assert(eng.run().forall(_.status == "success"))
    val row = eng.wh.read("bi_model").head()
    assert(row.getString(0) === eng.invocationId)
    assert(row.getString(1).startsWith("2001-02-03T04:05:06"))
  }

  test("--empty mode resolves refs/sources to LIMIT 0 relations") {
    val eng0 = Engine.fromProject(spark, writeProject(baseProject), tmpDir("wh"))
    val empty = new Engine(spark, eng0.manifest, tmpDir("wh_e"),
      vars = eng0.vars, emptyMode = true)
    val results = empty.run(threads = 1)
    assert(results.forall(_.status == "success"), results.mkString(";"))
    // tables built, but with zero rows (schema-only dry run)
    assert(empty.wh.read("fct_spend").count() === 0)
    assert(empty.wh.read("fct_spend").columns.contains("spend"))
  }

  test("ls returns topo-ordered selection") {
    val eng = Engine.fromProject(spark, writeProject(baseProject), tmpDir("wh"))
    val ids = eng.ls(Seq("+fct_spend"))
    assert(ids.indexOf("model.graft.stg_orders") < ids.indexOf("model.graft.fct_spend"))
  }

  test("on_schema_change variants") {
    val whDir = tmpDir("wh")
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), whDir)
    spark.range(3).select(col("id"), lit("x").as("a")).createOrReplaceTempView("osc_src1")
    spark.range(3, 5).select(col("id"), lit("y").as("a"), lit(1L).as("b"))
      .createOrReplaceTempView("osc_src2")

    // ignore: new column b dropped
    Materializer.incremental(eng.wh, "osc1", "SELECT * FROM osc_src1",
      "SELECT * FROM osc_src2", "append", Nil, "ignore", Nil, fullRefresh = false)
    Materializer.incremental(eng.wh, "osc1", "SELECT * FROM osc_src1",
      "SELECT * FROM osc_src2", "append", Nil, "ignore", Nil, fullRefresh = false)
    assert(eng.wh.read("osc1").columns.toSet === Set("id", "a"))

    // append_new_columns: b appears, null for old rows
    Materializer.incremental(eng.wh, "osc2", "SELECT * FROM osc_src1",
      "SELECT * FROM osc_src2", "append", Nil, "append_new_columns", Nil, fullRefresh = false)
    Materializer.incremental(eng.wh, "osc2", "SELECT * FROM osc_src1",
      "SELECT * FROM osc_src2", "append", Nil, "append_new_columns", Nil, fullRefresh = false)
    val osc2 = eng.wh.read("osc2")
    assert(osc2.columns.toSet === Set("id", "a", "b"))
    assert(osc2.filter(col("b").isNull).count() === 3)

    // fail: throws
    Materializer.incremental(eng.wh, "osc3", "SELECT * FROM osc_src1",
      "SELECT * FROM osc_src2", "append", Nil, "fail", Nil, fullRefresh = false)
    assertThrows[IllegalStateException](
      Materializer.incremental(eng.wh, "osc3", "SELECT * FROM osc_src1",
        "SELECT * FROM osc_src2", "append", Nil, "fail", Nil, fullRefresh = false))
  }

  test("microbatch strategy replaces exactly the delta's day buckets") {
    val whDir = tmpDir("wh")
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), whDir)
    def ts(day: Int) = s"TIMESTAMP '2024-01-0$day 10:00:00'"
    spark.sql(
      s"""SELECT * FROM VALUES (1, ${ts(1)}, 10.0), (2, ${ts(1)}, 20.0),
         |(3, ${ts(2)}, 30.0), (4, ${ts(3)}, 40.0) AS t(id, ev, v)""".stripMargin)
      .createOrReplaceTempView("mb_full")
    // delta: re-delivers day 2 with corrected values + new day 4
    spark.sql(
      s"""SELECT * FROM VALUES (3, ${ts(2)}, 99.0), (5, ${ts(4)}, 50.0)
         |AS t(id, ev, v)""".stripMargin)
      .createOrReplaceTempView("mb_delta")
    Materializer.incremental(eng.wh, "mb", "SELECT * FROM mb_full",
      "SELECT * FROM mb_delta", "microbatch:ev", Nil, "ignore", Nil, fullRefresh = false)
    Materializer.incremental(eng.wh, "mb", "SELECT * FROM mb_full",
      "SELECT * FROM mb_delta", "microbatch:ev", Nil, "ignore", Nil, fullRefresh = false)
    val out = eng.wh.read("mb")
    assert(out.count() === 5) // day1: 2 rows, day2: replaced 1 row, day3: 1, day4: 1
    assert(out.filter(col("id") === 3)
      .select(col("v").cast("double")).head().getDouble(0) === 99.0)
    // idempotence: re-running the same window changes nothing
    Materializer.incremental(eng.wh, "mb", "SELECT * FROM mb_full",
      "SELECT * FROM mb_delta", "microbatch:ev", Nil, "ignore", Nil, fullRefresh = false)
    assert(eng.wh.read("mb").count() === 5)
  }

  test("contract enforcement: type mismatch and not_null violations abort") {
    val whDir = tmpDir("wh")
    val eng = new Engine(spark, Manifest(Map.empty), whDir)
    import org.apache.spark.sql.functions._
    val good = spark.range(3).select(col("id"), lit("x").as("name"))
    val cols = Seq(
      ColumnInfo("id", dataType = Some("bigint"),
        tests = Seq(GenericTestRef("not_null"))),
      ColumnInfo("name", dataType = Some("string")))
    Materializer.enforceContract(good, "ok", cols) // passes
    // type mismatch
    val badType = spark.range(3).select(col("id").cast("int").as("id"), lit("x").as("name"))
    assertThrows[IllegalStateException](
      Materializer.enforceContract(badType, "bad_type", cols))
    // undeclared column
    val extra = good.withColumn("surprise", lit(1))
    assertThrows[IllegalStateException](
      Materializer.enforceContract(extra, "extra_col", cols))
    // not_null violation
    val withNull = spark.sql("SELECT * FROM VALUES (CAST(NULL AS BIGINT), 'x') AS t(id, name)")
    assertThrows[IllegalStateException](
      Materializer.enforceContract(withNull, "null_id", cols))
  }

  test("insert_overwrite replaces only delta partitions") {
    val whDir = tmpDir("wh")
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), whDir)
    spark.range(6).select(col("id"), (col("id") % 3).as("part"))
      .createOrReplaceTempView("iow_full")
    // delta: only part=1, with shifted ids
    spark.range(100, 102).select(col("id"), lit(1L).as("part"))
      .createOrReplaceTempView("iow_delta")
    Materializer.incremental(eng.wh, "iow", "SELECT * FROM iow_full",
      "SELECT * FROM iow_delta", "insert_overwrite", Nil, "ignore",
      Seq("part"), fullRefresh = false)
    Materializer.incremental(eng.wh, "iow", "SELECT * FROM iow_full",
      "SELECT * FROM iow_delta", "insert_overwrite", Nil, "ignore",
      Seq("part"), fullRefresh = false)
    val out = eng.wh.read("iow")
    assert(out.filter(col("part") === 1).count() === 2) // replaced
    assert(out.filter(col("part") =!= 1).count() === 4) // untouched
  }

  test("partial-column delta: merge keeps target values, delete+insert nulls them") {
    import org.apache.spark.sql.functions._
    def mkTarget(eng: Engine, rel: String): Unit = {
      spark.sql("SELECT * FROM VALUES (1L,'a',10L),(2L,'b',20L) AS t(id,name,score)")
        .createOrReplaceTempView(s"${rel}_full")
      // partial delta: id+score only (no name)
      spark.sql("SELECT * FROM VALUES (2L,99L),(3L,30L) AS t(id,score)")
        .createOrReplaceTempView(s"${rel}_delta")
      Materializer.incremental(eng.wh, rel, s"SELECT * FROM ${rel}_full",
        s"SELECT * FROM ${rel}_delta", strategy = rel.takeRight(1) match {
          case "m" => "merge"
          case _ => "delete+insert"
        }, uniqueKey = Seq("id"), onSchemaChange = "ignore",
        partitionBy = Nil, fullRefresh = false)
      Materializer.incremental(eng.wh, rel, s"SELECT * FROM ${rel}_full",
        s"SELECT * FROM ${rel}_delta", strategy = rel.takeRight(1) match {
          case "m" => "merge"
          case _ => "delete+insert"
        }, uniqueKey = Seq("id"), onSchemaChange = "ignore",
        partitionBy = Nil, fullRefresh = false)
    }
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    mkTarget(eng, "pc_m")
    val m = eng.wh.read("pc_m").orderBy("id").collect()
    assert(m.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(m(1).getString(1) === "b")   // merge kept the target's name
    assert(m(1).getLong(2) === 99L)     // but took the delta's score
    assert(m(2).isNullAt(1))            // fresh insert has no name
    mkTarget(eng, "pc_d")
    val d = eng.wh.read("pc_d").orderBy("id").collect()
    assert(d(1).isNullAt(1))            // delete+insert nulled the name
    assert(d(1).getLong(2) === 99L)
  }

  test("merge_update_columns bounds what WHEN MATCHED touches") {
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    spark.sql("SELECT * FROM VALUES (1L,'a',10L),(2L,'b',20L) AS t(id,name,score)")
      .createOrReplaceTempView("muc_full")
    // full-row delta, but only `score` is declared updatable
    spark.sql("SELECT * FROM VALUES (2L,'ZZZ',99L),(3L,'c',30L) AS t(id,name,score)")
      .createOrReplaceTempView("muc_delta")
    for (_ <- 1 to 2)
      Materializer.incremental(eng.wh, "muc", "SELECT * FROM muc_full",
        "SELECT * FROM muc_delta", "merge", Seq("id"), "ignore", Nil,
        fullRefresh = false, mergeUpdateColumns = Seq("score"))
    val rows = eng.wh.read("muc").orderBy("id").collect()
    assert(rows(1).getString(1) === "b")  // name NOT updated
    assert(rows(1).getLong(2) === 99L)    // score updated
    assert(rows(2).getString(1) === "c")  // insert carries full row
    // exclude flavor: everything but name
    for (_ <- 1 to 2)
      Materializer.incremental(eng.wh, "mec", "SELECT * FROM muc_full",
        "SELECT * FROM muc_delta", "merge", Seq("id"), "ignore", Nil,
        fullRefresh = false, mergeExcludeColumns = Seq("name"))
    val rows2 = eng.wh.read("mec").orderBy("id").collect()
    assert(rows2(1).getString(1) === "b" && rows2(1).getLong(2) === 99L)
  }

  test("namespaces isolate two engines on one SparkSession") {
    // same model names, same session; only the namespace differs —
    // without prefixes the second run would clobber the first's views
    val projA = writeProject(baseProject)
    val engA = Engine.fromProject(spark, projA, tmpDir("whA"), namespace = "enva")
    val engB = Engine.fromProject(spark, writeProject(baseProject +
      ("dbt_project.yml" -> "name: demo\nvars:\n  cutoff: '1998-01-01'\n")),
      tmpDir("whB"), namespace = "envb")
    assert(engA.run().forall(_.status == "success"))
    assert(engB.run().forall(_.status == "success"))
    assert(engA.wh.read("enva__fct_spend").count() > 0)
    assert(engB.wh.read("envb__fct_spend").count() > 0)
    // later cutoff -> fewer qualifying orders, and A's views survived
    // B's run (no clobbering)
    val oA = engA.wh.read("enva__stg_orders").count()
    val oB = engB.wh.read("envb__stg_orders").count()
    assert(oA > oB && oB > 0, s"oA=$oA oB=$oB")
    // defer across namespaces: an empty engine deferring to A resolves
    // A's relations through A's namespace
    val engC = Engine.fromProject(spark, projA, tmpDir("whC"), namespace = "envc")
    engC.deferEngine = Some(engA)
    val sql = engC.compile(engC.manifest.resolveRef("fct_spend").get)
    assert(sql.contains("envc__stg_orders"))
    assert(engC.wh.exists("envc__stg_orders")) // registered from A's data
  }

  test("unit test overrides shadow project vars and env vars") {
    val proj = baseProject + ("models/cutoffed.sql" ->
      """SELECT o_custkey FROM {{ ref('stg_orders') }}
        |WHERE o_orderdate >= '{{ var('cutoff') }}'
        |  AND '{{ env_var('GRAFT_UT_FLAG', 'off') }}' = 'on'""".stripMargin)
    val eng0 = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val rows = Seq(
      Map("o_custkey" -> 1L, "o_orderdate" -> java.sql.Timestamp.valueOf("1997-06-01 00:00:00")),
      Map("o_custkey" -> 2L, "o_orderdate" -> java.sql.Timestamp.valueOf("1990-01-01 00:00:00")))
    // overridden cutoff excludes the 1997 row too; env flag turns the query on
    val ut = UnitTestNode(
      name = "ut_cutoff", model = "cutoffed",
      given = Map("stg_orders" -> rows),
      expect = Seq(Map("o_custkey" -> 99L)),
      overrideVars = Map("cutoff" -> "1998-01-01"),
      overrideEnvVars = Map("GRAFT_UT_FLAG" -> "on"))
    // expect no rows -> expect fixture with a row must FAIL; then the
    // correct empty expectation is impossible to express with rows, so
    // assert via the passing variant: cutoff override keeps only nothing,
    // while the project cutoff (1996) would keep custkey 1
    val engFail = new Engine(spark,
      Manifest(eng0.manifest.nodes + (ut.uniqueId -> ut)), tmpDir("wh2"))
    assert(engFail.test(select = Seq("ut_cutoff")).head.status === "fail")
    val utPass = ut.copy(name = "ut_cutoff2",
      overrideVars = Map("cutoff" -> "1995-01-01"),
      expect = Seq(Map("o_custkey" -> 1L)))
    val engPass = new Engine(spark,
      Manifest(eng0.manifest.nodes + (utPass.uniqueId -> utPass)), tmpDir("wh3"))
    val res = engPass.test(select = Seq("ut_cutoff2"))
    assert(res.head.status === "pass", res.mkString("\n"))
  }

  test("unit test fixtures infer boolean, date, decimal columns") {
    val proj = baseProject + ("models/flags.sql" ->
      """SELECT o_custkey, is_big, day, amt
        |FROM {{ ref('stg_flags') }} WHERE is_big""".stripMargin,
      "models/stg_flags.sql" ->
      "SELECT 1 AS o_custkey, true AS is_big, DATE '2020-01-01' AS day, CAST(1 AS DECIMAL(38,18)) AS amt")
    val eng0 = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val ut = UnitTestNode(
      name = "ut_flags", model = "flags",
      given = Map("stg_flags" -> Seq(
        Map("o_custkey" -> 1L, "is_big" -> true,
          "day" -> java.sql.Date.valueOf("2020-02-02"), "amt" -> BigDecimal(7.5)),
        Map("o_custkey" -> 2L, "is_big" -> false,
          "day" -> java.sql.Date.valueOf("2020-03-03"), "amt" -> BigDecimal(1.25)))),
      expect = Seq(Map("o_custkey" -> 1L, "is_big" -> true,
        "day" -> java.sql.Date.valueOf("2020-02-02"), "amt" -> BigDecimal(7.5))))
    val eng = new Engine(spark,
      Manifest(eng0.manifest.nodes + (ut.uniqueId -> ut)), tmpDir("wh2"))
    val res = eng.test(select = Seq("ut_flags"))
    assert(res.head.status === "pass", res.mkString("\n"))
  }

  test("sources read csv and json files, format inferred from extension") {
    val data = Paths.get(tmpDir("src_data"))
    Files.writeString(data.resolve("regions.csv"),
      "rid,rname\n1,east\n2,west\n")
    Files.writeString(data.resolve("facts.jsonl"),
      """{"rid": 1, "amount": 10}
        |{"rid": 1, "amount": 5}
        |{"rid": 2, "amount": 7}
        |""".stripMargin)
    val proj = Map(
      "dbt_project.yml" -> "name: srcfmt\n",
      "models/sources.yml" ->
        s"""sources:
           |  - name: ext
           |    tables:
           |      - name: regions
           |        path: $data/regions.csv
           |      - name: facts
           |        path: $data/facts.jsonl
           |""".stripMargin,
      "models/region_totals.sql" ->
        """SELECT r.rname, SUM(f.amount) AS total
          |FROM {{ source('ext', 'facts') }} f
          |JOIN {{ source('ext', 'regions') }} r ON f.rid = r.rid
          |GROUP BY r.rname""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh_srcfmt"))
    val res = eng.run(threads = 1)
    assert(res.forall(_.status == "success"), res.mkString("\n"))
    val out = eng.wh.read("region_totals").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("east" -> 15L, "west" -> 7L))
  }

  test("structured event breadth: the reference's lifecycle codes stream from a real build") {
    // reference `core/dbt/events/types.py`: one typed line per
    // lifecycle step. A build with a seed, models, a passing test, a
    // failing model and a skipped child must produce the W/Q/Z codes.
    val dir = writeProject(Map(
      "dbt_project.yml" ->
        """name: demo
          |on-run-start: "SELECT 1"
          |""".stripMargin,
      "seeds/s.csv" -> "id,v\n1,2\n",
      "models/good.sql" -> "SELECT id, v FROM {{ ref('s') }}",
      "models/bad.sql" -> "SELECT definitely_no_such_col FROM {{ ref('good') }}",
      "models/child.sql" -> "SELECT * FROM {{ ref('bad') }}",
      "models/schema.yml" ->
        """models:
          |  - name: good
          |    columns:
          |      - name: id
          |        tests: [not_null]
          |""".stripMargin))
    val eventQ = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val (f0, s0, l0) = (EventLog.format, EventLog.sink, EventLog.minLevel)
    try {
      EventLog.format = "json"; EventLog.minLevel = "debug"
      EventLog.sink = line => { eventQ.add(line); () }
      val eng = Engine.fromProject(spark, dir, tmpDir("wh_events"),
        partialParse = Some(graft.parse.PartialParse.Options(env = Map.empty)))
      eng.build()
    } finally { EventLog.format = f0; EventLog.sink = s0; EventLog.minLevel = l0 }
    import scala.jdk.CollectionConverters._
    val events = eventQ.asScala.toSeq
    def has(code: String): Boolean =
      events.exists(_.contains("\"code\": \"" + code + "\""))
    val expected = Seq(
      "I024", // unable_to_partial_parse (no saved state yet)
      "W006", // found_stats
      "Q027", // concurrency_line
      "Q024", // node_started
      "Q025", // node_finished
      "Q012", // log_model_result
      "Q016", // log_seed_result
      "Q007", // log_test_result
      "Q032", // log_hook_start_line
      "Q033", // log_hook_end_line
      "Q034", // skipping_details (child of failed model)
      "Z024", // run_result_error (bad.sql)
      "Z030", // end_of_run_summary
      "Z023") // stats_line
    val missing = expected.filterNot(has)
    assert(missing.isEmpty, s"missing event codes: ${missing.mkString(", ")}\n" +
      s"got:\n${events.mkString("\n")}")
    // JSON shape: every coded line parses and carries event+level+ts
    val yaml = new org.yaml.snakeyaml.Yaml()
    events.filter(_.contains("\"code\"")).foreach { l =>
      val m = yaml.load[java.util.Map[String, Any]](l)
      assert(m.containsKey("event") && m.containsKey("level") && m.containsKey("ts"))
    }
  }

  test("alias-collision config keys and versioned+unversioned name clashes are parse errors") {
    val aliasDup = Map(
      "dbt_project.yml" -> "name: ad\n",
      "models/m.sql" -> "SELECT 1 AS x",
      "models/s.yml" ->
        ("models:\n  - name: m\n    config:\n" +
          "      pre-hook: \"SELECT 1\"\n      pre_hook: \"SELECT 2\"\n"))
    val e1 = intercept[IllegalArgumentException](
      Engine.fromProject(spark, writeProject(aliasDup), tmpDir("wh")))
    assert(e1.getMessage ===
      "Got duplicate keys: (pre-hook, pre_hook) all map to \"pre_hook\"")
    val verUnver = Map(
      "dbt_project.yml" -> "name: vu\n",
      "models/fam.sql" -> "SELECT 1 AS x",
      "models/fam_v1.sql" -> "SELECT 1 AS x",
      "models/fam_v2.sql" -> "SELECT 2 AS x",
      "models/s.yml" ->
        ("models:\n  - name: fam\n    latest_version: 2\n" +
          "    versions:\n      - v: 1\n      - v: 2\n"))
    val e2 = intercept[IllegalArgumentException](
      Engine.fromProject(spark, writeProject(verUnver), tmpDir("wh")))
    assert(e2.getMessage.contains(
      "dbt found versioned and unversioned models with the name \"fam\""))
  }

  test("duplicate macro names and duplicate yaml keys are hard parse errors") {
    val dupMacro = Map(
      "dbt_project.yml" -> "name: dm\n",
      "models/m.sql" -> "SELECT 1 AS x",
      "macros/a.sql" -> "{% macro pick() %}1{% endmacro %}",
      "macros/b.sql" -> "{% macro pick() %}2{% endmacro %}")
    val e1 = intercept[IllegalArgumentException](
      Engine.fromProject(spark, writeProject(dupMacro), tmpDir("wh")))
    assert(e1.getMessage.contains("dbt found two macros with the name \"pick\""))
    val dupKey = Map(
      "dbt_project.yml" -> "name: dk\n",
      "models/m.sql" -> "SELECT 1 AS x",
      "models/s.yml" -> "models:\n  - name: m\nmodels:\n  - name: m\n")
    val e2 = intercept[IllegalArgumentException](
      Engine.fromProject(spark, writeProject(dupKey), tmpDir("wh")))
    assert(e2.getMessage.contains("key found in yaml file"))
  }

  test("two schema.yml files patching one model raise DuplicatePatchPathError (schemas.py:694)") {
    val proj = Map(
      "dbt_project.yml" -> "name: duppatch\n",
      "models/m.sql" -> "SELECT 1 AS x",
      "models/one.yml" -> "models:\n  - name: m\n    description: a\n",
      "models/two.yml" -> "models:\n  - name: m\n    description: b\n")
    val e = intercept[IllegalArgumentException](
      Engine.fromProject(spark, writeProject(proj), tmpDir("wh")))
    assert(e.getMessage.contains(
      "dbt found two schema.yml entries for the same resource named m"))
    assert(e.getMessage.contains("one of these files"))
  }

  test("dashed hook keys in yml patches; snapshot yml+file hooks append; custom strategy list config (ADVICE r14)") {
    val proj = Map(
      "dbt_project.yml" -> "name: hookfix\n",
      "seeds/s1.csv" -> "id,v\n1,a\n",
      // dashed `post-hook:` spelling inside a seeds: yml config block
      // (reference-legal alias) must reach configFromKwargs
      "seeds/seeds.yml" ->
        """seeds:
          |  - name: s1
          |    config:
          |      post-hook: "CREATE OR REPLACE TEMP VIEW dash_seed_hook AS SELECT 1 AS x"
          |""".stripMargin,
      // hooks defined in BOTH the snapshots: yml and the in-file config
      // block APPEND (MergeBehavior.Append), yml level first
      "snapshots/snap.sql" ->
        """{% snapshot hs %}
          |{{ config(strategy='listcheck', unique_key='id', updated_at='upd',
          |   check_cols=['v', 'w'],
          |   post_hook='CREATE OR REPLACE TEMP VIEW snap_hook_file AS SELECT 1 AS x') }}
          |SELECT 1 AS id, 'a' AS v, 'b' AS w, TIMESTAMP '2000-01-01' AS upd
          |{% endsnapshot %}""".stripMargin,
      "snapshots/snapshots.yml" ->
        """snapshots:
          |  - name: hs
          |    config:
          |      post-hook: "CREATE OR REPLACE TEMP VIEW snap_hook_yml AS SELECT 1 AS x"
          |""".stripMargin,
      // custom strategy whose config carries a LIST value: the macro
      // must see check_cols as a real list (not a separator-joined
      // string), and the engine's 3-way strat split must survive
      "macros/listcheck.sql" ->
        """{% macro snapshot_listcheck_strategy(node, snapshotted_rel, current_rel, config, target_exists) %}
          |{% set cols = config['check_cols'] %}
          |{{ return({
          |  'updated_at': config['updated_at'],
          |  'row_changed': current_rel ~ '.' ~ cols[0] ~ ' <> ' ~ snapshotted_rel ~ '.' ~ cols[0]
          |    ~ ' OR ' ~ current_rel ~ '.' ~ cols[1] ~ ' <> ' ~ snapshotted_rel ~ '.' ~ cols[1],
          |  'scd_id': "md5(concat_ws('|', cast(id as string), cast(upd as string)))"
          |}) }}
          |{% endmacro %}""".stripMargin)
    val whRoot = tmpDir("wh")
    val eng = Engine.fromProject(spark, writeProject(proj), whRoot)
    val results = eng.build()
    assert(results.forall(r => r.status == "success" || r.status == "pass"),
      results.filterNot(r => r.status == "success" || r.status == "pass").mkString("; "))
    // dashed seed hook ran
    assert(spark.table("dash_seed_hook").count() === 1)
    // BOTH snapshot hooks ran: the yml-level one and the in-file one
    assert(spark.table("snap_hook_yml").count() === 1)
    assert(spark.table("snap_hook_file").count() === 1)
    // the strategy resolved: row_changed used both list elements
    // (read through a fresh engine — build() materializes via its
    // inner engine, so recovery-from-disk is the read path)
    val snap = new Engine(spark, graft.core.Manifest(Map.empty), whRoot).wh.read("hs")
    assert(snap.count() === 1)
    spark.sql("DROP VIEW IF EXISTS dash_seed_hook")
    spark.sql("DROP VIEW IF EXISTS snap_hook_yml")
    spark.sql("DROP VIEW IF EXISTS snap_hook_file")
  }

  test("node hooks render with the node context: this/model resolve; seeds+snapshots run hooks") {
    // the canonical post-hook idiom is `GRANT … ON {{ this }}` — here
    // the hook materializes what it saw so the assertion can read it
    val proj = Map(
      "dbt_project.yml" -> "name: hooks\n",
      "seeds/src.csv" -> "id,v\n1,a\n2,b\n",
      "seeds/seeds.yml" ->
        """seeds:
          |  - name: src
          |    config:
          |      post_hook: "CREATE OR REPLACE TEMP VIEW seed_hook_probe AS SELECT '{{ this }}' AS rel"
          |""".stripMargin,
      "models/m1.sql" ->
        """{{ config(materialized='table',
          |   post_hook="CREATE OR REPLACE TEMP VIEW model_hook_probe AS SELECT '{{ this }}' AS rel, '{{ model.name }}' AS nm, '{{ this.schema }}' AS sch") }}
          |SELECT * FROM {{ ref('src') }}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val results = eng.run(threads = 1)
    assert(results.forall(_.status == "success"),
      results.filterNot(_.status == "success").mkString("; "))
    val mh = spark.table("model_hook_probe").collect()(0)
    assert(mh.getString(0) === "m1")
    assert(mh.getString(1) === "m1")
    assert(mh.getString(2) === "default")
    assert(spark.table("seed_hook_probe").collect()(0).getString(0) === "src")
  }

  test("seed/snapshot yml properties: column_types, delimiter, column tests, snapshot strategy from yml") {
    val proj = Map(
      "dbt_project.yml" -> "name: seedyml\n",
      // delimiter ';' and an empty pop cell (row 2) -> NULL after cast
      "seeds/typed.csv" -> "id;pop;area\n1;100;2.5\n2;;3.5\n",
      "seeds/seeds.yml" ->
        """seeds:
          |  - name: typed
          |    config:
          |      delimiter: ";"
          |      column_types:
          |        pop: bigint
          |    columns:
          |      - name: id
          |        tests: [unique, not_null]
          |      - name: pop
          |        tests: [not_null]
          |""".stripMargin,
      // the snapshot block itself carries NO config — strategy,
      // unique_key and updated_at all come from the snapshots: yml
      "snapshots/snap.sql" ->
        "{% snapshot snap_rows %}SELECT 1 AS id, TIMESTAMP '2000-01-01' AS upd{% endsnapshot %}",
      "snapshots/snapshots.yml" ->
        """snapshots:
          |  - name: snap_rows
          |    config:
          |      strategy: timestamp
          |      unique_key: id
          |      updated_at: upd
          |""".stripMargin)
    val whRoot = tmpDir("wh")
    val eng = Engine.fromProject(spark, writeProject(proj), whRoot)
    val results = eng.build()
    def statusOf(id: String): String =
      results.find(_.uniqueId == id).map(_.status).getOrElse("missing")
    assert(statusOf("seed.graft.typed") === "success")
    assert(statusOf("snapshot.graft.snap_rows") === "success")
    // read through a FRESH engine: build() materializes via its inner
    // engine, so recovery-from-disk is the read path (the m-gate idiom)
    val wh = new Engine(spark, graft.core.Manifest(Map.empty), whRoot).wh
    // column_types applied: pop is bigint, empty cell -> null
    val typed = wh.read("typed")
    assert(typed.schema("pop").dataType === org.apache.spark.sql.types.LongType)
    // yml column tests became test nodes: id tests pass, pop not_null fails
    assert(statusOf("test.graft.unique_typed_id") === "pass")
    assert(statusOf("test.graft.not_null_typed_id") === "pass")
    assert(statusOf("test.graft.not_null_typed_pop") === "fail")
    // snapshot table exists with SCD2 columns
    val snap = wh.read("snap_rows")
    assert(snap.columns.contains("dbt_valid_from"))
    assert(snap.count() === 1)
  }

  test("typed vars: list/dict vars: entries iterate and index in templates") {
    val proj = Map(
      "dbt_project.yml" ->
        """name: tvars
          |vars:
          |  cutoff: '2020-01-01'
          |  regions: [emea, apac, amer]
          |  limits:
          |    emea: 10
          |    apac: 20
          |""".stripMargin,
      "models/m1.sql" ->
        """{{ config(materialized='table') }}
          |SELECT
          |  '{% for r in var('regions') %}{{ r }};{% endfor %}' AS all_regions,
          |  {{ var('regions') | length }} AS n_regions,
          |  {{ var('limits')['apac'] }} AS apac_limit,
          |  '{{ var('cutoff') }}' AS cutoff""".stripMargin)
    val whRoot = tmpDir("wh")
    val eng = Engine.fromProject(spark, writeProject(proj), whRoot)
    val results = eng.run(threads = 1)
    assert(results.forall(_.status == "success"),
      results.filterNot(_.status == "success").mkString("; "))
    val wh = new Engine(spark, graft.core.Manifest(Map.empty), whRoot).wh
    val row = wh.read("m1").collect()(0)
    assert(row.getString(0) === "emea;apac;amer;")
    assert(row.getInt(1) === 3)
    assert(row.getInt(2) === 20)
    assert(row.getString(3) === "2020-01-01")
  }

  test("build() keeps typed vars/which; source().schema answers the source name") {
    val proj = Map(
      "dbt_project.yml" ->
        """name: bprop
          |vars:
          |  regions: [emea, apac]
          |""".stripMargin,
      "models/sources.yml" ->
        s"""sources:
           |  - name: rawzone
           |    tables:
           |      - name: orders
           |        path: $sf/orders.parquet
           |""".stripMargin,
      "models/m1.sql" ->
        """{{ config(materialized='table') }}
          |SELECT '{{ var('regions') | join(';') }}' AS regions,
          |       '{{ flags.WHICH }}' AS which,
          |       '{{ source('rawzone', 'orders').schema }}' AS src_schema
          |FROM {{ source('rawzone', 'orders') }} LIMIT 1""".stripMargin)
    val whRoot = tmpDir("wh")
    val eng = Engine.fromProject(spark, writeProject(proj), whRoot)
    eng.currentWhich = "build" // what Cli sets for the build command
    val results = eng.build() // the INNER engine must inherit both
    assert(results.forall(r => r.status == "success" || r.status == "pass"),
      results.filterNot(r => r.status == "success" || r.status == "pass")
        .mkString("; "))
    val wh = new Engine(spark, graft.core.Manifest(Map.empty), whRoot).wh
    val row = wh.read("m1").collect()(0)
    assert(row.getString(0) === "emea;apac")
    assert(row.getString(1) === "build")
    assert(row.getString(2) === "rawzone")
  }

  test("run-operation typed args: a list arg drives a for-loop in the macro") {
    val proj = Map(
      "dbt_project.yml" -> "name: opargs\n",
      "macros/sweep.sql" ->
        """{% macro sweep(schemas, prefix='s') %}
          |SELECT '{% for s in schemas %}{{ prefix }}_{{ s }}|{% endfor %}' AS granted,
          |       {{ schemas | length }} AS n
          |{% endmacro %}""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val df = eng.runOperation("sweep",
      typedArgs = Map("schemas" -> Jinja.jlist(Seq(
        Jinja.JS("a"), Jinja.JS("b"))))).head
    val row = df.collect()(0)
    assert(row.getString(0) === "s_a|s_b|")
    assert(row.getInt(1) === 2)
    // string args with quotes round-trip through toLiteral's escaping
    // (Jinja-level; emitting them into SQL safely is the macro's job)
    assert(graft.render.Template.render(
      "{% set p = " + Jinja.toLiteral(Jinja.JS("it's")) + " %}" +
        "{% if p == \"it's\" %}ok:{{ p }}{% endif %}",
      graft.render.Template.Context(n => n, (a, b) => s"$a.$b", ""))
      === "ok:it's")
  }

  test("accepted_values with a MULTI-value yml list splits correctly") {
    val proj = Map(
      "dbt_project.yml" -> "name: av\n",
      "seeds/st.csv" -> "id,status\n1,O\n2,F\n3,P\n",
      "models/schema.yml" ->
        """seeds:
          |  - name: st
          |    columns:
          |      - name: status
          |        data_tests:
          |          - accepted_values:
          |              values: [O, F]
          |""".stripMargin)
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val results = eng.build()
    val t = results.find(_.uniqueId.startsWith("test.graft.accepted_values"))
      .getOrElse(fail(s"no accepted_values result in ${results.map(_.uniqueId)}"))
    // exactly ONE failing row (P); a broken list split would fail all 3
    assert(t.status === "fail")
    assert(t.rowsAffected === 1L, s"expected 1 failure, got ${t.rowsAffected}")
  }

  test("hook lists survive commas; dashed +post-hook and dict hooks work") {
    val proj = Map(
      "dbt_project.yml" ->
        """name: hookforms
          |models:
          |  +post-hook:
          |    - "CREATE OR REPLACE TEMP VIEW hf_tree AS SELECT 'from tree, with comma' AS v"
          |""".stripMargin,
      // a LIST of two in-file pre-hooks, each containing commas —
      // previously comma-joined into one broken statement
      "models/m1.sql" ->
        """{{ config(materialized='table',
          |   pre_hook=["CREATE OR REPLACE TEMP VIEW hf_a AS SELECT 1 AS x, 2 AS y",
          |             "CREATE OR REPLACE TEMP VIEW hf_b AS SELECT 3 AS x, 4 AS y"]) }}
          |SELECT * FROM hf_a UNION ALL SELECT * FROM hf_b""".stripMargin,
      // dict hook form via schema yml config — transaction listed
      // FIRST (key order is preserved by yaml; both orders must work),
      // plus the list-of-dicts form
      "models/schema.yml" ->
        """models:
          |  - name: m1
          |    config:
          |      post_hook:
          |        transaction: false
          |        sql: "CREATE OR REPLACE TEMP VIEW hf_dict AS SELECT 'dict,hook' AS v"
          |  - name: m2
          |""".stripMargin,
      "models/m2.sql" ->
        """{{ config(materialized='table', pre_hook=[{"sql": "CREATE OR REPLACE TEMP VIEW hf_ld AS SELECT 'list-of-dicts' AS v", "transaction": false}]) }}
          |SELECT * FROM hf_ld""".stripMargin)
    val whRoot = tmpDir("wh")
    val eng = Engine.fromProject(spark, writeProject(proj), whRoot)
    val results = eng.run(threads = 1)
    assert(results.forall(_.status == "success"),
      results.filterNot(_.status == "success").mkString("; "))
    val wh = new Engine(spark, graft.core.Manifest(Map.empty), whRoot).wh
    assert(wh.read("m1").count() === 2) // both pre-hook views existed
    assert(spark.table("hf_dict").collect()(0).getString(0) === "dict,hook")
    assert(spark.table("hf_tree").collect()(0).getString(0)
      === "from tree, with comma")
    assert(wh.read("m2").collect()(0).getString(0) === "list-of-dicts")
  }

  test("on-run-end hooks see the results list; selected_resources resolves") {
    val proj = Map(
      "dbt_project.yml" ->
        """name: runend
          |on-run-end:
          |  - "CREATE OR REPLACE TEMP VIEW run_end_probe AS SELECT {{ results | length }} AS n, '{% for r in results %}{{ r.node.name }}:{{ r.status }};{% endfor %}' AS summary, {{ selected_resources | length }} AS n_sel"
          |""".stripMargin,
      "models/a.sql" -> "SELECT 1 AS x",
      "models/b.sql" -> "SELECT 2 AS y")
    val eng = Engine.fromProject(spark, writeProject(proj), tmpDir("wh"))
    val results = eng.run(threads = 1)
    assert(results.count(_.status == "success") === 2)
    val probe = spark.table("run_end_probe").collect()(0)
    assert(probe.getInt(0) === 2)
    val summary = probe.getString(1)
    assert(summary.contains("a:success;"))
    assert(summary.contains("b:success;"))
    assert(probe.getInt(2) === 2)
  }
}
