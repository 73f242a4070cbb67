package graft.run

import graft.SparkSpec
import graft.core._
import graft.exec.Materializer
import java.nio.file.{Files, Paths}

/** Artifacts, retry, state:modified, defer, clone, Scala models. */
class TasksSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def mkManifest(extra: Node*): Manifest = {
    val src = SourceNode("main", "orders", s"$sf/orders.parquet")
    val stg = ModelNode("t_stg", "SELECT o_orderkey, o_custkey, o_totalprice FROM {{ source('main','orders') }}",
      refs = Nil, sources = Seq(("main", "orders")))
    val fct = ModelNode("t_fct",
      "SELECT o_custkey, count(*) AS n FROM {{ ref('t_stg') }} GROUP BY o_custkey",
      config = NodeConfig(materialized = "table"), refs = Seq("t_stg"))
    graft.parse.ProjectLoader.link(Manifest(
      (Seq(src, stg, fct) ++ extra).map(n => n.uniqueId -> n).toMap))
  }

  test("artifacts: run_results, manifest, catalog written and readable") {
    val eng = new Engine(spark, mkManifest(), tmpDir("wh"))
    val results = eng.run()
    val target = tmpDir("target")
    eng.writeArtifacts(target, results)
    val rr = Files.readString(Paths.get(s"$target/run_results.json"))
    assert(rr.contains("model.graft.t_fct") && rr.contains("\"success\""))
    val mf = Files.readString(Paths.get(s"$target/manifest.json"))
    assert(mf.contains("\"parent_map\"") && mf.contains("source.graft.main.orders"))
    val cat = Files.readString(Paths.get(s"$target/catalog.json"))
    assert(cat.contains("t_fct"))
    Artifacts.writeLineageDot(s"$target/graph.dot", eng.manifest)
    val dot = Files.readString(Paths.get(s"$target/graph.dot"))
    assert(dot.contains("\"model.graft.t_stg\" -> \"model.graft.t_fct\""))
    assert(dot.contains("shape=cds")) // sources shaped distinctly
    Artifacts.writeLineageHtml(s"$target/index.html", eng.manifest)
    val html = Files.readString(Paths.get(s"$target/index.html"))
    // the fct section links upstream to stg; stg lists fct downstream
    assert(html.contains("id=\"model.graft.t_fct\"")
      && html.contains("href=\"#model.graft.t_stg\""))
    assert(html.contains("id=\"model.graft.t_stg\"")
      && html.contains("href=\"#model.graft.t_fct\""))
    assert(!html.contains("<script"), "static page must stay script-free")
    // retry round-trip: statuses parse back
    val statuses = Artifacts.readRunStatuses(s"$target/run_results.json")
    assert(statuses.values.forall(_ == "success"))
    // sources.json appears when a source declares loaded_at_field
    val src2 = SourceNode("main", "orders", s"$sf/orders.parquet",
      loadedAtField = Some("o_orderdate"))
    val eng2 = new Engine(spark,
      graft.parse.ProjectLoader.link(Manifest(Map(src2.uniqueId -> src2))),
      tmpDir("wh2"))
    val target2 = tmpDir("target2")
    eng2.writeArtifacts(target2, Nil)
    val sj = Files.readString(Paths.get(s"$target2/sources.json"))
    assert(sj.contains("source.graft.main.orders") &&
      sj.contains("max_loaded_at_time_ago_in_s"))
  }

  test("retry re-runs only failed/skipped nodes") {
    val bad = ModelNode("t_bad", "SELECT * FROM nonexistent_relation_xyz",
      config = NodeConfig(materialized = "table"))
    val down = ModelNode("t_down", "SELECT * FROM {{ ref('t_bad') }}",
      config = NodeConfig(materialized = "table"), refs = Seq("t_bad"))
    val eng = new Engine(spark, mkManifest(bad, down), tmpDir("wh"))
    val results = eng.run()
    val byId = results.map(r => r.uniqueId -> r.status).toMap
    assert(byId("model.graft.t_bad") === "error")
    assert(byId("model.graft.t_down") === "skipped")
    val target = tmpDir("target")
    eng.writeArtifacts(target, results)
    // fix the model by swapping manifests, then retry
    val fixed = ModelNode("t_bad", "SELECT 1 AS x",
      config = NodeConfig(materialized = "table"))
    val down2 = ModelNode("t_down", "SELECT * FROM {{ ref('t_bad') }}",
      config = NodeConfig(materialized = "table"), refs = Seq("t_bad"))
    val eng2 = new Engine(spark, mkManifest(fixed, down2), tmpDir("wh2"))
    val retried = eng2.retry(s"$target/run_results.json")
    val retriedIds = retried.map(_.uniqueId).toSet
    assert(retriedIds === Set("model.graft.t_bad", "model.graft.t_down"))
    assert(retried.forall(_.status == "success"), retried.mkString(";"))
  }

  test("state:modified and state:new selection") {
    val m1 = mkManifest()
    val changed = ModelNode("t_fct",
      "SELECT o_custkey, count(*) AS n, 1 AS v2 FROM {{ ref('t_stg') }} GROUP BY o_custkey",
      config = NodeConfig(materialized = "table"), refs = Seq("t_stg"))
    val added = ModelNode("t_new", "SELECT 1 AS one")
    val m2 = graft.parse.ProjectLoader.link(Manifest(
      m1.nodes - "model.graft.t_fct" +
        (changed.uniqueId -> changed) + (added.uniqueId -> added)))
    val eng = new Engine(spark, m2, tmpDir("wh"))
    // state:modified includes changed AND new nodes (dbt semantics)
    val modified = eng.lsWithState(m1, Seq("state:modified"))
    assert(modified.toSet === Set("model.graft.t_fct", "model.graft.t_new"))
    val fresh = eng.lsWithState(m1, Seq("state:new"))
    assert(fresh === Seq("model.graft.t_new"))
    // state:modified+ includes downstream
    val plus = eng.lsWithState(m1, Seq("state:modified+"))
    assert(plus.contains("model.graft.t_fct"))
    // old = present in both manifests; unmodified = old minus changed
    val old = eng.lsWithState(m1, Seq("state:old"))
    assert(old.contains("model.graft.t_stg") && !old.contains("model.graft.t_new"))
    val unmod = eng.lsWithState(m1, Seq("state:unmodified"))
    assert(unmod.contains("model.graft.t_stg"))
    assert(!unmod.contains("model.graft.t_fct") && !unmod.contains("model.graft.t_new"))
    // config-only change: modified.configs catches it, modified.body doesn't
    val reconfig = ModelNode("t_fct",
      "SELECT o_custkey, count(*) AS n, 1 AS v2 FROM {{ ref('t_stg') }} GROUP BY o_custkey",
      config = NodeConfig(materialized = "view"), refs = Seq("t_stg"))
    val m3 = graft.parse.ProjectLoader.link(Manifest(
      m2.nodes + (reconfig.uniqueId -> reconfig)))
    val eng3 = new Engine(spark, m3, tmpDir("wh3"))
    val byConfig = eng3.lsWithState(m2, Seq("state:modified.configs"))
    assert(byConfig === Seq("model.graft.t_fct"))
    val byBody = eng3.lsWithState(m2, Seq("state:modified.body"))
    assert(!byBody.contains("model.graft.t_fct"))
  }

  test("defer resolves unbuilt refs to the state engine") {
    // state engine builds everything
    val stateEng = new Engine(spark, mkManifest(), tmpDir("wh_state"))
    assert(stateEng.run().forall(_.status == "success"))
    // dev engine: only run t_fct, defer t_stg to state
    val devEng = new Engine(spark, mkManifest(), tmpDir("wh_dev"))
    devEng.deferEngine = Some(stateEng)
    val res = devEng.run(select = Seq("t_fct"))
    assert(res.map(_.status).toSet === Set("success"), res.mkString(";"))
    assert(devEng.wh.read("t_fct").count() > 0)
  }

  test("favor-state prefers the state relation for unselected nodes") {
    // a custom stg body in state vs dev: with favor-state, the
    // unselected t_stg must serve from STATE even though a stale dev
    // build exists (reference providers.py:558-563)
    def manifestWith(filter: String): Manifest = {
      val src = SourceNode("main", "orders", s"$sf/orders.parquet")
      val stg = ModelNode("t_stg",
        s"SELECT o_orderkey FROM {{ source('main','orders') }} WHERE $filter",
        config = NodeConfig(materialized = "table"),
        sources = Seq(("main", "orders")))
      val fct = ModelNode("t_fct",
        "SELECT count(*) AS n FROM {{ ref('t_stg') }}",
        config = NodeConfig(materialized = "table"), refs = Seq("t_stg"))
      graft.parse.ProjectLoader.link(Manifest(
        Seq[Node](src, stg, fct).map(n => n.uniqueId -> n).toMap))
    }
    val stateEng = new Engine(spark, manifestWith("o_orderkey % 2 = 0"),
      tmpDir("wh_fs_state"))
    assert(stateEng.run().forall(_.status == "success"))
    val stateN = stateEng.wh.read("t_stg").count()
    val devEng = new Engine(spark, manifestWith("o_orderkey % 5 = 0"),
      tmpDir("wh_fs_dev"))
    assert(devEng.run().forall(_.status == "success")) // stale local build
    val devN = devEng.wh.read("t_stg").count()
    assert(devN !== stateN)
    devEng.deferEngine = Some(stateEng)
    // WITHOUT favor-state: local t_stg exists, so the local (dev) rows win
    assert(devEng.run(select = Seq("t_fct")).forall(_.status == "success"))
    assert(devEng.wh.read("t_fct").head().getLong(0) === devN)
    // WITH favor-state: unselected t_stg reads through to state
    devEng.favorState = true
    assert(devEng.run(select = Seq("t_fct")).forall(_.status == "success"))
    assert(devEng.wh.read("t_fct").head().getLong(0) === stateN)
  }

  test("clone re-registers relations from another warehouse") {
    val src = new Engine(spark, mkManifest(), tmpDir("wh_a"))
    src.run()
    val dst = new Engine(spark, Manifest(Map.empty), tmpDir("wh_b"))
    dst.cloneFrom(src, Seq("t_fct"))
    assert(dst.wh.read("t_fct").count() === src.wh.read("t_fct").count())
  }

  test("exposures and metrics: parsed, linked, metric compiles to a query") {
    val projDir = java.nio.file.Paths.get(tmpDir("expo_proj"))
    def write(rel: String, content: String): Unit = {
      val p = projDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: expo\n")
    write("models/sources.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |exposures:
         |  - name: exec_dashboard
         |    type: dashboard
         |    owner: data-team
         |    depends_on: [spend]
         |metrics:
         |  - name: total_spend
         |    model: spend
         |    calculation: sum(total)
         |    dimensions: [o_custkey]
         |""".stripMargin)
    write("models/spend.sql",
      """{{ config(materialized='table') }}
        |SELECT o_custkey, sum(o_totalprice) AS total
        |FROM {{ source('main','orders') }} GROUP BY o_custkey""".stripMargin)
    val eng = Engine.fromProject(spark, projDir.toString, tmpDir("wh"))
    // exposure + metric are in the DAG, downstream of the model
    val expo = eng.manifest.nodes("exposure.graft.exec_dashboard")
    assert(expo.dependsOn === Seq("model.graft.spend"))
    val met = eng.manifest.nodes("metric.graft.total_spend")
    assert(met.dependsOn === Seq("model.graft.spend"))
    // run does not materialize them, and metric compiles on demand
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(!eng.wh.exists("exec_dashboard"))
    val df = eng.queryMetric("total_spend")
    assert(df.columns.toSet === Set("o_custkey", "total_spend"))
    assert(df.count() > 0)
  }

  test("model versions: pinned/unpinned refs, relation names, artifacts") {
    val projDir = java.nio.file.Paths.get(tmpDir("ver_proj"))
    def write(rel: String, content: String): Unit = {
      val p = projDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: verproj\n")
    write("models/schema.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |models:
         |  - name: rev
         |    latest_version: 2
         |    versions:
         |      - v: 1
         |      - v: 2
         |    columns:
         |      - name: o_custkey
         |        tests: [not_null]
         |""".stripMargin)
    write("models/rev_v1.sql",
      "SELECT o_custkey, o_totalprice AS rev FROM {{ source('main','orders') }}")
    write("models/rev_v2.sql",
      "SELECT o_custkey, o_totalprice * 2 AS rev FROM {{ source('main','orders') }}")
    write("models/uses_latest.sql", "SELECT sum(rev) AS s FROM {{ ref('rev') }}")
    write("models/uses_pinned.sql", "SELECT sum(rev) AS s FROM {{ ref('rev', v=1) }}")
    val eng = Engine.fromProject(spark, projDir.toString, tmpDir("wh"))
    val m = eng.manifest
    // one node per version, with version metadata
    val v1 = m.nodes("model.graft.rev.v1").asInstanceOf[ModelNode]
    val v2 = m.nodes("model.graft.rev.v2").asInstanceOf[ModelNode]
    assert(v1.version === Some(1) && v1.latestVersion === Some(2))
    assert(!v1.isLatestVersion && v2.isLatestVersion)
    // unpinned ref -> latest; pinned ref -> that version
    assert(m.nodes("model.graft.uses_latest").dependsOn === Seq("model.graft.rev.v2"))
    assert(m.nodes("model.graft.uses_pinned").dependsOn === Seq("model.graft.rev.v1"))
    // schema tests attach once, to the latest version
    val tests = m.nodes.values.filter(_.resourceType == "test").toSeq
    assert(tests.map(_.dependsOn) === Seq(Seq("model.graft.rev.v2")))
    // run: versioned relations are name_vN, downstream reads resolve
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(eng.wh.exists("rev_v1") && eng.wh.exists("rev_v2"))
    val latest = eng.wh.read("uses_latest").head().getDouble(0)
    val pinned = eng.wh.read("uses_pinned").head().getDouble(0)
    assert(math.abs(latest - 2 * pinned) < 0.01, s"latest=$latest pinned=$pinned")
    // version: selector drives ls; eager mode (default) also pulls in
    // the attached test, empty mode doesn't
    assert(eng.ls(Seq("version:latest")) ===
      Seq("model.graft.rev.v2", "test.graft.not_null_rev_o_custkey"))
    assert(eng.ls(Seq("version:latest"), indirectSelection = "empty") ===
      Seq("model.graft.rev.v2"))
    assert(eng.ls(Seq("rev.v1"), indirectSelection = "empty") ===
      Seq("model.graft.rev.v1"))
    // manifest artifact carries version metadata
    val target = tmpDir("ver_target")
    eng.writeArtifacts(target, results)
    val mf = Files.readString(Paths.get(s"$target/manifest.json"))
    assert(mf.contains("\"model.graft.rev.v1\"") && mf.contains("\"latest_version\": 2"))
  }

  test("semantic models and saved queries: parse, link, compile, artifacts") {
    val projDir = java.nio.file.Paths.get(tmpDir("sem_proj"))
    def write(rel: String, content: String): Unit = {
      val p = projDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: semproj\n")
    write("models/schema.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |metrics:
         |  - name: total_rev
         |    model: spend
         |    calculation: sum(total)
         |  - name: big_orders
         |    model: spend
         |    calculation: count(*)
         |    filter: total > 1000
         |semantic_models:
         |  - name: sem_spend
         |    model: ref('spend')
         |    entities:
         |      - name: o_custkey
         |        type: primary
         |    dimensions:
         |      - name: status
         |        type: categorical
         |    measures:
         |      - name: total
         |        agg: sum
         |        expr: total
         |saved_queries:
         |  - name: rev_by_status
         |    metrics: [total_rev]
         |    group_by: [status]
         |    where: status IS NOT NULL
         |""".stripMargin)
    write("models/spend.sql",
      """{{ config(materialized='table') }}
        |SELECT o_custkey, o_orderstatus AS status, sum(o_totalprice) AS total
        |FROM {{ source('main','orders') }} GROUP BY o_custkey, o_orderstatus""".stripMargin)
    val eng = Engine.fromProject(spark, projDir.toString, tmpDir("wh"))
    val m = eng.manifest
    // both node types parsed and linked downstream of their model/metrics
    val sem = m.nodes("semantic_model.graft.sem_spend").asInstanceOf[SemanticModelNode]
    assert(sem.dependsOn === Seq("model.graft.spend"))
    assert(sem.entities === Seq(("o_custkey", "primary")))
    assert(sem.measures === Seq(("total", "sum", "total")))
    val sq = m.nodes("saved_query.graft.rev_by_status").asInstanceOf[SavedQueryNode]
    assert(sq.dependsOn === Seq("metric.graft.total_rev"))
    // selectors find them
    assert(eng.ls(Seq("semantic_model:sem_spend")) === Seq(sem.uniqueId))
    assert(eng.ls(Seq("saved_query:rev_by_status")) === Seq(sq.uniqueId))
    // run materializes only the model; saved query compiles on demand
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(!eng.wh.exists("sem_spend") && !eng.wh.exists("rev_by_status"))
    val df = eng.querySaved("rev_by_status")
    assert(df.columns.toSet === Set("status", "total_rev"))
    assert(df.count() > 0)
    // metric filters AND into the saved where
    val df2 = eng.querySaved("rev_by_status") // smoke: repeatable
    assert(df2.count() === df.count())
    assertThrows[IllegalArgumentException](eng.querySaved("nope"))
    // manifest artifact carries the semantic fields
    val target = tmpDir("sem_target")
    eng.writeArtifacts(target, results)
    val mf = Files.readString(Paths.get(s"$target/manifest.json"))
    assert(mf.contains("semantic_model.graft.sem_spend") && mf.contains("\"agg\": \"sum\""))
    assert(mf.contains("saved_query.graft.rev_by_status"))
  }

  test("bucketed tables join without a shuffle") {
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    eng.wh.writeBucketedTable("b_orders", orders, Seq("o_orderkey"), 4)
    eng.wh.writeBucketedTable("b_lineitem",
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"), 4)
    val joined = eng.wh.read("b_orders")
      .join(eng.wh.read("b_lineitem"), "o_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // and the result is correct
    assert(joined.count() === lineitem.count())
  }

  test("cluster_by writes range-disjoint files (footer-prunable layout)") {
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    // sf0.001 is small enough that AQE correctly coalesces to ONE file;
    // pin the partition count so the multi-file layout is observable
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try eng.wh.writeTable("c_orders", orders, clusterBy = Seq("o_orderdate"))
    finally spark.conf.set(coalesceKey, prev)
    // content unchanged
    assert(eng.wh.read("c_orders").count() === orders.count())
    // every parquet file covers a DISJOINT o_orderdate range — the
    // property min/max footer pruning needs
    val dir = new java.io.File(s"${eng.wh.root}/c_orders/v0")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "expected multiple range-clustered files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderdate").cast("string"),
          max("o_orderdate").cast("string")).head()
      (r.getString(0), r.getString(1)) // ISO timestamps sort lexically
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges overlap: $hi > $lo2")
      case _ =>
    }
  }

  test("warehouse compact collapses the commit log, content unchanged") {
    import org.apache.spark.sql.functions._
    val eng = new Engine(spark, Manifest(Map.empty), tmpDir("wh"))
    eng.wh.writeTable("cmp", spark.range(10).toDF("id"))
    (1 to 3).foreach(i =>
      eng.wh.appendTable("cmp", spark.range(10L * i, 10L * i + 5).toDF("id")))
    assert(eng.wh.commitCount("cmp") === 4)
    val before = eng.wh.read("cmp").agg(sum("id")).head().getLong(0)
    eng.wh.compact("cmp", targetPartitions = 2)
    assert(eng.wh.commitCount("cmp") === 1)
    assert(eng.wh.read("cmp").agg(sum("id")).head().getLong(0) === before)
    assert(eng.wh.read("cmp").count() === 25)
    // auto-compaction: appends past maxCommits collapse the log
    val wh2 = new graft.exec.Warehouse(spark, tmpDir("wh_auto"), maxCommits = 3)
    wh2.writeTable("ac", spark.range(10).toDF("id"))
    (1 to 5).foreach(i =>
      wh2.appendTable("ac", spark.range(10L * i, 10L * i + 5).toDF("id")))
    assert(wh2.commitCount("ac") <= 3, s"log=${wh2.commitCount("ac")}")
    assert(wh2.read("ac").count() === 35)
  }

  test("streaming model node feeds downstream batch model in one DAG run") {
    import org.apache.spark.sql.functions._
    // streamable copy of events (micros timestamps)
    val evDir = tmpDir("ev_stream")
    graft.Tables.load(spark, sf, "events").repartition(2)
      .write.mode("overwrite").parquet(evDir)
    val schema = spark.read.parquet(evDir).schema
    // dedup stream (emits immediately — unlike windowed aggs, no tail
    // windows withheld by the watermark, so totals are exactly
    // comparable to batch)
    val streamNode = ScalaModelNode(
      name = "t_stream_firsts",
      declaredRefs = Nil, declaredSources = Nil,
      body = ctx => graft.streaming.StreamMaterializer.dedupFirstEvents(
        ctx.spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(evDir)),
      config = NodeConfig(materialized = "streaming_table"))
    val downstream = ModelNode("t_stream_rollup",
      "SELECT event_type, count(*) AS n_keys FROM {{ ref('t_stream_firsts') }} GROUP BY event_type",
      config = NodeConfig(materialized = "table"), refs = Seq("t_stream_firsts"))
    val manifest = graft.parse.ProjectLoader.link(Manifest(
      Seq(streamNode: Node, downstream: Node).map(n => n.uniqueId -> n).toMap))
    val eng = new Engine(spark, manifest, tmpDir("wh"))
    val results = eng.run(threads = 1)
    assert(results.forall(_.status == "success"), results.mkString(";"))
    val rollup = eng.wh.read("t_stream_rollup")
    assert(rollup.count() > 0)
    // streamed distinct-(user,event_type) counts equal the batch ones
    val batch = spark.read.parquet(evDir)
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_keys"))
    val joined = rollup.as("s").join(batch.as("b"), Seq("event_type"), "full")
      .filter(!(col("s.n_keys") <=> col("b.n_keys")))
    assert(joined.count() === 0)
  }

  test("project-level on-run-start/end hooks execute around the run") {
    val projDir = java.nio.file.Paths.get(tmpDir("hook_proj"))
    def write(rel: String, content: String): Unit = {
      val p = projDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml",
      """name: hooky
        |on-run-start: "CREATE OR REPLACE TEMP VIEW run_started AS SELECT 1 AS x"
        |on-run-end:
        |  - "CREATE OR REPLACE TEMP VIEW run_ended AS SELECT 2 AS x"
        |""".stripMargin)
    write("models/sources.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |""".stripMargin)
    write("models/hk.sql", "SELECT count(*) AS n FROM {{ source('main','orders') }}")
    val eng = Engine.fromProject(spark, projDir.toString, tmpDir("wh"))
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    assert(spark.sql("SELECT x FROM run_started").head().getInt(0) === 1)
    assert(spark.sql("SELECT x FROM run_ended").head().getInt(0) === 2)
  }

  test("materialized_view: refresh, then apply/continue/fail on drift") {
    import graft.exec.Materializer
    val eng = new Engine(spark, mkManifest(), tmpDir("wh"))
    val v1 = "SELECT 1 AS x"
    val v2 = "SELECT 2 AS x"
    assert(Materializer.materializedView(eng.wh, "mv1", v1, "apply") === "create")
    assert(eng.wh.read("mv1").head().getInt(0) === 1)
    // same definition -> refresh (data recomputed, no drift)
    assert(Materializer.materializedView(eng.wh, "mv1", v1, "apply") === "refresh")
    // drifted definition
    assert(Materializer.materializedView(eng.wh, "mv1", v2, "apply") === "apply")
    assert(eng.wh.read("mv1").head().getInt(0) === 2)
    assert(Materializer.materializedView(eng.wh, "mv1", v1, "continue") === "continue")
    assert(eng.wh.read("mv1").head().getInt(0) === 2) // stale kept
    assertThrows[IllegalStateException](
      Materializer.materializedView(eng.wh, "mv1", v1, "fail"))
    // engine path: model with materialized='materialized_view' runs
    val mv = ModelNode("t_mv",
      "SELECT o_custkey, count(*) AS n FROM {{ ref('t_stg') }} GROUP BY o_custkey",
      config = NodeConfig(materialized = "materialized_view"), refs = Seq("t_stg"))
    val eng2 = new Engine(spark, mkManifest(mv), tmpDir("wh2"))
    assert(eng2.run().forall(_.status == "success"))
    assert(eng2.wh.read("t_mv").count() > 0)
  }

  test("run-operation invokes a project macro with args") {
    val projDir = java.nio.file.Paths.get(tmpDir("macro_proj"))
    def write(rel: String, content: String): Unit = {
      val p = projDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: macroproj\n")
    write("models/sources.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |""".stripMargin)
    write("macros/ops.sql",
      """{% macro order_count_snapshot(view_name, status='O') %}
        |CREATE OR REPLACE TEMP VIEW {{ view_name }} AS
        |SELECT count(*) AS n FROM {{ source('main','orders') }}
        |WHERE o_orderstatus = '{{ status }}';
        |SELECT * FROM {{ view_name }}
        |{% endmacro %}""".stripMargin)
    val eng = Engine.fromProject(spark, projDir.toString, tmpDir("wh"))
    val dfs = eng.runOperation("order_count_snapshot", Map("view_name" -> "op_out"))
    assert(dfs.length === 2)
    val n = spark.table("op_out").head().getLong(0)
    assert(n > 0)
    assert(dfs.last.head().getLong(0) === n)
    // default arg applied; explicit override changes the result
    eng.runOperation("order_count_snapshot",
      Map("view_name" -> "op_out_f", "status" -> "F"))
    assert(spark.table("op_out_f").head().getLong(0) !== n)
    assertThrows[IllegalArgumentException](eng.runOperation("nope"))
  }

  test("cli init scaffolds a loadable project; clean removes target") {
    val dir = tmpDir("init_proj")
    Cli.main(Array("init", "--project", dir))
    assert(Files.exists(Paths.get(s"$dir/dbt_project.yml")))
    val eng = Engine.fromProject(spark, dir, tmpDir("wh_init"))
    assert(eng.manifest.models.values.exists(_.name == "stg_orders"))
    assert(eng.manifest.sources.values.exists(_.name == "orders"))
    assert(eng.run().forall(_.status == "success"))
    eng.writeArtifacts(s"$dir/target", Nil)
    assert(Files.exists(Paths.get(s"$dir/target/manifest.json")))
    Cli.main(Array("clean", "--project", dir))
    assert(!Files.exists(Paths.get(s"$dir/target")))
  }

  test("selectors.yml: named selectors parse, resolve, and serialize") {
    val projDir = java.nio.file.Paths.get(tmpDir("selectors_proj"))
    def write(rel: String, content: String): Unit = {
      val p = projDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: selproj\n")
    write("models/sources.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |""".stripMargin)
    write("models/stg.sql",
      "{{ config(tags=['staging']) }}\nSELECT * FROM {{ source('main','orders') }}")
    write("models/fct.sql",
      "{{ config(tags=['nightly'], materialized='table') }}\n" +
        "SELECT o_custkey, count(*) AS n FROM {{ ref('stg') }} GROUP BY o_custkey")
    write("models/other.sql", "SELECT 1 AS x")
    write("selectors.yml",
      """selectors:
        |  - name: nightly_only
        |    description: tagged nightly
        |    definition: "tag:nightly"
        |  - name: staged
        |    default: true
        |    definition:
        |      union:
        |        - method: tag
        |          value: staging
        |          children: true
        |        - exclude:
        |            - fqn:other
        |  - name: both_tags
        |    definition:
        |      intersection:
        |        - tag:staging
        |        - tag:nightly
        |""".stripMargin)
    val eng = Engine.fromProject(spark, projDir.toString, tmpDir("wh"))
    // string definition
    assert(eng.namedSelector("nightly_only") === (Seq("tag:nightly"), Nil))
    // union with method flags + exclude; default flagged
    assert(eng.namedSelector("staged") === (Seq("tag:staging+"), Seq("fqn:other")))
    assert(eng.defaultSelector.map(_.name) === Some("staged"))
    // intersection flattens to the comma DSL
    assert(eng.namedSelector("both_tags") === (Seq("tag:staging,tag:nightly"), Nil))
    // resolution end-to-end: staged = staging + its children, minus other
    val (sel, exc) = eng.namedSelector("staged")
    val ids = eng.ls(sel, exc)
    assert(ids.contains("model.graft.stg") && ids.contains("model.graft.fct"))
    assert(!ids.exists(_.contains("other")))
    assertThrows[IllegalArgumentException](eng.namedSelector("nope"))
    // manifest artifact carries the selectors
    val target = tmpDir("sel_target")
    eng.writeArtifacts(target, Nil)
    val mf = Files.readString(Paths.get(s"$target/manifest.json"))
    assert(mf.contains("\"selectors\"") && mf.contains("nightly_only"))
  }

  test("run-operation: {% call statement %} blocks feed load_result in-order") {
    val projDir = java.nio.file.Paths.get(tmpDir("callstmt_proj"))
    def write(rel: String, content: String): Unit = {
      val p = projDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: callstmtproj\n")
    write("models/sources.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |""".stripMargin)
    write("macros/guard.sql",
      """{% macro audit_orders(view_name) %}
        |{% call statement('order_stats', fetch_result=true) %}
        |SELECT count(*) AS n FROM {{ source('main','orders') }}
        |{% endcall %}
        |CREATE OR REPLACE TEMP VIEW {{ view_name }} AS
        |SELECT {{ load_result('order_stats').rows_affected }} AS fetched_rows,
        |       {{ load_result('order_stats').first_value }} AS order_count
        |{% endmacro %}""".stripMargin)
    val eng = Engine.fromProject(spark, projDir.toString, tmpDir("wh"))
    val dfs = eng.runOperation("audit_orders", Map("view_name" -> "audit_out"))
    assert(dfs.length === 2) // the call statement + the view DDL
    val expected = spark.read.parquet(s"$sf/orders.parquet").count()
    val row = spark.table("audit_out").head()
    assert(row.getAs[Number](0).longValue === 1L) // the aggregate returned one row
    assert(row.getAs[Number](1).longValue === expected)
    // registry is per-invocation: a second run re-executes cleanly
    eng.runOperation("audit_orders", Map("view_name" -> "audit_out2"))
    assert(spark.table("audit_out2").head().getAs[Number](1).longValue === expected)
  }

  test("result registry: post-hook reads load_result('main').rows_affected") {
    val audited = ModelNode("t_audited",
      "SELECT o_custkey, count(*) AS n FROM {{ ref('t_stg') }} GROUP BY o_custkey",
      config = NodeConfig(materialized = "table",
        postHook = Seq(
          "CREATE OR REPLACE TEMP VIEW t_audit AS " +
            "SELECT CAST({{ load_result('main').rows_affected }} AS BIGINT) AS rows_written, " +
            "'{{ load_result('main').relation }}' AS rel")),
      refs = Seq("t_stg"))
    val eng = new Engine(spark, mkManifest(audited), tmpDir("wh"))
    val results = eng.run()
    assert(results.forall(_.status == "success"), results.mkString(";"))
    val written = eng.wh.read("t_audited").count()
    val audit = spark.table("t_audit").head()
    assert(audit.getLong(0) === written)
    assert(audit.getString(1) === "t_audited")
    // programmatic surface too
    val slot = eng.loadResult(audited.uniqueId, "main").get
    assert(slot("rows_affected").toLong === written)
    assert(slot("status") === "SUCCESS")
  }

  test("scala model: typed DataFrame body with refs") {
    import org.apache.spark.sql.functions._
    val sm = ScalaModelNode(
      name = "t_scala",
      declaredRefs = Seq("t_fct"),
      declaredSources = Nil,
      body = ctx => ctx.ref("t_fct").agg(sum("n").as("total")))
    val base = mkManifest()
    val linked = ScalaModel.link(sm, base)
    val eng = new Engine(spark, Manifest(base.nodes + (linked.uniqueId -> linked)),
      tmpDir("wh"))
    val res = eng.run()
    assert(res.forall(_.status == "success"), res.mkString(";"))
    val total = eng.wh.read("t_scala").head().getLong(0)
    assert(total === spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("init scaffolds a starter project that build runs unmodified") {
    val proj = tmpDir("init_proj")
    Cli.main(Array("init", "--project", proj,
      "--source-path", s"$sf/orders.parquet"))
    // the scaffold parses and executes through the normal engine path:
    // source -> staging view -> mart table, then its schema tests
    val eng = Engine.fromProject(spark, proj, tmpDir("init_wh"))
    val results = eng.build(Nil)
    assert(results.nonEmpty)
    assert(results.forall(r => r.status == "success" || r.status == "pass"),
      results.mkString("; "))
    val ids = results.map(_.uniqueId).toSet
    assert(ids.contains("model.graft.stg_orders")
      && ids.contains("model.graft.fct_customer_orders"))
    assert(results.count(_.status == "pass") === 2, "not_null + unique tests ran")
    // build() executes in a derived engine scope; recover the warehouse
    // from disk to observe what it materialized
    val mart = new graft.exec.Warehouse(spark, eng.wh.root)
      .read("fct_customer_orders")
    assert(mart.count() > 0)
    // re-init must not clobber user edits (scaffold is create-if-absent)
    val mf = java.nio.file.Paths.get(s"$proj/models/marts/fct_customer_orders.sql")
    java.nio.file.Files.writeString(mf, "-- edited\nSELECT 1 AS x\n")
    Cli.main(Array("init", "--project", proj))
    assert(java.nio.file.Files.readString(mf).startsWith("-- edited"))
  }
}
