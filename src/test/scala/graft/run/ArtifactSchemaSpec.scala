package graft.run

import graft.SparkSpec
import graft.core._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Validates the emitted artifacts against the reference's published
  * JSON schemas (`/root/reference/schemas/dbt/...`): manifest v12,
  * run-results v6, catalog v1, sources v3. The checker enforces the
  * load-bearing subset — `required` presence, `type` correctness,
  * `enum`/`const` membership, recursing through `properties` /
  * `items` / map-valued `additionalProperties` / `anyOf` — and
  * deliberately does NOT enforce `additionalProperties: false`
  * strictness: the artifacts carry a few extra self-describing fields
  * (e.g. seed raw csv) that schema-driven consumers ignore.
  */
class ArtifactSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val mapper = new ObjectMapper()

  private def loadJson(path: String): JsonNode =
    mapper.readTree(Files.readString(Paths.get(path)))

  // ------------------------------------------------- mini validator

  private def typeOk(t: String, v: JsonNode): Boolean = t match {
    case "object" => v.isObject
    case "array" => v.isArray
    case "string" => v.isTextual
    case "number" => v.isNumber
    case "integer" => v.isIntegralNumber
    case "boolean" => v.isBoolean
    case "null" => v.isNull
    case _ => true
  }

  private def validate(s: JsonNode, v: JsonNode, p: String): Seq[String] = {
    if (s.has("anyOf")) {
      val alts = s.get("anyOf").elements.asScala.toSeq
      val runs = alts.map(a => validate(a, v, p))
      if (runs.exists(_.isEmpty)) Nil
      else Seq(s"$p: no anyOf alternative matched " +
        s"(closest: ${runs.minBy(_.size).take(2).mkString(" | ")})")
    } else {
      val errs = scala.collection.mutable.Buffer[String]()
      if (s.has("const") && s.get("const") != v)
        errs += s"$p: expected const ${s.get("const")}, got $v"
      if (s.has("enum") && !s.get("enum").elements.asScala.contains(v))
        errs += s"$p: $v not in enum ${s.get("enum")}"
      if (s.has("type")) {
        val ts = if (s.get("type").isArray)
          s.get("type").elements.asScala.map(_.asText).toSeq
        else Seq(s.get("type").asText)
        if (!ts.exists(typeOk(_, v))) {
          errs += s"$p: expected type ${ts.mkString("/")}, got ${v.getNodeType}"
          return errs.toSeq // wrong shape: deeper checks are meaningless
        }
      }
      if (v.isObject) {
        if (s.has("required"))
          s.get("required").elements.asScala.foreach { r =>
            if (!v.has(r.asText)) errs += s"$p: missing required field '${r.asText}'"
          }
        val props = Option(s.get("properties"))
        v.properties.asScala.foreach { e =>
          props.flatMap(ps => Option(ps.get(e.getKey))) match {
            case Some(sub) => errs ++= validate(sub, e.getValue, s"$p.${e.getKey}")
            case None =>
              // map-style objects: additionalProperties carries the
              // value schema (e.g. manifest.nodes)
              Option(s.get("additionalProperties")).filter(_.isObject).foreach {
                sub => errs ++= validate(sub, e.getValue, s"$p.${e.getKey}")
              }
          }
        }
      }
      if (v.isArray && s.has("items"))
        v.elements.asScala.zipWithIndex.foreach { case (el, i) =>
          errs ++= validate(s.get("items"), el, s"$p[$i]")
        }
      errs.toSeq
    }
  }

  private def assertValid(schemaPath: String, artifactPath: String): Unit = {
    val errs = validate(loadJson(schemaPath), loadJson(artifactPath), "$")
    assert(errs.isEmpty,
      s"\n${artifactPath.split('/').last} vs ${schemaPath.split('/').last}:\n  " +
        errs.take(20).mkString("\n  "))
  }

  // ------------------------------------------------------- fixture

  /** One manifest exercising every artifact-visible node kind. */
  private def fullManifest(): Manifest = {
    val src = SourceNode("main", "orders", s"$sf/orders.parquet",
      loadedAtField = Some("o_orderdate"))
    val stg = ModelNode("a_stg",
      "SELECT o_orderkey, o_custkey, o_totalprice FROM {{ source('main','orders') }}",
      sources = Seq(("main", "orders")), originPath = "models/staging/a_stg.sql",
      description = "Staging orders.")
    val fct = ModelNode("a_fct",
      "SELECT o_custkey, count(*) AS n FROM {{ ref('a_stg') }} GROUP BY o_custkey",
      config = NodeConfig(materialized = "table"), refs = Seq("a_stg"),
      columns = Seq(ColumnInfo("o_custkey", Some("bigint"), "Customer key.",
        tests = Seq(GenericTestRef("unique"), GenericTestRef("not_null")))))
    val seed = SeedNode("a_seed", "id,name\n1,x\n2,y")
    val snap = SnapshotNode("a_snap",
      "SELECT o_custkey, o_totalprice FROM {{ ref('a_stg') }}",
      uniqueKey = Seq("o_custkey"), strategy = CheckStrategy(None),
      refs = Seq("a_stg"))
    val tst = TestNode("not_null_a_fct_n",
      "SELECT * FROM {{ ref('a_fct') }} WHERE n IS NULL",
      refs = Seq("a_fct"), genericTest = Some("not_null"))
    val ut = UnitTestNode("ut_fct", model = "a_fct",
      given = Map("a_stg" -> Seq(Map("o_orderkey" -> 1, "o_custkey" -> 7,
        "o_totalprice" -> 3.5))),
      expect = Seq(Map("o_custkey" -> 7, "n" -> 1)))
    val exp = ExposureNode("dash", exposureType = "dashboard", owner = "Ana",
      url = "http://example/d", refs = Seq("a_fct"))
    val met = MetricNode("m_total", model = "a_fct", calculation = "sum(n)")
    val sem = SemanticModelNode("sem_orders", model = "a_fct",
      entities = Seq(("o_custkey", "primary")),
      measures = Seq(("n_sum", "sum", "n")))
    val sq = SavedQueryNode("sq_orders", metrics = Seq("m_total"),
      groupBy = Seq("o_custkey"), where = Some("n > 0"))
    graft.parse.ProjectLoader.link(Manifest(
      Seq(src, stg, fct, seed, snap, tst, ut, exp, met, sem, sq)
        .map(n => n.uniqueId -> n).toMap))
  }

  test("emitted artifacts validate against the reference JSON schemas") {
    val eng = new Engine(spark, fullManifest(), tmpDir("wh_schema"))
    val results = eng.run()
    assert(results.nonEmpty && results.forall(r =>
      r.status == "success" || r.status == "pass"), results.mkString("; "))
    val target = tmpDir("target_schema")
    eng.writeArtifacts(target, results)
    val base = "/root/reference/schemas/dbt"
    assertValid(s"$base/manifest/v12.json", s"$target/manifest.json")
    assertValid(s"$base/run-results/v6.json", s"$target/run_results.json")
    assertValid(s"$base/catalog/v1.json", s"$target/catalog.json")
    assertValid(s"$base/sources/v3.json", s"$target/sources.json")
    // primary-key inference (reference infer_primary_key): a_fct's
    // o_custkey carries unique + not_null tests -> manifest primary_key
    val mf = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$target/manifest.json")))
    val pk = mf.at("/nodes/model.graft.a_fct/primary_key")
    assert(pk.isArray && pk.size == 1 && pk.get(0).asText == "o_custkey",
      s"inferred primary_key wrong: $pk")
  }

  test("the validator itself rejects non-conforming documents") {
    val rr = loadJson("/root/reference/schemas/dbt/run-results/v6.json")
    // missing required top-level fields
    assert(validate(rr, mapper.readTree("""{"metadata":{}}"""), "$").nonEmpty)
    // bad status enum + wrong elapsed_time type
    val bad = mapper.readTree(
      """{"metadata":{"dbt_schema_version":"x"},
         |"results":[{"status":"exploded","timing":[],"thread_id":"t",
         |"execution_time":1,"adapter_response":{},"message":null,"failures":null,
         |"unique_id":"m.x.y","compiled":true,"compiled_code":null,"relation_name":null}],
         |"elapsed_time":"not a number"}""".stripMargin)
    val errs = validate(rr, bad, "$")
    assert(errs.exists(_.contains("status")), errs.mkString("; "))
    assert(errs.exists(_.contains("elapsed_time")), errs.mkString("; "))
    // a required field stripped from a manifest node is caught
    val mf = loadJson("/root/reference/schemas/dbt/manifest/v12.json")
    val inst = mapper.readTree(
      """{"metadata":{},"nodes":{"model.graft.m":{"name":"m","resource_type":"model"}},
         |"sources":{},"macros":{},"docs":{},"exposures":{},"metrics":{},"groups":{},
         |"selectors":{},"disabled":{},"parent_map":{},"child_map":{},"group_map":{},
         |"saved_queries":{},"semantic_models":{},"unit_tests":{}}""".stripMargin)
    assert(validate(mf, inst, "$").exists(_.contains("anyOf")))
  }

  test("run_results with error/skip statuses still validates") {
    val bad = ModelNode("z_bad", "SELECT * FROM missing_relation_xyz",
      config = NodeConfig(materialized = "table"))
    val down = ModelNode("z_down", "SELECT * FROM {{ ref('z_bad') }}",
      config = NodeConfig(materialized = "table"), refs = Seq("z_bad"))
    val eng = new Engine(spark, graft.parse.ProjectLoader.link(Manifest(
      Seq(bad, down).map(n => n.uniqueId -> n).toMap)), tmpDir("wh_schema2"))
    val results = eng.run()
    assert(results.exists(_.status == "error") && results.exists(_.status == "skipped"))
    val target = tmpDir("target_schema2")
    eng.writeArtifacts(target, results)
    assertValid("/root/reference/schemas/dbt/run-results/v6.json",
      s"$target/run_results.json")
  }
}
