package graft.run

import graft.core._
import graft.exec.Materializer
import java.nio.file.{Files, Paths}

/** Artifact writers — shape-compatible subsets of the reference's
  * `target/manifest.json` (schema v12), `run_results.json` (v6) and
  * `catalog.json` (v1) (`core/dbt/artifacts/schemas/...`). Hand-rolled
  * JSON (no external deps beyond the Spark classpath).
  */
object Artifacts {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def q(s: String): String = "\"" + esc(s) + "\""
  private def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")
  private def arr(items: Seq[String]): String = items.mkString("[", ", ", "]")

  def writeRunResults(
      path: String,
      results: Seq[Materializer.Result],
      invocationId: String,
      generatedAt: java.sql.Timestamp): Unit = {
    val items = results.map { r =>
      obj(Seq(
        "unique_id" -> q(r.uniqueId),
        "status" -> q(r.status),
        "message" -> q(r.message),
        "execution_time" -> r.elapsedSec.toString,
        "rows_affected" -> r.rowsAffected.toString,
        "adapter_response" -> obj(Nil),
        "timing" -> arr(Nil),
        "thread_id" -> q("main"),
        "failures" -> (if (r.status == "fail") "1" else "null")))
    }
    val doc = obj(Seq(
      "metadata" -> obj(Seq(
        "dbt_schema_version" -> q("https://schemas.getdbt.com/dbt/run-results/v6.json"),
        "generated_at" -> q(generatedAt.toInstant.toString),
        "invocation_id" -> q(invocationId))),
      "results" -> arr(items),
      "elapsed_time" -> results.map(_.elapsedSec).sum.toString,
      "args" -> obj(Nil)))
    write(path, doc)
  }

  def writeManifest(path: String, manifest: Manifest,
      generatedAt: java.sql.Timestamp, invocationId: String): Unit = {
    def nodeJson(n: Node): String = {
      val base = Seq(
        "unique_id" -> q(n.uniqueId),
        "name" -> q(n.name),
        "resource_type" -> q(n.resourceType),
        "package_name" -> q("graft"),
        "depends_on" -> obj(Seq("nodes" -> arr(n.dependsOn.map(q)))),
        "config" -> obj(Seq(
          "materialized" -> q(n.config.materialized),
          "enabled" -> n.config.enabled.toString,
          "tags" -> arr(n.config.tags.toSeq.sorted.map(q)))),
        "tags" -> arr(n.config.tags.toSeq.sorted.map(q)))
      val extra = n match {
        case m: ModelNode => Seq("raw_code" -> q(m.rawSql)) ++
          (if (m.description.nonEmpty) Seq("description" -> q(m.description)) else Nil) ++
          (if (m.columns.nonEmpty) Seq("columns" -> obj(m.columns.map(c =>
            c.name -> obj(Seq("name" -> q(c.name)) ++
              c.dataType.map(t => "data_type" -> q(t)) ++
              (if (c.description.nonEmpty) Seq("description" -> q(c.description))
               else Nil)))))
           else Nil) ++
          m.version.map(v => "version" -> v.toString) ++
          m.latestVersion.map(lv => "latest_version" -> lv.toString)
        case s: SnapshotNode => Seq("raw_code" -> q(s.rawSql))
        case t: TestNode => Seq("raw_code" -> q(t.rawSql))
        case s: SemanticModelNode => Seq(
          "model" -> q(s.model),
          "entities" -> arr(s.entities.map { case (en, et) =>
            obj(Seq("name" -> q(en), "type" -> q(et))) }),
          "dimensions" -> arr(s.dimensions.map { case (dn, dt) =>
            obj(Seq("name" -> q(dn), "type" -> q(dt))) }),
          "measures" -> arr(s.measures.map { case (mn, ma, me) =>
            obj(Seq("name" -> q(mn), "agg" -> q(ma), "expr" -> q(me))) }))
        case s: SavedQueryNode => Seq(
          "metrics" -> arr(s.metrics.map(q)),
          "group_by" -> arr(s.groupBy.map(q))) ++
          s.where.map(w => "where" -> q(w))
        case _ => Nil
      }
      obj(base ++ extra)
    }
    val (sources, others) = manifest.nodes.partition(_._2.resourceType == "source")
    val doc = obj(Seq(
      "metadata" -> obj(Seq(
        "dbt_schema_version" -> q("https://schemas.getdbt.com/dbt/manifest/v12.json"),
        "generated_at" -> q(generatedAt.toInstant.toString),
        "invocation_id" -> q(invocationId),
        "project_name" -> q("graft"))),
      "nodes" -> obj(others.toSeq.sortBy(_._1).map { case (id, n) => id -> nodeJson(n) }),
      "sources" -> obj(sources.toSeq.sortBy(_._1).map { case (id, n) => id -> nodeJson(n) }),
      "parent_map" -> obj(manifest.parentMap.toSeq.sortBy(_._1).map {
        case (id, ps) => id -> arr(ps.toSeq.sorted.map(q)) }),
      "child_map" -> obj(manifest.nodes.keys.toSeq.sorted.map { id =>
        id -> arr(manifest.childMap.getOrElse(id, Set.empty).toSeq.sorted.map(q)) }),
      "selectors" -> obj(manifest.selectors.toSeq.sortBy(_._1).map {
        case (name, s) => name -> obj(Seq(
          "name" -> q(s.name),
          "default" -> s.isDefault.toString,
          "select" -> arr(s.select.map(q)),
          "exclude" -> arr(s.exclude.map(q)),
          "description" -> q(s.description))) })))
    write(path, doc)
  }

  /** `docs generate` lineage graph as GraphViz DOT — the plain-text
    * analog of the reference's interactive site (the site itself is
    * out of scope; the lineage graph it renders is not). Nodes are
    * shaped by resource type; edges follow the parent map.
    */
  def writeLineageDot(path: String, manifest: Manifest): Unit = {
    def shape(rt: String): String = rt match {
      case "source" => "cds"
      case "seed" => "cylinder"
      case "test" | "unit_test" => "note"
      case "exposure" | "metric" | "semantic_model" | "saved_query" => "oval"
      case _ => "box"
    }
    val sb = new StringBuilder("digraph graft {\n  rankdir=LR;\n  node [fontsize=10];\n")
    manifest.nodes.toSeq.sortBy(_._1).foreach { case (id, n) =>
      sb.append(s"""  "$id" [label="${n.name}" shape=${shape(n.resourceType)}];\n""")
    }
    manifest.parentMap.toSeq.sortBy(_._1).foreach { case (child, parents) =>
      parents.toSeq.sorted.foreach(p => sb.append(s"""  "$p" -> "$child";\n"""))
    }
    sb.append("}\n")
    write(path, sb.toString)
  }

  /** `docs generate` static lineage page: a single self-contained HTML
    * file — no scripts, no external assets — rendering each node with
    * its type, description, and upstream/downstream links (anchor
    * navigation). The dependency-free counterpart of the reference's
    * docs site: everything its lineage view answers ("what feeds
    * this?", "what breaks if I change it?") is one click here, and the
    * file ships anywhere a parquet file does.
    */
  def writeLineageHtml(path: String, manifest: Manifest): Unit = {
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")
    val childMap: Map[String, Seq[String]] = manifest.parentMap.toSeq
      .flatMap { case (c, ps) => ps.toSeq.map(_ -> c) }
      .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).sorted }
    def links(ids: Seq[String]): String =
      if (ids.isEmpty) "<em>none</em>"
      else ids.map(i => s"""<a href="#${esc(i)}">${esc(i)}</a>""").mkString(", ")
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html><html><head><meta charset=\"utf-8\">")
    sb.append(s"<title>graft lineage — ${esc(manifest.nodes.size.toString)} nodes</title>")
    sb.append("<style>body{font-family:sans-serif;margin:2em}" +
      "section{border:1px solid #ccc;border-radius:4px;padding:.6em 1em;margin:.5em 0}" +
      "h2{margin:.2em 0;font-size:1em}.rt{color:#666;font-size:.85em}</style>")
    sb.append("</head><body><h1>graft lineage</h1>")
    manifest.nodes.toSeq.sortBy(_._1).foreach { case (id, n) =>
      val parents = manifest.parentMap.getOrElse(id, Set.empty).toSeq.sorted
      sb.append(s"""<section id="${esc(id)}"><h2>${esc(n.name)} """ +
        s"""<span class="rt">(${esc(n.resourceType)})</span></h2>""")
      sb.append(s"<div>upstream: ${links(parents)}</div>")
      sb.append(s"<div>downstream: ${links(childMap.getOrElse(id, Nil))}</div>")
      sb.append("</section>")
    }
    sb.append("</body></html>")
    write(path, sb.toString)
  }

  /** `docs generate` catalog: relations + columns from the live
    * warehouse (reference `core/dbt/task/docs/generate.py`).
    */
  def writeCatalog(path: String, wh: graft.exec.Warehouse,
      generatedAt: java.sql.Timestamp): Unit = {
    val nodes = wh.list.map { name =>
      val df = wh.read(name)
      val cols = df.schema.fields.zipWithIndex.map { case (f, i) =>
        f.name -> obj(Seq(
          "type" -> q(f.dataType.sql),
          "index" -> (i + 1).toString,
          "name" -> q(f.name),
          "comment" -> "null"))
      }
      name -> obj(Seq(
        "metadata" -> obj(Seq(
          "type" -> q(if (wh.isView(name)) "view" else "table"),
          "schema" -> q("main"),
          "name" -> q(name))),
        "columns" -> obj(cols.toSeq),
        "stats" -> {
          // row counts from parquet footers (no scan); views = unknown
          val n = wh.rowCount(name)
          if (n < 0) obj(Nil)
          else obj(Seq("row_count" -> obj(Seq(
            "id" -> q("row_count"), "label" -> q("Row Count"),
            "value" -> n.toString, "include" -> "true"))))
        }))
    }
    val doc = obj(Seq(
      "metadata" -> obj(Seq(
        "dbt_schema_version" -> q("https://schemas.getdbt.com/dbt/catalog/v1.json"),
        "generated_at" -> q(generatedAt.toInstant.toString))),
      "nodes" -> obj(nodes),
      "sources" -> obj(Nil),
      "errors" -> "null"))
    write(path, doc)
  }

  /** `sources.json` (freshness v3 subset, reference
    * `core/dbt/artifacts/schemas/freshness`): one entry per checked
    * source with status and age seconds.
    */
  def writeSources(path: String,
      freshness: Map[String, (String, Double)],
      generatedAt: java.sql.Timestamp, invocationId: String): Unit = {
    val items = freshness.toSeq.sortBy(_._1).map { case (id, (status, age)) =>
      obj(Seq(
        "unique_id" -> q(id),
        "status" -> q(status),
        "max_loaded_at_time_ago_in_s" -> age.toString,
        "criteria" -> obj(Nil),
        "adapter_response" -> obj(Nil),
        "timing" -> arr(Nil)))
    }
    val doc = obj(Seq(
      "metadata" -> obj(Seq(
        "dbt_schema_version" -> q("https://schemas.getdbt.com/dbt/sources/v3.json"),
        "generated_at" -> q(generatedAt.toInstant.toString),
        "invocation_id" -> q(invocationId))),
      "results" -> arr(items),
      "elapsed_time" -> "0.0"))
    write(path, doc)
  }

  /** Read statuses back from run_results.json (for `retry`). */
  def readRunStatuses(path: String): Map[String, String] = {
    val txt = Files.readString(Paths.get(path))
    val entry = """"unique_id":\s*"([^"]+)"[^}]*?"status":\s*"([^"]+)"""".r
    entry.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2)).toMap
  }

  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }
}
