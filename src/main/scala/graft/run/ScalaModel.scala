package graft.run

import graft.core.{Manifest, ModelApi, ScalaModelNode}
import org.apache.spark.sql.DataFrame

/** Runtime for code models (graft.core.ScalaModelNode — the analog of
  * the reference's Python models, A28).
  */
object ScalaModel {

  /** Engine-backed ModelApi. */
  final class ModelCtx(engine: Engine) extends ModelApi {
    def spark: org.apache.spark.sql.SparkSession = engine.spark
    def ref(name: String): DataFrame = {
      val node = engine.manifest.resolveRef(name).getOrElse(
        throw new IllegalArgumentException(s"unresolved ref: $name"))
      engine.wh.read(engine.relationName(node))
    }
    def source(src: String, table: String): DataFrame = {
      val node = engine.manifest.resolveSource(src, table).getOrElse(
        throw new IllegalArgumentException(s"unresolved source: $src.$table"))
      engine.wh.read(engine.relationName(node))
    }
    def variable(name: String, default: String = null): String =
      engine.vars.getOrElse(name,
        Option(default).getOrElse(
          throw new IllegalArgumentException(s"undefined var: $name")))
  }

  /** Resolve declared refs/sources into dependsOn ids (mirrors the
    * reference's AST-extraction step).
    */
  def link(node: ScalaModelNode, manifest: Manifest): ScalaModelNode = {
    val refIds = node.declaredRefs.map(r => manifest.resolveRef(r)
      .getOrElse(throw new IllegalArgumentException(s"unresolved ref: $r")).uniqueId)
    val srcIds = node.declaredSources.map { case (s, t) => manifest.resolveSource(s, t)
      .getOrElse(throw new IllegalArgumentException(s"unresolved source: $s.$t")).uniqueId }
    node.copy(dependsOn = (node.dependsOn ++ refIds ++ srcIds).distinct)
  }

  /** Execute: run body, materialize per config. */
  def run(engine: Engine, node: ScalaModelNode): Unit = {
    val df = node.body(new ModelCtx(engine))
    node.config.materialized match {
      case "view" => engine.wh.createView(engine.relationName(node), df)
      case _ => engine.wh.writeTable(engine.relationName(node), df,
        node.config.partitionBy)
    }
  }
}
