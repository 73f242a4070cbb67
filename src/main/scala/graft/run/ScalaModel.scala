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

  /** Execute: run body, materialize per config.
    *
    * `streaming_table`: the body returns a STREAMING DataFrame
    * (readStream source); it is drained into the warehouse with an
    * AvailableNow trigger — processes everything available, then stops,
    * so downstream batch nodes in the same DAG run see complete data.
    * Checkpoints live under the warehouse, so a later engine run
    * resumes incrementally (exactly-once per micro-batch commit).
    */
  def run(engine: Engine, node: ScalaModelNode): Unit = {
    val df = node.body(new ModelCtx(engine))
    node.config.materialized match {
      case "view" => engine.wh.createView(engine.relationName(node), df)
      case "streaming_table" =>
        require(df.isStreaming, s"${node.name}: streaming_table body must return a streaming DataFrame")
        val rel = engine.relationName(node)
        val q = graft.streaming.StreamMaterializer.writeToWarehouse(
          engine.wh, rel, df,
          checkpointDir = s"${engine.warehouseRoot}/_checkpoints/$rel")
        q.awaitTermination()
        // a stream that emitted nothing still needs the relation to exist
        if (!engine.wh.exists(rel))
          engine.wh.writeTable(rel, engine.spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), df.schema))
      case _ => engine.wh.writeTable(engine.relationName(node), df,
        node.config.partitionBy)
    }
  }
}
