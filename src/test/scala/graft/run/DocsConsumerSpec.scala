package graft.run

import graft.SparkSpec
import java.nio.file.Files

/** The docs artifacts proven against their REAL consumer: the vendored
  * dbt docs SPA (resources/graft/docs/index.html — dbt's published
  * build artifact) is served by DocsServer over this engine's
  * manifest.json/catalog.json, and every endpoint the app loads at
  * startup must resolve (no 404s) with parseable JSON carrying the
  * shapes the app reads (`nodes`, `sources`, `metadata`).
  */
class DocsConsumerSpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val body =
      if (code == 200) new String(conn.getInputStream.readAllBytes(), "UTF-8")
      else ""
    conn.disconnect()
    (code, body)
  }

  private def mkProject(): java.nio.file.Path = {
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("docs_site_proj"))
    def write(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    write("dbt_project.yml", "name: docsite\n")
    write("models/base_m.sql", "SELECT 1 AS id, 'x' AS tag")
    write("models/fct_m.sql",
      "{{ config(materialized='table') }}\nSELECT id, tag FROM {{ ref('base_m') }}")
    root
  }

  test("dbt docs app skeleton serves and its startup endpoints resolve") {
    val root = mkProject()
    val eng = Engine.fromProject(spark, root.toString,
      graft.SparkSpec.registerScratch(Files.createTempDirectory("docs_site_wh")).toString)
    assert(eng.run().forall(_.status == "success"))
    val target = graft.SparkSpec.registerScratch(Files.createTempDirectory("docs_site_target")).toString
    eng.writeDocsArtifacts(target)
    Artifacts.writeLineageHtml(s"$target/lineage.html", eng.manifest)

    val server = DocsServer.serve(target, 0)
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val (rootCode, index) = get(s"$base/")
      assert(rootCode == 200, "/ must serve the docs app")
      assert(index.contains("<title>dbt Docs</title>"),
        "index.html must be the dbt docs SPA skeleton")
      // the two artifacts the app fetches at startup
      val (mCode, manifest) = get(s"$base/manifest.json")
      assert(mCode == 200, "manifest.json must resolve")
      val (cCode, catalog) = get(s"$base/catalog.json")
      assert(cCode == 200, "catalog.json must resolve")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val mNode = om.readTree(manifest)
      assert(mNode.has("nodes") && mNode.has("sources") && mNode.has("metadata"),
        "manifest must carry the keys the app reads")
      assert(mNode.get("nodes").has("model.graft.fct_m"))
      val cNode = om.readTree(catalog)
      assert(cNode.has("nodes") && cNode.has("metadata"))
      assert(get(s"$base/lineage.html")._1 == 200)
      assert(get(s"$base/nope.json")._1 == 404)
    } finally server.stop(0)
  }

  test("static_index.html inlines both artifacts (the --static variant)") {
    val root = mkProject()
    val eng = Engine.fromProject(spark, root.toString,
      graft.SparkSpec.registerScratch(Files.createTempDirectory("docs_static_wh")).toString)
    assert(eng.run().forall(_.status == "success"))
    val target = graft.SparkSpec.registerScratch(Files.createTempDirectory("docs_static_target")).toString
    eng.writeDocsArtifacts(target)
    val static = Files.readString(java.nio.file.Paths.get(s"$target/static_index.html"))
    assert(!static.contains("MANIFEST.JSON INLINE DATA"),
      "manifest placeholder must be substituted")
    assert(!static.contains("CATALOG.JSON INLINE DATA"),
      "catalog placeholder must be substituted")
    assert(static.contains("model.graft.fct_m"),
      "inlined manifest must carry the project's nodes")
  }
}
