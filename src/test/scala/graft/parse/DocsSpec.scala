package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** `{% docs %}` blocks + `{{ doc() }}` resolution (reference
  * `core/dbt/parser/docs.py` + `process_docs` in parser/manifest.py):
  * markdown docs blocks register by name, descriptions in schema YAML
  * reference them, resolution follows package precedence, unknown
  * names are hard errors, and resolved text lands in the manifest
  * artifact.
  */
class DocsSpec extends AnyFunSuite {

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def mkProject(): Path = {
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("docs_proj"))
    write(root, "dbt_project.yml", "name: docsproj\n")
    write(root, "models/overview.md",
      """{% docs orders_doc %}
        |All orders placed through the storefront.
        |{% enddocs %}
        |
        |{% docs status_doc %}One-letter order status.{% enddocs %}""".stripMargin)
    write(root, "models/orders_m.sql", "SELECT 1 AS o_orderstatus")
    write(root, "models/schema.yml",
      """models:
        |  - name: orders_m
        |    description: "{{ doc('orders_doc') }}"
        |    columns:
        |      - name: o_orderstatus
        |        description: "Status: {{ doc('status_doc') }}"
        |""".stripMargin)
    root
  }

  test("docs blocks parse and doc() resolves into model and column descriptions") {
    val proj = ProjectLoader.load(mkProject().toString)
    assert(proj.docs("orders_doc") ===
      "All orders placed through the storefront.")
    val m = proj.manifest.nodes("model.graft.orders_m")
      .asInstanceOf[graft.core.ModelNode]
    assert(m.description === "All orders placed through the storefront.")
    assert(m.columns.head.description === "Status: One-letter order status.")
  }

  test("unknown doc() reference is a hard parse error") {
    val root = mkProject()
    write(root, "models/schema.yml",
      """models:
        |  - name: orders_m
        |    description: "{{ doc('nope_doc') }}"
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](ProjectLoader.load(root.toString))
    assert(e.getMessage.contains("nope_doc"))
  }

  test("package docs resolve with package precedence and pkg-qualified doc()") {
    val root = mkProject()
    // installed package with its own docs block shadowed name + unique name
    write(root, "dbt_packages/util_pkg/dbt_project.yml", "name: util_pkg\n")
    write(root, "dbt_packages/util_pkg/models/docs.md",
      """{% docs orders_doc %}PKG orders doc.{% enddocs %}
        |{% docs pkg_only_doc %}Only in the package.{% enddocs %}""".stripMargin)
    write(root, "dbt_packages/util_pkg/models/pkg_m.sql", "SELECT 1 AS a")
    write(root, "dbt_packages/util_pkg/models/schema.yml",
      """models:
        |  - name: pkg_m
        |    description: "{{ doc('orders_doc') }}"
        |""".stripMargin)
    // root model referencing the package's doc with a qualified name
    write(root, "models/schema.yml",
      """models:
        |  - name: orders_m
        |    description: "{{ doc('util_pkg', 'pkg_only_doc') }}"
        |""".stripMargin)
    val proj = ProjectLoader.load(root.toString)
    // package model's unqualified ref resolves to ITS OWN docs block
    val pkgM = proj.manifest.nodes("model.util_pkg.pkg_m")
      .asInstanceOf[graft.core.ModelNode]
    assert(pkgM.description === "PKG orders doc.")
    // root model resolves the package-qualified name
    val rootM = proj.manifest.nodes("model.graft.orders_m")
      .asInstanceOf[graft.core.ModelNode]
    assert(rootM.description === "Only in the package.")
    // flat export carries root-shadowed + qualified keys
    assert(proj.docs("orders_doc") === "All orders placed through the storefront.")
    assert(proj.docs("util_pkg.orders_doc") === "PKG orders doc.")
  }

  test("resolved descriptions land in the manifest artifact") {
    val root = mkProject()
    val proj = ProjectLoader.load(root.toString)
    val out = graft.SparkSpec.registerScratch(Files.createTempDirectory("docs_art")).resolve("manifest.json")
    graft.run.Artifacts.writeManifest(out.toString, proj.manifest,
      new java.sql.Timestamp(0), "test-invocation")
    val json = Files.readString(out)
    assert(json.contains("All orders placed through the storefront."))
    assert(json.contains("Status: One-letter order status."))
  }
}
