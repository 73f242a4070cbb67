package graft.parse

import graft.SparkSpec
import graft.run.Engine
import java.nio.file.{Files, Path, Paths}

/** A32 deps: local + tarball package install, per-package macro
  * namespacing, package-precedence resolution, lockfile.
  */
class DepsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  /** A reusable fixture package: one source-reading model that uses its
    * OWN unqualified macro (calling-package precedence), one macro the
    * root will call qualified, and one macro the root will SHADOW.
    */
  private def writePackage(dir: Path): Unit = {
    write(dir, "dbt_project.yml", "name: util_pkg\n")
    write(dir, "models/pkg_base.sql",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM {{ source('main', 'orders') }}
        |WHERE {{ even_rows('o_orderkey') }}""".stripMargin)
    write(dir, "macros/utils.sql",
      """{% macro even_rows(c) %}{{ c }} % 2 = 0{% endmacro %}
        |{% macro money(c) %}CAST({{ c }} AS DECIMAL(20,4)){% endmacro %}
        |{% macro greeting() %}pkg{% endmacro %}""".stripMargin)
  }

  private def writeRoot(root: Path, pkgRef: String): Unit = {
    write(root, "dbt_project.yml", "name: deps_root\n")
    write(root, "packages.yml", s"packages:\n  - $pkgRef\n")
    write(root, "models/sources.yml",
      s"""sources:
         |  - name: main
         |    tables:
         |      - name: orders
         |        path: $sf/orders.parquet
         |""".stripMargin)
    // root macro shadows the package's `greeting`; `money` resolves
    // qualified; the packaged MODEL refs like any other
    write(root, "macros/root.sql",
      "{% macro greeting() %}root{% endmacro %}")
    write(root, "models/root_fct.sql",
      """{{ config(materialized='table') }}
        |SELECT o_custkey,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM({{ util_pkg.money('o_totalprice') }}) AS DOUBLE) AS spend
        |FROM {{ ref('pkg_base') }}
        |GROUP BY o_custkey""".stripMargin)
  }

  test("local package: install, load, run — macros namespace correctly") {
    val pkgDir = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_pkg"))
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root"))
    writePackage(pkgDir)
    writeRoot(root, s"local: $pkgDir")

    val installed = Deps.install(root.toString)
    assert(installed.map(_.name) === Seq("util_pkg"))
    assert(Files.exists(root.resolve("dbt_packages/util_pkg/models/pkg_base.sql")))
    assert(Files.exists(root.resolve("package-lock.yml")))
    val lock = Files.readString(root.resolve("package-lock.yml"))
    assert(lock.contains("name: util_pkg") && lock.contains("source: local"))

    val proj = ProjectLoader.load(root.toString)
    // package node carries its package name in the unique id
    assert(proj.manifest.nodes.contains("model.util_pkg.pkg_base"))
    assert(proj.manifest.nodes.contains("model.graft.root_fct"))
    // qualified + unqualified macro resolution
    assert(proj.macros.contains("util_pkg.money"))
    assert(proj.macros("greeting").body === "root") // root shadows pkg
    assert(proj.macrosByPackage("util_pkg")("greeting").body === "pkg")

    val eng = Engine.fromProject(spark, root.toString, tmpDir("wh"))
    val results = eng.run(threads = 2)
    assert(results.forall(_.status == "success"), results.mkString("; "))
    // packaged model used ITS OWN even_rows macro: only even keys
    val base = eng.wh.read("pkg_base")
    assert(base.filter("o_orderkey % 2 != 0").count() === 0)
    assert(base.count() > 0)
    // root model aggregated over the packaged model via ref()
    assert(eng.wh.read("root_fct").count() > 0)
    // run-operation resolves package macros with root precedence
    assert(eng.macroResolverFor("graft")("greeting").get.body === "root")
    assert(eng.macroResolverFor("util_pkg")("greeting").get.body === "pkg")
  }

  test("tarball package: extract, install, load") {
    val pkgDir = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_pkg_tar"))
    writePackage(pkgDir)
    val tarGz = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_tars")).resolve("util_pkg.tar.gz")
    makeTarGz(pkgDir, tarGz)

    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_tar"))
    writeRoot(root, s"tarball: $tarGz")
    val installed = Deps.install(root.toString)
    assert(installed.map(_.name) === Seq("util_pkg"))
    assert(installed.head.kind === "tarball")
    assert(Files.exists(root.resolve("dbt_packages/util_pkg/macros/utils.sql")))

    val eng = Engine.fromProject(spark, root.toString, tmpDir("wh"))
    assert(eng.run(threads = 2).forall(_.status == "success"))
    assert(eng.wh.read("root_fct").count() > 0)
  }

  test("duplicate model names across packages are a hard error") {
    val pkgDir = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_pkg_dup"))
    writePackage(pkgDir)
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_dup"))
    writeRoot(root, s"local: $pkgDir")
    // root model with the SAME name as the packaged one
    write(root, "models/pkg_base.sql", "SELECT 1 AS x")
    Deps.install(root.toString)
    val e = intercept[IllegalArgumentException](ProjectLoader.load(root.toString))
    assert(e.getMessage.contains("pkg_base"))
  }

  test("root project scopes package configs: models: <pkg>: +key") {
    val pkgDir = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_pkg_scope"))
    writePackage(pkgDir)
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_scope"))
    writeRoot(root, s"local: $pkgDir")
    // root project forces the packaged model to materialize as a table
    // and tags it; root's own models keep their own configs
    write(root, "dbt_project.yml",
      """name: deps_root
        |models:
        |  util_pkg:
        |    +materialized: table
        |    +tags: scoped
        |""".stripMargin)
    Deps.install(root.toString)
    val proj = ProjectLoader.load(root.toString)
    val pkgModel = proj.manifest.nodes("model.util_pkg.pkg_base")
    assert(pkgModel.config.materialized === "table")
    assert(pkgModel.config.tags.contains("scoped"))
    // root model unaffected by the package scope
    val rootModel = proj.manifest.nodes("model.graft.root_fct")
    assert(!rootModel.config.tags.contains("scoped"))
  }

  test("per-directory config tree: deeper scopes win, siblings isolated") {
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("cfg_tree"))
    write(root, "dbt_project.yml",
      """name: treeproj
        |models:
        |  +tags: everywhere
        |  treeproj:
        |    +materialized: table
        |    staging:
        |      +materialized: view
        |      +tags: stg
        |      finance:
        |        +schema: fin
        |    marts:
        |      +tags: mart
        |""".stripMargin)
    write(root, "models/top.sql", "SELECT 1 AS a")
    write(root, "models/staging/stg_a.sql", "SELECT 1 AS a")
    write(root, "models/staging/finance/fin_a.sql", "SELECT 1 AS a")
    write(root, "models/marts/mart_a.sql", "SELECT 1 AS a")
    val proj = ProjectLoader.load(root.toString)
    def cfg(n: String) = proj.manifest.nodes(s"model.graft.$n").config
    assert(cfg("top").materialized === "table")
    assert(cfg("top").tags === Set("everywhere"))
    assert(cfg("stg_a").materialized === "view")
    assert(cfg("stg_a").tags === Set("everywhere", "stg"))
    assert(cfg("stg_a").schema === None)
    assert(cfg("fin_a").materialized === "view") // inherited from staging
    assert(cfg("fin_a").schema === Some("fin"))
    assert(cfg("mart_a").materialized === "table") // staging's view not leaked
    assert(cfg("mart_a").tags === Set("everywhere", "mart"))
  }

  test("deps without packages.yml is a no-op; hub entries refused without a mirror") {
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_none"))
    write(root, "dbt_project.yml", "name: lonely\n")
    assert(Deps.install(root.toString) === Nil)
    write(root, "packages.yml",
      "packages:\n  - package: dbt-labs/dbt_utils\n    version: 1.1.1\n")
    val e = intercept[IllegalArgumentException](Deps.install(root.toString, hubUrl = None))
    assert(e.getMessage.contains("egress"))
    val e2 = intercept[IllegalArgumentException](
      Deps.install(root.toString, hubUrl = Some("https://hub.getdbt.com")))
    assert(e2.getMessage.contains("egress"))
  }

  /** Build a local registry mirror: <reg>/<org>/<name>/<version>.tar.gz.
    * Each version's tree carries a VERSION marker macro so the installed
    * tree proves which version won resolution.
    */
  private def mkRegistry(versions: Map[String, Seq[String]]): Path = {
    val reg = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_registry"))
    versions.foreach { case (pkg, vs) =>
      vs.foreach { v =>
        val tree = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_reg_pkg"))
        writePackage(tree)
        write(tree, "macros/version.sql",
          s"{% macro pkg_version() %}$v{% endmacro %}")
        val out = reg.resolve(pkg)
        Files.createDirectories(out)
        makeTarGz(tree, out.resolve(s"$v.tar.gz"))
      }
    }
    reg
  }

  test("hub package from a local registry mirror: semver range picks highest in range") {
    val reg = mkRegistry(Map("org/util_pkg" -> Seq("0.8.0", "0.8.5", "0.9.0")))
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_hub"))
    writeRoot(root,
      "package: org/util_pkg\n    version: [\">=0.8.0\", \"<0.9.0\"]")
    val installed = Deps.install(root.toString, hubUrl = Some(reg.toString))
    assert(installed.map(i => (i.name, i.kind, i.version)) ===
      Seq(("util_pkg", "hub", Some("0.8.5"))))
    val lock = Files.readString(root.resolve("package-lock.yml"))
    assert(lock.contains("version: 0.8.5"))
    assert(Files.readString(root.resolve("dbt_packages/util_pkg/macros/version.sql"))
      .contains("0.8.5"))
    // the installed hub package runs end-to-end like any other
    val eng = Engine.fromProject(spark, root.toString, tmpDir("wh"))
    assert(eng.run(threads = 2).forall(_.status == "success"))
    assert(eng.wh.read("root_fct").count() > 0)
  }

  test("prereleases are excluded unless requested or explicitly pinned") {
    val reg = mkRegistry(Map("org/util_pkg" -> Seq("0.9.0", "1.0.0-rc.1")))
    def rootWith(entry: String): Path = {
      val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_pre"))
      writeRoot(root, entry)
      root
    }
    val r1 = rootWith("package: org/util_pkg\n    version: \">=0.9.0\"")
    assert(Deps.install(r1.toString, hubUrl = Some(reg.toString))
      .head.version === Some("0.9.0"))
    val r2 = rootWith(
      "package: org/util_pkg\n    version: \">=0.9.0\"\n    install-prerelease: true")
    assert(Deps.install(r2.toString, hubUrl = Some(reg.toString))
      .head.version === Some("1.0.0-rc.1"))
    val r3 = rootWith("package: org/util_pkg\n    version: \"1.0.0-rc.1\"")
    assert(Deps.install(r3.toString, hubUrl = Some(reg.toString))
      .head.version === Some("1.0.0-rc.1"))
  }

  test("transitive hub deps install and ranges merge across dependents") {
    val reg = mkRegistry(Map("org/util_pkg" -> Seq("0.8.0", "0.8.5", "0.9.0")))
    // base_pkg depends on util_pkg with its own range
    val baseTree = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_base_pkg"))
    write(baseTree, "dbt_project.yml", "name: base_pkg\n")
    write(baseTree, "macros/base.sql", "{% macro base_m() %}1=1{% endmacro %}")
    write(baseTree, "packages.yml",
      "packages:\n  - package: org/util_pkg\n    version: \"<0.9.0\"\n")
    val baseDir = reg.resolve("org/base_pkg")
    Files.createDirectories(baseDir)
    makeTarGz(baseTree, baseDir.resolve("1.0.0.tar.gz"))

    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_trans"))
    writeRoot(root, "package: org/base_pkg\n    version: \">=1.0.0\"")
    // root ALSO constrains util_pkg from below; merged range -> 0.8.5
    write(root, "packages.yml",
      """packages:
        |  - package: org/base_pkg
        |    version: ">=1.0.0"
        |  - package: org/util_pkg
        |    version: ">=0.8.5"
        |""".stripMargin)
    val installed = Deps.install(root.toString, hubUrl = Some(reg.toString))
    assert(installed.map(_.name).sorted === Seq("base_pkg", "util_pkg"))
    assert(installed.find(_.name == "util_pkg").get.version === Some("0.8.5"))

    // disjoint merged ranges are a hard error naming the package
    write(root, "packages.yml",
      """packages:
        |  - package: org/base_pkg
        |    version: ">=1.0.0"
        |  - package: org/util_pkg
        |    version: "0.9.0"
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      Deps.install(root.toString, hubUrl = Some(reg.toString)))
    assert(e.getMessage.contains("util_pkg") &&
      e.getMessage.contains("not compatible"))
  }

  test("a dependency shadowing the root project name is a hard error") {
    val pkgDir = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_pkg_shadow"))
    writePackage(pkgDir)
    write(pkgDir, "dbt_project.yml", "name: deps_root\n")
    val root = graft.SparkSpec.registerScratch(Files.createTempDirectory("dep_root_shadow"))
    writeRoot(root, s"local: $pkgDir")
    val e = intercept[IllegalArgumentException](Deps.install(root.toString))
    assert(e.getMessage.contains("deps_root"))
  }

  /** Minimal ustar writer — enough structure for Deps.untarGz:
    * 512-byte headers with octal size + checksum, data padded to 512.
    */
  private def makeTarGz(srcDir: Path, out: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val os = new java.util.zip.GZIPOutputStream(Files.newOutputStream(out))
    try {
      def header(name: String, size: Long, isDir: Boolean): Array[Byte] = {
        val h = new Array[Byte](512)
        val nameB = name.getBytes("UTF-8")
        System.arraycopy(nameB, 0, h, 0, math.min(nameB.length, 100))
        def octal(v: Long, off: Int, len: Int): Unit = {
          val s = java.lang.Long.toOctalString(v)
          val padded = ("0" * (len - 1 - s.length)) + s
          System.arraycopy(padded.getBytes("UTF-8"), 0, h, off, len - 1)
        }
        octal(420, 100, 8) // mode 0644
        octal(0, 108, 8); octal(0, 116, 8)
        octal(size, 124, 12)
        octal(0, 136, 12)
        h(156) = if (isDir) '5'.toByte else '0'.toByte
        // checksum: spaces while summing, then written
        java.util.Arrays.fill(h, 148, 156, ' '.toByte)
        val sum = h.map(b => b & 0xff).sum
        val cs = java.lang.Long.toOctalString(sum)
        val csPad = ("0" * (6 - cs.length)) + cs
        System.arraycopy(csPad.getBytes("UTF-8"), 0, h, 148, 6)
        h(154) = 0; h(155) = ' '.toByte
        h
      }
      Files.walk(srcDir).iterator().asScala.toSeq.sortBy(_.toString).foreach { p =>
        val rel = srcDir.relativize(p).toString
        if (rel.nonEmpty) {
          if (Files.isDirectory(p)) os.write(header(rel + "/", 0, isDir = true))
          else {
            val bytes = Files.readAllBytes(p)
            os.write(header(rel, bytes.length.toLong, isDir = false))
            os.write(bytes)
            val pad = (512 - (bytes.length % 512)) % 512
            if (pad > 0) os.write(new Array[Byte](pad))
          }
        }
      }
      os.write(new Array[Byte](1024)) // end-of-archive blocks
    } finally os.close()
  }
}
