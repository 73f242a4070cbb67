package graft.run

import org.scalatest.funsuite.AnyFunSuite
import graft.core.PythonModelNode

/** Static-extraction contract for Python models (reference
  * `core/dbt/parser/models.py:30-140`: the AST visitor accepts only
  * literal `dbt.ref("...")` / `dbt.source("...","...")` /
  * `dbt.config(key=value)` call shapes and errors on anything
  * dynamic, so the regex extraction here implements the same
  * contract), plus the parse→manifest wiring (config cascade,
  * dependency linking, partial-parse caching). The RUNTIME (subprocess
  * execution, incremental apply) is oracle-gated by m51/m52.
  */
class PythonModelSpec extends AnyFunSuite {

  test("extractRefs: both quote styles, whitespace, dedup") {
    val code =
      """def model(dbt, session):
        |    a = dbt.ref("orders")
        |    b = dbt . ref( 'customers' )
        |    c = dbt.ref("orders")  # repeated
        |    return a.join(b, "k")
        |""".stripMargin
    assert(PythonModel.extractRefs(code) === Seq("orders", "customers"))
  }

  test("extractSources: two-arg literal shape") {
    val code = """x = dbt.source("raw", "events"); y = dbt.source('raw', 'users')"""
    assert(PythonModel.extractSources(code) ===
      Seq(("raw", "events"), ("raw", "users")))
  }

  test("extractConfig: strings, booleans, ints") {
    val code =
      """def model(dbt, session):
        |    dbt.config(materialized="incremental", unique_key='id',
        |               full_refresh=False, some_n=3)
        |    return dbt.ref("src")
        |""".stripMargin
    val kw = PythonModel.extractConfig(code)
    assert(kw("materialized") === "incremental")
    assert(kw("unique_key") === "id")
    assert(kw("full_refresh") === "false")
    assert(kw("some_n") === "3")
  }

  test("project loader: .py file parses, config cascades, deps link") {
    val dir = graft.SparkSpec.registerScratch(java.nio.file.Files.createTempDirectory("pymspec"))
    try {
      def write(rel: String, content: String): Unit = {
        val p = dir.resolve(rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, content): Unit
      }
      write("dbt_project.yml",
        "name: pym\nmodels:\n  pym:\n    +tags: [\"from_tree\"]\n")
      write("seeds/src.csv", "id\n1\n")
      write("models/py_m.py",
        """def model(dbt, session):
          |    dbt.config(materialized="table")
          |    return dbt.ref("src")
          |""".stripMargin)
      write("models/down.sql", "SELECT * FROM {{ ref('py_m') }}")
      val proj = graft.parse.ProjectLoader.load(dir.toString)
      val py = proj.manifest.nodes.values.collectFirst {
        case p: PythonModelNode => p
      }.getOrElse(fail("no PythonModelNode parsed"))
      assert(py.name === "py_m")
      assert(py.config.materialized === "table")
      assert(py.config.tags.contains("from_tree"), "dir-tree config must cascade")
      assert(py.refs === Seq("src"))
      // ref extraction put the seed in dependsOn; the SQL model depends
      // on the python node — python models are ordinary DAG citizens
      assert(py.dependsOn.exists(_.endsWith(".src")))
      val down = proj.manifest.nodes.values.collectFirst {
        case m: graft.core.ModelNode if m.name == "down" => m
      }.get
      assert(down.dependsOn.contains(py.uniqueId))
      // python models default to table even without a config call
      write("models/py_plain.py",
        "def model(dbt, session):\n    return dbt.ref(\"src\")\n")
      val proj2 = graft.parse.ProjectLoader.load(dir.toString)
      val plain = proj2.manifest.nodes.values.collectFirst {
        case p: PythonModelNode if p.name == "py_plain" => p
      }.get
      assert(plain.config.materialized === "table")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }

  test("validate: dynamic call shapes fail at parse, naming the shape") {
    // reference verify_python_model_code (models.py:60-101): any
    // dbt.ref/source/config call the static extractor could not
    // consume as a literal is a parse error, not a silent miss
    def bad(code: String, shape: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        PythonModel.validate("m", code)
      }
      assert(e.getMessage.contains(shape), s"message was: ${e.getMessage}")
      assert(e.getMessage.contains("non-literal") ||
        e.getMessage.contains("not a literal"))
    }
    bad("def model(dbt, session):\n    v = 'orders'\n    return dbt.ref(v)\n",
      "dbt.ref()")
    bad("def model(dbt, session):\n    return dbt.ref(f\"{name}\")\n",
      "dbt.ref()")
    bad("def model(dbt, session):\n    return dbt.source(s, 'events')\n",
      "dbt.source()")
    bad("def model(dbt, session):\n    dbt.config(materialized=mode())\n" +
      "    return dbt.ref('src')\n", "dbt.config()")
    // literal-only models (the m51 shapes) still pass
    PythonModel.validate("m",
      """def model(dbt, session):
        |    dbt.config(materialized="incremental", unique_key='id')
        |    a = dbt.ref("orders")
        |    b = dbt.source('raw', 'events')
        |    n = dbt.config.get("some_n", 3)  # runtime getter is fine
        |    return a.join(b, "k")
        |""".stripMargin)
    // and the loader surfaces the error at project parse time
    val dir = graft.SparkSpec.registerScratch(java.nio.file.Files.createTempDirectory("pymdyn"))
    try {
      def write(rel: String, content: String): Unit = {
        val p = dir.resolve(rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, content): Unit
      }
      write("dbt_project.yml", "name: pymdyn\n")
      write("models/py_dyn.py",
        "def model(dbt, session):\n    v = 'x'\n    return dbt.ref(v)\n")
      val e = intercept[IllegalArgumentException] {
        graft.parse.ProjectLoader.load(dir.toString)
      }
      assert(e.getMessage.contains("py_dyn"))
      assert(e.getMessage.contains("dbt.ref()"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }

  test("state checksums: body is the code, content folds config") {
    import graft.core.StateHash
    val a = PythonModelNode("m", "def model(dbt, session): return 1")
    val b = a.copy(code = a.code + " # edited")
    assert(StateHash.of(a).body !== StateHash.of(b).body)
    val c = a.copy(config = a.config.copy(alias = Some("other")))
    assert(StateHash.of(a).body === StateHash.of(c).body,
      "a config-only change must not read as a body change")
    assert(StateHash.of(a).content !== StateHash.of(c).content)
  }
}
