package graft.run

import graft.core.PythonModelNode

/** Runtime for Python models (reference `def model(dbt, session)`:
  * `core/dbt/parser/models.py:30-140` static extraction,
  * `core/dbt/compilation.py:407-416` runtime wrapper, adapter
  * `submit_python_job` for execution).
  *
  * Execution model — a PySpark SUBPROCESS over the same warehouse
  * files, the hermetic analog of the reference's "submit to the
  * platform's python runtime" (a dbt-spark/databricks/dataproc job
  * submission; there the model also runs in its own remote session,
  * never inside dbt's process): the engine hands the subprocess a JSON
  * spec (model file, ref→files map, extracted config, output dir), the
  * model body runs under its own local SparkSession receiving a real
  * `session` and a `dbt` shim (`ref`/`source`/`config.get`/`var`), and
  * writes its result as parquet; the engine then commits that output
  * through the normal versioned-table write path. Upstream relations
  * are read FILE-DIRECT from their current version paths and the
  * result lands file-direct, so no table data ever crosses a process
  * boundary through a driver — the bridge is O(model IO) at any scale,
  * and on a cluster the same spec would point at object-store paths.
  *
  * Scope: `materialized='table'` and `'incremental'` (+ partition_by),
  * matching the reference's limit. Incremental runs hand the model
  * `dbt.is_incremental=True` and register the existing table under
  * `dbt.this` in the subprocess session; the subprocess output is then
  * applied as the DELTA through Materializer.incrementalApply.
  */
object PythonModel {

  // Static extraction. The reference's PythonValidationVisitor accepts
  // exactly the literal call shapes `dbt.ref("name")`,
  // `dbt.source("src", "table")` and `dbt.config(key=value, ...)`
  // (models.py:60-101 verify_python_model_code errors on anything
  // dynamic), so a regex over the source implements the same contract.
  private val refRe =
    """dbt\s*\.\s*ref\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val srcRe =
    """dbt\s*\.\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)""".r
  private val cfgRe = """dbt\s*\.\s*config\(([^)]*)\)""".r
  private val kwRe =
    """(\w+)\s*=\s*(?:['"]([^'"]*)['"]|(True|False|\d+))""".r

  def extractRefs(code: String): Seq[String] =
    refRe.findAllMatchIn(code).map(_.group(1)).toSeq.distinct

  def extractSources(code: String): Seq[(String, String)] =
    srcRe.findAllMatchIn(code).map(m => (m.group(1), m.group(2))).toSeq.distinct

  def extractConfig(code: String): Map[String, String] =
    cfgRe.findAllMatchIn(code).flatMap(m =>
      kwRe.findAllMatchIn(m.group(1)).map(k =>
        k.group(1) -> Option(k.group(2)).getOrElse(k.group(3).toLowerCase)))
      .toMap

  /** Parse-time rejection of DYNAMIC call shapes — the reference's
    * `verify_python_model_code` raises a parse error on any
    * `dbt.ref`/`dbt.source`/`dbt.config` call whose arguments are not
    * literals (`core/dbt/parser/models.py:60-101` — static extraction
    * cannot see a variable, f-string or call result). After removing
    * every literal-shaped match, a surviving call is dynamic by
    * construction; for `dbt.config`, each kwarg must individually be a
    * literal (the whole call can match the paren regex while carrying
    * a non-literal value).
    */
  def validate(name: String, code: String): Unit = {
    def snippet(s: String): String =
      s.take(70).takeWhile(_ != '\n').trim
    val noCfg = cfgRe.replaceAllIn(
      srcRe.replaceAllIn(refRe.replaceAllIn(code, ""), ""),
      m => {
        // a config call survives only if every kwarg is literal-shaped
        val args = m.group(1)
        val rest = kwRe.replaceAllIn(args, "")
        if (rest.forall(c => c == ',' || c.isWhitespace)) "" else
          throw new IllegalArgumentException(
            s"python model $name: dbt.config() argument is not a literal " +
              "keyword (parsing is static; reference " +
              "core/dbt/parser/models.py:60-101 verify_python_model_code): " +
              snippet(m.matched))
      })
    val dynRe = """dbt\s*\.\s*(ref|source|config)\s*\(""".r
    for (m <- dynRe.findFirstMatchIn(noCfg))
      throw new IllegalArgumentException(
        s"python model $name: dbt.${m.group(1)}() with non-literal " +
          "arguments is not supported (parsing is static; reference " +
          "core/dbt/parser/models.py:60-101 verify_python_model_code): " +
          snippet(noCfg.substring(m.start)))
  }

  /** The subprocess entry, written to a scratch file at run time. Reads
    * the spec JSON, builds the `dbt` shim, executes the user module's
    * `model(dbt, session)`, writes the returned DataFrame as parquet.
    */
  private val Bootstrap =
    """import importlib.util, json, sys
      |
      |spec = json.load(open(sys.argv[1]))
      |from pyspark.sql import SparkSession
      |session = (SparkSession.builder
      |    .master(spec["master"])
      |    .appName("graft-python-model-" + spec["name"])
      |    .config("spark.sql.shuffle.partitions", str(spec["shuffle"]))
      |    .config("spark.sql.session.timeZone", "UTC")
      |    .config("spark.ui.enabled", "false")
      |    .getOrCreate())
      |session.sparkContext.setLogLevel("WARN")
      |
      |class _Config:
      |    def __init__(self, kv):
      |        self._kv = kv
      |    def __call__(self, **kw):  # runtime dbt.config() is a no-op,
      |        pass                   # config is extracted at parse time
      |    def get(self, key, default=None):
      |        return self._kv.get(key, default)
      |
      |class _Dbt:
      |    def __init__(self, spec):
      |        self._rel = spec["relations"]
      |        self.config = _Config(spec.get("config", {}))
      |        self._vars = spec.get("vars", {})
      |        self.this = spec["this"]
      |        self.is_incremental = spec.get("is_incremental", False)
      |    def _read(self, key):
      |        r = self._rel[key]
      |        df = session.read.format(r["fmt"]).load(*r["paths"])
      |        for c in r.get("drop", []):
      |            df = df.drop(c)
      |        return df
      |    def ref(self, name):
      |        return self._read("ref:" + name)
      |    def source(self, src, table):
      |        return self._read("source:" + src + "." + table)
      |    def var(self, key, default=None):
      |        return self._vars.get(key, default)
      |
      |# incremental runs register the EXISTING table under its relation
      |# name, so `session.table(str(dbt.this))` / f-string SQL over
      |# dbt.this work exactly like the reference's python runtime
      |if spec.get("is_incremental"):
      |    r = spec["relations"]["this"]
      |    tdf = session.read.format(r["fmt"]).load(*r["paths"])
      |    for c in r.get("drop", []):
      |        tdf = tdf.drop(c)
      |    tdf.createOrReplaceTempView(spec["this"])
      |
      |mspec = importlib.util.spec_from_file_location(
      |    "graft_python_model", spec["model_path"])
      |mod = importlib.util.module_from_spec(mspec)
      |mspec.loader.exec_module(mod)
      |df = mod.model(_Dbt(spec), session)
      |df.write.mode("overwrite").parquet(spec["out"])
      |session.stop()
      |""".stripMargin

  private def jstr(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Execute the node's python body in the subprocess and commit its
    * output as the node's table — full write, or delta-apply through
    * [[graft.exec.Materializer.incrementalApply]] when the node is
    * incremental and the table exists (the model sees
    * `dbt.is_incremental` and `dbt.this` resolves to the existing
    * table inside the subprocess session, so the usual
    * max-timestamp-watermark python idiom works verbatim).
    */
  def run(engine: Engine, node: PythonModelNode,
      fullRefresh: Boolean = false): Unit = {
    require(node.config.materialized == "table" ||
      node.config.materialized == "incremental",
      s"python model ${node.name}: materialized='${node.config.materialized}'" +
        " is not supported (the reference limits python models to" +
        " table/incremental)")
    val rel = engine.relationName(node)
    val isIncremental = node.config.materialized == "incremental" &&
      engine.wh.exists(rel) && !fullRefresh
    val work = java.nio.file.Files.createTempDirectory(s"pymodel_${node.name}_")
    try {
      // ref/source → (fmt, file paths, hidden columns); views have no
      // files, so they are materialized into the scratch dir first.
      // Ephemeral upstreams have NO relation at all (they exist only as
      // inlined CTEs) — the reference rejects them explicitly
      // (core/dbt/compilation.py: python models cannot ref ephemeral).
      def handle(key: String, n: graft.core.Node): (String, String) = {
        n match {
          case m: graft.core.ModelNode
              if m.config.materialized == "ephemeral" =>
            throw new IllegalArgumentException(
              s"python model ${node.name}: cannot ref ephemeral model " +
                s"'${m.name}' — ephemeral models are inlined CTEs with no " +
                "relation a python runtime can read (reference: python " +
                "models cannot be used with the ephemeral materialization " +
                "or ref ephemeral nodes)")
          case _ =>
        }
        val rel = engine.relationName(n)
        val (fmt, paths, drop) = engine.wh.physical(rel).getOrElse {
          val dump = work.resolve(s"view_$rel").toString
          engine.wh.read(rel).write.mode("overwrite").parquet(dump)
          ("parquet", Seq(dump), Nil)
        }
        key -> s"""{"fmt":${jstr(fmt)},"paths":${paths.map(jstr)
          .mkString("[", ",", "]")},"drop":${drop.map(jstr)
          .mkString("[", ",", "]")}}"""
      }
      val relEntries =
        node.refs.map { r =>
          val n = engine.manifest.resolveRefSpec(r).getOrElse(
            throw new IllegalArgumentException(
              s"python model ${node.name}: unresolved ref: $r"))
          handle(s"ref:$r", n)
        } ++ node.sources.map { case (s, t) =>
          val n = engine.manifest.resolveSource(s, t).getOrElse(
            throw new IllegalArgumentException(
              s"python model ${node.name}: unresolved source: $s.$t"))
          handle(s"source:$s.$t", n)
        } ++ (if (isIncremental) {
          // the existing table, registered in the subprocess session
          // under the relation name so dbt.this is queryable; exists()
          // can be true while physical() is None when the relation is a
          // VIEW left behind by a materialization change (view →
          // incremental between runs) — treat that as a loud error, not
          // a NoSuchElementException
          val (fmt, paths, drop) = engine.wh.physical(rel).getOrElse(
            throw new IllegalStateException(
              s"python model ${node.name}: incremental run found existing " +
                s"relation '$rel' with no physical files (it is a view or " +
                "catalog-only entry, likely a materialization change from " +
                "view to incremental) — run with full_refresh to replace it"))
          Seq("this" -> s"""{"fmt":${jstr(fmt)},"paths":${paths.map(jstr)
            .mkString("[", ",", "]")},"drop":${drop.map(jstr)
            .mkString("[", ",", "]")}}""")
        } else Nil)
      val modelPath = work.resolve("model.py")
      java.nio.file.Files.writeString(modelPath, node.code)
      val bootPath = work.resolve("bootstrap.py")
      java.nio.file.Files.writeString(bootPath, Bootstrap)
      val outDir = work.resolve("out").toString
      def jmap(kv: Iterable[(String, String)], quoteVals: Boolean): String =
        kv.map { case (k, v) => s"${jstr(k)}:${if (quoteVals) jstr(v) else v}" }
          .mkString("{", ",", "}")
      val spec =
        s"""{"name":${jstr(node.name)},
           |"master":"local[8]","shuffle":8,
           |"model_path":${jstr(modelPath.toString)},
           |"out":${jstr(outDir)},
           |"this":${jstr(rel)},
           |"is_incremental":$isIncremental,
           |"config":${jmap(extractConfig(node.code), quoteVals = true)},
           |"vars":${jmap(engine.vars, quoteVals = true)},
           |"relations":${jmap(relEntries, quoteVals = false)}}
           |""".stripMargin
      val specPath = work.resolve("spec.json")
      java.nio.file.Files.writeString(specPath, spec)
      val proc = new ProcessBuilder("python3", bootPath.toString,
        specPath.toString).redirectErrorStream(true).start()
      val log = new String(proc.getInputStream.readAllBytes, "UTF-8")
      val rc = proc.waitFor()
      require(rc == 0,
        s"python model ${node.name}: subprocess exited $rc\n" +
          log.linesIterator.toSeq.takeRight(25).mkString("\n"))
      // commit through the ordinary versioned write path: read the
      // subprocess output in THIS session and write it as the table —
      // or, on an incremental run, apply it as the DELTA under the
      // configured strategy (the copy is one pass over the model's own
      // output — the upstream inputs were never copied)
      val df = engine.spark.read.parquet(outDir)
      if (isIncremental)
        graft.exec.Materializer.incrementalApply(engine.wh, rel, df,
          strategy = node.config.incrementalStrategy.getOrElse("merge"),
          uniqueKey = node.config.uniqueKey,
          onSchemaChange = node.config.onSchemaChange,
          partitionBy = node.config.partitionBy,
          incrementalPredicates = node.config.incrementalPredicates,
          mergeUpdateColumns = node.config.mergeUpdateColumns,
          mergeExcludeColumns = node.config.mergeExcludeColumns)
      else
        engine.wh.writeTable(rel, df, node.config.partitionBy)
    } finally {
      // best-effort scratch cleanup (output data has been committed)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(work.toFile)
    }
  }
}
