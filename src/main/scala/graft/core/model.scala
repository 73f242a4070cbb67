package graft.core

/** Typed resource model — the Spark-native equivalent of the reference
  * manifest's node universe (dbt-core `core/dbt/contracts/graph/nodes.py`,
  * `core/dbt/artifacts/resources/types.py:18-46` NodeType enum).
  *
  * One sealed ADT instead of dataclass + dict soup; `uniqueId` matches
  * the reference's `<type>.<package>.<name>` convention so artifacts
  * stay shape-compatible.
  */

/** Node config after cascade resolution — reference `NodeConfig`
  * (`core/dbt/artifacts/resources/v1/config.py:46-124`).
  */
final case class NodeConfig(
    materialized: String = "view",
    incrementalStrategy: Option[String] = None, // append|merge|delete+insert|insert_overwrite
    incrementalPredicates: Seq[String] = Nil,
    mergeUpdateColumns: Seq[String] = Nil, // merge updates ONLY these
    mergeExcludeColumns: Seq[String] = Nil, // merge updates all BUT these
    uniqueKey: Seq[String] = Nil,
    onSchemaChange: String = "ignore", // ignore|append_new_columns|sync_all_columns|fail
    onConfigurationChange: String = "apply", // apply|continue|fail (A6, MV drift)
    fullRefresh: Boolean = false,
    preHook: Seq[String] = Nil,
    postHook: Seq[String] = Nil,
    enabled: Boolean = true,
    alias: Option[String] = None,
    schema: Option[String] = None,
    database: Option[String] = None,
    tags: Set[String] = Set.empty,
    meta: Map[String, String] = Map.empty,
    group: Option[String] = None,
    access: String = "protected", // private|protected|public (A24)
    partitionBy: Seq[String] = Nil,
    bucketBy: Seq[String] = Nil,
    numBuckets: Int = 0,
    /** Range-cluster the table's files on these columns at write time
      * (repartitionByRange + sortWithinPartitions): every parquet file
      * covers a disjoint value range, so min/max footer stats prune
      * scans on these columns — the sort-key lever of a 100 TB table
      * layout (Delta/Iceberg `OPTIMIZE ... ZORDER/SORT BY` analog).
      * `bucket_by` (join co-location) takes precedence when both set.
      */
    clusterBy: Seq[String] = Nil,
    /** Storage format for table-like materializations (dbt-spark's
      * `file_format` config): parquet (default) or orc — the two
      * self-describing columnar formats Spark ships; csv/json sinks
      * would silently lose schema fidelity on read-back and are
      * rejected with a clear error at write time.
      */
    fileFormat: Option[String] = None,
    contractEnforced: Boolean = false,
    /** Grants config (reference `grants` field, `config.py:110-112`,
      * MergeBehavior.DictKeyAppend): privilege -> grantees. A key
      * arriving from a deeper cascade level clobbers; a `+`-prefixed
      * key extends the inherited grantee list instead
      * (`context_config.py:322-341`). Keys are normalized (no `+`)
      * after the cascade resolves.
      */
    grants: Map[String, Seq[String]] = Map.empty,
    /** persist_docs (reference `persist_docs` field,
      * MergeBehavior.Update): {"relation" -> bool, "columns" -> bool}
      * — whether model/column descriptions are written through to the
      * warehouse as relation/column comments.
      */
    persistDocs: Map[String, Boolean] = Map.empty,
    severity: String = "error", // tests: error|warn
    warnIf: String = "!= 0",
    errorIf: String = "!= 0",
    failCalc: String = "count(*)",
    limit: Option[Int] = None,
    where: Option[String] = None,
    storeFailures: Boolean = false,
    /** `store_failures_as` (reference `config.py:172,179-191`):
      * table | view | ephemeral. When set it OVERRIDES
      * [[storeFailures]] at any granularity; "ephemeral" turns
      * storage off; unset + storeFailures=true behaves as "table".
      */
    storeFailuresAs: Option[String] = None) {

  /** Cascade merge — `other` (more specific) wins per-field; tags and
    * hooks append (reference merge behaviors Append/Clobber,
    * `config.py:77-124`).
    */
  def merge(other: NodeConfig, defaults: NodeConfig = NodeConfig()): NodeConfig =
    NodeConfig(
      materialized = if (other.materialized != defaults.materialized) other.materialized else materialized,
      incrementalStrategy = other.incrementalStrategy.orElse(incrementalStrategy),
      incrementalPredicates = if (other.incrementalPredicates.nonEmpty) other.incrementalPredicates else incrementalPredicates,
      mergeUpdateColumns = if (other.mergeUpdateColumns.nonEmpty) other.mergeUpdateColumns else mergeUpdateColumns,
      mergeExcludeColumns = if (other.mergeExcludeColumns.nonEmpty) other.mergeExcludeColumns else mergeExcludeColumns,
      uniqueKey = if (other.uniqueKey.nonEmpty) other.uniqueKey else uniqueKey,
      onSchemaChange = if (other.onSchemaChange != defaults.onSchemaChange) other.onSchemaChange else onSchemaChange,
      onConfigurationChange = if (other.onConfigurationChange != defaults.onConfigurationChange) other.onConfigurationChange else onConfigurationChange,
      fullRefresh = other.fullRefresh || fullRefresh,
      preHook = preHook ++ other.preHook,
      postHook = postHook ++ other.postHook,
      enabled = other.enabled && enabled,
      alias = other.alias.orElse(alias),
      schema = other.schema.orElse(schema),
      database = other.database.orElse(database),
      tags = tags ++ other.tags,
      meta = meta ++ other.meta,
      group = other.group.orElse(group),
      access = if (other.access != defaults.access) other.access else access,
      partitionBy = if (other.partitionBy.nonEmpty) other.partitionBy else partitionBy,
      bucketBy = if (other.bucketBy.nonEmpty) other.bucketBy else bucketBy,
      numBuckets = if (other.numBuckets != 0) other.numBuckets else numBuckets,
      clusterBy = if (other.clusterBy.nonEmpty) other.clusterBy else clusterBy,
      fileFormat = other.fileFormat.orElse(fileFormat),
      contractEnforced = other.contractEnforced || contractEnforced,
      grants = NodeConfig.mergeGrants(grants, other.grants),
      persistDocs = persistDocs ++ other.persistDocs,
      severity = if (other.severity != defaults.severity) other.severity else severity,
      warnIf = if (other.warnIf != defaults.warnIf) other.warnIf else warnIf,
      errorIf = if (other.errorIf != defaults.errorIf) other.errorIf else errorIf,
      failCalc = if (other.failCalc != defaults.failCalc) other.failCalc else failCalc,
      limit = other.limit.orElse(limit),
      where = other.where.orElse(where),
      storeFailures = other.storeFailures || storeFailures,
      storeFailuresAs = other.storeFailuresAs.orElse(storeFailuresAs))

  /** Resolved failure-storage mode (reference `config.py:179-191`
    * __post_init__): store_failures_as overrides store_failures at
    * any granularity; "ephemeral" = off; bool true alone = "table".
    */
  def failureStorage: Option[String] = storeFailuresAs match {
    case Some("ephemeral") => None
    case Some(mode) => Some(mode)
    case None => if (storeFailures) Some("table") else None
  }
}

object NodeConfig {
  /** DictKeyAppend (reference `context_config.py:322-341`): per-key
    * clobber unless the incoming key is `+`-prefixed, which extends
    * the inherited grantee list. Result keys carry no `+`.
    */
  def mergeGrants(base: Map[String, Seq[String]],
      incoming: Map[String, Seq[String]]): Map[String, Seq[String]] =
    incoming.foldLeft(base.map { case (k, v) => k.stripPrefix("+") -> v }) {
      case (acc, (k, v)) =>
        if (k.startsWith("+")) {
          val key = k.drop(1)
          acc + (key -> (acc.getOrElse(key, Nil) ++ v).distinct)
        } else acc + (k -> v)
    }
}

final case class ColumnInfo(
    name: String,
    dataType: Option[String] = None,
    description: String = "",
    tests: Seq[GenericTestRef] = Nil)

/** A generic test attached via schema YAML — reference `TestBuilder`
  * (`core/dbt/parser/generic_test_builders.py:69-120`).
  */
final case class GenericTestRef(
    testName: String, // unique | not_null | accepted_values | relationships | <custom>
    kwargs: Map[String, String] = Map.empty,
    config: NodeConfig = NodeConfig())

sealed trait Node {
  def name: String
  def config: NodeConfig
  def dependsOn: Seq[String] // unique ids, filled by ref-resolution
  def resourceType: String
  /** Owning package (A32 deps): the root project is "graft"; nodes
    * installed from `dbt_packages/<pkg>/` carry that package's name —
    * it namespaces unique ids (reference `<type>.<package>.<name>`
    * convention) and drives package-precedence macro resolution.
    */
  def packageName: String = "graft"
  def uniqueId: String = s"$resourceType.$packageName.$name"
}

final case class ModelNode(
    name: String,
    rawSql: String,
    config: NodeConfig = NodeConfig(),
    columns: Seq[ColumnInfo] = Nil,
    dependsOn: Seq[String] = Nil,
    /** ref specs: plain `name`, or `name.v<N>` for a pinned ref —
      * the same encoding the reference uses in versioned unique ids.
      */
    refs: Seq[String] = Nil,
    sources: Seq[(String, String)] = Nil,
    /** Model versions (reference `nodes.py:448-470`): a versioned
      * model is one node per version, all sharing `name`; unpinned
      * refs resolve to the latest version.
      */
    version: Option[Int] = None,
    latestVersion: Option[Int] = None,
    /** `deprecation_date:` from the model's schema-yml entry (reference
      * nodes.py ModelNode.deprecation_date, ISO date or datetime) —
      * drives I065/I066/I067 parse+reference warnings. */
    deprecationDate: Option[String] = None,
    /** project-relative source file, for path:/file: selectors. */
    originPath: String = "",
    /** From schema YAML; `{{ doc('name') }}` references are resolved
      * at load time (reference `process_docs`, parser/manifest.py).
      */
    description: String = "",
    override val packageName: String = "graft") extends Node {
  val resourceType = "model"
  override def uniqueId: String =
    version.map(v => s"$resourceType.$packageName.$name.v$v")
      .getOrElse(s"$resourceType.$packageName.$name")
  def isLatestVersion: Boolean =
    version.isDefined && version == latestVersion
}

final case class SourceNode(
    sourceName: String,
    name: String,
    /** Physical location: parquet path or catalog table. */
    path: String,
    /** Storage format; None = infer from the path extension
      * (.csv/.json/.orc), default parquet. CSV reads with header +
      * schema inference (the reference's agate-typed seeds analog for
      * external files).
      */
    format: Option[String] = None,
    loadedAtField: Option[String] = None,
    freshnessWarnAfterSec: Option[Long] = None,
    freshnessErrorAfterSec: Option[Long] = None,
    freshnessFilter: Option[String] = None,
    config: NodeConfig = NodeConfig()) extends Node {
  val resourceType = "source"
  def dependsOn: Seq[String] = Nil
  override def uniqueId: String = s"source.graft.$sourceName.$name"
}

final case class SeedNode(
    name: String,
    /** Inline CSV content (reference loads from file; content-inlined
      * here — the loader supplies file contents).
      */
    csv: String,
    delimiter: String = ",",
    columnTypes: Map[String, String] = Map.empty,
    config: NodeConfig = NodeConfig(),
    originPath: String = "",
    /** `seeds: quote_columns:` (reference `column_quoting` tests):
      * Some(false) folds header names to lowercase like an unquoted
      * identifier would fold in a case-folding warehouse; Some(true)
      * or None preserves the header case exactly (Spark resolves
      * identifiers case-insensitively, so quoted is the safe default).
      */
    quoteColumns: Option[Boolean] = None,
    override val packageName: String = "graft") extends Node {
  val resourceType = "seed"
  def dependsOn: Seq[String] = Nil
}

/** Snapshot strategies — reference `SnapshotConfig`
  * (`core/dbt/artifacts/resources/v1/snapshot.py:11-60`).
  */
sealed trait SnapshotStrategy
final case class TimestampStrategy(updatedAt: String) extends SnapshotStrategy
final case class CheckStrategy(checkCols: Option[Seq[String]]) extends SnapshotStrategy // None = all
/** A named custom strategy (reference `snapshot_<name>_strategy` macro,
  * `tests/functional/simple_snapshot/fixtures.py:66-85`): carried
  * unresolved through parsing with the snapshot's config kwargs; the
  * engine evaluates the macro at run time into a
  * [[ResolvedCustomStrategy]].
  */
final case class CustomStrategy(name: String,
    kwargs: Map[String, String] = Map.empty) extends SnapshotStrategy
/** The macro's returned dict: SQL expression strings. `updatedAtSql` /
  * `scdIdSql` evaluate over source columns; `rowChangedSql` over the
  * aliases the engine passed as snapshotted_rel ("t") and current_rel
  * ("s").
  */
final case class ResolvedCustomStrategy(updatedAtSql: String,
    rowChangedSql: String, scdIdSql: String) extends SnapshotStrategy

final case class SnapshotNode(
    name: String,
    rawSql: String,
    uniqueKey: Seq[String],
    strategy: SnapshotStrategy,
    invalidateHardDeletes: Boolean = false,
    config: NodeConfig = NodeConfig(materialized = "snapshot"),
    dependsOn: Seq[String] = Nil,
    refs: Seq[String] = Nil,
    sources: Seq[(String, String)] = Nil,
    originPath: String = "",
    override val packageName: String = "graft") extends Node {
  val resourceType = "snapshot"
}

/** A data test node: generic (instantiated from YAML) or singular
  * (a standalone SQL file).
  */
final case class TestNode(
    name: String,
    rawSql: String, // SELECT returning failing rows
    config: NodeConfig = NodeConfig(materialized = "test"),
    dependsOn: Seq[String] = Nil,
    refs: Seq[String] = Nil,
    sources: Seq[(String, String)] = Nil,
    /** generic-test macro name (unique/not_null/…) when synthesized
      * from schema YAML; None for singular tests — drives the
      * test_type:/test_name: selectors (A22).
      */
    genericTest: Option[String] = None,
    originPath: String = "",
    override val packageName: String = "graft") extends Node {
  val resourceType = "test"
}

/** One unit-test fixture in any of the reference's three formats
  * (`unit_test_definition.py:25-28` UnitTestFormat: Dict | CSV | SQL).
  */
sealed trait UnitFixture
/** `format: dict` — YAML row maps (the default). */
final case class DictRows(rows: Seq[Map[String, Any]]) extends UnitFixture
/** `format: csv` — inline CSV with a header row; types inferred like
  * seeds. */
final case class CsvRows(csv: String) extends UnitFixture
/** `format: sql` — a literal SELECT producing the fixture rows. */
final case class SqlRows(sql: String) extends UnitFixture

/** Unit test — fixture inputs replace refs, expect rows diffed
  * (reference `core/dbt/artifacts/resources/v1/unit_test_definition.py`).
  */
final case class UnitTestNode(
    name: String,
    model: String,
    given: Map[String, Seq[Map[String, Any]]], // ref/source name -> dict rows
    expect: Seq[Map[String, Any]],
    /** csv/sql `given` fixtures (A13); merged over `given` — a name
      * present in both resolves here. */
    givenFixtures: Map[String, UnitFixture] = Map.empty,
    /** csv/sql `expect` fixture; when set, wins over `expect`. */
    expectFixture: Option[UnitFixture] = None,
    config: NodeConfig = NodeConfig(),
    dependsOn: Seq[String] = Nil,
    /** fixture-scoped overrides (reference `UnitTestOverrides`,
      * `unit_test_definition.py:40-44`): vars, env_vars and macros
      * replace the project's values for this test's render only.
      * `overrideMacros` maps a (optionally package-qualified) project
      * Jinja macro name to the VALUE its calls return during the
      * render — a user stubbing e.g. a surrogate-key helper pins the
      * tested model's output without exercising the helper (reference
      * `providers.py:1658-1699`). The special key `is_incremental`
      * toggles the render's incremental flag instead (reference
      * `parser/unit_tests.py:470-481`). Overrides scope to PROJECT
      * JINJA MACROS only: materializations are Scala strategies here,
      * not macros, so they have no override surface.
      */
    overrideVars: Map[String, String] = Map.empty,
    overrideEnvVars: Map[String, String] = Map.empty,
    overrideMacros: Map[String, String] = Map.empty) extends Node {
  val resourceType = "unit_test"
}

/** Exposure — downstream-use metadata node (A29; reference
  * `core/dbt/contracts/graph/nodes.py:1282`): parsed + linked into the
  * DAG, never executed.
  */
final case class ExposureNode(
    name: String,
    exposureType: String = "dashboard", // dashboard|notebook|analysis|ml|application
    owner: String = "",
    url: String = "",
    refs: Seq[String] = Nil,
    config: NodeConfig = NodeConfig(),
    dependsOn: Seq[String] = Nil) extends Node {
  val resourceType = "exposure"
}

/** Metric — semantic-layer metadata (A29); `calculation` is a SQL
  * aggregate over the referenced model, compilable to a Spark query
  * (Engine.queryMetric).
  */
final case class MetricNode(
    name: String,
    model: String,
    /** Aggregation SQL, e.g. "sum(spend)". Empty when [[measure]] names
      * a semantic-model measure instead (reference simple metrics,
      * `type_params.measure`) — the engine derives agg(expr) from it. */
    calculation: String, // e.g. "sum(spend)"
    dimensions: Seq[String] = Nil,
    filter: Option[String] = None,
    /** Reference `type_params.measure`: the semantic-model measure this
      * metric aggregates; validated to exist at parse (I070 check). */
    measure: Option[String] = None,
    config: NodeConfig = NodeConfig(),
    dependsOn: Seq[String] = Nil) extends Node {
  val resourceType = "metric"
}

/** Semantic model — metric-layer metadata over one model (reference
  * `core/dbt/artifacts/resources/v1/semantic_model.py`): entities
  * (join keys), dimensions (group-by columns), measures (aggregations
  * that metrics build on). Parsed + linked into the DAG, never
  * executed.
  */
final case class SemanticModelNode(
    name: String,
    model: String, // ref name
    description: String = "",
    /** (name, type) — type: primary|foreign|unique|natural. */
    entities: Seq[(String, String)] = Nil,
    /** (name, type) — type: categorical|time. */
    dimensions: Seq[(String, String)] = Nil,
    /** (name, agg, expr) — e.g. ("revenue", "sum", "price * qty"). */
    measures: Seq[(String, String, String)] = Nil,
    config: NodeConfig = NodeConfig(),
    dependsOn: Seq[String] = Nil) extends Node {
  val resourceType = "semantic_model"
}

/** Saved query — a named, reusable metric request (reference
  * `core/dbt/artifacts/resources/v1/saved_query.py`): metrics +
  * group-bys + where, exportable. Metadata only; `Engine.querySaved`
  * compiles it through the metric layer.
  */
final case class SavedQueryNode(
    name: String,
    metrics: Seq[String],
    groupBy: Seq[String] = Nil,
    where: Option[String] = None,
    description: String = "",
    config: NodeConfig = NodeConfig(),
    dependsOn: Seq[String] = Nil) extends Node {
  val resourceType = "saved_query"
}

/** Group — a named ownership bucket for access control (reference
  * `core/dbt/artifacts/resources/v1/group.py:10`: name + Owner).
  * Declared in `groups:` yml blocks; nodes opt in via the `group`
  * config, and `check_valid_group_config` (ported into
  * ProjectLoader.validateGroupsAndAccess) rejects references to
  * undeclared groups at parse time. Metadata-only: never scheduled.
  */
final case class GroupNode(
    name: String,
    ownerName: String = "",
    ownerEmail: String = "",
    config: NodeConfig = NodeConfig(),
    dependsOn: Seq[String] = Nil) extends Node {
  val resourceType = "group"
}

/** What a code-model body sees (dbt.ref/source/config equivalent for
  * A28 Python models; implemented by the engine).
  */
trait ModelApi {
  def spark: org.apache.spark.sql.SparkSession
  def ref(name: String): org.apache.spark.sql.DataFrame
  def source(src: String, table: String): org.apache.spark.sql.DataFrame
  def variable(name: String, default: String = null): String
}

/** Code model — the analog of the reference's Python models (A28,
  * `def model(dbt, session)`, `core/dbt/parser/models.py:30-140`). On
  * Spark a native win: the body is already a DataFrame program, typed
  * at compile time; refs/sources are declared (the reference extracts
  * them from the Python AST).
  */
final case class ScalaModelNode(
    name: String,
    declaredRefs: Seq[String],
    declaredSources: Seq[(String, String)],
    body: ModelApi => org.apache.spark.sql.DataFrame,
    config: NodeConfig = NodeConfig(materialized = "table"),
    dependsOn: Seq[String] = Nil) extends Node {
  val resourceType = "model"
}

/** Python model — the reference's `.py` files under models/ defining
  * `def model(dbt, session)` (`core/dbt/parser/models.py:30-140`
  * static AST extraction of refs/sources/config;
  * `core/dbt/compilation.py:407-416` runtime wrapper). Executed by
  * run/PythonModel in a PySpark subprocess against the same warehouse
  * files — the hermetic analog of the reference's submit-to-platform
  * python runtime. Refs/sources/config are extracted statically at
  * parse, exactly like the reference's PythonValidationVisitor.
  */
final case class PythonModelNode(
    name: String,
    code: String,
    refs: Seq[String] = Nil,
    sources: Seq[(String, String)] = Nil,
    config: NodeConfig = NodeConfig(materialized = "table"),
    dependsOn: Seq[String] = Nil,
    originPath: String = "",
    override val packageName: String = "graft") extends Node {
  val resourceType = "model"
}

/** A named selector from selectors.yml (reference
  * `core/dbt/config/selectors.py`, `core/dbt/contracts/selection.py`):
  * the YAML definition is flattened at parse time into the string DSL
  * in disjunctive normal form (union = separate entries, intersection
  * = comma-joined atoms, nested combinations distributed) plus
  * exclusions, so resolution reuses the one selection engine.
  */
final case class SelectorDef(
    name: String,
    select: Seq[String],
    exclude: Seq[String] = Nil,
    isDefault: Boolean = false,
    description: String = "")

/** The manifest: typed universe of all resources (reference
  * `core/dbt/contracts/graph/manifest.py:807+`).
  */
final case class Manifest(nodes: Map[String, Node],
    selectors: Map[String, SelectorDef] = Map.empty,
    /** Macro name -> definition body, for `state:modified.macros`
      * (reference check_macros_modified walks macro depends_on;
      * empty when the manifest was built without a project load —
      * the state comparator then skips macro checking).
      */
    macroSources: Map[String, String] = Map.empty,
    /** Nodes parked by `enabled: false` (reference `manifest.disabled`,
      * `core/dbt/contracts/graph/manifest.py`): out of the executable
      * universe, but a ref/source pointing at one raises the specific
      * "is disabled" flavor of TargetNotFoundError instead of the
      * generic not-found. */
    disabled: Map[String, Node] = Map.empty,
    /** Packages whose dbt_project.yml sets `restrict-access: true` —
      * their `access: protected` models reject refs from other
      * packages (reference `manifest.is_invalid_protected_ref`,
      * `contracts/graph/manifest.py:1451`). */
    restrictedPackages: Set[String] = Set.empty) {
  def models: Map[String, ModelNode] = collect { case m: ModelNode => m }
  def seeds: Map[String, SeedNode] = collect { case s: SeedNode => s }
  def snapshots: Map[String, SnapshotNode] = collect { case s: SnapshotNode => s }
  def tests: Map[String, TestNode] = collect { case t: TestNode => t }
  def sources: Map[String, SourceNode] = collect { case s: SourceNode => s }
  def unitTests: Map[String, UnitTestNode] = collect { case u: UnitTestNode => u }

  private def collect[T <: Node](pf: PartialFunction[Node, T]): Map[String, T] =
    nodes.collect { case (id, n) if pf.isDefinedAt(n) => id -> pf(n) }

  // name indexes: linking is O(n) instead of O(n^2) on big projects
  @transient private lazy val refIndex: Map[String, Node] =
    nodes.values.filter(n => Set("model", "seed", "snapshot")(n.resourceType))
      .collect { case n if !n.isInstanceOf[ModelNode] ||
        n.asInstanceOf[ModelNode].version.isEmpty => n.name -> n }.toMap
  @transient private lazy val versionIndex: Map[(String, Int), ModelNode] =
    nodes.values.collect {
      case m: ModelNode if m.version.isDefined => (m.name, m.version.get) -> m
    }.toMap
  /** Unpinned refs to a versioned family resolve here: the node whose
    * version == latest_version, else the highest version (reference
    * unpinned-ref resolution, `nodes.py:448-470`). */
  @transient private lazy val latestIndex: Map[String, ModelNode] =
    nodes.values.collect { case m: ModelNode if m.version.isDefined => m }
      .groupBy(_.name).map { case (n, vs) =>
        n -> vs.find(_.isLatestVersion).getOrElse(vs.maxBy(_.version.get))
      }
  @transient private lazy val sourceIndex: Map[(String, String), SourceNode] =
    nodes.values.collect { case s: SourceNode => (s.sourceName, s.name) -> s }.toMap

  def byName(name: String): Option[Node] = nodes.values.find(_.name == name)

  def resolveRef(name: String): Option[Node] =
    latestIndex.get(name).orElse(refIndex.get(name))

  /** Resolve a ref spec: `name` (unpinned → latest version for
    * versioned families) or `name.v<N>` (pinned). */
  def resolveRefSpec(spec: String): Option[Node] = {
    val pinned = """^(.*)\.v(\d+)$""".r
    spec match {
      case pinned(nm, v) =>
        versionIndex.get((nm, v.toInt)).orElse(resolveRef(spec))
      case _ => resolveRef(spec)
    }
  }

  def resolveSource(sourceName: String, tableName: String): Option[SourceNode] =
    sourceIndex.get((sourceName, tableName))

  /** The disabled node a ref spec WOULD have resolved to — drives the
    * "is disabled" flavor of TargetNotFoundError. */
  def disabledRefTarget(spec: String): Option[Node] = {
    val bare = spec match {
      case s if s.matches("^.*\\.v\\d+$") => s.substring(0, s.lastIndexOf(".v"))
      case s => s
    }
    disabled.values.find(n =>
      Set("model", "seed", "snapshot")(n.resourceType) && n.name == bare)
  }

  def disabledSourceTarget(s: String, t: String): Option[Node] =
    disabled.values.collectFirst {
      case sn: SourceNode if sn.sourceName == s && sn.name == t => sn }

  /** ref-able names in scope — the did-you-mean candidate pool. */
  def refableNames: Iterable[String] =
    nodes.values.collect {
      case n if Set("model", "seed", "snapshot")(n.resourceType) => n.name }

  def parentMap: Map[String, Set[String]] =
    nodes.map { case (id, n) => id -> n.dependsOn.toSet }

  def childMap: Map[String, Set[String]] = {
    val pairs = for ((id, n) <- nodes.toSeq; p <- n.dependsOn) yield p -> id
    pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty)
  }
}
