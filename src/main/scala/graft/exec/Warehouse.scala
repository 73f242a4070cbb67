package graft.exec

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Spark-backed warehouse: the role the external database plays for the
  * reference (its `adapter`), played here by versioned parquet
  * directories + session temp views.
  *
  * Write protocol (SURVEY §7 hard-part 1 — crash-consistent without a
  * transaction log dependency):
  *   - every write lands in a fresh `"$root/$name/v$N"` directory;
  *   - the relation's visible state is a list of directories (replace →
  *     one dir; append → previous list + new dir, a mini commit log);
  *   - registration happens only after the parquet commit succeeds, so
  *     readers never observe partial data;
  *   - at cluster scale the same layout works on object storage
  *     (directory commit = parquet `_SUCCESS`), and `append` avoids
  *     rewriting history — O(delta), not O(table).
  *
  * Relations are exposed to SQL as temp views named `name` so rendered
  * model SQL can reference them like warehouse tables.
  */
final class Warehouse(val spark: SparkSession, val root: String,
    /** Auto-compaction threshold: when an append pushes a relation's
      * commit log past this many directories, it is rewritten into one
      * (the background-OPTIMIZE policy small-file mitigation needs at
      * scale). 0 disables — appends stay O(delta) forever and
      * compaction is manual via [[compact]].
      */
    val maxCommits: Int = 0) {

  private final case class RelState(paths: Seq[String], nextVersion: Int,
      isView: Boolean, isCatalog: Boolean = false, fmt: String = "parquet",
      /** Engine-internal physical columns (e.g. the snapshot layout's
        * `dbt_part` partition key) dropped at every read boundary —
        * consumers see exactly the logical schema. Recorded in the
        * `_commits` header so recovery hides them too. */
      hide: Seq[String] = Nil)

  /** Formats a table materialization may use (dbt-spark `file_format`):
    * the self-describing columnar pair only — csv/json would lose
    * schema fidelity on read-back.
    */
  private val SupportedFormats = Set("parquet", "orc")

  private def checkFormat(fmt: String): String = {
    require(SupportedFormats(fmt),
      s"unsupported file_format '$fmt' (supported: ${SupportedFormats.toSeq.sorted.mkString(", ")})")
    fmt
  }

  private val relations = scala.collection.mutable.Map[String, RelState]()
  private val lock = new Object

  // ---- durability: recover parquet-backed relations from disk.
  // Each table write records its current commit list in
  // `$root/$name/_commits`; a NEW Warehouse over an existing root
  // replays those manifests, so a separate process (retry, defer,
  // state:modified against a prior run's warehouse) sees the same
  // relations. Views and catalog tables are session-scoped and do not
  // recover. The _commits file is the tiny "table metadata" analog of
  // a real lakehouse log — written AFTER the parquet commit, so a
  // crash between the two leaves the previous (consistent) state.
  locally {
    val rootDir = new java.io.File(root)
    val dirs = Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    for (d <- dirs) {
      val cf = new java.io.File(d, "_commits")
      if (cf.isFile) {
        val lines = scala.jdk.CollectionConverters.IteratorHasAsScala(
          java.nio.file.Files.readAllLines(cf.toPath).iterator()).asScala.toSeq
        // optional "format=<fmt>" header line (older manifests = parquet)
        val fmt = lines.headOption.filter(_.startsWith("format="))
          .map(_.stripPrefix("format=")).getOrElse("parquet")
        val hide = lines.find(_.startsWith("hide="))
          .map(_.stripPrefix("hide=").split(",").toSeq.filter(_.nonEmpty))
          .getOrElse(Nil)
        val versions = lines.filterNot(l =>
          l.startsWith("format=") || l.startsWith("hide="))
        val live = versions
          .map(v => s"$root/${d.getName}/$v")
          .filter(p => new java.io.File(p).isDirectory)
        if (live.nonEmpty) {
          val nextV = live.map(_.split('/').last.stripPrefix("v").toInt).max + 1
          relations(d.getName) = RelState(live, nextV, isView = false,
            fmt = fmt, hide = hide)
          registerRead(d.getName, fmt, live, hide)
        }
      }
    }
  }

  private def writeCommits(name: String, paths: Seq[String],
      fmt: String = "parquet", hide: Seq[String] = Nil): Unit =
    Warehouse.writeCommitsFile(root, name, paths, fmt, hide)

  /** (Re-)register the relation's temp view with hidden columns dropped. */
  private def registerRead(name: String, fmt: String, paths: Seq[String],
      hide: Seq[String]): Unit = {
    val df = spark.read.format(fmt).load(paths: _*)
    (if (hide.isEmpty) df else df.drop(hide: _*)).createOrReplaceTempView(name)
  }

  def exists(name: String): Boolean = lock.synchronized(relations.contains(name))

  /** Physical handle for out-of-process consumers — the Python-model
    * subprocess reads upstream relations FILE-DIRECT from their current
    * version paths, so no table data crosses a process boundary through
    * either driver: (format, paths, hidden physical columns to drop).
    * None for views/catalog tables (session-scoped, no files — callers
    * materialize those to a scratch dir first). */
  def physical(name: String): Option[(String, Seq[String], Seq[String])] =
    lock.synchronized(relations.get(name).collect {
      case st if !st.isView && !st.isCatalog => (st.fmt, st.paths, st.hide)
    })

  def isView(name: String): Boolean =
    lock.synchronized(relations.get(name).exists(_.isView))

  def read(name: String): DataFrame = {
    val st = lock.synchronized(relations.getOrElse(name,
      throw new IllegalArgumentException(s"unknown relation: $name")))
    if (st.isView || st.isCatalog) spark.table(name)
    else {
      val df = spark.read.format(st.fmt).load(st.paths: _*)
      if (st.hide.isEmpty) df else df.drop(st.hide: _*)
    }
  }

  /** Read INCLUDING hidden physical columns (the snapshot merge prunes
    * on its `dbt_part` partition key before dropping it). */
  private[exec] def readRaw(name: String): DataFrame = {
    val st = lock.synchronized(relations.getOrElse(name,
      throw new IllegalArgumentException(s"unknown relation: $name")))
    if (st.isView || st.isCatalog) spark.table(name)
    else spark.read.format(st.fmt).load(st.paths: _*)
  }

  /** Replace the relation's content atomically (new version dir).
    * `clusterBy` range-clusters the files on the given columns
    * (repartitionByRange + sortWithinPartitions): each parquet file
    * then covers a disjoint value range, so footer min/max stats prune
    * scans filtering on those columns — the Delta/Iceberg
    * `OPTIMIZE ... SORT BY` analog, and the cheap half of the 100 TB
    * layout story (bucketing co-locates joins; clustering prunes
    * scans).
    */
  def writeTable(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil, fileFormat: String = "parquet",
      hideCols: Seq[String] = Nil): Unit = {
    val fmt = checkFormat(fileFormat)
    val v = lock.synchronized(relations.get(name).map(_.nextVersion).getOrElse(0))
    val path = s"$root/$name/v$v"
    val clustered =
      if (clusterBy.nonEmpty) {
        val cols = clusterBy.map(org.apache.spark.sql.functions.col)
        df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
      } else df
    val writer = clustered.write.mode(SaveMode.Overwrite).format(fmt)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .save(path)
    lock.synchronized {
      relations(name) = RelState(Seq(path), v + 1, isView = false, fmt = fmt,
        hide = hideCols)
      registerRead(name, fmt, Seq(path), hideCols)
      writeCommits(name, Seq(path), fmt, hideCols)
    }
  }

  /** Partition-pruned replace: write ONLY the `touchedVals` partitions'
    * new content into the fresh version dir and carry every other
    * partition of the previous snapshot BY REFERENCE — hard links to
    * the prior commit dirs' data files (the server-side-copy /
    * metadata-only operation on object storage), so write volume is
    * O(touched partitions), never O(table). Old version dirs stay
    * byte-intact (links share storage), preserving the in-flight-reader
    * and vacuum-fence guarantees of the versioned layout.
    *
    * `touchedVals` are string-rendered partition tuples in
    * `partitionBy` order; the caller guarantees they are hive-dir-safe
    * (no characters hive escapes) and that `touched` holds the full
    * new content of exactly those partitions. Throws
    * [[Warehouse.PrunedWriteUnsupported]] BEFORE writing anything if a
    * prior commit dir does not conform to the expected partition
    * layout (e.g. the table was previously written unpartitioned) —
    * callers fall back to the full rewrite.
    *
    * Returns (partitionsCarried, filesLinked) for write-volume gates.
    */
  /** True when [[writeTablePruned]] can run for this relation: it is a
    * stored table whose every commit dir nests exactly
    * `partitionBy.size` levels of `col=val` dirs before data files.
    * Callers decide the pruned-vs-full plan on this BEFORE building
    * either DataFrame.
    */
  def canWritePruned(name: String, partitionBy: Seq[String]): Boolean =
    partitionBy.nonEmpty && lock.synchronized(relations.get(name)).exists { st =>
      !st.isView && !st.isCatalog && st.paths.nonEmpty &&
        (try {
          st.paths.foreach(p => partitionLeaves(name, new java.io.File(p), partitionBy))
          true
        } catch { case _: Warehouse.PrunedWriteUnsupported => false })
    }

  /** `(partition values, leaf dir)` pairs under one commit dir. */
  private def partitionLeaves(name: String, src: java.io.File,
      partitionBy: Seq[String]): Seq[(Seq[String], java.io.File)] = {
    def walk(dir: java.io.File, values: Seq[String]): Seq[(Seq[String], java.io.File)] = {
      val children = Option(dir.listFiles()).getOrElse(Array.empty)
      val dataFiles = children.filter(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      if (values.size == partitionBy.size) {
        // Leaf must hold the partition's data directly: a `col=` subdir
        // means the stored layout has MORE partition levels than the
        // current partition_by (config changed), and zero data files
        // means a carried leaf would link nothing — both silently
        // corrupt the pruned write, so reject and force the full path.
        if (children.exists(f => f.isDirectory && f.getName.contains("=")))
          throw new Warehouse.PrunedWriteUnsupported(
            s"$name: partition dirs below expected depth in ${dir.getPath}")
        if (dataFiles.isEmpty)
          throw new Warehouse.PrunedWriteUnsupported(
            s"$name: no data files in partition leaf ${dir.getPath}")
        Seq((values, dir))
      } else {
        if (dataFiles.nonEmpty)
          throw new Warehouse.PrunedWriteUnsupported(
            s"$name: data files above partition depth in ${dir.getPath}")
        // Every level's dir name must be `<expected col>=`: a stored
        // layout partitioned by different columns (or in a different
        // order) would otherwise be re-linked under wrongly-named dirs.
        val expect = partitionBy(values.size) + "="
        val subdirs = children.toSeq.filter(f => f.isDirectory &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
        subdirs.find(d => !d.getName.startsWith(expect)).foreach { d =>
          throw new Warehouse.PrunedWriteUnsupported(
            s"$name: expected $expect* dirs, found ${d.getName} in ${dir.getPath}")
        }
        subdirs.flatMap(c => walk(c,
          values :+ c.getName.substring(c.getName.indexOf('=') + 1)))
      }
    }
    walk(src, Nil)
  }

  def writeTablePruned(name: String, touched: DataFrame,
      partitionBy: Seq[String],
      /** Partition values the DataFrame REWRITES in full — every other
        * stored leaf is carried by hard link. A carried leaf whose
        * value the df also writes is legal and means APPEND: the old
        * files are linked (version-prefixed names) next to the newly
        * written ones — the snapshot path appends new closed rows to
        * immutable closed_<date> partitions this way. */
      rewriteVals: Set[Seq[String]]): (Int, Int) = {
    val touchedVals = rewriteVals
    require(partitionBy.nonEmpty, "writeTablePruned needs partition columns")
    val st = lock.synchronized(relations.getOrElse(name,
      throw new IllegalArgumentException(s"unknown relation: $name")))
    require(!st.isView && !st.isCatalog, s"$name: not a table")

    // pre-check (throws BEFORE any write on layout mismatch)
    val srcLeaves: Seq[(String, Seq[(Seq[String], java.io.File)])] =
      st.paths.map(p => (p.split('/').last,
        partitionLeaves(name, new java.io.File(p), partitionBy)))

    val v = st.nextVersion
    val path = s"$root/$name/v$v"
    touched.write.mode(SaveMode.Overwrite).format(st.fmt)
      .partitionBy(partitionBy: _*).save(path)

    var linked = 0
    val carried = scala.collection.mutable.Set[Seq[String]]()
    for ((srcV, ls) <- srcLeaves; (values, leafDir) <- ls
         if !touchedVals.contains(values)) {
      carried += values
      val destDir = java.nio.file.Paths.get(path +
        values.zip(partitionBy).map { case (vv, c) => s"/$c=$vv" }.mkString)
      java.nio.file.Files.createDirectories(destDir)
      for (f <- Option(leafDir.listFiles()).getOrElse(Array.empty)
           if f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")) {
        val dest = destDir.resolve(s"${srcV}_${f.getName}")
        try java.nio.file.Files.createLink(dest, f.toPath)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          java.nio.file.Files.copy(f.toPath, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        linked += 1
      }
    }
    lock.synchronized {
      relations(name) = RelState(Seq(path), v + 1, isView = false, fmt = st.fmt,
        hide = st.hide)
      registerRead(name, st.fmt, Seq(path), st.hide)
      writeCommits(name, Seq(path), st.fmt, st.hide)
    }
    (carried.size, linked)
  }

  /** Append a delta (new commit dir; no rewrite of existing data).
    * The delta inherits the relation's existing file format.
    */
  def appendTable(name: String, df: DataFrame): Unit = {
    val st = lock.synchronized(relations.get(name)).getOrElse {
      return writeTable(name, df)
    }
    val path = s"$root/$name/v${st.nextVersion}"
    df.write.mode(SaveMode.Overwrite).format(st.fmt).save(path)
    lock.synchronized {
      val newPaths = st.paths :+ path
      relations(name) = RelState(newPaths, st.nextVersion + 1,
        isView = false, fmt = st.fmt, hide = st.hide)
      registerRead(name, st.fmt, newPaths, st.hide)
      writeCommits(name, newPaths, st.fmt, st.hide)
    }
    if (maxCommits > 0 && commitCount(name) > maxCommits) compact(name)
  }

  /** Register a (lazy) view — Catalyst composes the plan into
    * consumers, so cross-model filter pushdown comes free (better than
    * the reference's opaque-text views; SURVEY §4 "ephemeral inlining").
    */
  def createView(name: String, df: DataFrame): Unit = lock.synchronized {
    df.createOrReplaceTempView(name)
    relations(name) = RelState(Nil, relations.get(name).map(_.nextVersion).getOrElse(0), isView = true)
  }

  def drop(name: String): Unit = lock.synchronized {
    relations.remove(name)
    spark.catalog.dropTempView(name)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, name, "_commits"))
    ()
  }

  def list: Seq[String] = lock.synchronized(relations.keys.toSeq.sorted)

  /** Execute one statement-block string — the small DDL dialect custom
    * materializations emit through the global `create_table_as` /
    * `create_view_as` macros (reference: the adapter executes the
    * rendered statement; here CREATE/DROP/INSERT route onto warehouse
    * relations, anything else runs as a plain Spark query). Returns
    * rows affected where knowable, else -1.
    */
  def executeSql(sql: String): Long = {
    val ctas = """(?is)^\s*create\s+(?:or\s+replace\s+)?(?:temp(?:orary)?\s+)?table\s+([\w.]+)\s+as\s+(.*)$""".r
    val cvas = """(?is)^\s*create\s+(?:or\s+replace\s+)?(?:temp(?:orary)?\s+)?view\s+([\w.]+)\s+as\s+(.*)$""".r
    val dropStmt = """(?is)^\s*drop\s+(?:table|view)\s+(?:if\s+exists\s+)?([\w.]+)\s*$""".r
    val insert = """(?is)^\s*insert\s+into\s+([\w.]+)\s+(.*)$""".r
    sql.trim match {
      case ctas(name, select) =>
        writeTable(name, spark.sql(select)); rowCount(name)
      case cvas(name, select) =>
        createView(name, spark.sql(select)); -1L
      case dropStmt(name) => drop(name); -1L
      case insert(name, select) =>
        val df = spark.sql(select)
        val n = df.count()
        appendTable(name, df); n
      case other => spark.sql(other).count()
    }
  }

  /** Compact a relation's commit log into one version dir (the
    * OPTIMIZE analog): repeated appends accumulate small files/dirs;
    * compaction rewrites once and resets the log. Readers registered
    * before the compact keep their old snapshot (paths are immutable).
    */
  def compact(name: String, targetPartitions: Int = 0): Unit = {
    val df0 = read(name)
    val fmt = lock.synchronized(relations.get(name).map(_.fmt).getOrElse("parquet"))
    val df = if (targetPartitions > 0) df0.repartition(targetPartitions) else df0
    writeTable(name, df, fileFormat = fmt)
  }

  /** The relation's storage format ("parquet"/"orc"; views report
    * parquet).
    */
  def formatOf(name: String): String =
    lock.synchronized(relations.get(name).map(_.fmt).getOrElse("parquet"))

  /** Commit-log length (for compaction policies / tests). */
  def commitCount(name: String): Int =
    lock.synchronized(relations.get(name).map(_.paths.size).getOrElse(0))

  /** Live commit versions of a relation, oldest first. */
  def versions(name: String): Seq[Int] =
    lock.synchronized(relations.get(name).map(_.paths.map(
      _.split('/').last.stripPrefix("v").toInt)).getOrElse(Nil))

  /** Time travel over the APPEND history: the relation as of commit
    * version ≤ maxVersion (a prefix of the live commit log — the AS OF
    * read a lakehouse log gives for free; replace rewrites history, so
    * pre-replace states are vacuum targets, not travel targets).
    */
  def readAsOf(name: String, maxVersion: Int): DataFrame = {
    val st = lock.synchronized(relations.getOrElse(name,
      throw new IllegalArgumentException(s"unknown relation: $name")))
    val prefix = st.paths.filter(
      _.split('/').last.stripPrefix("v").toInt <= maxVersion)
    require(prefix.nonEmpty,
      s"$name: no commits at or before v$maxVersion (live: ${versions(name).mkString(",")})")
    spark.read.format(st.fmt).load(prefix: _*)
  }

  /** Delete on-disk version dirs no longer in the live commit list
    * (replace and compact leave their predecessors orphaned — the
    * VACUUM need of any versioned layout). A retention fence protects
    * in-flight readers: orphan dirs modified within `retainSeconds`
    * are kept, so a lazy DataFrame obtained via read()/readAsOf()
    * before a concurrent replace still evaluates against intact files
    * (the Delta `VACUUM ... RETAIN` model). Pass retainSeconds=0 for
    * the old immediate GC (tests / explicit force). Returns dirs
    * removed.
    */
  def vacuum(name: String, retainSeconds: Long = 300L): Int = lock.synchronized {
    val st = relations.getOrElse(name,
      throw new IllegalArgumentException(s"unknown relation: $name"))
    val live = st.paths.map(_.split('/').last).toSet
    val fence = System.currentTimeMillis() - retainSeconds * 1000L
    val dir = new java.io.File(s"$root/$name")
    val orphans = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v")
        && !live(f.getName) && f.lastModified() < fence)
    orphans.foreach { o =>
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(o)
    }
    orphans.length
  }

  /** Row count of a parquet-backed relation from file footers only —
    * the driver-side metadata read that plays the role of the
    * warehouse cursor's `rows_affected` (reference adapter response).
    * No Spark job: O(#files) footer reads, so it stays cheap even when
    * the data itself is huge. Views fall back to -1 (unknown) rather
    * than triggering a scan.
    */
  def rowCount(name: String): Long = {
    val st = lock.synchronized(relations.getOrElse(name,
      throw new IllegalArgumentException(s"unknown relation: $name")))
    if (st.isView || st.isCatalog || st.paths.isEmpty) -1L
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      st.paths.iterator.map { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(conf)
        val files = fs.listStatus(path).iterator
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try reader.getRecordCount finally reader.close()
        }.sum
      }.sum
    }
  }

  /** Register an external parquet path as a source relation view. */
  def registerSource(name: String, df: DataFrame): Unit = lock.synchronized {
    df.createOrReplaceTempView(name)
    relations(name) = RelState(Nil, 0, isView = true)
  }

  /** Bucketed catalog table: hash-bucketed + sorted by `bucketBy`, so
    * downstream equi-joins/aggregations on those keys run with NO
    * shuffle (Catalyst recognizes the bucketing as satisfying the
    * required distribution). This is the knob that removes the big-fact
    * join shuffle at 100 TB — bucket orders and lineitem by orderkey
    * once, join free forever. Uses the session catalog (bucketing
    * metadata lives there, not in plain parquet dirs).
    */
  def writeBucketedTable(name: String, df: DataFrame,
      bucketBy: Seq[String], numBuckets: Int): Unit = {
    require(bucketBy.nonEmpty && numBuckets > 0,
      s"$name: bucketed write needs bucket columns and a bucket count")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the in-memory catalog forgets tables across sessions but their
    // managed location persists — clear it or CTAS refuses the name
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
      .sortBy(bucketBy.head, bucketBy.tail: _*)
      .saveAsTable(name)
    lock.synchronized {
      relations(name) = RelState(Nil,
        relations.get(name).map(_.nextVersion).getOrElse(0),
        isView = false, isCatalog = true)
    }
  }

  // ------------------------------------------------------------- grants

  /** One applied grant/revoke action (the audit row the reference logs
    * as grant/revoke statements — `dbt/adapters/base/impl.py`
    * apply_grants).
    */
  final case class GrantAction(relation: String, action: String,
      privilege: String, grantee: String)

  private val grantActions = scala.collection.mutable.ArrayBuffer[GrantAction]()

  private def grantsFile(name: String) =
    java.nio.file.Paths.get(root, s"$name.grants.json")

  /** Current grants on a relation: privilege -> grantees (empty when
    * none were ever applied).
    */
  def grantsOf(name: String): Map[String, Seq[String]] = lock.synchronized {
    val f = grantsFile(name)
    if (!java.nio.file.Files.exists(f)) Map.empty
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(f))
      val it = node.properties().iterator()
      val out = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
      while (it.hasNext) {
        val e = it.next()
        val vs = scala.collection.mutable.ArrayBuffer[String]()
        e.getValue.forEach(v => vs += v.asText())
        out(e.getKey) = vs.toSeq
      }
      out.toMap
    }
  }

  /** Reconcile a relation's grants to `desired`, diffing against the
    * current state exactly like the reference's apply_grants flow
    * (show_grants -> diff -> grant missing + revoke extra;
    * `dbt/adapters/base/impl.py` standardize_grants_dict /
    * apply_grants). Returns the actions applied, newest last; the full
    * session history is [[grantLog]].
    */
  def applyGrants(name: String,
      desired: Map[String, Seq[String]]): Seq[GrantAction] = lock.synchronized {
    val current = grantsOf(name)
    val privs = (current.keySet ++ desired.keySet).toSeq.sorted
    val actions = privs.flatMap { p =>
      val have = current.getOrElse(p, Nil).toSet
      val want = desired.getOrElse(p, Nil).toSet
      (want -- have).toSeq.sorted.map(g => GrantAction(name, "grant", p, g)) ++
        (have -- want).toSeq.sorted.map(g => GrantAction(name, "revoke", p, g))
    }
    val json = desired.toSeq.sortBy(_._1).map { case (p, gs) =>
      s""""$p": [${gs.map(g => s""""$g"""").mkString(", ")}]"""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.createDirectories(grantsFile(name).getParent)
    java.nio.file.Files.writeString(grantsFile(name), json)
    grantActions ++= actions
    actions
  }

  /** All grant/revoke actions applied through this Warehouse. */
  def grantLog: Seq[GrantAction] = lock.synchronized(grantActions.toSeq)

  // ----------------------------------------------- persisted comments

  private def docsFile(name: String) =
    java.nio.file.Paths.get(root, s"$name.docs.json")

  /** persist_docs write-through: relation + column comments, stored as
    * a metadata sidecar (the COMMENT ON analog; a lakehouse catalog
    * would hold these as table properties).
    */
  def setComments(name: String, relation: Option[String],
      columns: Map[String, String]): Unit = lock.synchronized {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val cols = columns.toSeq.sortBy(_._1).map { case (c, d) =>
      s""""${esc(c)}": "${esc(d)}"""" }.mkString("{", ", ", "}")
    val rel = relation.map(r => s""""${esc(r)}"""").getOrElse("null")
    java.nio.file.Files.createDirectories(docsFile(name).getParent)
    java.nio.file.Files.writeString(docsFile(name),
      s"""{"relation": $rel, "columns": $cols}""")
    ()
  }

  /** Read back persisted comments: (relation comment, column comments).
    * Empty when persist_docs never wrote any.
    */
  def commentsOf(name: String): (Option[String], Map[String, String]) =
    lock.synchronized {
      val f = docsFile(name)
      if (!java.nio.file.Files.exists(f)) (None, Map.empty)
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(f))
        val rel = Option(node.get("relation")).filterNot(_.isNull).map(_.asText())
        val it = node.get("columns").properties().iterator()
        val out = scala.collection.mutable.LinkedHashMap[String, String]()
        while (it.hasNext) { val e = it.next(); out(e.getKey) = e.getValue.asText() }
        (rel, out.toMap)
      }
    }
}

object Warehouse {
  /** A prior commit dir does not conform to the partition layout the
    * pruned write needs — callers fall back to the full rewrite.
    */
  final class PrunedWriteUnsupported(msg: String) extends RuntimeException(msg)

  /** Commit-manifest write protocol (crash-consistent): stage the new
    * manifest beside the live one — fsynced, so its CONTENT is durable
    * before any rename can be — then ATOMIC-RENAME it into place and
    * fsync the parent directory so the rename itself is durable. The
    * manifest is the reader's ONLY pointer into the data (data files
    * are written first, under version dirs the old manifest does not
    * name), so a crash at ANY instruction of a write — process kill OR
    * power loss — leaves the previous complete version visible: never a
    * torn manifest, never a manifest naming unsynced bytes. Pre-fix
    * this was a plain writeString: a kill mid-write could truncate
    * `_commits` and make an intact table invisible to recovery, and
    * without the two fsyncs a power loss could persist the rename
    * before the manifest content. CrashCommitSpec SIGKILLs a child
    * mid-protocol N>=50 times and asserts zero torn reads (process-kill
    * channel; the fsyncs extend the same ordering to OS crash within
    * the filesystem's rename-durability guarantees). Static +
    * Spark-free so the crash harness drives the REAL protocol from a
    * plain JVM. */
  def writeCommitsFile(root: String, name: String, paths: Seq[String],
      fmt: String = "parquet", hide: Seq[String] = Nil): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    val f = Paths.get(root, name, "_commits")
    Files.createDirectories(f.getParent)
    val header = (if (fmt == "parquet") Nil else Seq(s"format=$fmt")) ++
      (if (hide.isEmpty) Nil else Seq(s"hide=${hide.mkString(",")}"))
    val tmp = f.resolveSibling("_commits.tmp")
    val ch = java.nio.channels.FileChannel.open(tmp,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        (header ++ paths.map(_.split('/').last)).mkString("\n").getBytes("UTF-8")))
      ch.force(true) // content durable BEFORE the rename can be
    } finally ch.close()
    try Files.move(tmp, f,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
    }
    // fsync the directory so the rename survives power loss; best-effort
    // (not all filesystems allow opening a directory for read)
    try {
      val dir = java.nio.channels.FileChannel.open(f.getParent,
        StandardOpenOption.READ)
      try dir.force(true) finally dir.close()
    } catch { case _: java.io.IOException => () }
    ()
  }
}
