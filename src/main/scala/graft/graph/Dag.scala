package graft.graph

import graft.core.{Manifest, Node}

/** Dependency graph over manifest nodes — the reference's `Linker`
  * (`core/dbt/compilation.py:116-191`: nx.DiGraph build + cycle check)
  * re-done as plain adjacency maps + Kahn topological sort.
  */
final case class Dag(parents: Map[String, Set[String]]) {

  val children: Map[String, Set[String]] = {
    val pairs = for ((id, ps) <- parents.toSeq; p <- ps) yield p -> id
    val m = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    parents.keys.map(k => k -> m.getOrElse(k, Set.empty[String])).toMap
  }

  def nodes: Set[String] = parents.keySet

  /** Kahn topo order; throws on cycles (reference cycle check
    * `compilation.py:128-135`).
    */
  def topoSort: Seq[String] = {
    val inDeg = scala.collection.mutable.Map(
      parents.view.mapValues(_.count(parents.contains)).toSeq: _*)
    // deterministic: ready nodes processed in sorted order
    val ready = scala.collection.mutable.PriorityQueue[String]()(
      Ordering[String].reverse)
    inDeg.foreach { case (n, d) => if (d == 0) ready.enqueue(n) }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += n
      for (c <- children.getOrElse(n, Set.empty)) {
        inDeg(c) -= 1
        if (inDeg(c) == 0) ready.enqueue(c)
      }
    }
    if (out.size != parents.size) {
      val stuck = parents.keySet -- out
      throw new IllegalStateException(s"dependency cycle among: ${stuck.toSeq.sorted.mkString(", ")}")
    }
    out.toSeq
  }

  /** Depth score per node = 1 + max parent score; the reference's
    * priority metric (`core/dbt/graph/queue.py:90-112` `_get_scores`).
    */
  def depthScores: Map[String, Int] = {
    val memo = scala.collection.mutable.Map[String, Int]()
    def score(n: String): Int = memo.getOrElseUpdate(n, {
      val ps = parents.getOrElse(n, Set.empty).filter(parents.contains)
      if (ps.isEmpty) 0 else 1 + ps.map(score).max
    })
    nodes.foreach(score)
    memo.toMap
  }

  def ancestors(id: String, maxDepth: Int = Int.MaxValue): Set[String] =
    bfs(id, parents, maxDepth)

  def descendants(id: String, maxDepth: Int = Int.MaxValue): Set[String] =
    bfs(id, children, maxDepth)

  private def bfs(start: String, adj: Map[String, Set[String]], maxDepth: Int): Set[String] = {
    val seen = scala.collection.mutable.Set[String]()
    var frontier = adj.getOrElse(start, Set.empty)
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      val next = frontier -- seen
      seen ++= next
      frontier = next.flatMap(n => adj.getOrElse(n, Set.empty))
      depth += 1
    }
    seen.toSet
  }
}

object Dag {
  def fromManifest(m: Manifest): Dag = {
    val ids = m.nodes.keySet
    Dag(m.nodes.map { case (id, n) => id -> n.dependsOn.toSet.intersect(ids) })
  }
}

/** Node-selection DSL — the reference's `--select`/`--exclude` grammar
  * (`core/dbt/graph/selector_spec.py:15-24` regex,
  * `selector_methods.py`, union/intersection in `graph/cli.py`):
  * `model_b` (name), `+model_b` (ancestors), `model_b+` (descendants),
  * `2+model_b+3` (bounded), `@model_b` (descendants + their ancestors),
  * `tag:x`, `source:s`, space = union, comma = intersection.
  */
object Selector {

  private val spec = """^(@)?(?:(\d*)(\+))?([^+]+?)(?:(\+)(\d*))?$""".r

  /** state:modified / state:new need the `--state` manifest
    * (reference `StateSelectorMethod`, `selector_methods.py:609-788`).
    */
  private val stateManifestTL = new ThreadLocal[Option[Manifest]] {
    override def initialValue(): Option[Manifest] = None
  }

  def withState[T](state: Manifest)(f: => T): T = {
    stateManifestTL.set(Some(state))
    try f finally stateManifestTL.set(None)
  }

  def select(manifest: Manifest, dag: Dag, include: Seq[String],
      exclude: Seq[String] = Nil): Set[String] = {
    val base =
      if (include.isEmpty) dag.nodes
      else include.map(term => selectUnion(manifest, dag, term)).reduce(_ union _)
    val excluded =
      if (exclude.isEmpty) Set.empty[String]
      else exclude.map(term => selectUnion(manifest, dag, term)).reduce(_ union _)
    base -- excluded
  }

  /** One CLI token: comma-separated atoms intersect. */
  private def selectUnion(manifest: Manifest, dag: Dag, term: String): Set[String] =
    term.split(",").map(atom => selectAtom(manifest, dag, atom.trim))
      .reduce(_ intersect _)

  private def selectAtom(manifest: Manifest, dag: Dag, atom: String): Set[String] =
    atom match {
      case spec(at, preN, pre, body, post, postN) =>
        val matched = method(manifest, body)
        val withPre =
          if (pre != null)
            matched ++ matched.flatMap(id => dag.ancestors(id,
              if (preN != null && preN.nonEmpty) preN.toInt else Int.MaxValue))
          else matched
        val withPost =
          if (post != null)
            withPre ++ matched.flatMap(id => dag.descendants(id,
              if (postN != null && postN.nonEmpty) postN.toInt else Int.MaxValue))
          else withPre
        if (at != null) {
          // @x = x + descendants + ancestors-of-all-of-those
          val desc = matched ++ matched.flatMap(id => dag.descendants(id))
          desc ++ desc.flatMap(id => dag.ancestors(id))
        } else withPost
      case _ => method(manifest, atom)
    }

  /** Selection methods (subset of `MethodName`,
    * `selector_methods.py:45-66`): bare name / fqn, tag:, source:,
    * resource_type:, path not applicable (no files).
    */
  private def method(manifest: Manifest, body: String): Set[String] = body.split(":", 2) match {
    case Array(name) =>
      manifest.nodes.collect {
        case (id, n) if n.name == name || id == name => id
      }.toSet
    case Array("tag", t) =>
      manifest.nodes.collect {
        case (id, n) if n.config.tags.contains(t) => id }.toSet
    case Array("source", src) =>
      manifest.nodes.collect {
        case (id, n: graft.core.SourceNode) if n.sourceName == src || s"${n.sourceName}.${n.name}" == src => id
      }.toSet
    case Array("resource_type", rt) =>
      manifest.nodes.collect { case (id, n) if n.resourceType == rt => id }.toSet
    case Array("state", which) =>
      val state = stateManifestTL.get().getOrElse(
        throw new IllegalArgumentException("state: selector needs a --state manifest (Selector.withState)"))
      which match {
        case "new" => manifest.nodes.keySet -- state.nodes.keySet
        case "modified" =>
          manifest.nodes.collect {
            case (id, n) if !state.nodes.get(id).exists(same(_, n)) => id
          }.toSet
        case other =>
          throw new IllegalArgumentException(s"unsupported state method: $other")
      }
    case Array(m, _) =>
      throw new IllegalArgumentException(s"unsupported selection method: $m")
  }

  /** Node equivalence for state:modified — raw code + config
    * (reference compares content checksums).
    */
  private def same(a: Node, b: Node): Boolean = (a, b) match {
    case (x: graft.core.ModelNode, y: graft.core.ModelNode) =>
      x.rawSql == y.rawSql && x.config == y.config
    case (x: graft.core.SnapshotNode, y: graft.core.SnapshotNode) =>
      x.rawSql == y.rawSql && x.config == y.config &&
        x.strategy == y.strategy && x.uniqueKey == y.uniqueKey
    case (x: graft.core.TestNode, y: graft.core.TestNode) =>
      x.rawSql == y.rawSql && x.config == y.config
    case (x: graft.core.SeedNode, y: graft.core.SeedNode) => x.csv == y.csv
    case (x, y) => x == y
  }
}

/** Thread-safe release-on-done scheduler queue — the reference's
  * `GraphQueue` (`core/dbt/graph/queue.py:19-207`): nodes become
  * available when all parents completed; priority = depth score
  * (deeper first is the reference's ordering via topological
  * generation).
  */
final class GraphQueue(dag: Dag, selected: Set[String]) {
  private val scores = dag.depthScores
  private val lock = new Object
  private val remainingParents = scala.collection.mutable.Map(
    selected.toSeq.map(id =>
      id -> dag.parents.getOrElse(id, Set.empty).intersect(selected)
        .to(scala.collection.mutable.Set)): _*)
  private val inProgress = scala.collection.mutable.Set[String]()
  private val done = scala.collection.mutable.Set[String]()

  /** Pop one ready node (lowest depth score first, then name), or None
    * if nothing is ready right now; blocks=false semantics.
    */
  def poll(): Option[String] = lock.synchronized {
    val ready = remainingParents.collect {
      case (id, ps) if ps.isEmpty && !inProgress(id) && !done(id) => id
    }
    if (ready.isEmpty) None
    else {
      val next = ready.minBy(id => (scores.getOrElse(id, 0), id))
      inProgress += next
      Some(next)
    }
  }

  def markDone(id: String): Unit = lock.synchronized {
    inProgress -= id
    done += id
    remainingParents.remove(id)
    remainingParents.values.foreach(_ -= id)
  }

  /** Mark failed: downstream nodes are skipped (reference skip cascade,
    * `task/runnable.py:62` MARK_DEPENDENT_ERRORS_STATUSES). Returns the
    * skipped set.
    */
  def markFailed(id: String): Set[String] = lock.synchronized {
    inProgress -= id
    done += id
    remainingParents.remove(id)
    val skipped = dag.descendants(id).intersect(remainingParents.keySet.toSet)
    skipped.foreach { s => remainingParents.remove(s); done += s }
    skipped
  }

  def isComplete: Boolean = lock.synchronized {
    remainingParents.isEmpty && inProgress.isEmpty
  }

  def pending: Int = lock.synchronized(remainingParents.size)
}
