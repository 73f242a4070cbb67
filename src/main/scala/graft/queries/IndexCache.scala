package graft.queries

/** Shared discipline for the built-once corpus index caches
  * (TextOps.indexCache, Similarity.{ivfCache, cellPairCache, pqCache},
  * Ext2 asset tables).
  *
  * - `sessionKey` keys entries on the session's stable UUID instead of
  *   `System.identityHashCode`: identity hashes can be reused after a
  *   session is GC'd, so a new session over the same data dir could be
  *   served a persisted DataFrame bound to a stopped session. A
  *   sessionUUID is never reused, so a stale entry can only ever miss.
  *   (Entries are not evicted — growth is bounded by #sessions ×
  *   #datasets, both tiny in this harness; cluster deployments
  *   materialize these indexes as bucketed tables instead, SCALING.md.)
  * - `buildLock` is the ONE monitor every first-build serializes on.
  *   Index builds nest (CC groups ← pair kernel, cell pairs ← IVF);
  *   with a single reentrant monitor a build may freely cache-build
  *   its own inputs, and no pair of caches can deadlock on lock order.
  *   First-build serialization across different indexes is an accepted
  *   one-time warm-up cost.
  */
private[graft] object IndexCache {
  val buildLock = new Object
  def sessionKey(s: org.apache.spark.sql.SparkSession): String = s match {
    // sessionUUID lives on the classic implementation, not the abstract
    // API; every session in this engine is classic (local JVM)
    case c: org.apache.spark.sql.classic.SparkSession =>
      org.apache.spark.sql.graftshim.sessionUUID(c)
    case other => s"${other.getClass.getName}@${System.identityHashCode(other)}"
  }

  /** Canonical cache key. EVERY built-once index keys itself through
    * this helper so the ledger (and IndexRegistrySpec's source scan)
    * can enumerate the index population from one syntactic shape:
    * `IndexCache.key("<prefix>", s, dir)`. The prefix is the index's
    * registry id (IndexRegistry.all).
    */
  def key(prefix: String, s: org.apache.spark.sql.SparkSession, dir: String): String =
    s"$prefix|${sessionKey(s)}|$dir"

  def prefixOf(key: String): String = key.takeWhile(_ != '|')

  // ------------------------------------------------------------------
  // Build/consumer ledger (VERDICT r10 item 1): the built-once index
  // channel was excluded from every bench ratio while it tripled in
  // cost — so builds are now MEASURED per index (not inferred from
  // cold−warm totals) and consumers are RECORDED per query, feeding
  // Bench's `warm_solo_plus_build` / `warm_solo_plus_amortized_build`
  // channels and the INDEXES.md ledger. Recording is always on; the
  // cost is two ConcurrentHashMap ops per index ACCESS (not per row).
  // ------------------------------------------------------------------

  /** full key -> own build seconds (nested child builds subtracted,
    * so `cc02` doesn't double-bill the `pairs` build it triggers). */
  private val buildsM =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** prefix -> query names that touched the index (only while a
    * consumer label is set — Bench/Verify/IndexesMd set it per query). */
  private val accessesM =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[String]]()

  /** The query currently being constructed/run on this thread; set by
    * harnesses (Bench, IndexesMd) around each query so index accesses
    * attribute to a consumer. Null outside a harness — accesses are
    * then counted for builds only. */
  val currentConsumer = new ThreadLocal[String]

  def noteAccess(key: String): Unit = {
    val c = currentConsumer.get
    if (c != null)
      accessesM
        .computeIfAbsent(prefixOf(key),
          _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
        .add(c): Unit
  }

  /** Per-thread stack of child-build-seconds accumulators: builds nest
    * (cc02 <- pairs, cellpair <- ivf), and each frame subtracts the
    * time its CHILDREN spent so a build is billed exactly once. */
  private val childSec = new ThreadLocal[java.util.ArrayDeque[Array[Double]]] {
    override def initialValue(): java.util.ArrayDeque[Array[Double]] =
      new java.util.ArrayDeque[Array[Double]]()
  }

  /** Times a build (or an eviction re-pin) and records OWN seconds
    * (total minus nested child builds) against the key. Re-entrant.
    * A build that THROWS records nothing — a failed attempt (missing
    * table in a partial replica dir, OOM) is not a build cost, and a
    * garbage 0.01 s entry would win the ledger's per-dir slot. */
  def timedBuild[T](key: String)(build: => T): T = {
    val stack = childSec.get()
    stack.push(Array(0.0))
    val t0 = System.nanoTime()
    var ok = false
    try { val r = build; ok = true; r }
    finally {
      val total = (System.nanoTime() - t0) / 1e9
      val children = stack.pop()(0)
      if (ok)
        buildsM.merge(key, math.max(0.0, total - children),
          (a, b) => java.lang.Double.valueOf(a + b))
      if (!stack.isEmpty) stack.peek()(0) += total
    }
  }

  /** prefix -> cumulative own-build seconds (summed across sessions /
    * dirs seen by this JVM — one session, one dir in any harness run). */
  def buildsByPrefix: Map[String, Double] = {
    val it = buildsM.entrySet().iterator()
    var m = Map.empty[String, Double]
    while (it.hasNext) {
      val e = it.next()
      val p = prefixOf(e.getKey)
      m = m.updated(p, m.getOrElse(p, 0.0) + e.getValue.doubleValue())
    }
    m
  }

  /** prefix -> own-build seconds restricted to one dataset dir (keys
    * are `prefix|session|dir`, so a multi-dir harness run — IndexesMd
    * measuring sf0.1 and the 10x/100x replicas in one JVM — can slice
    * builds per dataset). */
  def buildsForDir(dir: String): Map[String, Double] = {
    val suffix = s"|$dir"
    val it = buildsM.entrySet().iterator()
    var m = Map.empty[String, Double]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.endsWith(suffix)) {
        val p = prefixOf(e.getKey)
        m = m.updated(p, m.getOrElse(p, 0.0) + e.getValue.doubleValue())
      }
    }
    m
  }

  def consumersByPrefix: Map[String, Set[String]] = {
    val it = accessesM.entrySet().iterator()
    var m = Map.empty[String, Set[String]]
    while (it.hasNext) {
      val e = it.next()
      m = m.updated(e.getKey,
        scala.jdk.CollectionConverters.SetHasAsScala(e.getValue).asScala.toSet)
    }
    m
  }

  def resetLedger(): Unit = { buildsM.clear(); accessesM.clear() }
}
