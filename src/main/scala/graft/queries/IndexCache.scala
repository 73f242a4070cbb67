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
private[queries] object IndexCache {
  val buildLock = new Object
  def sessionKey(s: org.apache.spark.sql.SparkSession): String = s match {
    // sessionUUID lives on the classic implementation, not the abstract
    // API; every session in this engine is classic (local JVM)
    case c: org.apache.spark.sql.classic.SparkSession =>
      org.apache.spark.sql.graftshim.sessionUUID(c)
    case other => s"${other.getClass.getName}@${System.identityHashCode(other)}"
  }
}
