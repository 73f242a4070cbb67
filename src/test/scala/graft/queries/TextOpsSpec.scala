package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Kernel-level checks for the dedup pipeline's two scale-critical
  * pieces: the stop-shingle df cap on the shared pair kernel (bounds
  * any posting list's pair fan-out at cap²/2) and the connected-
  * components loop (reliable per-round materialization, one job per
  * round).
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("pair kernel drops posting lists above the stop-shingle df cap") {
    // 130 boilerplate docs (> StopShingleDf = 128) share one shingle —
    // without the cap they alone would emit 130·129/2 = 8385 pairs.
    // Two rare docs share a distinct shingle → exactly one real pair.
    val boiler = (0L until 130L).map(i => (i, "aaa bbb ccc"))
    val rare = Seq((900L, "xxx yyy zzz qqq"), (901L, "xxx yyy zzz rrr"))
    val corpus = (boiler ++ rare).toDF("doc_id", "text")
    val pairs = TextOps.shingleOverlapPairsOf(corpus).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("doc_a") === 900L)
    assert(pairs.head.getAs[Long]("doc_b") === 901L)
    // the shared rare shingles: "xxx yyy zzz" only (suffixes differ)
    assert(pairs.head.getAs[Long]("common") === 1L)
    // cardinalities are computed BEFORE the cap: boilerplate shingle
    // still counts toward each rare doc's denominator (2 shingles each)
    assert(pairs.head.getAs[Long]("na") === 2L)
  }

  test("cc loop: one action per round + reliable final labels") {
    // path graph 0-1-2-3-4-5-6: labels take 6 rounds to flow to node 6,
    // plus one confirming round = 7 rounds. The old formulation ran TWO
    // actions per round (materialize + join-recompute convergence
    // count); the fused loop runs exactly one write action per round:
    // edges(1) + init labels(1) + 7 rounds(1 each) + final collect(1)
    // = 10 SQL executions. (Job count is AQE-dependent — executions,
    // i.e. actions, are the stable measure of driver round-trips.)
    val pairs = (0L until 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val execs = new java.util.concurrent.atomic.AtomicInteger
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = execs.incrementAndGet()
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    val labels =
      try TextOps.connectedComponents(pairs).collect()
      finally {
        // listener events are async — wait until the count stops moving
        var last = -1
        var spins = 0
        while (execs.get != last && spins < 40) {
          last = execs.get; Thread.sleep(250); spins += 1
        }
        spark.listenerManager.unregister(ql)
      }
    assert(labels.length === 7)
    assert(labels.forall(_.getLong(1) == 0L), labels.mkString(","))
    assert(execs.get <= 11,
      s"expected ≤11 actions (1/round + setup), saw ${execs.get}")
  }

  test("property: min-label propagation yields valid components") {
    // random undirected edge sets → invariants: both endpoints of every
    // edge share a group, each group's id is its minimum member, every
    // edge-touched node is labelled. Runs the REAL kernel (q48/q57).
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.choose(0L, 14L); b <- Gen.choose(0L, 14L) if a != b
    } yield if (a < b) (a, b) else (b, a))
    for (seedN <- 1 to 3) {
      val edgesSeq = edgeGen.apply(Gen.Parameters.default, Seed(seedN.toLong))
        .get.distinct
      val pairs = edgesSeq.toDF("doc_a", "doc_b")
      val lbl = TextOps.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      assert(lbl.keySet === edgesSeq.flatMap(e => Seq(e._1, e._2)).toSet)
      edgesSeq.foreach { case (a, b) =>
        assert(lbl(a) === lbl(b), s"seed $seedN: edge ($a,$b) split") }
      lbl.groupBy(_._2).foreach { case (g, members) =>
        assert(members.keys.min === g, s"seed $seedN: group $g min mismatch") }
    }
  }
}
