package graft.plans

import graft.SparkSpec
import graft.tools.{ExplainAudit, ScaleGen}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** Regression harness for ExplainAudit's bounded-domain allowlist
  * (VERDICT r9 item 8): for every allowlisted unpartitioned window,
  * MEASURE the rows actually flowing into the window at 1× and at 10×
  * data and assert both stay under the entry's declared `rowBound`.
  * A "bounded domain" is a domain property — the input cardinality
  * must not scale with data volume — so the declaration stays a
  * measured fact instead of a comment.
  */
class BoundedWindowSpec extends SparkSpec {

  private val baseDir = "/root/testdata/sf0.01"
  /** 10× replica of sf0.01, generated once and cached under target/. */
  private lazy val scaleDir: String = {
    val out = "target/scale_sf001"
    val marker = java.nio.file.Paths.get(s"$out/scale10/documents.parquet")
    if (!java.nio.file.Files.exists(marker))
      ScaleGen.generate(spark, baseDir, out, 10, Set("scale10"))
    s"$out/scale10"
  }

  /** Expand AQE wrappers so WindowExec nodes inside query stages are
    * visible after execution. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Nearest descendant with a numOutputRows metric — the rows the
    * window consumed (walks single-child links + AQE wrappers). */
  private def firstWithRows(p: SparkPlan): Option[Long] = p match {
    case q: QueryStageExec => firstWithRows(q.plan)
    case r: ReusedExchangeExec => firstWithRows(r.child)
    case _ if p.metrics.contains("numOutputRows") =>
      Some(p.metrics("numOutputRows").value)
    case _ if p.children.size == 1 => firstWithRows(p.children.head)
    case _ => None
  }

  /** Execute the query against `dir` (AQE off, so the classifier sees
    * the same static shape ExplainAudit audits) and return measured
    * input rows of every BOUNDED-DOMAIN unpartitioned window — the
    * topk/bucket-offset kernels (e.g. Dist.rangedRank's offsets pass)
    * are provably bounded by construction and excluded, exactly as in
    * ExplainAudit's audit. */
  private def windowInputRows(name: String, dir: String): Seq[Long] = {
    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = byName(name).run(spark, dir)
      // collect() executes df's OWN queryExecution, so the metrics land
      // in the plan instance we inspect (a write would clone the plan)
      df.collect()
      ExplainAudit.classifiedWindows(df.queryExecution.executedPlan)
        .filter(_._2 == "FLAG")
        .map { case (w, _) =>
          firstWithRows(w.children.head).getOrElse(
            fail(s"$name: no numOutputRows metric under the window"))
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // Structural cross-check (VERDICT r10 item 8): the measurement tests
  // below are GENERATED from the allowlist, so an entry without a
  // measurement row cannot exist; this guard closes the remaining
  // drift hole — a stale entry naming a deleted/renamed query — with a
  // named failure instead of a lookup error inside its generated test.
  test("allowlist hygiene: every bounded-domain entry names a live query") {
    val names = graft.SparkEntry.allQueries.map(_.name).toSet
    val stale = ExplainAudit.boundedDomainAllowlist.keySet.filterNot(names)
    assert(stale.isEmpty, s"allowlist entries without a query: $stale")
  }

  for ((name, bd) <- ExplainAudit.boundedDomainAllowlist.toSeq.sortBy(_._1)) {
    test(s"$name: unpartitioned-window input <= ${bd.rowBound} rows at 1x and 10x") {
      val at1x = windowInputRows(name, baseDir)
      assert(at1x.nonEmpty, s"$name: expected an unpartitioned window at 1x")
      assert(at1x.size <= bd.maxWindows,
        s"$name: ${at1x.size} unpartitioned windows > declared ${bd.maxWindows}")
      at1x.foreach(r => assert(r <= bd.rowBound,
        s"$name at 1x: window input $r > declared bound ${bd.rowBound} (${bd.why})"))
      val at10x = windowInputRows(name, scaleDir)
      at10x.foreach(r => assert(r <= bd.rowBound,
        s"$name at 10x: window input $r > declared bound ${bd.rowBound} — " +
          s"the domain is scaling with data; fix the kernel (${bd.why})"))
      info(s"$name: input rows 1x=${at1x.mkString(",")} 10x=${at10x.mkString(",")} " +
        s"bound=${bd.rowBound}")
    }
  }
}
