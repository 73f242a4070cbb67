package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of every analytical query — the
  * reviewable record of the repo's plan discipline (pushdown, pruning,
  * broadcasts, top-k, codegen spans). Usage:
  *
  * {{{
  *   sbt "runMain graft.tools.ExplainAudit [sfDir] [outDir]"
  * }}}
  *
  * Writes one `<query>.txt` per query plus `_summary.txt` with grep
  * counts of the operators that matter at scale (CartesianProduct and
  * unplanned SortMergeJoin are the red flags to review).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/plans")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    // formatted mode marks codegen membership per-operator as
    // "[codegen id : N]"; InMemoryTableScan = a reused cached artifact
    // (the IVF index) instead of recomputed lineage
    val interesting = Seq("CartesianProduct", "SortMergeJoin",
      "BroadcastHashJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin",
      "TakeOrderedAndProject", "InMemoryTableScan", "codegen id", "Exchange")
    val summary = new StringBuilder
    SparkEntry.allQueries.filter(_.name.startsWith("q")).foreach { q =>
      try {
        val plan = q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(dir.resolve(s"${q.name}.txt"), plan)
        val counts = interesting.map(op =>
          s"$op=${op.r.findAllIn(plan).length}").mkString(" ")
        summary.append(s"${q.name}: $counts\n")
      } catch {
        case e: Throwable =>
          summary.append(s"${q.name}: EXPLAIN FAILED ${e.getMessage}\n")
      }
    }
    java.nio.file.Files.writeString(dir.resolve("_summary.txt"), summary.toString)
    print(summary)
    spark.stop()
  }
}
