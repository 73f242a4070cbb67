package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Benchmark main (driver contract): runs the headline analytical
  * queries on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology — three passes, so one-time costs can't masquerade as
  * query regressions (the r4 attribution problem: cache builds and
  * queue time landed on whichever concurrent query arrived first):
  *
  *  1. COLD sequential pass (`cold_first_pass`): JIT + codegen
  *     compilation + every built-once index/asset-table build, each
  *     billed to its first toucher. `index_build_sec` ≈ cold total −
  *     warm-solo total = the one-time warm-up work.
  *  2. WARM SOLO sequential pass (`per_query_warm_solo`): each query
  *     alone on a quiet JVM — THE per-query number to compare across
  *     rounds.
  *  3. CONCURRENT batch (`value` + `queries`): FAIR-scheduled pool,
  *     Spark's honest single-node throughput number; per-query times
  *     overlap and are reported for completeness only.
  *
  * SPARK_GRAFT_BENCH_MODE=batch skips pass 2 for quick local loops.
  *
  * Framework m-queries (engine runs against scratch warehouses) are
  * correctness fixtures gated by Verify, not throughput queries —
  * excluded here.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val concurrency = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONCURRENCY", "4").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "full") // full | batch
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = SparkEntry.allQueries.filter(_.name.startsWith("q"))

    // Sink: a `noop`-format write consumes every row through the FULL
    // physical plan — unlike `count()`, which lets Catalyst drop each
    // query's final global sort and under-measures ordered queries.
    def drain(q: QueryDef): Unit =
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()

    def timedPass(): Seq[(String, Double, Boolean)] = headline.map { q =>
      val s = System.nanoTime()
      try { drain(q); (q.name, (System.nanoTime() - s) / 1e9, true) }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          (q.name, (System.nanoTime() - s) / 1e9, false)
      }
    }

    // pass 1: cold sequential (JIT + index builds, per first toucher)
    val coldT0 = System.nanoTime()
    val cold = timedPass()
    val coldTotal = (System.nanoTime() - coldT0) / 1e9

    // pass 2: warm solo sequential — the comparable per-query numbers
    val (solo, soloTotal) =
      if (mode == "batch") (Nil, 0.0)
      else {
        val t = System.nanoTime()
        val r = timedPass()
        (r, (System.nanoTime() - t) / 1e9)
      }

    // pass 3: concurrent batch — the headline throughput number
    val pool = Executors.newFixedThreadPool(concurrency)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val futures = headline.map { q =>
      Future {
        val s = System.nanoTime()
        try { drain(q); (q.name, (System.nanoTime() - s) / 1e9, true) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            (q.name, (System.nanoTime() - s) / 1e9, false)
        }
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf)
    val total = (System.nanoTime() - t0) / 1e9
    pool.shutdown()

    def qmap(rs: Seq[(String, Double, Boolean)]): String =
      rs.collect { case (k, v, true) => s""""$k":$v""" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s""""$k"""" }
      .mkString("[", ",", "]")
    val indexBuild = math.max(0.0, coldTotal - soloTotal)

    // Full machine-readable artifact: every per-query number from all three
    // passes. The driver's log capture keeps only the LAST 2000 chars of
    // stdout, which truncated (and un-parseable-ified) the r5 one-line JSON
    // at 170 queries — so the complete maps live in this file and stdout
    // carries a compact summary that fits the capture window.
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec",
         |"batch_wall":$total,
         |"cold_first_pass_wall":$coldTotal,
         |"warm_solo_wall":$soloTotal,
         |"index_build_sec":$indexBuild,
         |"queries":${qmap(results)},
         |"per_query_warm_solo":${qmap(solo)},
         |"per_query_cold":${qmap(cold)},
         |"failed":$failed,
         |"sf":"$sfDir","concurrency":$concurrency,"cpus":"$cpus","mode":"$mode",
         |"note":"value=concurrent batch wall after cold+solo passes; per_query_warm_solo=comparable per-query numbers; batch per-query times overlap; sink=noop write (order-preserving)"}
         |""".stripMargin
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json"))
    java.nio.file.Files.write(outPath, fullJson.getBytes("UTF-8"))

    // Compact stdout line (< ~1500 chars so the whole line survives the
    // driver's 2000-char tail): summary walls + the 20 slowest batch
    // queries, rounded; the complete per-query maps are in BENCH_FULL.json.
    def r3(v: Double): String = f"$v%.3f"
    val top20 = results.filter(_._3).sortBy(-_._2).take(20)
      .map { case (k, v, _) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
    val soloPart =
      if (mode == "batch") ""
      else s""""warm_solo_wall":${r3(soloTotal)},"index_build_sec":${r3(indexBuild)},"""
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$top20,$soloPart"cold_first_pass_wall":${r3(coldTotal)},"n_queries":${headline.size},"failed":$failed,"sf":"$sfDir","concurrency":$concurrency,"full":"${outPath.toAbsolutePath}","note":"queries=20 slowest of concurrent batch; complete 3-pass per-query maps in the full file"}""")
    spark.stop()
  }
}
