package graft.tools

import org.apache.spark.sql.SparkSession

/** In-JVM A/B probe for the sf0.1 long-tail fixed overhead (VERDICT r11
  * item 1b): ~224 sub-second queries average 0.6 s each and dominate the
  * warm-solo sequential wall, while the audited heavy hitters total only
  * ~25 s. Every knob probed here is RUNTIME-settable, so one warm JVM
  * compares the whole matrix without re-paying JIT/codegen/index builds:
  *
  *   TUNE_COMBOS  comma list of named combos (default: all)
  *   TUNE_LIMIT   run only the first N queries (0 = all)
  *   TUNE_ONLY    comma list of query-name prefixes
  *
  * Output: per-combo total wall + the per-query deltas vs baseline for
  * the 15 biggest movers, so a win can be attributed before it's frozen
  * into Bench.scala.
  */
object BenchTune {
  private case class Combo(name: String, confs: Map[String, String])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val only = sys.env.get("TUNE_ONLY").map(_.split(",").toSeq)
    val limit = sys.env.getOrElse("TUNE_LIMIT", "0").toInt
    val qs0 = graft.SparkEntry.allQueries.filter(_.name.startsWith("q"))
    val qs1 = only.fold(qs0)(ps => qs0.filter(q => ps.exists(q.name.startsWith)))
    val qs = if (limit > 0) qs1.take(limit) else qs1

    // the baseline MUST mirror Bench.scala's session confs (r12:
    // data-proportional parts — 8 at sf0.1 — and minPartitionNum 8)
    val baseline = Combo("baseline", Map(
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.files.minPartitionNum" -> "8",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1MB"))
    val combos = Seq(
      baseline,
      // round-1 winner (−9%): no AQE stage barrier, 8 reducers
      Combo("aqe_off_parts8", baseline.confs ++ Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8")),
      // + scan fan-out cut: files.minPartitionNum defaults to the core
      // count (32), so even a 16 MB scan launches 32 tasks
      Combo("aqe_off_parts8_minpart8", baseline.confs ++ Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.files.minPartitionNum" -> "8")),
      Combo("aqe_off_parts8_minpart4", baseline.confs ++ Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.files.minPartitionNum" -> "4")),
      Combo("aqe_off_parts4_minpart4", baseline.confs ++ Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.files.minPartitionNum" -> "4")),
      // tiny shuffles: compression latency > IO saved?
      Combo("aqe_off_parts8_minpart8_nocomp", baseline.confs ++ Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.files.minPartitionNum" -> "8",
        "spark.shuffle.compress" -> "false",
        "spark.shuffle.spill.compress" -> "false")),
      Combo("aqe_on_parts8_minpart8", baseline.confs ++ Map(
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.files.minPartitionNum" -> "8")),
      // let AQE coalesce reducers to BYTE size (1-2 partitions at
      // sf0.1) instead of keeping one per core slot
      Combo("aqe_pf_false", baseline.confs ++ Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")),
      Combo("minpart2", baseline.confs ++ Map(
        "spark.sql.files.minPartitionNum" -> "2")),
      Combo("pf_false_minpart2", baseline.confs ++ Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.files.minPartitionNum" -> "2")))
    val chosen = sys.env.get("TUNE_COMBOS") match {
      case Some(names) =>
        val set = names.split(",").toSet
        combos.filter(c => set(c.name))
      case None => combos
    }

    def pass(): Map[String, Double] = qs.map { q =>
      val s = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      q.name -> (System.nanoTime() - s) / 1e9
    }.toMap

    // TUNE_PROFILE=1: decompose each query into DataFrame construction
    // (graft code + any driver-side work), plan force (Catalyst analyze
    // + optimize + physical planning), and execution — tells us whether
    // the long-tail 0.6 s/query is driver planning or task scheduling
    if (sys.env.getOrElse("TUNE_PROFILE", "0") == "1") {
      baseline.confs.foreach { case (k, v) => spark.conf.set(k, v) }
      pass() // warm
      val rows = qs.map { q =>
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        (q.name, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val (tb, tp, te) = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
      println(f"PROFILE totals: build=$tb%.1f plan=$tp%.1f exec=$te%.1f (n=${qs.size})")
      println("top 25 by build+plan:")
      rows.sortBy(r => -(r._2 + r._3)).take(25).foreach { case (n, b, p, e) =>
        println(f"  $n%-36s build=$b%6.3f plan=$p%6.3f exec=$e%6.3f")
      }
      spark.stop()
      return
    }

    // warm-up pass on baseline confs: JIT + codegen + index builds
    baseline.confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val w0 = System.nanoTime(); pass()
    println(f"warmup: ${(System.nanoTime() - w0) / 1e9}%.1f s (n=${qs.size})")

    // GC wall fraction per combo pass: the solo-pass walls in the full
    // bench swing 143-195 s on an idle box with the SAME plans, and the
    // only per-pass mutable state in the JVM is the heap — measure the
    // collector's share instead of guessing heap sizes blind.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    var base: Map[String, Double] = Map.empty
    for (c <- chosen) {
      c.confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val times = pass()
      val total = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis() - gc0) / 1e3
      if (c.name == "baseline") base = times
      val deltaStr = if (base.nonEmpty && c.name != "baseline") {
        val deltas = times.map { case (k, v) => k -> (v - base.getOrElse(k, v)) }
        val movers = deltas.toSeq.sortBy(_._2).take(8) ++
          deltas.toSeq.sortBy(-_._2).take(4)
        " movers: " + movers.map { case (k, d) => f"$k=${d}%+.2f" }.mkString(" ")
      } else ""
      println(f"${c.name}%-22s total=$total%7.1f s gc=$gcSec%6.1f s (${100 * gcSec / total}%.0f%%)$deltaStr")
    }
    spark.stop()
  }
}
