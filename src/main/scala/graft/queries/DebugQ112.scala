package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics for the q112 scale regression: where does the
  * time go — fingerprint build, band-bucket occupancy (candidate join
  * fan-out), or the verify/window stage?
  */
object DebugQ112 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/scale10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val sh = timed("simhash64 build+count") {
      val x = TextOps.simhashes64(spark, dir)
      println("  docs: " + x.count())
      x
    }
    timed("fingerprint diversity") {
      println("  distinct simhash: " + sh.select("simhash").distinct().count())
    }
    val idx = sh.filter(col("doc_id") % 10 =!= 9)
    val batch = sh.filter(col("doc_id") % 10 === 9)
    def bandsOf(df: org.apache.spark.sql.DataFrame) = {
      val bandStructs = (0 until 4).map(b =>
        struct(lit(b).as("b"), substring(col("simhash"), b * 16 + 1, 16).as("bits")))
      df.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.b").as("b"), col("bk.bits").as("bits"))
    }
    timed("bucket occupancy") {
      bandsOf(idx).groupBy("b", "bits").agg(count(lit(1)).as("n"))
        .agg(max("n").as("max_bucket"), expr("percentile(n, 0.99)").as("p99"),
          count(lit(1)).as("n_buckets")).show(false)
    }
    timed("candidate pair count") {
      val cand = bandsOf(batch).as("q").join(bandsOf(idx).as("i"),
          col("q.b") === col("i.b") && col("q.bits") === col("i.bits"))
        .select(col("q.doc_id").as("qid"), col("i.doc_id").as("nid"))
      println("  raw band matches: " + cand.count())
      println("  distinct pairs: " + cand.distinct().count())
    }
    spark.stop()
  }
}
