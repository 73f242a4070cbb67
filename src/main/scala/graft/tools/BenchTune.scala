package graft.tools
import org.apache.spark.sql.SparkSession
object BenchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val parts = sys.env.getOrElse("TUNE_PARTS", "32")
    val adaptive = sys.env.getOrElse("TUNE_AQE", "true")
    // parallelismFirst=false lets AQE coalesce post-shuffle partitions
    // down to minPartitionSize instead of keeping one per core — at
    // sf0.1 most shuffles are << 32 MB total, so 32 reducer tasks are
    // pure scheduling overhead
    val pfirst = sys.env.getOrElse("TUNE_PFIRST", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", adaptive)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pfirst)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val limit = sys.env.getOrElse("TUNE_LIMIT", "0").toInt
    val qs0 = graft.SparkEntry.allQueries.filter(_.name.startsWith("q"))
    val qs = if (limit > 0) qs0.take(limit) else qs0
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val times = qs.map { q =>
        val s = System.nanoTime()
        q.run(spark, sfDir).count()
        q.name -> (System.nanoTime() - s) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"pass $pass (parts=$parts aqe=$adaptive): total=$total%.1f")
      if (pass == 2) times.sortBy(-_._2).take(5).foreach { case (n, t) => println(f"  $n: $t%.2f") }
    }
    spark.stop()
  }
}
