package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable
object Profile26 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = mutable.Map[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages(si.stageId) = (si.name.split("\n").head.take(60), ms, si.numTasks)
      }
    })
    val q = graft.SparkEntry.queries("q26_ngram_jaccard_pairs")
    // warm
    q(spark, "/root/testdata/sf0.1").count()
    stages.clear()
    val t0 = System.nanoTime()
    q(spark, "/root/testdata/sf0.1").count()
    println(f"total ${(System.nanoTime()-t0)/1e9}%.2f s")
    stages.toSeq.sortBy(_._1).foreach { case (id, (name, ms, n)) =>
      println(f"stage $id%3d: $ms%6d ms  tasks=$n%3d  $name")
    }
    spark.stop()
  }
}
