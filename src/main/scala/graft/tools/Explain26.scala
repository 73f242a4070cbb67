package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Explain26 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime(); val n = f
        println(f"$label pass$p: $n rows, ${(System.nanoTime()-t0)/1e9}%.2fs")
      }
    }
    val w = split(col("text"), " ")
    val shs = graft.functions.TextExprs.shingles(w, 3)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(32).select(col("doc_id"), shs.as("shs"))
    val sh = docs.select(col("doc_id"), explode(col("shs")).as("shingle"))
    def agg(j: org.apache.spark.sql.DataFrame) = j
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    val cond = col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id")
    time("broadcast")(agg(sh.as("a").join(broadcast(sh).as("b"), cond)).count())
    time("shuffle_hash")(agg(sh.as("a").join(sh.hint("shuffle_hash").as("b"), cond)).count())
    time("merge")(agg(sh.as("a").join(sh.hint("merge").as("b"), cond)).count())
    spark.stop()
  }
}
