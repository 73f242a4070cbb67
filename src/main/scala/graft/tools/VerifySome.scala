package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev helper: Verify for a subset of queries (name prefixes as args
  * after sfDir/outDir) so new entries can be oracle-checked without
  * re-running the whole gate. Same output layout as graft.Verify, so
  * tools/check_oracle.py works on the result unchanged.
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val prefixes = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val picked = SparkEntry.allQueries
      .filter(q => prefixes.exists(q.name.startsWith))
    picked.foreach { q =>
      q.run(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${q.name}")
      println(s"[verify-some] wrote ${q.name}")
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = picked.flatMap(q => q.oracle.map(o =>
      s"${esc(q.name)}: ${esc(o)}")).mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
