package graft.tools
import graft.core._
import graft.exec.Materializer
import graft.run.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugSnap {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(s, "/root/testdata/sf0.01")
    val wh = java.nio.file.Files.createTempDirectory("dbg_wh").toString
    val eng = new Engine(s, Manifest(Map.empty), wh)
    def batch(k: Int): String = {
      s.sql(s"""SELECT o_orderkey AS id,
        CASE WHEN o_orderkey % 10 = 0 AND $k >= 1 THEN 'U1'
             WHEN o_orderkey % 10 = 1 AND $k >= 2 THEN 'U2'
             ELSE o_orderstatus END AS status,
        CASE WHEN o_orderkey % 10 = 0 AND $k >= 1 THEN TIMESTAMP '1999-01-02 00:00:00'
             WHEN o_orderkey % 10 = 1 AND $k >= 2 THEN TIMESTAMP '1999-01-03 00:00:00'
             ELSE o_orderdate END AS updated_at
        FROM orders
        WHERE NOT (o_orderkey % 10 = 2 AND $k >= 2)
          AND NOT (o_orderkey % 10 = 3 AND $k = 0)""").createOrReplaceTempView("dbg_src")
      "SELECT * FROM dbg_src"
    }
    def clockAt(day: Int): Materializer.Clock =
      () => java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2000,1,1+day,0,0,0))
    for (k <- 0 to 2) {
      Materializer.snapshot(eng.wh, "dbg_snap", batch(k), Seq("id"),
        TimestampStrategy("updated_at"), invalidateHardDeletes = true, clockAt(k))
      val t = eng.wh.read("dbg_snap")
      println(s"=== after batch $k: total=${t.count()}")
      t.withColumn("grp", col("id") % 10)
        .withColumn("open", col("dbt_valid_to").isNull).groupBy("grp", "open").count()
        .orderBy("grp", "open").show(30)
    }
    s.stop()
  }
}
