package graft.queries

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Skew-join resilience gate (VERDICT r5 item 7): q52's salting is
  * oracle-checked for correctness; this spec checks the SKEW BEHAVIOR —
  * that the salted plan actually bounds the straggler partition on an
  * adversarial key distribution. Metric: per-task shuffle-read RECORDS
  * from a SparkListener (data volume, not wall time, so the assertion
  * is deterministic for a fixed partitioning).
  */
class SkewJoinSpec extends SparkSpec {

  private def perTaskShuffleRecords(run: => Unit): Seq[Long] = {
    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleReadMetrics != null)
          tasks.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      org.apache.spark.sql.graftshim.drainListenerBus(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    tasks.asScala.toSeq
  }

  test("salting bounds the hot-key straggler partition (measured spread)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val nSalts = 8
    // adversarial distribution: ~25% of fact rows collapse onto ONE key
    val liRaw = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    val hotKey = liRaw.agg(min("l_partkey")).head().getLong(0)
    val li = liRaw.withColumn("l_partkey",
      when(pmod(col("l_orderkey"), lit(4)) === 0, lit(hotKey))
        .otherwise(col("l_partkey")))
      .persist()
    val total = li.count()
    val hotRows = li.filter(col("l_partkey") === hotKey).count()
    assert(hotRows > total / 5, "fixture must actually be skewed")
    val dim = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))

    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // raw skew, no rescue
    try {
      def unsalted() = li.join(dim.hint("shuffle_hash"), Seq("l_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      def salted() = {
        val fact = li.withColumn("salt",
          pmod(col("l_linenumber"), lit(nSalts)).cast("int"))
        val dimSalted = dim.crossJoin(
          spark.range(nSalts).select(col("id").cast("int").as("salt")))
        fact.join(dimSalted.hint("shuffle_hash"), Seq("l_partkey", "salt"))
          .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      }
      // same answer first — the speed claim is meaningless otherwise
      val a = unsalted().as[(String, Long, Double)].collect().toSet
      val b = salted().as[(String, Long, Double)].collect().toSet
      assert(a === b, "salted join must be a pure re-plan")

      val u = perTaskShuffleRecords(
        unsalted().write.format("noop").mode("overwrite").save())
      val sTasks = perTaskShuffleRecords(
        salted().write.format("noop").mode("overwrite").save())
      val uMax = u.max
      val sMax = sTasks.max
      info(f"unsalted max-task shuffle records = $uMax (hot rows = $hotRows); " +
        f"salted max-task = $sMax; spread ratio = ${uMax.toDouble / sMax}%.1f x")
      // the unsalted hot partition carries ~all hot rows in ONE task...
      assert(uMax >= hotRows,
        s"expected the unsalted plan to funnel the hot key into one task ($uMax < $hotRows)")
      // ...and salting splits it nSalts ways: the straggler shrinks by
      // a wide margin (>= 2.5x here; exact factor depends on hashing)
      assert(uMax.toDouble / sMax >= 2.5,
        s"salting must bound the straggler: unsalted max $uMax vs salted max $sMax")
    } finally {
      li.unpersist()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
