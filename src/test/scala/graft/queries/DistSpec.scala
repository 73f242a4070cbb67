package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `Dist` kernel correctness: the distributed two-pass prefix sum must
  * reproduce the single-partition window EXACTLY (rank, running sum,
  * NTILE) on adversarial shapes — skewed values, negatives (DESC keys
  * arrive negated), duplicates of the primary key broken by tiebreak,
  * and n smaller than k.
  */
class DistSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    // deterministic pseudo-random longs; heavy duplication in v so the
    // tiebreak and bucket-boundary paths are exercised
    val rows = (1L to 997L).map { i =>
      val v = (i * 2654435761L) % 37L - 18L // range [-18, 18], many dups
      (v, i)
    }
    rows.toDF("v", "id").repartition(7)
  }

  test("rangedRank == ROW_NUMBER over (v, id)") {
    val df = sample
    val expected = df.withColumn("rk",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    val got = Dist.rangedRank(df, col("v"), col("id"), "rk")
    assert(got.select("v", "id", "rk").except(
      expected.select("v", "id", "rk")).isEmpty)
    assert(expected.select("v", "id", "rk").except(
      got.select("v", "id", "rk")).isEmpty)
  }

  test("rangedRank survives a key range past 2^57 (bucket index must not overflow)") {
    import spark.implicits._
    // keys spread across nearly the full positive Long range: the old
    // `(v-lo)*Buckets` bucket form overflowed past a ~2^57 span and
    // silently broke bucket monotonicity; the divide-first form is exact
    val df = (1L to 200L).map { i =>
      val v = (i * 2654435761L % 100000L) * (1L << 45) + i // span ~2^61
      (v, i)
    }.toDF("v", "id").repartition(5)
    val expected = df.withColumn("rk",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    val got = Dist.rangedRank(df, col("v"), col("id"), "rk")
    assert(got.select("v", "id", "rk").except(
      expected.select("v", "id", "rk")).isEmpty)
    assert(expected.select("v", "id", "rk").except(
      got.select("v", "id", "rk")).isEmpty)
  }

  test("rangedPrefixSum == SUM OVER (ORDER BY v, id ROWS UNBOUNDED..CURRENT)") {
    val df = sample.withColumn("w", (col("id") % 11L) + 1L)
    val expected = df.withColumn("cum",
      sum("w").over(Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Dist.rangedPrefixSum(df, col("v"), col("id"), col("w"), "cum")
    assert(got.select("v", "id", "cum").except(
      expected.select("v", "id", "cum")).isEmpty)
    assert(expected.select("v", "id", "cum").except(
      got.select("v", "id", "cum")).isEmpty)
  }

  test("ntileFromRank == NTILE(k) for k in {3, 5, 10}, including n < k") {
    Seq(997, 7, 3).foreach { n =>
      val df = sample.filter(col("id") <= n) // deterministic subset
      Seq(3, 5, 10).foreach { k =>
        val expected = df.withColumn("t",
          ntile(k).over(Window.orderBy("v", "id")).cast("long"))
        val ranked = Dist.rangedRank(df, col("v"), col("id"), "rk")
        val cnt = df.agg(count(lit(1)).cast("long").as("__n"))
        val got = ranked.crossJoin(broadcast(cnt))
          .select(col("v"), col("id"),
            Dist.ntileFromRank(col("rk"), col("__n"), k).as("t"))
        assert(got.except(expected.select("v", "id", "t")).isEmpty &&
          expected.select("v", "id", "t").except(got).isEmpty,
          s"n=$n k=$k mismatch")
      }
    }
  }

  test("rangedRanks == three independent ROW_NUMBERs (incl. DESC keys)") {
    val df = sample.withColumn("w", (col("id") * 7L) % 13L)
    val expected = df
      .withColumn("r1", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("r2", row_number().over(Window.orderBy(col("w").desc, col("id"))).cast("long"))
      .select("id", "r1", "r2")
    // r16 contract: the kernel returns one row per tie value keyed
    // `__t` (callers carry payload columns instead of joining back)
    val got = Dist.rangedRanks(df, col("id"), Seq(
        (col("v"), "r1"), (-col("w"), "r2")))
      .select(col("__t").as("id"), col("r1"), col("r2"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("rangedRanks payload carry + total == join-back + count (r16)") {
    val df = sample.withColumn("w", (col("id") * 7L) % 13L)
      .withColumn("pay", col("id") * 1000L + col("v"))
    val n = df.count()
    val expected = df
      .withColumn("r1", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("r1"), col("pay"), lit(n).as("__n"))
    val got = Dist.rangedRanks(df, col("id"), Seq((col("v"), "r1")),
        Seq((col("pay"), "pay")), "__n")
      .select(col("__t").as("id"), col("r1"), col("pay"), col("__n"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("rangedRankWithTotal: total column == COUNT(*) (r16)") {
    val df = sample
    val n = df.count()
    val expected = df.withColumn("rk",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
      .withColumn("__n", lit(n))
      .select("v", "id", "rk", "__n")
    val got = Dist.rangedRankWithTotal(df, col("v"), col("id"), "rk", "__n")
      .select("v", "id", "rk", "__n")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("plan: no unpartitioned window over the data; offsets broadcast") {
    // static plan: AQE wraps the tree and hides it from collect()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val wins = try {
      val got = Dist.rangedRank(sample, col("v"), col("id"), "rk")
      graft.tools.ExplainAudit.auditWindows(got.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(wins.nonEmpty, "expected the offsets window in the plan")
    assert(wins.forall(_._1 != "FLAG"),
      s"unpartitioned data-sized window leaked: $wins")
  }
}
