package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order kernels — the scale path for the handful of
  * query shapes that are naturally "one global ordered sweep" (rank,
  * NTILE, running sum). A single-partition `WindowExec` computes these
  * correctly but serializes the whole input through one task — the one
  * plan shape that cannot survive a 100× scale-up. The replacement is
  * the classic two-pass distributed prefix sum (the same topology as
  * q177's bucketed systematic sample, generalized to arbitrary numeric
  * sort keys):
  *
  *   1. bucket every row by a MONOTONE function of the sort key
  *      (fixed-width value buckets between the global min/max — a
  *      deterministic, plan-pure choice, immune to sampling/AQE,
  *      unlike `spark_partition_id` after a range exchange);
  *   2. per-bucket prefix sums via a PARTITIONED window (parallel);
  *   3. per-bucket totals → an offsets table of ≤ `buckets` rows whose
  *      own ordered sweep is metadata-scale (the same order as a
  *      RangePartitioner boundary array), broadcast back and added.
  *
  * Exactness: the bucket function is monotone in the sort key and ties
  * never split across buckets (the bucket depends only on the key), so
  * `offset + local prefix` is exactly the global prefix sum. With a
  * unique (key, tiebreak) the derived rank is exactly `ROW_NUMBER`,
  * and `ntileFromRank` reproduces SQL `NTILE` from the closed form.
  */
object Dist {

  /** Number of value buckets: enough for every core to work, few
    * enough that the offsets table stays metadata-scale. On a real
    * cluster this would be O(executors); the exactness argument is
    * independent of the count.
    */
  val Buckets = 64

  /** Exact global running sum of `value` under the total order
    * `(v ASC, tie ASC)` — `v` and `tie` must be integral (callers
    * scale decimals; negate `v` for DESC) and `(v, tie)` unique per
    * row. Appends `out` = SUM(value) OVER (ORDER BY v, tie ROWS
    * UNBOUNDED PRECEDING..CURRENT) without any single-partition
    * window over the data.
    */
  def rangedPrefixSum(df: DataFrame, v: Column, tie: Column,
      value: Column, out: String): DataFrame = {
    val b = s"__b_$out"; val lo = s"__lo_$out"; val hi = s"__hi_$out"
    val lc = s"__lc_$out"; val off = s"__off_$out"; val vc = s"__v_$out"
    val tc = s"__t_$out"; val wc = s"__w_$out"
    val keyed = df.withColumn(vc, v.cast("long"))
      .withColumn(tc, tie.cast("long")).withColumn(wc, value.cast("long"))
    // global key range: a 1-row aggregate, broadcast by crossJoin
    val mm = keyed.agg(min(vc).as(lo), max(vc).as(hi))
    // fixed-width bucket index — monotone in the key, 0..Buckets-1
    val bucketed = keyed.crossJoin(broadcast(mm))
      .withColumn(b, expr(
        s"cast((($vc - $lo) * ${Buckets}L) div (greatest($hi - $lo, 0L) + 1L) as int)"))
      .drop(lo, hi)
    // pass 1: per-bucket running sums — partitioned, parallel
    val local = bucketed.withColumn(lc,
      sum(wc).over(Window.partitionBy(b).orderBy(vc, tc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // pass 2: bucket offsets — ≤ Buckets rows; the ordered window here
    // sweeps THAT tiny aggregate, then broadcasts back
    val offsets = bucketed.groupBy(b).agg(sum(wc).as(wc))
      .select(col(b), coalesce(sum(wc).over(Window.orderBy(b)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as(off))
    local.join(broadcast(offsets), b)
      .withColumn(out, col(lc) + col(off))
      .drop(b, lc, off, vc, tc, wc)
  }

  /** Exact global `ROW_NUMBER() OVER (ORDER BY v, tie)` — requires
    * `(v, tie)` unique per row, so the running count IS the rank.
    */
  def rangedRank(df: DataFrame, v: Column, tie: Column, out: String): DataFrame =
    rangedPrefixSum(df, v, tie, lit(1L), out)

  /** SQL `NTILE(k)` bucket from a 1-based rank and the total row count
    * `n`: the first `n % k` tiles carry `n/k + 1` rows, the rest
    * `n/k` (identical in Spark and DuckDB — both implement the
    * standard closed form).
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = intDiv(n, lit(k.toLong))
    val rem = n % k
    val cut = rem * (q + 1)
    when(rank <= cut, intDiv(rank - 1, q + 1) + 1)
      .otherwise(rem + intDiv(rank - cut - 1, greatest(q, lit(1L))) + 1)
  }

  /** Exact floor division for non-negative longs: `a - a%b` is an
    * exact multiple of `b`, so the double quotient is the exact
    * integer (always < 2^53 here).
    */
  private def intDiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")
}
