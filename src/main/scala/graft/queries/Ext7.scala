package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Wave-10 operators (round-6 third session, cont.):
  *
  *  - q201: date-spine gap-fill — dimension-complete daily series
  *    (every region x every calendar day, zero-filled) + running
  *    cumulative. The spine is RANGE-bounded (days x regions), not
  *    row-bounded, so it stays tiny at any corpus size; dbt ships
  *    this as the `date_spine` macro.
  *  - q202: PIVOT (status -> columns) per priority — the wide-format
  *    twin of q158's unpivot, via Spark's native `pivot()` with a
  *    pinned value list (one shuffle, no second pass to discover
  *    columns).
  *  - q203: mergeable binned-quantile sketch — 256 fixed-width bins
  *    per event type, p50/p95/p99 by in-bin linear interpolation.
  *    Bin counts are additive under any partitioning (the same
  *    merge property as the CMS/KMV sketches), which is what a
  *    100-TB percentile monitor folds; q53 keeps the exact-percentile
  *    contrast.
  *
  * Determinism: counts/cents integer-exact; the only doubles are
  * mirrored-shape expressions rounded to 4-6 decimals.
  */
object Ext7 {

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "q201_date_spine_gapfill",
      """WITH bounds AS (
        |  SELECT DATE_TRUNC('day', MIN(o_orderdate)) AS lo,
        |         DATE_TRUNC('day', MAX(o_orderdate)) AS hi
        |  FROM orders
        |), days AS (
        |  SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
        |), rev AS (
        |  SELECT r.r_regionkey, DATE_TRUNC('day', o.o_orderdate) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |       JOIN nation na ON na.n_nationkey = c.c_nationkey
        |       JOIN region r ON r.r_regionkey = na.n_regionkey
        |  GROUP BY 1, 2
        |)
        |SELECT g.r_name AS region, g.day AS day,
        |       COALESCE(rev.n, 0) AS n_orders,
        |       COALESCE(rev.cents, 0) AS day_cents,
        |       CAST(SUM(COALESCE(rev.cents, 0))
        |            OVER (PARTITION BY g.r_regionkey ORDER BY g.day) AS BIGINT) AS cum_cents
        |FROM (SELECT r_regionkey, r_name, day FROM region CROSS JOIN days) g
        |LEFT JOIN rev ON rev.r_regionkey = g.r_regionkey AND rev.day = g.day
        |ORDER BY region, day""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val bounds = orders.agg(
        date_trunc("day", min("o_orderdate")).as("lo"),
        date_trunc("day", max("o_orderdate")).as("hi"))
      val days = bounds.select(
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val rev = orders
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_regionkey").as("rk"), date_trunc("day", col("o_orderdate")).as("day"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).cast("long").as("cents"))
      val grid = Tables.load(s, dir, "region")
        .select("r_regionkey", "r_name").crossJoin(broadcast(days))
      grid.join(rev,
          grid("r_regionkey") === rev("rk") && grid("day") === rev("day"), "left")
        .select(col("r_name").as("region"), grid("day").as("day"),
          coalesce(col("n"), lit(0L)).as("n_orders"),
          coalesce(col("cents"), lit(0L)).as("day_cents"))
        .withColumn("cum_cents",
          sum("day_cents").over(
            Window.partitionBy("region").orderBy("day")).cast("long"))
        .orderBy("region", "day")
    },

    QueryDef(
      "q202_status_pivot",
      """SELECT o_orderpriority AS priority,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_orders,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_orders,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_orders,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS f_cents,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS o_cents,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS p_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // native pivot with a PINNED value list: one hash aggregate, no
      // extra pass to discover the pivot domain (at 100 TB the domain
      // scan would rival the aggregate itself)
      val piv = Tables.load(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      piv.select(col("priority"),
          coalesce(col("F_n"), lit(0L)).cast("long").as("f_orders"),
          coalesce(col("O_n"), lit(0L)).cast("long").as("o_orders"),
          coalesce(col("P_n"), lit(0L)).cast("long").as("p_orders"),
          coalesce(col("F_c"), lit(0L)).cast("long").as("f_cents"),
          coalesce(col("O_c"), lit(0L)).cast("long").as("o_cents"),
          coalesce(col("P_c"), lit(0L)).cast("long").as("p_cents"))
        .orderBy("priority")
    },

    QueryDef(
      "q203_binned_quantiles",
      """WITH b AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL
        |), m AS (
        |  SELECT event_type, MAX(value) AS hi, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1
        |), bins AS (
        |  SELECT b.event_type,
        |         LEAST(CAST(FLOOR(b.value / (m.hi / 256)) AS BIGINT), 255) AS bin,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM b JOIN m USING (event_type) GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, bin, cnt,
        |         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum
        |  FROM bins
        |), probes AS (
        |  SELECT * FROM (VALUES (0.5), (0.95), (0.99)) t(p)
        |), sel AS (
        |  SELECT c.event_type, pr.p, MIN(c.bin) AS bin
        |  FROM cum c JOIN m USING (event_type) CROSS JOIN probes pr
        |  WHERE CAST(c.cum AS DOUBLE) >= pr.p * CAST(m.n AS DOUBLE)
        |  GROUP BY 1, 2
        |)
        |SELECT s.event_type, s.p AS quantile, s.bin,
        |       CAST(ROUND((m.hi / 256)
        |                  * (CAST(s.bin AS DOUBLE)
        |                     + (s.p * CAST(m.n AS DOUBLE) - CAST(c.cum - c.cnt AS DOUBLE))
        |                       / CAST(c.cnt AS DOUBLE)), 4) AS DOUBLE) AS estimate
        |FROM sel s JOIN m ON m.event_type = s.event_type
        |     JOIN cum c ON c.event_type = s.event_type AND c.bin = s.bin
        |ORDER BY s.event_type, quantile""".stripMargin) { (s, dir) =>
      val b = Tables.load(s, dir, "events")
        .filter(col("value").isNotNull).select("event_type", "value")
      val m = b.groupBy("event_type")
        .agg(max("value").as("hi"), count(lit(1)).cast("long").as("n"))
      val bins = b.join(broadcast(m), "event_type")
        .select(col("event_type"),
          least(floor(col("value") / (col("hi") / 256)).cast("long"), lit(255L)).as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).cast("long").as("cnt"))
      val cum = bins.withColumn("cum",
        sum("cnt").over(Window.partitionBy("event_type").orderBy("bin")).cast("long"))
      val probes = Seq(0.5, 0.95, 0.99).foldLeft(Option.empty[DataFrame]) { (acc, p) =>
        val one = b.sparkSession.range(1).select(lit(p).as("p"))
        Some(acc.map(_.unionAll(one)).getOrElse(one))
      }.get
      val sel = cum.join(broadcast(m), "event_type").crossJoin(broadcast(probes))
        .filter(col("cum").cast("double") >= col("p") * col("n").cast("double"))
        .groupBy("event_type", "p").agg(min("bin").as("bin"))
      sel.join(broadcast(m), "event_type")
        .join(cum.withColumnRenamed("bin", "cbin"),
          Seq("event_type")).filter(col("cbin") === col("bin"))
        .select(col("event_type"), col("p").as("quantile"), col("bin"),
          round((col("hi") / 256) *
            (col("bin").cast("double") +
              (col("p") * col("n").cast("double") - (col("cum") - col("cnt")).cast("double")) /
                col("cnt").cast("double")), 4).cast("double").as("estimate"))
        .orderBy("event_type", "quantile")
    }
  )
}
