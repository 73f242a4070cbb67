package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Second relational batch: grouping sets, pivot, calendar spine,
  * sketches, skew-safe aggregation, correlated EXISTS.
  */
object Relational2 {

  val queries: Seq[QueryDef] = Seq(

    // B10: explicit GROUPING SETS (beyond q10's rollup).
    QueryDef(
      "q35_grouping_sets",
      """SELECT COALESCE(l_returnflag, '-') AS rf,
        |       COALESCE(l_linestatus, '-') AS ls,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT COALESCE(l_returnflag, '-') AS rf,
          |       COALESCE(l_linestatus, '-') AS ls,
          |       CAST(COUNT(*) AS BIGINT) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY rf, ls""".stripMargin)
    },

    // Pivot: orders per year × status matrix (DataFrame pivot API;
    // oracle = CASE-WHEN cross tab).
    QueryDef(
      "q36_pivot_status",
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .count()
        .select(col("yr"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("yr")
    },

    // date_spine (B21 — the dbt date_spine macro analog): generated
    // calendar LEFT JOIN daily order counts, zero-filled.
    QueryDef(
      "q37_date_spine",
      """WITH spine AS (
        |  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
        |                                     INTERVAL 1 DAY)) AS DATE) AS day
        |), daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        |  FROM orders GROUP BY 1
        |)
        |SELECT CAST(spine.day AS TIMESTAMP) AS day,
        |       CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin) { (s, dir) =>
      val spine = s.range(1)
        .select(explode(sequence(
          lit("1995-01-01").cast("date"), lit("1995-03-31").cast("date"),
          expr("interval 1 day"))).as("day"))
      val daily = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day").cast("timestamp").as("day"),
          coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy("day")
    },

    // B9 sketches: approx_count_distinct (HLL). Approximation is
    // engine-specific → no SQL oracle; driver records rows-only.
    QueryDef.noOracle("q38_approx_distinct") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .orderBy("l_returnflag")
    },

    // Skew-safe aggregation: two-phase salted groupBy (partial by
    // (key, salt), final by key) — equals the plain aggregate, which is
    // exactly what the oracle checks. The pattern for hot keys at
    // 100 TB when one group would overwhelm a single reducer.
    QueryDef(
      "q39_salted_agg",
      """SELECT o_orderstatus,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val salted = Tables.load(s, dir, "orders")
        .withColumn("salt", (col("o_orderkey") % 8).cast("int"))
        .groupBy("o_orderstatus", "salt")
        .agg(
          count(lit(1)).as("n_part"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .as("sum_part"))
      salted.groupBy("o_orderstatus")
        .agg(
          sum("n_part").cast("long").as("n"),
          sum("sum_part").cast("double").as("total"))
        .orderBy("o_orderstatus")
    },

    // B14: correlated EXISTS / NOT EXISTS pair.
    QueryDef(
      "q40_exists_correlated",
      """SELECT 'with_late_order' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |UNION ALL
        |SELECT 'no_late_order', CAST(COUNT(*) AS BIGINT)
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT 'with_late_order' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          |              AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
          |UNION ALL
          |SELECT 'no_late_order', CAST(COUNT(*) AS BIGINT)
          |FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          |                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
          |ORDER BY bucket""".stripMargin)
    }
  )
}
