package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third relational batch: the remaining hard TPC-H plan shapes, adapted
  * to this schema (no partsupp table — lineitem plays the part-supplier
  * fact role). Each query is one canonical decorrelation pattern:
  *
  *   - q121 groupwise-min join (Q2's min-cost supplier)
  *   - q122 HAVING against a global scalar subquery (Q11)
  *   - q123 equal-to-max scalar subquery (Q15)
  *   - q124 distinct-count with NOT-IN supplier exclusion (Q16)
  *   - q125 nested semi-join with a correlated share threshold (Q20)
  *   - q126 global-average filter + anti-join (Q22)
  *
  * Determinism rule (same as Relational/Relational2): money sums go
  * through DECIMAL(20,4) so the aggregate is order-independent, and the
  * final division/casts to DOUBLE are single IEEE ops both engines
  * round identically. Quantities are integer-valued doubles, exact
  * under summation.
  */
object Relational3 {

  private def dec(c: Column): Column = c.cast(DecimalType(20, 4))

  val queries: Seq[QueryDef] = Seq(

    // TPC-H Q2 shape: for each small part, the supplier(s) with the
    // minimum average sale price — the groupwise-min (argmin). The
    // Spark plan does it as a min-window over the per-(part, supplier)
    // aggregate rather than the oracle's agg-join-agg CTE: one pass
    // over the already-aggregated (small) rows, no second full
    // aggregate and no cost⋈best join — Spark computes an unreferenced
    // CTE subtree twice, so the join form would scan lineitem twice.
    // The p_size predicate keeps or drops WHOLE partkey groups (the
    // min is within-group), so it is pushed below the aggregate as a
    // broadcast semi-join on the filtered part keys: map-side, no
    // extra shuffle, and the groupBy + window only see lineitem rows
    // for small parts (~the part-filter selectivity of the fact
    // table) instead of aggregating everything and discarding 90% at
    // the join. Part/supplier/nation dims broadcast. Cost =
    // exactly-summed decimal cast to double, divided by the count:
    // one IEEE division, identical in both engines, so the
    // min-equality filter matches exactly.
    QueryDef(
      "q121_min_cost_supplier",
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
        |           / COUNT(*) AS cost
        |  FROM lineitem GROUP BY 1, 2
        |), best AS (
        |  SELECT l_partkey, MIN(cost) AS min_cost FROM cost GROUP BY 1
        |)
        |SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
        |       c.cost AS min_cost
        |FROM cost c
        |JOIN best b ON b.l_partkey = c.l_partkey AND c.cost = b.min_cost
        |JOIN part p ON p.p_partkey = c.l_partkey
        |JOIN supplier s ON s.s_suppkey = c.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE p.p_size <= 5
        |ORDER BY p.p_partkey, s.s_name""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val smallParts = Tables.load(s, dir, "part")
        .filter(col("p_size") <= 5)
      val cost = Tables.load(s, dir, "lineitem")
        .join(broadcast(smallParts.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg((sum(dec(col("l_extendedprice"))).cast("double")
          / count(lit(1))).as("cost"))
      cost
        .withColumn("min_cost",
          min(col("cost")).over(Window.partitionBy("l_partkey")))
        .filter(col("cost") === col("min_cost"))
        .join(broadcast(smallParts),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"),
          col("n_name"), col("cost").as("min_cost"))
        .orderBy("p_partkey", "s_name")
    },

    // TPC-H Q11 shape: parts whose total sales value exceeds a
    // multiple of the GLOBAL mean part value — HAVING against a scalar
    // subquery. The scalar is a 1-row aggregate broadcast into the
    // filter (cross join of a singleton), never a per-group rescan.
    // The threshold is mean-relative (1.5× the average part value), so
    // it selects a stable ~1-2% of parts at every SF; the compare is
    // cross-multiplied into integer-scaled decimals (2·val·n > 3·tot)
    // so both engines evaluate it in exact decimal arithmetic — a
    // fractional literal would be DECIMAL in DuckDB but DOUBLE in
    // Spark, two different coercion paths.
    QueryDef(
      "q122_important_parts",
      """WITH value AS (
        |  SELECT l_partkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS val
        |  FROM lineitem GROUP BY 1
        |), total AS (
        |  SELECT SUM(val) AS tot, COUNT(*) AS n_parts FROM value
        |)
        |SELECT v.l_partkey AS p_partkey, CAST(v.val AS DOUBLE) AS part_value
        |FROM value v CROSS JOIN total t
        |WHERE 2 * v.val * t.n_parts > 3 * t.tot
        |ORDER BY part_value DESC, p_partkey""".stripMargin) { (s, dir) =>
      val value = Tables.load(s, dir, "lineitem").groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice"))).as("val"))
      val total = value.agg(sum(col("val")).as("tot"),
        count(lit(1)).as("n_parts"))
      value.join(broadcast(total))
        .filter(lit(2) * col("val") * col("n_parts")
          > lit(3) * col("tot"))
        .select(col("l_partkey").as("p_partkey"),
          col("val").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    },

    // TPC-H Q15 shape: the top supplier(s) by quarterly revenue —
    // revenue view + equal-to-max scalar subquery. Revenue is summed
    // once per supplier (one suppkey shuffle); the max is a 1-row
    // broadcast; survivors (usually one) join the supplier dim.
    // Revenue stays decimal through the equality compare.
    QueryDef(
      "q123_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |             * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01'
        |    AND l_shipdate < DATE '1995-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name,
        |       CAST(r.total_rev AS DOUBLE) AS total_rev
        |FROM revenue r
        |JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, dir) =>
      val revenue = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("date")
          && col("l_shipdate") < lit("1995-04-01").cast("date"))
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice"))
          * (lit(1) - dec(col("l_discount")))).as("total_rev"))
      val best = revenue.agg(max(col("total_rev")).as("max_rev"))
      revenue.join(broadcast(best), col("total_rev") === col("max_rev"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q16 shape: distinct supplier count per part attribute,
    // excluding a supplier blocklist — the NOT-IN (anti-join) +
    // COUNT(DISTINCT) combination. The exclusion is a broadcast
    // left_anti before the join; the distinct-count pre-distincts on
    // the grouping keys + suppkey (map-side combine) instead of
    // shipping every duplicate row to one reducer.
    QueryDef(
      "q124_part_supplier_counts",
      """SELECT p.p_brand, p.p_type, p.p_size,
        |       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_size IN (1, 2, 3)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
        |  )
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin) { (s, dir) =>
      val blocked = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 1000).select("s_suppkey")
      Tables.load(s, dir, "lineitem")
        .join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_size").isin(1, 2, 3))),
          col("p_partkey") === col("l_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey").distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count(lit(1)).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // TPC-H Q20 shape: suppliers that dominate the supply of some
    // focus part — a nested semi-join whose inner predicate compares a
    // per-(part, supplier) aggregate against a correlated share of the
    // per-part total. ONE lineitem scan: the per-part total is a
    // sum-window over the already-aggregated (part, supplier) rows,
    // not the oracle's second full-table aggregate, and the window
    // runs AFTER the broadcast widget-part filter — legal because the
    // p_name predicate removes whole parts, never rows within a part,
    // so only surviving parts pay the window shuffle. The qualifying
    // set collapses to distinct suppkeys and semi-joins the supplier
    // dim. Quantities are integer-valued, so sums and the 0.2×
    // threshold are exact regardless of accumulation order.
    QueryDef(
      "q125_dominant_suppliers",
      """WITH ss AS (
        |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2
        |), pt AS (
        |  SELECT l_partkey, SUM(l_quantity) AS part_qty
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT s.s_name, s.s_acctbal
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT ss.l_suppkey
        |  FROM ss
        |  JOIN pt ON pt.l_partkey = ss.l_partkey
        |  JOIN part p ON p.p_partkey = ss.l_partkey
        |  WHERE p.p_name LIKE '%widget' AND ss.qty > 0.2 * pt.part_qty
        |)
        |ORDER BY s.s_name""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val qualifying = Tables.load(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity")).as("qty"))
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_name").like("%widget")).select("p_partkey")),
          col("p_partkey") === col("l_partkey"))
        .withColumn("part_qty",
          sum(col("qty")).over(Window.partitionBy("l_partkey")))
        .filter(col("qty") > lit(0.2) * col("part_qty"))
        .select("l_suppkey")
      Tables.load(s, dir, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    },

    // TPC-H Q22 shape: well-funded customers who never ordered —
    // global-average scalar filter + anti-join, rolled up by nation.
    // The average over positive balances is a 1-row broadcast; the
    // anti-join runs on the shrunken survivor set, not all customers;
    // the rollup is a tiny nation-keyed aggregate.
    QueryDef(
      "q126_idle_rich_customers",
      """WITH threshold AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
        |           / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0
        |)
        |SELECT n.n_name,
        |       CAST(COUNT(*) AS BIGINT) AS n_custs,
        |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
        |         AS total_bal
        |FROM customer c, threshold t
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c.c_acctbal > t.avg_bal
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= DATE '2001-01-01'
        |  )
        |GROUP BY 1
        |ORDER BY n.n_name""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val threshold = cust.filter(col("c_acctbal") > 0)
        .agg((sum(dec(col("c_acctbal"))).cast("double")
          / count(lit(1))).as("avg_bal"))
      cust.join(broadcast(threshold))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("date"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_custs"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
        .orderBy("n_name")
    }
  )
}
