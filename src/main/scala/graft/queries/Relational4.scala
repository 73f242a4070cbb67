package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fourth relational batch: the last nine TPC-H plan shapes, completing
  * the 22-query sweep (Q1/2/5/7/8/11/15/16/17/18/20/21/22 live in
  * Relational/Relational2/Relational3). Columns the synthetic schema
  * lacks (l_shipmode, l_commitdate, p_container, comments) are replaced
  * by predicates with the same plan topology:
  *
  *   - q127 Q3  top-k unshipped-order revenue (segment filter + 2 joins)
  *   - q128 Q4  order-priority histogram over a correlated EXISTS
  *             (late = shipped >60 days after order date, standing in
  *             for commitdate < receiptdate)
  *   - q129 Q6  pure scan-filter-agg revenue forecast
  *   - q130 Q9  profit by supplier nation × year (cost proxied from
  *             p_retailprice — no partsupp table)
  *   - q131 Q10 returned-items customer ranking (l_returnflag = 'R')
  *   - q132 Q12 priority × shipping-delay-band matrix (delay bands
  *             stand in for shipmode)
  *   - q133 Q13 customer order-count distribution (double aggregate
  *             over a filtered left join)
  *   - q134 Q14 promo revenue share (conditional-sum ratio)
  *   - q135 Q19 disjunctive brand/size/quantity predicate join
  *
  * Determinism rules are Relational's: money math in DECIMAL(20,4)
  * (order-independent exact sums), final division/subtraction as a
  * fixed, small number of IEEE double ops both engines evaluate
  * left-to-right, top-k always fully tie-broken by a unique key.
  *
  * Scale notes (100 TB): every fact-fact join (lineitem ⋈ orders)
  * shuffles on the shared orderkey; dimension sides are broadcast only
  * after their selective filter (brand/name/segment), which keeps them
  * broadcast-able at any SF where dims grow sub-linearly — and AQE
  * demotes to shuffle join if a build side outgrows the threshold.
  */
object Relational4 {

  private def dec(c: Column): Column = c.cast(DecimalType(20, 4))
  private def rev: Column =
    dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  val queries: Seq[QueryDef] = Seq(

    // TPC-H Q3 shape: revenue of orders placed before a date but (in
    // part) shipped after it, for one market segment — top 10. The
    // segment filter reaches the customer scan, both date filters push
    // into their scans, orders⋈lineitem shuffles on orderkey, and the
    // final top-k is a TakeOrderedAndProject (never a global sort).
    // revenue DESC ties are broken by the unique orderkey.
    QueryDef(
      "q127_shipping_priority",
      """SELECT l_orderkey AS o_orderkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
        |         AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 3, 4
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val cut = lit("1998-01-01 00:00:00").cast("timestamp")
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      Tables.load(s, dir, "orders").filter(col("o_orderdate") < cut)
        .join(broadcast(cust), col("c_custkey") === col("o_custkey"))
        .join(Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > cut),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(rev).cast("double").as("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q4 shape: order-priority histogram over orders with at
    // least one late line — the correlated EXISTS becomes a left-semi
    // join whose extra (non-equi) condition rides on the equi join, so
    // it stays a hash semi-join on orderkey, not a broadcast-nested-
    // loop. The lateness cut is precomputed on the orders side so the
    // join condition is a plain column comparison.
    QueryDef(
      "q128_late_order_priority",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .withColumn("late_cut", col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("late_cut"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q6 shape: the pure scan — revenue delta from a discount
    // band in one shipping year. No join at all; all three predicates
    // and the two-column projection push into the parquet scan, and
    // the aggregate is a map-side-combined single row. At 100 TB this
    // is the query whose cost IS the I/O, which is why the scan must
    // show PushedFilters + a 2-column ReadSchema (PlanSpec asserts).
    QueryDef(
      "q129_revenue_forecast",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE)
        |         AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg((sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q9 shape: profit by supplier nation × order year for one
    // part family. No partsupp table in this schema, so cost is
    // proxied as 60% of p_retailprice × quantity — same plan: lineitem
    // joins the name-filtered part + supplier→nation (broadcast after
    // filter) and orders (orderkey shuffle) for the year. Gross and
    // cost are summed as exact decimals SEPARATELY; profit is then
    // two IEEE double ops (0.6×cost, gross−that), so both engines
    // round identically — a 0.6 inside the decimal sum would hit the
    // engines' different decimal-scale-capping rules instead.
    QueryDef(
      "q130_nation_profit",
      """SELECT n_name AS nation,
        |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
        |       - 0.6 * CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))
        |                        * CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
        |         AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_name").contains("widget"))
          .select("p_partkey", "p_retailprice")),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("n_nationkey") === col("s_nationkey"))
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(rev).cast("double").as("gross"),
          sum(dec(col("p_retailprice")) * dec(col("l_quantity")))
            .cast("double").as("cost"))
        .select(col("nation"), col("o_year"),
          (col("gross") - lit(0.6) * col("cost")).as("profit"))
        .orderBy("nation", "o_year")
    },

    // TPC-H Q10 shape: top 20 customers by revenue lost to returned
    // lineitems in one quarter. The quarter filter shrinks orders
    // before the orderkey shuffle against returnflag-filtered
    // lineitem; customer joins on custkey (shuffle — customers scale
    // with the fact side); nation broadcasts. Fully tie-broken top-k.
    QueryDef(
      "q131_returned_items",
      """SELECT c_custkey, c_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
        |         AS revenue,
        |       c_acctbal, n_name
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 4, 5
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-07-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
        .join(Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(rev).cast("double").as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q12 shape: the priority × shipping-class matrix — two
    // conditional sums per group in ONE aggregation pass over the
    // orderkey join (never two scans). Delay bands (days from order
    // to ship) stand in for the missing l_shipmode column; both
    // engines diff midnight timestamps, so the day count is exact.
    QueryDef(
      "q132_delay_priority_matrix",
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
        |            THEN 'fast'
        |            WHEN date_diff('day', o_orderdate, l_shipdate) <= 75
        |            THEN 'medium'
        |            ELSE 'slow' END AS ship_band,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val delay = datediff(col("l_shipdate"), col("o_orderdate"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_shipdate")
        .join(Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(when(delay <= 30, "fast").when(delay <= 75, "medium")
          .otherwise("slow").as("ship_band"))
        .agg(sum(when(high, 1).otherwise(0)).cast("long").as("high_line_count"),
          sum(when(high, 0).otherwise(1)).cast("long").as("low_line_count"))
        .orderBy("ship_band")
    },

    // TPC-H Q13 shape: the customer order-count distribution — a
    // double aggregate: left join customers to their non-urgent orders
    // (the filter lives IN the join condition, so customers with only
    // urgent orders still appear with count 0), count per customer,
    // then histogram the counts. The second aggregate's input is one
    // row per customer — tiny — so the heavy shuffle happens once, on
    // custkey.
    QueryDef(
      "q133_customer_distribution",
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey,
        |             CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) {
      (s, dir) =>
      val cust = Tables.load(s, dir, "customer").select("c_custkey")
      val ord = Tables.load(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderpriority")
      cust.join(ord, col("c_custkey") === col("o_custkey")
          && col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14 shape: promo revenue share — a conditional-sum ratio
    // in one pass over a month of lineitems joined to part. Both sums
    // are exact decimals; the percentage is (promo×100)/total, two
    // IEEE ops evaluated left-to-right in both engines. The CASE's
    // ELSE is an explicit DECIMAL(20,4) zero so the branch types unify
    // identically in both engines.
    QueryDef(
      "q134_promo_revenue",
      """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                 THEN CAST(l_extendedprice AS DECIMAL(20,4))
        |                      * (1 - CAST(l_discount AS DECIMAL(20,4)))
        |                 ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) * 100
        |       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                  * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
        |         AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin) {
      (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
        .join(broadcast(Tables.load(s, dir, "part")
          .select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast(DecimalType(20, 4))))
            .cast("double").as("promo"),
          sum(rev).cast("double").as("total"))
        .select((col("promo") * 100 / col("total")).as("promo_revenue"))
    },

    // TPC-H Q19 shape: the disjunctive predicate join — three
    // brand/size/quantity OR-blocks that mix part and lineitem
    // columns. The per-side halves of each disjunct (brand+size;
    // quantity band) still push into their scans as an OR-of-
    // conjuncts; the cross-side residue evaluates on the join output.
    // Part, pre-filtered to three brands, broadcasts.
    QueryDef(
      "q135_disjunctive_parts",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
        |         AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin) {
      (s, dir) =>
      val b12 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
      val b23 = col("p_brand") === "Brand#23" && col("p_size").between(1, 20)
      val b15 = col("p_brand") === "Brand#15" && col("p_size").between(1, 25)
      Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(b12 || b23 || b15)
          .select("p_partkey", "p_brand", "p_size")),
          col("p_partkey") === col("l_partkey"))
        .filter((b12 && col("l_quantity").between(1, 11))
          || (b23 && col("l_quantity").between(10, 20))
          || (b15 && col("l_quantity").between(20, 30)))
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }
  )
}
