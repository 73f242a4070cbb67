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

    // B9 sketches: approx_count_distinct (HLL). The sketch estimate is
    // engine-specific, so the oracled output is the accuracy INVARIANT:
    // the HLL++ estimate at rsd=0.02 must land within ±10% (5 relative
    // standard deviations) of the exact distinct count. The oracle
    // recomputes the exact side and asserts the bound — a real hash
    // check on sketch health instead of a rows-only count.
    QueryDef(
      "q38_approx_distinct",
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |       TRUE AS within_tolerance
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // Pre-distinct, then sketch + count over the distinct pairs: a
      // HLL register depends only on the SET of values, so the
      // estimate is identical — but mixing countDistinct with another
      // aggregate in one pass forces an Expand (2 projections of every
      // input row through the shuffle). This shape map-side-partials
      // the distinct instead: strictly less shuffled data, same result.
      Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          count(lit(1)).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders"))
            <= col("exact_orders") * lit(0.10)).as("within_tolerance"))
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

    // Skew-safe JOIN: the join-side sibling of q39's salted aggregate.
    // 6M lineitems collapse onto 5 hot keys — a plain shuffle join
    // sends each hot key to ONE reducer (5 of 32 cores busy at
    // 100 TB). Salting: each fact row gets a deterministic salt, the
    // dim is replicated once per salt value, the join keys on
    // (key, salt) → 40 evenly-loaded partitions. The dim is NOT
    // broadcast on purpose — the pattern exists for dims too big to
    // broadcast; shuffle-hash is forced to keep the demo honest. The
    // oracle checks the salted plan equals the plain join.
    QueryDef(
      "q52_salted_join",
      """WITH dim(hot_key, label) AS (
        |  VALUES (0, 'alpha'), (1, 'bravo'), (2, 'charlie'), (3, 'delta'), (4, 'echo')
        |)
        |SELECT label,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN dim ON l_orderkey % 5 = hot_key
        |GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      val labels = Seq("alpha", "bravo", "charlie", "delta", "echo")
      val nSalts = 8
      val dim = s.createDataFrame(labels.zipWithIndex.map { case (l, k) => (k.toLong, l) })
        .toDF("hot_key", "label")
      val dimSalted = dim.crossJoin(
        s.range(nSalts).select(col("id").cast("int").as("salt")))
      val li = Tables.load(s, dir, "lineitem")
        .select(
          (col("l_orderkey") % 5).as("hot_key"),
          (col("l_linenumber") % nSalts).cast("int").as("salt"),
          col("l_quantity"))
      li.join(dimSalted.hint("shuffle_hash"), Seq("hot_key", "salt"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double").as("total_qty"))
        .orderBy("label")
    },

    // B9 exact percentiles: sort-based `percentile` (Spark) vs
    // `quantile_cont` (DuckDB) — both interpolate a + (b-a)·frac at
    // pos = q·(n-1). l_quantity holds small integers and q is a
    // quarter-fraction, so every intermediate is exactly representable
    // and the doubles compare bit-equal with no rounding dance. (The
    // approximate sketch variant is q38.)
    QueryDef(
      "q53_percentiles",
      """SELECT l_returnflag,
        |       CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25_qty,
        |       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
        |       CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS p75_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25_qty"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.75)").as("p75_qty"))
        .orderBy("l_returnflag")
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
    },

    // TPC-H Q7 shape (volume shipping): bilateral trade revenue between
    // two nation pairs by year — a 6-way join (lineitem → orders →
    // customer + lineitem → supplier, each to nation) with the classic
    // cross-pair predicate. Deep-join planning exercise: the two tiny
    // nation dims broadcast, the fact-side joins shuffle on their keys,
    // and Catalyst orders them; revenue in exact decimal (q03's rule).
    QueryDef(
      "q107_volume_shipping",
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ns ON ns.n_nationkey = s_nationkey
        |JOIN nation nc ON nc.n_nationkey = c_nationkey
        |WHERE (ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19')
        |   OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val dec = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DecimalType(20, 4))
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val supp = Tables.load(s, dir, "supplier")
      val ns = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
      val nc = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("nc_key"), col("n_name").as("cust_nation"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(supp, li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("ns_key"))
        .join(broadcast(nc), col("c_nationkey") === col("nc_key"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19")
          || (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8 shape (national market share): one nation's share of a
    // market region's revenue per year — the deepest join in the suite
    // (lineitem → orders → customer → nation → region + lineitem →
    // part + lineitem → supplier → nation), with the share computed as
    // a conditional-sum ratio in one aggregation pass (no self-join).
    // Exact decimal sums; the final ratio is one rounded double
    // division (identical on both engines).
    QueryDef(
      "q108_market_share",
      """WITH base AS (
        |  SELECT EXTRACT(year FROM l_shipdate) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(20,4))
        |           * (1 - CAST(l_discount AS DECIMAL(20,4))) AS volume,
        |         ns.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation nc ON nc.n_nationkey = c_nationkey
        |  JOIN region   ON r_regionkey = nc.n_regionkey
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ns ON ns.n_nationkey = s_nationkey
        |  WHERE r_name = 'EUROPE' AND p_size <= 25
        |)
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        |       CAST(SUM(CASE WHEN supp_nation = 'NATION_13' THEN volume
        |                     ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
        |         AS nation_volume,
        |       CAST(SUM(volume) AS DOUBLE) AS total_volume,
        |       CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_13' THEN volume
        |                               ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
        |                  / CAST(SUM(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
        |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
      val dec = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DecimalType(20, 4))
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val part = Tables.load(s, dir, "part")
      val supp = Tables.load(s, dir, "supplier")
      val nc = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("nc_key"), col("n_regionkey").as("nc_reg"))
      val ns = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
      val reg = Tables.load(s, dir, "region")
      val base = li
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nc), col("c_nationkey") === col("nc_key"))
        .join(broadcast(reg), col("nc_reg") === col("r_regionkey"))
        .join(part, li("l_partkey") === part("p_partkey"))
        .join(supp, li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("ns_key"))
        .filter(col("r_name") === "EUROPE" && col("p_size") <= 25)
        .select(year(col("l_shipdate")).as("o_year"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("volume"),
          col("supp_nation"))
      val german = sum(when(col("supp_nation") === "NATION_13", col("volume"))
        .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(20, 4))))
      base.groupBy(col("o_year").cast("long").as("o_year"))
        .agg(german.cast("double").as("nation_volume"),
          sum(col("volume")).cast("double").as("total_volume"),
          round(german.cast("double") / sum(col("volume")).cast("double"), 4)
            .cast("double").as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    // this schema's columns: a supplier is "blamed" for a finished
    // multi-supplier order when it shipped >90 days after the order
    // date and NO other supplier on that order did. The reference
    // expresses this as double-correlated EXISTS / NOT EXISTS
    // (ref `tests` relational suite); here both correlations collapse
    // into ONE window over ONE lineitem scan — per-order distinct
    // supplier counts (size(collect_set), the window-able form of
    // COUNT(DISTINCT); orders have bounded line counts so the sets
    // are tiny) annotate each line in place, so no second scan and no
    // agg⋈probe join, vs the three correlated scans of the textbook
    // Q21 plan. At 100 TB the single shuffle is on l_orderkey (high
    // cardinality, no skew) and supplier is broadcast-small.
    QueryDef(
      "q117_sole_late_supplier",
      """WITH per_order AS (
        |  SELECT l.l_orderkey,
        |         COUNT(DISTINCT l.l_suppkey) AS n_supp,
        |         COUNT(DISTINCT CASE WHEN l.l_shipdate >
        |                 o.o_orderdate + INTERVAL 90 DAY
        |               THEN l.l_suppkey END) AS n_late
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |  GROUP BY l.l_orderkey
        |), blamed AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN per_order p ON p.l_orderkey = l.l_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |    AND p.n_supp > 1 AND p.n_late = 1
        |)
        |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey")
      val lo = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > date_add(col("o_orderdate"), 90)).as("late"))
      val blamed = lo
        .withColumn("n_supp",
          size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("n_late",
          size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
        .filter(col("late") && col("n_supp") > 1 && col("n_late") === 1)
        .select("l_orderkey", "l_suppkey").distinct()
      blamed
        .join(broadcast(Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // TPC-H Q17 shape (small-order revenue): lines whose quantity is
    // under half their part's average — the correlated-aggregate
    // pattern, computed as an avg-window over ONE lineitem scan
    // rather than the oracle's per-group aggregate joined back onto
    // the detail rows (which scans lineitem twice and re-shuffles the
    // full table into the join). The window shuffles once on
    // l_partkey and annotates each line in place. The comparison is
    // engine-exact because quantities are integer-valued, so the
    // per-part average is an exactly-summed integer over a count
    // regardless of accumulation order. Revenue sums go through
    // decimals (the determinism rule).
    QueryDef(
      "q119_small_order_revenue",
      """WITH pavg AS (
        |  SELECT l_partkey, AVG(l_quantity) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / 7
        |         AS avg_yearly_loss
        |FROM lineitem l
        |JOIN pavg p ON p.l_partkey = l.l_partkey
        |WHERE l.l_quantity < 0.5 * p.avg_qty""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "lineitem")
        .withColumn("avg_qty",
          avg(col("l_quantity")).over(Window.partitionBy("l_partkey")))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(count(lit(1)).as("n_small_lines"),
          (sum(col("l_extendedprice")
            .cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double") / 7).as("avg_yearly_loss"))
    },

    // TPC-H Q18 shape (large-volume orders): orders whose total line
    // quantity exceeds a threshold, served with their customer — the
    // HAVING-filtered aggregate re-joined to its dimensions. The big
    // aggregate shuffles once on l_orderkey; the survivors (a few
    // percent) then join orders and customer, and AQE broadcasts the
    // shrunken side. Top-k is TakeOrdered, tie-broken on the key.
    QueryDef(
      "q120_large_volume_orders",
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
        |           AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 150
        |)
        |SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP)
        |         AS o_orderdate,
        |       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
        |       b.total_qty
        |FROM big b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY b.total_qty DESC, o.o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val dec = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DecimalType(20, 4))
      val big = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") > 150)
        .select(col("l_orderkey"), col("qty_dec").cast("double").as("total_qty"))
      big
        .join(Tables.load(s, dir, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(10)
    }
  )
}
