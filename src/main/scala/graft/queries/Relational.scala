package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational surface fixture queries — one or more per SURVEY.md §2B
  * family (B1–B20). Every query is written twice: as an idiomatic Spark
  * DataFrame program (what Catalyst optimizes) and as DuckDB SQL (the
  * driver's oracle). Column names and types are aligned between both.
  *
  * Determinism rules (the oracle hash-compares values):
  *  - double aggregation goes through exact decimal arithmetic, then a
  *    final cast to double: sum(cast(x as decimal(20,4))) — parallel
  *    summation order then cannot change the result;
  *  - every query ends in a total ORDER BY on tie-free keys;
  *  - int-typed scalar functions (year, length, floor) are cast to a
  *    common width on both sides (Spark int vs DuckDB bigint).
  *
  * Scale notes are per-query; the general stance: filters/projections
  * stay in the scan (pushdown), small dims are broadcast, large joins
  * shuffle on their natural keys, aggregates are partial+final.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(20, 4))
  /** Exact sum of a double column: decimal-sum then cast back. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  val queries: Seq[QueryDef] = Seq(

    // B1+B3+B4: scan, projection, expression, filter (pushdown check:
    // explain must show PushedFilters on l_shipdate and a 4-col ReadSchema).
    QueryDef(
      "q01_scan_filter",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(20,4))
        |            * (1 - CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_quantity") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // B9: TPC-H Q1 shape — grouped aggregation with partial+final agg.
    QueryDef(
      "q02_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(COUNT(*) AS BIGINT) AS count_order,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // B5: multi-way join (TPC-H Q5 shape). region/nation are broadcast;
    // orders⋈lineitem is the one real shuffle (on orderkey), then
    // customer joins on custkey. At 100 TB: bucket orders+lineitem by
    // orderkey to kill that shuffle.
    QueryDef(
      "q03_revenue_per_nation",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |                * (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("n_name")
    },

    // B5: left outer join keeping customers with zero orders.
    QueryDef(
      "q04_orders_per_customer_outer",
      """SELECT c_custkey,
        |       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
        |       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(20,4))), 0) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast("double")
            .as("total_spend"))
        .orderBy("c_custkey")
    },

    // B6: anti join — customers with no high-value order (dbt
    // `relationships` test shape: child LEFT ANTI JOIN parent).
    QueryDef(
      "q05_customers_without_orders",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // B6: semi join — suppliers that shipped at least one item.
    QueryDef(
      "q06_active_suppliers_semi",
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "supplier")
        .join(Tables.load(s, dir, "lineitem"),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // B7: equi+range join — quantity within a band of the part size.
    QueryDef(
      "q07_quantity_band_join",
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM part JOIN lineitem
        |  ON l_partkey = p_partkey
        | AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part").as("p")
        .join(Tables.load(s, dir, "lineitem").as("l"),
          col("l_partkey") === col("p_partkey")
            && col("l_quantity").between(col("p_size") - 5, col("p_size") + 5))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"))
        .orderBy("p_brand")
    },

    // B7: pure theta join on tiny dims → broadcast nested loop.
    QueryDef(
      "q08_theta_join_regions",
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS other_nations
        |FROM region JOIN nation ON n_regionkey <> r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "region")
        .join(Tables.load(s, dir, "nation"),
          col("n_regionkey") =!= col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("other_nations"))
        .orderBy("r_name")
    },

    // B8: as-of/latest-row — newest order per customer via ranked window
    // (the SCD2 "current row" pattern). One shuffle on the partition key.
    QueryDef(
      "q09_latest_order_per_customer",
      """SELECT o_custkey, o_orderkey, o_orderdate
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |             ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    },

    // B10: rollup (grouping sets family).
    QueryDef(
      "q10_rollup_status",
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },

    // B11: ranking + analytic windows with explicit frames.
    QueryDef(
      "q11_top3_orders_with_lag",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(20,4)) AS DOUBLE) AS price,
        |         ROW_NUMBER() OVER w AS rn,
        |         CAST(COALESCE(LAG(CAST(o_totalprice AS DECIMAL(20,4))) OVER w, 0) AS DOUBLE) AS prev_price,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
        |              OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          // DECIMAL(20,4) renders differently between Spark and DuckDB under the
          // driver's hash normalization; the value is exact at scale 4, so the
          // DOUBLE conversion is the same round-to-nearest on both engines.
          dec(col("o_totalprice")).cast("double").as("price"),
          row_number().over(w).as("rn"),
          coalesce(lag(dec(col("o_totalprice")), 1).over(w), lit(0))
            .cast("double").as("prev_price"),
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // B12: global top-k — Spark plans TakeOrderedAndProject (no full sort).
    QueryDef(
      "q12_top10_orders",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // B13: set operations — EXCEPT / INTERSECT / UNION ALL over key sets.
    QueryDef(
      "q13_setops_custkeys",
      """WITH early AS (SELECT DISTINCT o_custkey FROM orders
        |               WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |     late  AS (SELECT DISTINCT o_custkey FROM orders
        |               WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
        |SELECT 'only_early' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM early EXCEPT SELECT * FROM late) a
        |UNION ALL
        |SELECT 'both' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM early INTERSECT SELECT * FROM late) b
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val cut = lit("1996-01-01 00:00:00").cast("timestamp")
      val early = ord.filter(col("o_orderdate") < cut).select("o_custkey").distinct()
      val late = ord.filter(col("o_orderdate") >= cut).select("o_custkey").distinct()
      early.except(late).agg(count(lit(1)).as("n"))
        .select(lit("only_early").as("bucket"), col("n"))
        .unionAll(early.intersect(late).agg(count(lit(1)).as("n"))
          .select(lit("both").as("bucket"), col("n")))
        .orderBy("bucket")
    },

    // B14: CTE + scalar subquery (max per customer — exact on doubles)
    // + IN subquery. Catalyst decorrelates the scalar subquery into a
    // grouped join; no per-row re-execution.
    QueryDef(
      "q14_cte_subqueries",
      """WITH building AS (SELECT c_custkey FROM customer
        |                  WHERE c_mktsegment = 'BUILDING')
        |SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_custkey IN (SELECT c_custkey FROM building)
        |  AND o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH building AS (SELECT c_custkey FROM customer
          |                  WHERE c_mktsegment = 'BUILDING')
          |SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders o
          |WHERE o_custkey IN (SELECT c_custkey FROM building)
          |  AND o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // B15: string functions.
    QueryDef(
      "q15_string_funcs",
      """SELECT c_custkey,
        |       UPPER(c_name) AS uname,
        |       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
        |       SUBSTR(c_name, 1, 8) AS name_prefix,
        |       SPLIT_PART(c_name, '#', 2) AS name_num,
        |       REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
        |       CONCAT_WS('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string"))
            .as("seg_nat"))
        .orderBy("c_custkey")
    },

    // B16: date/time functions — months, diffs, extraction.
    QueryDef(
      "q16_orders_per_month",
      """SELECT DATE_TRUNC('month', o_orderdate) AS month,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(MIN(DATE_DIFF('day', DATE '1992-01-01',
        |                          CAST(o_orderdate AS DATE))) AS BIGINT) AS min_day_offset,
        |       CAST(MAX(YEAR(o_orderdate)) AS BIGINT) AS yr
        |FROM orders
        |GROUP BY 1
        |ORDER BY month""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date")))
            .cast("long").as("min_day_offset"),
          max(year(col("o_orderdate"))).cast("long").as("yr"))
        .orderBy("month")
    },

    // B17: case/when, coalesce, nullif, least/greatest, floor/ceil.
    QueryDef(
      "q17_case_math",
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000 THEN 'high'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'low' END AS bucket,
        |       CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_price,
        |       CAST(CEIL(o_totalprice) AS BIGINT) AS ceil_price,
        |       CAST(LEAST(o_totalprice, 150000.0) AS DOUBLE) AS capped,
        |       COALESCE(NULLIF(o_orderstatus, 'O'), 'open?') AS status_or_flag
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"),
          floor(col("o_totalprice")).cast("long").as("floor_price"),
          ceil(col("o_totalprice")).cast("long").as("ceil_price"),
          least(col("o_totalprice"), lit(150000.0)).cast("double").as("capped"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open?"))
            .as("status_or_flag"))
        .orderBy("o_orderkey")
    },

    // B18: hashing — md5 surrogate key, the dbt_scd_id recipe
    // (reference: tests/functional/simple_snapshot/fixtures.py:76
    // snapshot_hash_arguments → md5(concat_ws('|', ...))).
    QueryDef(
      "q18_surrogate_keys",
      """SELECT o_orderkey,
        |       MD5(CONCAT_WS('|', CAST(o_orderkey AS VARCHAR),
        |                          CAST(o_custkey AS VARCHAR))) AS scd_id
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          md5(concat_ws("|", col("o_orderkey").cast("string"),
            col("o_custkey").cast("string"))).as("scd_id"))
        .orderBy("o_orderkey")
    },

    // B19: JSON extraction + array explode (lateral).
    QueryDef(
      "q19_json_explode",
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // B20: null-safe equality (`<=>` / IS NOT DISTINCT FROM) — the
    // snapshot `check` strategy's row_changed compare.
    QueryDef(
      "q20_null_safe_compare",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_same_status
        |FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey
        |WHERE NULLIF(a.o_orderstatus, 'F') IS NOT DISTINCT FROM NULLIF(b.o_orderpriority, 'x')
        |""".stripMargin) { (s, dir) =>
      val a = Tables.load(s, dir, "orders").as("a")
      val b = Tables.load(s, dir, "orders").as("b")
      a.join(b, col("a.o_orderkey") === col("b.o_orderkey"))
        .filter(nullif(col("a.o_orderstatus"), lit("F"))
          <=> nullif(col("b.o_orderpriority"), lit("x")))
        .agg(count(lit(1)).as("n_same_status"))
    }
  )
}
