package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Wave-6 operators: product-analytics shapes every warehouse team runs
  * (cohort retention, anomaly scoring, Markov transitions, streaks,
  * session paths) plus graph/text curation extensions (triangle support
  * on the co-purchase graph, sorted-neighborhood dedup blocking, exact
  * integer tf-icf term ranking).
  *
  * Same determinism contract as Relational.scala: decimal-exact
  * aggregation, identical IEEE double expression shapes on both engines
  * where a ratio is genuinely fractional, total tie-free ORDER BY.
  */
object Ext3 {

  private def dec(c: Column): Column = c.cast(DecimalType(20, 4))

  val queries: Seq[QueryDef] = Seq(

    // Cohort retention matrix: users grouped by first-activity week,
    // tracked over week offsets. Scale: the (user, week) activity grid
    // and the per-user cohort week share ONE user_id shuffle (distinct
    // then groupBy on the same key — co-partitioned join, no second
    // exchange); the final cohort×offset rollup is tiny. 100 TB: the
    // user dimension is the only big cardinality and it partitions
    // cleanly.
    QueryDef(
      "q146_cohort_retention",
      """WITH wk AS (SELECT DISTINCT user_id, DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cohort_week FROM wk GROUP BY 1)
        |SELECT cohort_week,
        |       CAST(DATE_DIFF('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM wk JOIN f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      val wk = Tables.load(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = wk.groupBy("user_id").agg(min("wk").as("cohort_week"))
      wk.join(first, "user_id")
        .withColumn("week_offset", expr("datediff(wk, cohort_week) div 7").cast("long"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // Rolling z-score anomaly detection over daily purchase revenue:
    // mean/variance from EXACT decimal window sums (sum, sum-of-squares
    // over a 7-day trailing frame), final z in double with the same
    // IEEE expression shape on both engines — correctly-rounded ops on
    // identical operands give identical bits, no stddev-implementation
    // drift. Decimal→double casts are only bit-identical across
    // engines while the unscaled value stays < 2^53 (DuckDB casts via
    // int128→double then divides by 10^scale — two roundings), so the
    // scale-8 sum-of-squares is first ROUNDed to 2 decimals (a decimal
    // op with identical half-up rounding in both engines — NOT a
    // decimal downcast, which DuckDB truncates but Spark rounds)
    // before its cast. The day-grain series is bounded cardinality
    // (like q96's vocabulary rank), so the unpartitioned window is a
    // documented non-issue at 100 TB; the heavy lifting is the
    // map-side-combined daily rollup.
    QueryDef(
      "q147_revenue_anomaly",
      """WITH daily AS (
        |  SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
        |         CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DECIMAL(18,4)) AS rev_d
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), w AS (
        |  SELECT day, rev_d,
        |         COUNT(*) OVER win AS n,
        |         SUM(rev_d) OVER win AS s,
        |         SUM(rev_d * rev_d) OVER win AS sq
        |  FROM daily
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT day, CAST(rev_d AS DOUBLE) AS revenue,
        |       (CAST(rev_d AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |         / SQRT((CAST(ROUND(sq, 2) AS DOUBLE)
        |                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                / (CAST(n AS DOUBLE) - 1)) AS z
        |FROM w WHERE n >= 3 ORDER BY day""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(dec(col("value"))).cast(DecimalType(18, 4)).as("rev_d"))
      val win = Window.orderBy("day").rowsBetween(-7, -1)
      val d = (c: Column) => c.cast("double")
      daily
        .withColumn("n", count(lit(1)).over(win))
        .withColumn("s", sum(col("rev_d")).over(win))
        .withColumn("sq", sum(col("rev_d") * col("rev_d")).over(win))
        .filter(col("n") >= 3)
        .select(
          col("day"), d(col("rev_d")).as("revenue"),
          ((d(col("rev_d")) - d(col("s")) / d(col("n")))
            / sqrt((d(round(col("sq"), 2))
              - d(col("s")) * d(col("s")) / d(col("n")))
              / (d(col("n")) - 1))).as("z"))
        .orderBy("day")
    },

    // First-order Markov transition matrix over per-user event
    // sequences: one lead window on the user_id×time order, then a
    // grouped count and a per-from-state normalization. p is a single
    // bigint/bigint division in double — deterministic. 100 TB: one
    // user_id shuffle for the window, one tiny (|types|²) aggregate.
    QueryDef(
      "q148_markov_transitions",
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events
        |), t AS (
        |  SELECT event_type AS from_type, next_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM t ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val t = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).cast("long").as("n"))
      t.withColumn("p",
          col("n").cast("double")
            / sum(col("n")).over(Window.partitionBy("from_type")).cast("double"))
        .orderBy("from_type", "to_type")
    },

    // Gaps-and-islands: longest consecutive-day activity streak per
    // user (the classic `day - row_number()` island key). 100 TB: the
    // distinct day grid and both windows partition on user_id — one
    // shuffle end-to-end; no self-join formulation.
    QueryDef(
      "q149_activity_streaks",
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        |  FROM d
        |), st AS (
        |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS streak FROM r GROUP BY 1, 2
        |)
        |SELECT user_id, MAX(streak) AS longest_streak,
        |       CAST(SUM(streak) AS BIGINT) AS active_days
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      d.withColumn("grp", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).cast("long").as("streak"))
        .groupBy("user_id")
        .agg(max("streak").as("longest_streak"),
          sum("streak").cast("long").as("active_days"))
        .orderBy("user_id")
    },

    // Triangle support on the part co-purchase graph (community
    // cohesion / "frequently bought together" strength). The scale
    // move: SPARSIFY FIRST — keep only edges with co-occurrence
    // support ≥ 2, which empirically holds the candidate graph at
    // ~3k edges across 100× of SF growth (co-baskets get sparser as
    // the catalog grows), then enumerate oriented triangles (a<b<c,
    // each counted once) on the pruned list. Per-order pair fan-out is
    // bounded by basket size; the triangle joins run on a
    // dimension-sized table AQE can broadcast. No all-pairs stage.
    QueryDef(
      "q150_part_triangles",
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |), tri AS (
        |  SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.pb = e2.pa
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
        |), m AS (
        |  SELECT x AS p FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri
        |)
        |SELECT p AS p_partkey, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM m GROUP BY 1 ORDER BY n_tri DESC, p_partkey LIMIT 15""".stripMargin) { (s, dir) =>
      val items = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val a = items.select(col("l_orderkey"), col("l_partkey").as("pa"))
      val b = items.select(col("l_orderkey"), col("l_partkey").as("pb"))
      val e = a.join(b, "l_orderkey")
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select("pa", "pb")
      val e1 = e.select(col("pa").as("x"), col("pb").as("y"))
      val e2 = e.select(col("pa").as("y2"), col("pb").as("z"))
      val e3 = e.select(col("pa").as("x3"), col("pb").as("z3"))
      val tri = e1.join(e2, col("y") === col("y2"))
        .join(e3, col("x") === col("x3") && col("z") === col("z3"))
        .select("x", "y", "z")
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("p"))
        .groupBy("p").agg(count(lit(1)).cast("long").as("n_tri"))
        .select(col("p").as("p_partkey"), col("n_tri"))
        .orderBy(col("n_tri").desc, col("p_partkey")).limit(15)
    },

    // Sorted-neighborhood dedup blocking (Hernández–Stolfo SNM): the
    // alternative candidate generator to MinHash banding (q27). Sort
    // documents by a normalized prefix key, compare each row to its
    // next 2 neighbors WITHIN a 4-char block; integer levenshtein on
    // the 64-char prefix keeps both engines bit-agreed. 100 TB: blocks
    // partition the sort (no global window), window state is O(w)=2
    // rows, candidate count is ≤ 2N — linear, never all-pairs.
    QueryDef(
      "q151_snm_candidates",
      """WITH n AS (
        |  SELECT doc_id,
        |         substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 64) AS norm
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, norm, substr(norm, 1, 4) AS blk FROM n
        |), p AS (
        |  SELECT blk, doc_id, norm,
        |         LEAD(doc_id, 1) OVER w AS d1, LEAD(norm, 1) OVER w AS n1,
        |         LEAD(doc_id, 2) OVER w AS d2, LEAD(norm, 2) OVER w AS n2
        |  FROM o WINDOW w AS (PARTITION BY blk ORDER BY norm, doc_id)
        |)
        |SELECT doc_a, doc_b, lev FROM (
        |  SELECT doc_id AS doc_a, d1 AS doc_b,
        |         CAST(levenshtein(norm, n1) AS BIGINT) AS lev
        |  FROM p WHERE d1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, d2, CAST(levenshtein(norm, n2) AS BIGINT)
        |  FROM p WHERE d2 IS NOT NULL
        |) u WHERE lev <= 8
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val n = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          substring(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), 1, 64)
            .as("norm"))
        .withColumn("blk", substring(col("norm"), 1, 4))
      val w = Window.partitionBy("blk").orderBy("norm", "doc_id")
      val p = n
        .withColumn("d1", lead(col("doc_id"), 1).over(w))
        .withColumn("n1", lead(col("norm"), 1).over(w))
        .withColumn("d2", lead(col("doc_id"), 2).over(w))
        .withColumn("n2", lead(col("norm"), 2).over(w))
      val c1 = p.filter(col("d1").isNotNull)
        .select(col("doc_id").as("doc_a"), col("d1").as("doc_b"),
          levenshtein(col("norm"), col("n1")).cast("long").as("lev"))
      val c2 = p.filter(col("d2").isNotNull)
        .select(col("doc_id").as("doc_a"), col("d2").as("doc_b"),
          levenshtein(col("norm"), col("n2")).cast("long").as("lev"))
      c1.union(c2).filter(col("lev") <= 8).orderBy("doc_a", "doc_b")
    },

    // Top session opening paths (the Sankey/user-journey feed): q33's
    // sessionization, then the first 3 event types pivoted into a
    // '>'-joined path string (pivot-by-rank, not collect_list — order
    // is pinned by the window, and concat_ws drops the NULL steps of
    // short sessions identically in both engines). 100 TB: everything
    // up to the final tiny path rollup partitions on user_id.
    QueryDef(
      "q152_session_paths",
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events
        |), m AS (
        |  SELECT *, CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
        |                 OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sx AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
        |  FROM sx
        |), pth AS (
        |  SELECT user_id, sid,
        |         CONCAT_WS('>', MAX(CASE WHEN rn = 1 THEN event_type END),
        |                        MAX(CASE WHEN rn = 2 THEN event_type END),
        |                        MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
        |  FROM r GROUP BY 1, 2
        |)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM pth GROUP BY path ORDER BY n_sessions DESC, path LIMIT 25""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val m = Tables.load(s, dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("ns",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L
            || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sid",
          sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val r = m.withColumn("rn",
        row_number().over(Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")))
      r.groupBy("user_id", "sid")
        .agg(concat_ws(">",
          max(when(col("rn") === 1, col("event_type"))),
          max(when(col("rn") === 2, col("event_type"))),
          max(when(col("rn") === 3, col("event_type")))).as("path"))
        .groupBy("path").agg(count(lit(1)).cast("long").as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(25)
    },

    // Per-language salient terms by tf·icf, with the inverse collection
    // frequency as an EXACT integer surrogate (1e6·N div df — the
    // q139 log-free move taken one step further: rank-equivalent to a
    // reciprocal-df idf, zero float ops anywhere, so the gate compares
    // pure bigints). 100 TB: tf and df are both map-side-combined
    // aggregates over one tokenization pass; df is vocabulary-sized
    // and broadcast into the scoring join; the rank window partitions
    // by language.
    QueryDef(
      "q153_tficf_terms",
      """WITH tok AS (
        |  SELECT doc_id, lang, t AS term
        |  FROM (SELECT doc_id, lang,
        |               unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
        |        FROM documents) x
        |  WHERE length(t) >= 3
        |), tf AS (
        |  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
        |), df AS (
        |  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1
        |), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |sc AS (
        |  SELECT lang, tf.term, tf,
        |         CAST(tf * ((1000000 * n_docs) // df) AS BIGINT) AS score
        |  FROM tf JOIN df ON tf.term = df.term, nd
        |), r AS (
        |  SELECT lang, term, tf, score,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term)
        |              AS BIGINT) AS rk
        |  FROM sc
        |)
        |SELECT lang, rk, term, tf, score FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val nDocs = docs.count()
      val tok = docs
        .select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), "[^a-z]+")).as("term"))
        .filter(length(col("term")) >= 3)
      val tf = tok.groupBy("lang", "term").agg(count(lit(1)).cast("long").as("tf"))
      val df = tok.groupBy("term")
        .agg(countDistinct("doc_id").cast("long").as("df"))
      val sc = tf.join(broadcast(df), "term")
        .withColumn("score",
          (col("tf") * expr(s"(1000000L * ${nDocs}L) div df")).cast("long"))
      val rw = Window.partitionBy("lang").orderBy(col("score").desc, col("term"))
      sc.withColumn("rk", row_number().over(rw).cast("long"))
        .filter(col("rk") <= 10)
        .select("lang", "rk", "term", "tf", "score")
        .orderBy("lang", "rk")
    }
  )
}
