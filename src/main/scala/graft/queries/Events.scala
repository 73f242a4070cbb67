package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch analytics over the `events` stream table — the batch twins of
  * the Structured Streaming operators (tumbling windows, sessionization,
  * dedup-within-watermark). The streaming versions share these exact
  * aggregation shapes via `graft.streaming` (readStream → window →
  * writeStream); keeping a batch twin makes them oracle-checkable.
  */
object Events {

  val queries: Seq[QueryDef] = Seq(

    // Tumbling 1-hour window per event type (streaming: groupBy(window($"ts","1 hour"))).
    QueryDef(
      "q32_tumbling_window",
      """SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double").as("sum_value"))
        .orderBy("hour", "event_type")
    },

    // Sessionization: 30-minute inactivity gap per user → session ids
    // via lag + cumulative sum (streaming twin: session_window($"ts","30 minutes")).
    QueryDef(
      "q33_sessionize",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
        |              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events) e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts, event_id,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM marked
        |)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sessions
        |GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events").select("user_id", "ts", "event_id")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val marked = ev.withColumn("new_session",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L
          || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
      val sessions = marked.withColumn("session_no",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      sessions.groupBy("user_id", "session_no")
        .agg(
          count(lit(1)).as("n_events"),
          min("ts").as("session_start"),
          max("ts").as("session_end"))
        .select(col("user_id"), col("session_no").cast("long").as("session_no"),
          col("n_events"), col("session_start"), col("session_end"))
        .orderBy("user_id", "session_no")
    },

    // Stream dedup twin: first event per (user_id, event_type) within
    // each day (streaming: dropDuplicatesWithinWatermark).
    QueryDef(
      "q34_dedup_first_event",
      """SELECT user_id, event_type,
        |       DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
        |       CAST(MIN(event_id) AS BIGINT) AS first_event_id
        |FROM events
        |GROUP BY user_id, event_type, 3
        |ORDER BY user_id, event_type, day""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(min("event_id").cast("long").as("first_event_id"))
        .orderBy("user_id", "event_type", "day")
    },

    // B11 frames: per-customer running spend over an explicit
    // ROWS BETWEEN frame. Tie-free ordering (date, orderkey) keeps the
    // cumulative sums deterministic; decimal cumsum is exact in both
    // engines. Key restriction bounds the verified output, not the
    // computation shape.
    QueryDef(
      "q54_running_spend",
      """SELECT o_custkey, o_orderkey,
        |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_spend
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("order_seq"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .over(frame).cast("double").as("running_spend"))
        .orderBy("o_custkey", "order_seq")
    },

    // Event funnel: users progressing view → click → purchase in
    // temporal order — each step's earliest qualifying timestamp must
    // follow the previous step's. The per-step min-reduce keeps every
    // stage a groupBy (no window over the raw event log), and step
    // tables shrink monotonically, so the joins get cheaper as the
    // funnel deepens — the scalable funnel topology.
    QueryDef(
      "q55_event_funnel",
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |)
        |SELECT step, CAST(n AS BIGINT) AS n_users FROM (
        |  SELECT 'step1_view' AS step, COUNT(*) AS n FROM v
        |  UNION ALL SELECT 'step2_click', COUNT(*) FROM c
        |  UNION ALL SELECT 'step3_purchase', COUNT(*) FROM p
        |) t ORDER BY step""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events").select("user_id", "event_type", "ts")
      def step(of: String, after: org.apache.spark.sql.DataFrame,
          afterCol: String, out: String) =
        ev.filter(col("event_type") === of)
          .join(after, Seq("user_id"))
          .filter(col("ts") > col(afterCol))
          .groupBy("user_id").agg(min("ts").as(out))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = step("click", v, "t1", "t2")
      val p = step("purchase", c, "t2", "t3")
      def cnt(df: org.apache.spark.sql.DataFrame, label: String) =
        df.agg(count(lit(1)).cast("long").as("n_users"))
          .select(lit(label).as("step"), col("n_users"))
      cnt(v, "step1_view")
        .unionByName(cnt(c, "step2_click"))
        .unionByName(cnt(p, "step3_purchase"))
        .orderBy("step")
    },

    // Retention cohorts — the product-analytics staple: users cohorted
    // by first-activity week, per-week return rates thereafter. Both
    // engines truncate weeks to Monday, so cohort keys and day diffs
    // (all multiples of 7) agree exactly; the rate is a decimal ratio
    // rounded to 4. Scale shape: one user-keyed min-reduce (cohort),
    // one distinct on (user, week) — both map-side combinable — and a
    // cohort-grid rollup; no window over the raw event log.
    QueryDef(
      "q106_retention_cohorts",
      """WITH e AS (
        |  SELECT user_id, DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS wk
        |  FROM events
        |), coh AS (
        |  SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT e.user_id, coh.cohort, e.wk
        |  FROM e JOIN coh USING (user_id)
        |), sz AS (
        |  SELECT cohort, COUNT(*) AS cohort_size FROM coh GROUP BY cohort
        |)
        |SELECT a.cohort AS cohort_week,
        |       CAST(DATE_DIFF('day', CAST(a.cohort AS DATE), CAST(a.wk AS DATE)) // 7
        |            AS BIGINT) AS week_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_active,
        |       CAST(MAX(sz.cohort_size) AS BIGINT) AS cohort_size,
        |       CAST(ROUND(CAST(COUNT(*) AS DECIMAL(20,6)) / MAX(sz.cohort_size), 4)
        |            AS DOUBLE) AS retention
        |FROM act a JOIN sz ON sz.cohort = a.cohort
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val coh = e.groupBy("user_id").agg(min("wk").as("cohort"))
      val act = e.join(coh, "user_id")
        .select("user_id", "cohort", "wk").distinct()
      val sz = coh.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      act.join(sz, "cohort")
        .groupBy(col("cohort").as("cohort_week"),
          floor(datediff(col("wk"), col("cohort")) / 7).cast("long")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_active"),
          max("cohort_size").cast("long").as("cohort_size"),
          round(count(lit(1)).cast(org.apache.spark.sql.types.DecimalType(20, 6))
            / max("cohort_size"), 4).cast("double").as("retention"))
        .orderBy("cohort_week", "week_offset")
    },

    // Inter-event-time distribution: quartiles of the gap (whole
    // seconds) between a user's consecutive events, per event type —
    // the arrival-process profile that sizes session-gap thresholds
    // (q33's 30 min) and streaming watermarks. Gaps are floored to
    // integer seconds, so quartile interpolation (quarter fractions of
    // integers) is exact in both engines — the q53/q80 portability
    // rule. One per-user window pass + one per-type aggregate.
    QueryDef(
      "q109_inter_event_times",
      """WITH g AS (
        |  SELECT event_type,
        |         CAST(DATE_DIFF('microseconds', LAG(ts) OVER w, ts) // 1000000
        |              AS BIGINT) AS gap_s
        |  FROM (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |               event_id FROM events) e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |  QUALIFY LAG(ts) OVER w IS NOT NULL
        |)
        |SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |       CAST(quantile_cont(gap_s, 0.25) AS DOUBLE) AS p25_s,
        |       CAST(quantile_cont(gap_s, 0.50) AS DOUBLE) AS p50_s,
        |       CAST(quantile_cont(gap_s, 0.75) AS DOUBLE) AS p75_s
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("gap_s",
          ((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            / 1000000L).cast("long"))
        .filter(col("gap_s").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap_s, 0.25)").as("p25_s"),
          expr("percentile(gap_s, 0.50)").as("p50_s"),
          expr("percentile(gap_s, 0.75)").as("p75_s"))
        .orderBy("event_type")
    },

    // Ordered funnel: signup → first view AFTER the signup → first
    // purchase AFTER that view, per user — the product-analytics
    // staple that needs ORDER, not mere co-occurrence (a purchase
    // before signup must not count). Each step is one shuffle on
    // user_id over a monotonically SHRINKING survivor set, so at
    // 100 TB the step tables quickly become broadcast-small while the
    // big events scan happens exactly once per step filter (AQE flips
    // the join side automatically). Conversion is double division of
    // exact integer counts — IEEE-identical on both engines.
    QueryDef(
      "q114_funnel",
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'view' GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |), counts AS (
        |  SELECT 'step1_signup' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        |  UNION ALL
        |  SELECT 'step2_view', CAST(COUNT(*) AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT 'step3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3
        |), base AS (SELECT n_users AS n1 FROM counts WHERE step = 'step1_signup')
        |SELECT step, n_users,
        |       CAST(ROUND(100.0 * n_users / n1, 4) AS DOUBLE) AS conversion_pct
        |FROM counts CROSS JOIN base
        |ORDER BY step""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      val counts = s1.agg(count(lit(1)).as("n_users"))
        .select(lit("step1_signup").as("step"), col("n_users"))
        .unionByName(s2.agg(count(lit(1)).as("n_users"))
          .select(lit("step2_view").as("step"), col("n_users")))
        .unionByName(s3.agg(count(lit(1)).as("n_users"))
          .select(lit("step3_purchase").as("step"), col("n_users")))
      val base = counts.filter(col("step") === "step1_signup")
        .select(col("n_users").as("n1"))
      counts.crossJoin(base)
        .select(col("step"), col("n_users"),
          round(lit(100.0) * col("n_users") / col("n1"), 4)
            .cast("double").as("conversion_pct"))
        .orderBy("step")
    },

    // Rolling 7-day active users (WAU) + same-day actives (DAU) +
    // stickiness per day. The rolling distinct is NOT a window
    // function (COUNT(DISTINCT) OVER RANGE doesn't distribute): each
    // distinct (user, day) pair fans out to the ≤7 target days it
    // contributes to — a map-side ×7 expansion — then ONE shuffle on
    // the day key aggregates. At 100 TB the expansion is linear and
    // the day-keyed aggregate is a two-phase partial countDistinct
    // (Spark expands on (day, user) first), so no hot single reducer.
    // Counts are exact integers; stickiness is a decimal division —
    // bit-identical across engines.
    QueryDef(
      "q116_rolling_active_users",
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
        |  FROM events
        |), days AS (SELECT DISTINCT d FROM ud),
        |wau AS (
        |  SELECT days.d, COUNT(DISTINCT ud.user_id) AS wau
        |  FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
        |  GROUP BY days.d
        |), dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d)
        |SELECT CAST(wau.d AS TIMESTAMP) AS day,
        |       CAST(dau.dau AS BIGINT) AS dau,
        |       CAST(wau.wau AS BIGINT) AS wau,
        |       CAST(ROUND(CAST(dau.dau AS DECIMAL(20,6)) / wau.wau, 4) AS DOUBLE)
        |         AS stickiness
        |FROM wau JOIN dau ON dau.d = wau.d
        |ORDER BY day""".stripMargin) { (s, dir) =>
      val ud = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
        .distinct()
      val days = ud.select(col("d").as("day")).distinct()
      // each active day contributes to itself and the 6 following days
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("d"))
        .select(col("user_id"), expr("date_add(d, i)").as("day"))
        .join(days, "day") // observed days only; tiny → AQE broadcasts
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
      val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
      wau.join(dau, "day")
        .select(col("day").cast("timestamp").as("day"), col("dau"), col("wau"),
          round(col("dau").cast(org.apache.spark.sql.types.DecimalType(20, 6))
            / col("wau"), 4).cast("double").as("stickiness"))
        .orderBy("day")
    },

    // Top event trigrams: the 10 most common 3-step event sequences
    // across user timelines — the path-analysis staple behind "what do
    // users do next". One window pass per user (lead ×2, no
    // self-joins), one shuffle on the trigram key; ties broken on the
    // full sequence so the top-10 cut is deterministic. At scale the
    // per-user window partitions by user_id (millions of small
    // partitions — no skew) and the trigram space is tiny.
    QueryDef(
      "q118_event_trigrams",
      """WITH seq AS (
        |  SELECT s1, LEAD(s1, 1) OVER w AS s2, LEAD(s1, 2) OVER w AS s3
        |  FROM (SELECT user_id, event_type AS s1, CAST(ts AS TIMESTAMP) AS ts,
        |               event_id FROM events) e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT s1 AS step1, s2 AS step2, s3 AS step3,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM seq WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type").as("step1"),
          col("ts"), col("event_id"))
        .withColumn("step2", lead(col("step1"), 1).over(w))
        .withColumn("step3", lead(col("step1"), 2).over(w))
        .filter(col("step3").isNotNull)
        .groupBy("step1", "step2", "step3")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(10)
    },

    // Last-touch attribution: every purchase is credited to the user's
    // most recent PRIOR touch event (view/click/signup), the classic
    // marketing-attribution operator. The carry is a single ignore-
    // nulls last_value window with a 1-PRECEDING frame — no as-of
    // self-join, no range join: one user-keyed shuffle and the touch
    // rides forward through the partition. value sums via the q32
    // decimal idiom so the double column aggregates order-
    // independently. 100 TB: the window partitions by user (millions
    // of small partitions — perfectly parallel), and the final rollup
    // is 4 rows.
    QueryDef(
      "q143_last_touch_attribution",
      """WITH e AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |         event_type, value
        |  FROM events
        |), t AS (
        |  SELECT event_type, value,
        |         LAST_VALUE(CASE WHEN event_type IN ('view','click','signup')
        |                         THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS touch
        |  FROM e
        |)
        |SELECT COALESCE(touch, 'none') AS channel,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE)
        |         AS attributed_value
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, dir, "events")
        .withColumn("touch", last(
          when(col("event_type").isin("view", "click", "signup"),
            col("event_type")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("channel"))
        .agg(count(lit(1)).cast("long").as("n_purchases"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double").as("attributed_value"))
        .orderBy("channel")
    },

    // Forward-fill imputation over a dense calendar spine: per user,
    // per day, carry the last OBSERVED daily purchase spend forward
    // into gap days (the gauge-imputation operator — "last known
    // balance" — that every metrics warehouse needs; q37's date spine
    // made the calendar, this fills it). Spine = users × global date
    // range via sequence+explode (map-side fan-out, no range join);
    // the fill is one ignore-nulls last_value window per user. Daily
    // sums go through the decimal idiom before the window so carried
    // values are exact. 100 TB: spine cardinality is users × days —
    // tiny next to the event log — and the whole plan is one
    // user-keyed shuffle after a map-side-combined daily aggregate.
    QueryDef(
      "q144_forward_fill_spend",
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id,
        |         event_type, value
        |  FROM events
        |), bounds AS (
        |  SELECT MIN(day) AS mn, MAX(day) AS mx FROM e
        |), daily AS (
        |  SELECT user_id, day,
        |         SUM(CAST(value AS DECIMAL(20,4))) AS day_spend
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, day
        |), spine AS (
        |  SELECT u.user_id, CAST(d.d AS DATE) AS day
        |  FROM (SELECT DISTINCT user_id FROM e) u,
        |       (SELECT unnest(generate_series(bounds.mn, bounds.mx,
        |                                      INTERVAL 1 DAY)) AS d
        |        FROM bounds) d
        |), filled AS (
        |  SELECT s.user_id, s.day,
        |         daily.day_spend IS NOT NULL AS observed,
        |         LAST_VALUE(daily.day_spend IGNORE NULLS)
        |           OVER (PARTITION BY s.user_id ORDER BY s.day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS carried
        |  FROM spine s LEFT JOIN daily
        |    ON daily.user_id = s.user_id AND daily.day = s.day
        |)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day, observed,
        |       CAST(COALESCE(carried, 0) AS DOUBLE) AS filled_spend
        |FROM filled ORDER BY user_id, day""".stripMargin) { (s, dir) =>
      val dec = org.apache.spark.sql.types.DecimalType(20, 4)
      val e = Tables.load(s, dir, "events")
        .select(col("ts").cast("date").as("day"), col("user_id"),
          col("event_type"), col("value"))
      val b = e.agg(min("day").as("mn"), max("day").as("mx")).head
      val (mn, mx) = (b.getDate(0), b.getDate(1)) // 1-row driver bounds
      val daily = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "day")
        .agg(sum(col("value").cast(dec)).as("day_spend"))
      val spine = e.select("user_id").distinct()
        .select(col("user_id"), explode(sequence(
          lit(mn).cast("date"), lit(mx).cast("date"),
          expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("observed", col("day_spend").isNotNull)
        .withColumn("carried", last(col("day_spend"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("day").cast("timestamp").as("day"),
          col("observed"),
          coalesce(col("carried"), lit(0).cast(dec)).cast("double")
            .as("filled_spend"))
        .orderBy("user_id", "day")
    }
  )
}
