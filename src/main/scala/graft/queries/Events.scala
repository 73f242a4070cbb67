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
    }
  )
}
