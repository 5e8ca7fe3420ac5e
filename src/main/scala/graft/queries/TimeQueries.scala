package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TimeOps

/** Event-time operator queries (q110 sessionize, q111 as-of join).
  *
  * q111's oracle uses DuckDB's native ASOF JOIN — the Spark side must
  * reproduce exactly the "latest right.ts ≤ left.ts" semantics with its
  * union + carry-forward window formulation.
  */
object TimeQueries {

  type Q = (SparkSession, String) => DataFrame

  private val gapMs = 30L * 60 * 1000 // 30 minutes

  val queries: Map[String, Q] = Map(
    "q110_sessionize" -> ((s, d) =>
      TimeOps.sessionize(
        Tables.events(s, d).select("user_id", "ts", "event_id"),
        keyCol = "user_id", tsCol = "ts", gapMs = gapMs,
        tiebreaker = col("event_id"))),

    "q111_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // unique (user, ts) state stream: latest 'view' value per instant
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("view_value"))
      TimeOps.asofJoin(clicks, views, "user_id", "ts", Seq("view_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value"), 2).as("value"),
          round(col("view_value"), 2).as("view_value"))
    }))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val rollingAndPivot: Map[String, Q] = Map(
    "q112_rolling" -> ((s, d) =>
      graft.medallion.Gold.rollingMetrics(
        Tables.events(s, d).select("event_id", "user_id", "ts", "value"),
        keyCol = "user_id", tsCol = "ts", windowMs = 3600L * 1000,
        aggs = Seq(
          (count(lit(1)), "n_1h"),
          (sum(col("value")), "sum_1h")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("n_1h").cast("long").as("n_1h"),
          round(col("sum_1h"), 2).as("sum_1h"))),

    "q113_pivot_metrics" -> ((s, d) =>
      graft.medallion.Gold.pivotMetrics(
        Tables.events(s, d),
        groupBy = Seq("user_id"),
        pivotCol = "event_type",
        pivotValues = eventTypes,
        aggs = Seq(
          ((v: String) => count(when(col("event_type") === v, 1)), "n"),
          ((v: String) => round(sum(when(col("event_type") === v, col("value"))), 2), "sum")))))

  val rangeJoinQueries: Map[String, Q] = Map(
    // assign every event to its session interval: a self-consistency
    // check of q110 (exactly one match per event) and the scalable
    // grain-bucketed range-join pattern in one
    "q115_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
      val sessions = TimeOps.sessionize(
        Tables.events(s, d).select("user_id", "ts", "event_id"),
        keyCol = "user_id", tsCol = "ts", gapMs = gapMs, tiebreaker = col("event_id"))
      TimeOps.rangeJoin(ev, sessions, "user_id", "ts",
        "session_start", "session_end", grainMs = gapMs)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("session_start"), col("n_events"))
    }))

  val rangeJoinOracles: Map[String, String] = Map(
    "q115_range_join" ->
      s"""WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${gapMs}000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          numbered AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM flagged),
          sessions AS (
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, sess)
          SELECT e.event_id, e.user_id, e.ts, s.session_start, s.n_events
          FROM events e JOIN sessions s
            ON e.user_id = s.user_id
           AND e.ts BETWEEN s.session_start AND s.session_end""")

  val rollingAndPivotOracles: Map[String, String] = Map(
    "q112_rolling" ->
      """SELECT event_id, user_id, ts,
                count(*) OVER w AS n_1h,
                round(sum(value) OVER w, 2) AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",

    "q113_pivot_metrics" -> {
      val cells = Seq("click", "error", "purchase", "signup", "view").flatMap(v => Seq(
        s"count(*) FILTER (WHERE event_type = '$v') AS ${v}_n",
        s"round(sum(value) FILTER (WHERE event_type = '$v'), 2) AS ${v}_sum"))
      s"SELECT user_id, ${cells.mkString(", ")} FROM events GROUP BY user_id"
    })

  val oracles: Map[String, String] = Map(
    "q110_sessionize" ->
      s"""WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${gapMs}000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          numbered AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM flagged)
          SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                 count(*) AS n_events
          FROM numbered GROUP BY user_id, sess""",

    "q111_asof_join" ->
      """WITH clicks AS (
           SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, max_by(value, event_id) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
         SELECT l.event_id, l.user_id, l.ts, round(l.value, 2) AS value,
                round(v.view_value, 2) AS view_value
         FROM clicks l ASOF LEFT JOIN views v
           ON l.user_id = v.user_id AND l.ts >= v.ts""")
}
