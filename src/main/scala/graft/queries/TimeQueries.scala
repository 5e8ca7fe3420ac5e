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
