package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.extraction.Incremental
import graft.services.Curator

/** Incremental extraction, CDC, and split queries (q70, q71, q80).
  *
  * q71 builds a deterministic CDC scenario from `events`: the target is
  * 80% of rows (event_id % 10 < 8), the change feed is the top half
  * (% 10 >= 5) with shifted values, deletes where event_id % 7 == 0 —
  * so the feed exercises all of upsert-existing / insert-new /
  * delete-existing / delete-nonexistent.
  */
object ExtractionQueries {

  type Q = (SparkSession, String) => DataFrame

  private val watermark = "2024-01-20 00:00:00"

  val queries: Map[String, Q] = Map(
    "q70_incremental" -> ((s, d) =>
      Incremental.readNewSince(
        Tables.events(s, d), "ts", Some(lit(watermark).cast("timestamp")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), round(col("value"), 2).as("value"))),

    "q71_cdc_apply" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val target = ev.filter(col("event_id") % 10 < 8)
      val changes = ev.filter(col("event_id") % 10 >= 5)
        .withColumn("value", col("value") + 1000)
        .withColumn("_change_type",
          when(col("event_id") % 7 === 0, "DELETE").otherwise("UPSERT"))
      Incremental.applyChanges(target, changes, Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), round(col("value"), 2).as("value"))
    }),

    "q80_split" -> ((s, d) =>
      Curator.assignSplits(
        Tables.documents(s, d), col("doc_id"),
        Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1),
        seed = 42L, portable = true)
        .select(col("doc_id"), col("split"))))

  val oracles: Map[String, String] = Map(
    "q70_incremental" ->
      s"""SELECT event_id, user_id, event_type, ts, round(value, 2) AS value
          FROM events WHERE ts > TIMESTAMP '$watermark'""",

    "q71_cdc_apply" ->
      """WITH target AS (SELECT * FROM events WHERE event_id % 10 < 8),
         changes AS (
           SELECT event_id, ts, user_id, event_type, value + 1000 AS value,
                  CASE WHEN event_id % 7 = 0 THEN 'DELETE' ELSE 'UPSERT' END AS ct
           FROM events WHERE event_id % 10 >= 5)
         SELECT event_id, user_id, event_type, ts, round(value, 2) AS value
         FROM target WHERE event_id NOT IN (SELECT event_id FROM changes)
         UNION ALL
         SELECT event_id, user_id, event_type, ts, round(value, 2)
         FROM changes WHERE ct = 'UPSERT'""",

    "q80_split" ->
      """SELECT doc_id,
                CASE WHEN frac < 0.8 THEN 'train'
                     WHEN frac < 0.9 THEN 'test'
                     ELSE 'val' END AS split
         FROM (SELECT doc_id,
                      ((doc_id + 42) * 2654435761 % 4294967296) / 4294967296.0 AS frac
               FROM documents)""")
}
