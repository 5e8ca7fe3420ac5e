package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.medallion.Silver

/** Silver-layer cleaning queries (q10–q13) + DuckDB oracles.
  *
  * The source tables are already clean, so q10 deterministically
  * constructs a dirty column first (padding + sentinel strings keyed off
  * the primary key), then runs the library's cleaning pipeline over it —
  * the oracle applies the identical construction and cleanup in SQL.
  */
object SilverQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q10_silver_clean" -> ((s, d) => {
      val dirty = Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit("N/A"))
          .when(col("c_custkey") % 11 === 0, lit("  "))
          .otherwise(concat(lit("  "), col("c_name"), lit("  ")))
          .as("name_clean"))
      Silver.clean(dirty)
    }),

    "q11_silver_dedup" -> ((s, d) =>
      // agg-based keep-last: map-side partial agg collapses duplicates
      // before the shuffle (see Silver.dedup). struct(ts, event_id)
      // orders lexicographically = ORDER BY ts DESC, event_id DESC kept-row.
      Silver.dedup(
        Tables.events(s, d),
        keys = Seq("user_id", "event_type"),
        orderKey = struct(col("ts"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("ts"), col("value"))),

    "q12_silver_normalize_names" -> ((s, d) =>
      Silver.normalizeColumnNames(
        Tables.orders(s, d).select(
          col("o_orderkey").as("OrderKey"),
          col("o_custkey").as("custKey"),
          col("o_totalprice").as("Total-Price")))),

    "q13_silver_pipeline" -> ((s, d) => {
      val renamed = Silver.applySchemaMapping(Tables.events(s, d), Map("value" -> "amount"))
      val parsed = renamed.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      val valid = Silver.filterInvalid(parsed, Seq("ts", "k"))
      val filled = Silver.fillNulls(valid, Map("amount" -> 0.0))
      filled.select(
        col("event_id"), col("user_id"), col("event_type"),
        round(col("amount"), 2).as("amount"), col("k"),
        to_date(col("ts")).as("event_date"))
    }))

  val oracles: Map[String, String] = Map(
    "q10_silver_clean" ->
      """SELECT c_custkey,
         CASE WHEN t IN ('', 'null', 'NULL', 'N/A', 'n/a', 'None') THEN NULL
              ELSE t END AS name_clean
         FROM (SELECT c_custkey,
                      trim(CASE WHEN c_custkey % 7 = 0 THEN 'N/A'
                                WHEN c_custkey % 11 = 0 THEN '  '
                                ELSE '  ' || c_name || '  ' END) AS t
               FROM customer)""",

    "q11_silver_dedup" ->
      """SELECT event_id, user_id, event_type, ts, value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1""",

    "q12_silver_normalize_names" ->
      """SELECT o_orderkey AS order_key, o_custkey AS cust_key,
         o_totalprice AS total_price FROM orders""",

    "q13_silver_pipeline" ->
      """SELECT event_id, user_id, event_type,
         round(coalesce(value, 0.0), 2) AS amount,
         TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         CAST(ts AS DATE) AS event_date
         FROM events
         WHERE ts IS NOT NULL
           AND TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL""")
}
