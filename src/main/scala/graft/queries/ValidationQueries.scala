package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.validation._

/** Validation queries (q30, q31) + DuckDB oracles.
  *
  * The source tables are clean, so the queries first construct a
  * deterministically dirty `orders` view (nulls, orphan FKs, negative
  * prices, duplicated keys — all keyed off o_orderkey arithmetic), then
  * run the rule engine over it; the oracle applies the identical
  * construction and per-rule counts in SQL.
  */
object ValidationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic dirt: %13 → null custkey, %19 → orphan custkey,
    * %17 → negative price, %97 → duplicated row. Shared with the
    * quality queries (q40/q42) so profiling sees real nulls/dupes. */
  private[queries] def dirtyOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val dirty0 = o.select(
      col("o_orderkey"),
      when(col("o_orderkey") % 13 === 0, lit(null))
        .when(col("o_orderkey") % 19 === 0, col("o_custkey") + 1000000)
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(col("o_orderkey") % 17 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      col("o_orderstatus"), col("o_orderpriority"), col("o_orderdate"))
    dirty0.unionByName(dirty0.filter(col("o_orderkey") % 97 === 0))
  }

  private def rules(s: SparkSession, d: String): Seq[Rule] = Seq(
    NotNull(Seq("o_custkey")),
    Range("o_totalprice", min = Some(0)),
    InSet("o_orderstatus", Seq("O", "F", "P")),
    Regex("o_orderpriority", "^[1-5]-"),
    Unique(Seq("o_orderkey")),
    ForeignKey("o_custkey", Tables.customer(s, d), "c_custkey"),
    SchemaRule(Map(
      "o_orderkey" -> org.apache.spark.sql.types.LongType,
      "o_custkey" -> org.apache.spark.sql.types.LongType,
      "o_totalprice" -> org.apache.spark.sql.types.DoubleType,
      "o_orderstatus" -> org.apache.spark.sql.types.StringType,
      "o_orderpriority" -> org.apache.spark.sql.types.StringType,
      // parquet isAdjustedToUTC=false → Spark 4 reads TIMESTAMP_NTZ
      "o_orderdate" -> org.apache.spark.sql.types.TimestampNTZType)))

  private[queries] val dirtySql =
    """dirty0 AS (
         SELECT o_orderkey,
                CASE WHEN o_orderkey%13=0 THEN NULL
                     WHEN o_orderkey%19=0 THEN o_custkey+1000000
                     ELSE o_custkey END AS o_custkey,
                CASE WHEN o_orderkey%17=0 THEN -o_totalprice
                     ELSE o_totalprice END AS o_totalprice,
                o_orderstatus, o_orderpriority, o_orderdate
         FROM orders),
       dirty AS (SELECT * FROM dirty0
                 UNION ALL SELECT * FROM dirty0 WHERE o_orderkey%97=0)"""

  val queries: Map[String, Q] = Map(
    "q30_validation_report" -> ((s, d) =>
      Validator.report(dirtyOrders(s, d), rules(s, d))),

    "q31_validate_filter" -> ((s, d) =>
      Validator.validateAndFilter(dirtyOrders(s, d), rules(s, d))
        .select(
          col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderstatus"), col("o_orderpriority"))))

  val oracles: Map[String, String] = Map(
    "q30_validation_report" ->
      s"""WITH $dirtySql,
          raw AS (
            SELECT 'not_null_o_custkey' AS rule, 'error' AS severity,
                   count(*) FILTER (WHERE o_custkey IS NULL) AS failed,
                   count(*) AS total
            FROM dirty
            UNION ALL
            SELECT 'range_o_totalprice', 'error',
                   count(*) FILTER (WHERE o_totalprice < 0), count(*) FROM dirty
            UNION ALL
            SELECT 'in_set_o_orderstatus', 'error',
                   count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')), count(*) FROM dirty
            UNION ALL
            SELECT 'regex_o_orderpriority', 'error',
                   count(*) FILTER (WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-')), count(*) FROM dirty
            UNION ALL
            SELECT 'unique_o_orderkey', 'error',
                   count(*) - count(DISTINCT o_orderkey), count(*) FROM dirty
            UNION ALL
            SELECT 'fk_o_custkey', 'error',
                   count(*) FILTER (WHERE o_custkey IS NOT NULL
                     AND o_custkey NOT IN (SELECT c_custkey FROM customer)), count(*) FROM dirty
            UNION ALL
            SELECT 'schema_validation', 'error', CAST(0 AS BIGINT), CAST(6 AS BIGINT))
          SELECT rule, severity, failed, total,
                 total - failed AS passed,
                 CASE WHEN total = 0 THEN 100.0
                      ELSE (total - failed) * 100.0 / total END AS pass_rate
          FROM raw""",

    "q31_validate_filter" ->
      s"""WITH $dirtySql
          SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
                 o_orderstatus, o_orderpriority
          FROM dirty
          WHERE o_custkey IS NOT NULL
            AND o_totalprice >= 0
            AND o_orderstatus IN ('O','F','P')
            AND regexp_matches(o_orderpriority, '^[1-5]-')
            AND o_custkey IN (SELECT c_custkey FROM customer)""")
}
