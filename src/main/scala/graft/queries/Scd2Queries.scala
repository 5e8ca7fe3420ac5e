package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.medallion.Scd2

/** SCD Type 2 query (q20) + DuckDB oracle.
  *
  * Builds two deterministic snapshots from `customer` and runs the full
  * initial-load + merge path (ref medallion/scd.py:53,397):
  *   snapshot t1 = customer as-is;
  *   snapshot t2 = keys %11==0 soft-deleted, keys %5==0 changed
  *   (segment → MACHINERY, acctbal + 100), keys %7==0 duplicated as
  *   brand-new entities (key + 1,000,000), everything else unchanged.
  * The oracle declares the same end-state directly: per key-class rows
  * with the expected effective ranges, current flags, and versions.
  */
object Scd2Queries {

  type Q = (SparkSession, String) => DataFrame

  private val keys = Seq("c_custkey")
  private val tracked = Seq("c_name", "c_mktsegment", "c_acctbal")
  private val t1 = lit("2024-01-01 00:00:00")
  private val t2 = lit("2024-02-01 00:00:00")

  /** The two-snapshot merge shared by q20 (full table) and q21
    * (point-in-time read). */
  private def merged(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))

    val scd1 = Scd2.initialLoad(base, keys, tracked, t1)

    val upserts = base.filter(col("c_custkey") % 11 =!= 0).select(
      col("c_custkey"), col("c_name"),
      when(col("c_custkey") % 5 === 0, lit("MACHINERY")).otherwise(col("c_mktsegment")).as("c_mktsegment"),
      when(col("c_custkey") % 5 === 0, col("c_acctbal") + 100).otherwise(col("c_acctbal")).as("c_acctbal"))
      .withColumn("_deleted", lit(false))
    val fresh = base.filter(col("c_custkey") % 7 === 0).select(
      (col("c_custkey") + 1000000).as("c_custkey"),
      col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("_deleted", lit(false))
    val dels = base.filter(col("c_custkey") % 11 === 0)
      .withColumn("_deleted", lit(true))
    val source = upserts.unionByName(fresh).unionByName(dels)

    Scd2.merge(scd1, source, keys, tracked, t2, deleteIndicator = Some("_deleted"))
  }

  private def output(df: DataFrame): DataFrame =
    df.select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      round(col("c_acctbal"), 2).as("c_acctbal"),
      col("_scd_effective_from"), col("_scd_effective_to"),
      col("_scd_is_current"), col("_scd_version"))

  val queries: Map[String, Q] = Map(
    "q20_scd2" -> ((s, d) => output(merged(s, d))),
    // point-in-time read between the two snapshots: every entity's v1
    // row (scd.py:335) — closed rows qualify while t < effective_to
    "q21_scd2_point_in_time" -> ((s, d) =>
      output(Scd2.recordsAt(merged(s, d), lit("2024-01-15 00:00:00")))))

  /** q20's full end-state, reused (filtered) by q21. */
  private val q20Sql: String =
      """WITH base AS (
           SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer),
         unchanged AS (SELECT * FROM base WHERE c_custkey%11<>0 AND c_custkey%5<>0),
         updated   AS (SELECT * FROM base WHERE c_custkey%11<>0 AND c_custkey%5=0),
         deleted   AS (SELECT * FROM base WHERE c_custkey%11=0),
         newrows   AS (SELECT c_custkey+1000000 AS c_custkey, c_name, c_mktsegment, c_acctbal
                       FROM base WHERE c_custkey%7=0)
         SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal,2) AS c_acctbal,
                TIMESTAMP '2024-01-01 00:00:00' AS _scd_effective_from,
                CAST(NULL AS TIMESTAMP) AS _scd_effective_to,
                true AS _scd_is_current, 1 AS _scd_version
         FROM unchanged
         UNION ALL
         SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal,2),
                TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', false, 1
         FROM updated
         UNION ALL
         SELECT c_custkey, c_name, 'MACHINERY', round(c_acctbal+100,2),
                TIMESTAMP '2024-02-01 00:00:00', NULL, true, 2
         FROM updated
         UNION ALL
         SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal,2),
                TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', false, 1
         FROM deleted
         UNION ALL
         SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal,2),
                TIMESTAMP '2024-02-01 00:00:00', NULL, true, 1
         FROM newrows"""

  val oracles: Map[String, String] = Map(
    "q20_scd2" -> q20Sql,
    "q21_scd2_point_in_time" ->
      s"""SELECT * FROM ($q20Sql)
          WHERE _scd_effective_from <= TIMESTAMP '2024-01-15 00:00:00'
            AND (_scd_effective_to IS NULL
                 OR _scd_effective_to > TIMESTAMP '2024-01-15 00:00:00')""")
}
