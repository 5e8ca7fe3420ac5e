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
    Scd2.merge(scd1, t2Source(base), keys, tracked, t2, deleteIndicator = Some("_deleted"))
  }

  private def output(df: DataFrame): DataFrame =
    df.select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      round(col("c_acctbal"), 2).as("c_acctbal"),
      col("_scd_effective_from"), col("_scd_effective_to"),
      col("_scd_is_current"), col("_scd_version"))

  /** The q20 fixture's t2 source snapshot (upserts + fresh + deletes). */
  private def t2Source(base: DataFrame): DataFrame = {
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
    upserts.unionByName(fresh).unionByName(dels)
  }

  val queries: Map[String, Q] = Map(
    "q20_scd2" -> ((s, d) => output(merged(s, d))),

    // Incremental SCD2 under the FULL hash gate (q20's oracle
    // VERBATIM on the folded store — the q186/q194 pattern, the r15
    // verdict's #5): the t2 snapshot arrives as TWO micro-batch
    // slices (key parity; every business key appears in exactly one
    // slice, the CDC-snapshot contract) folding sequentially into the
    // dimension, each fold localCheckpoint-materialized (the store
    // discipline — a real dimension is a VersionedTable snapshot
    // between merges, exercised exactly-once in StreamingSpec). Keys
    // untouched by a slice pass through its merge unchanged, so the
    // folded end-state must hash-equal the one-shot q20 merge.
    "q195_scd2_incremental" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      val scd1 = Scd2.initialLoad(base, keys, tracked, t1).localCheckpoint(true)
      val src = t2Source(base)
      val fold1 = Scd2.merge(scd1, src.filter(col("c_custkey") % 2 === 0),
        keys, tracked, t2, deleteIndicator = Some("_deleted")).localCheckpoint(true)
      output(Scd2.merge(fold1, src.filter(col("c_custkey") % 2 =!= 0),
        keys, tracked, t2, deleteIndicator = Some("_deleted")))
    }),
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
    // q20's end-state verbatim: the folded two-slice merge must land
    // exactly where the one-shot merge lands
    "q195_scd2_incremental" -> q20Sql,
    "q21_scd2_point_in_time" ->
      s"""SELECT * FROM ($q20Sql)
          WHERE _scd_effective_from <= TIMESTAMP '2024-01-15 00:00:00'
            AND (_scd_effective_to IS NULL
                 OR _scd_effective_to > TIMESTAMP '2024-01-15 00:00:00')""")
}
