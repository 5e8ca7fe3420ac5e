package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + §2.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * runnable DataFrame; `oracleSql` holds the equivalent DuckDB SQL the
  * driver replays for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GoldQueries.queries("q01_gold_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GoldQueries.queries ++ SilverQueries.queries ++ Scd2Queries.queries ++
      ValidationQueries.queries ++ QualityQueries.queries ++ ExtractionQueries.queries ++
      RedactionQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      TextQueries.queries ++ ImageQueries.queries ++ WebQueries.queries ++
      TimeQueries.queries ++ TimeQueries.rollingAndPivot ++ TimeQueries.rangeJoinQueries ++
      PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GoldQueries.oracles ++ SilverQueries.oracles ++ Scd2Queries.oracles ++
      ValidationQueries.oracles ++ QualityQueries.oracles ++ ExtractionQueries.oracles ++
      RedactionQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      TextQueries.oracles ++ ImageQueries.oracles ++ WebQueries.oracles ++
      TimeQueries.oracles ++ TimeQueries.rollingAndPivotOracles ++ TimeQueries.rangeJoinOracles ++
      PipelineQueries.oracles
}
