package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.validation.Quality

/** Quality/profiling queries (q40–q42) + DuckDB oracles.
  *
  * The oracles mirror graft.validation.Quality's float-determinism
  * strategy term for term: integer counts, round(sum,2)/count means,
  * stddev from exact integer cent-sums (HUGEINT in DuckDB, DECIMAL in
  * Spark — both exact, so the double math runs on identical inputs),
  * and IQR fences computed from 4-decimal-rounded quantiles.
  */
object QualityQueries {

  type Q = (SparkSession, String) => DataFrame

  private val profiled = Seq(
    "o_orderkey" -> "numeric", "o_custkey" -> "numeric", "o_totalprice" -> "numeric",
    "o_orderstatus" -> "string", "o_orderpriority" -> "string", "o_orderdate" -> "other")

  private val iqrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, Q] = Map(
    "q40_profile" -> ((s, d) =>
      Quality.profile(ValidationQueries.dirtyOrders(s, d), profiled.map(_._1))),

    // Production-path twin of q40: HLL-sketch unique counts, no Expand
    // operator in the plan — this is the profile a 100 TB job runs.
    // approx_count_distinct is engine-specific, so no DuckDB oracle
    // (driver records a rows-only check); exactness vs q40 is asserted
    // structurally in QualitySpec instead.
    "q40a_profile_approx" -> ((s, d) =>
      Quality.profileApprox(ValidationQueries.dirtyOrders(s, d), profiled.map(_._1))),

    "q41_outliers" -> ((s, d) =>
      Quality.outliersIqr(Tables.lineitem(s, d), iqrCols)),

    // production twin of q41: approx_percentile bounds (no per-column
    // full sort) — fences shift within sketch error, which is fine for
    // a heuristic outlier screen. Engine-specific sketch ⇒ rows-only
    // driver check; QualitySpec asserts fence closeness vs exact.
    "q41a_outliers_approx" -> ((s, d) =>
      Quality.outliersIqr(Tables.lineitem(s, d), iqrCols, exact = false)),

    "q42_dataset_quality" -> ((s, d) =>
      Quality.datasetQuality(ValidationQueries.dirtyOrders(s, d))),

    // Production-path twin of q42 (the q40a pattern): HLL per-column
    // uniques + a 64-bit-row-hash duplicate estimate — single pass, no
    // Expand. Engine-specific sketches ⇒ rows-only driver check;
    // closeness to q42 is asserted in QualitySpec.
    "q42a_dataset_quality_approx" -> ((s, d) =>
      Quality.datasetQualityApprox(ValidationQueries.dirtyOrders(s, d))),

    // drift: clean orders (without o_orderdate) vs the dirtied view
    // (with it) — exercises added-column detection plus null/mean drift
    "q43_profile_drift" -> ((s, d) =>
      Quality.compareProfiles(
        Tables.orders(s, d), profiled.map(_._1).filterNot(_ == "o_orderdate"),
        ValidationQueries.dirtyOrders(s, d), profiled.map(_._1))),

    // production twin of q43 (the q40a/q42a pattern): both profile
    // passes are HLL-sketched, no Expand in either scan. Rows-only
    // driver check; closeness asserted in QualitySpec.
    "q43a_profile_drift_approx" -> ((s, d) =>
      Quality.compareProfilesApprox(
        Tables.orders(s, d), profiled.map(_._1).filterNot(_ == "o_orderdate"),
        ValidationQueries.dirtyOrders(s, d), profiled.map(_._1))))

  // ---- q40 oracle: per-column aggregate block + per-column SELECT ----

  private def aggBlock(c: String, kind: String): String = {
    val base = s"count($c) AS cnt_$c, count(DISTINCT $c) AS uni_$c"
    kind match {
      case "numeric" => base +
        s""", CAST(min($c) AS DOUBLE) AS min_$c, CAST(max($c) AS DOUBLE) AS max_$c,
            sum($c) AS sum_$c,
            sum(CAST(round($c*100) AS BIGINT)) AS cs1_$c,
            sum(CAST(round($c*100) AS BIGINT) * CAST(round($c*100) AS BIGINT)) AS cs2_$c"""
      case "string" => base +
        s""", CAST(min(length($c)) AS BIGINT) AS lmin_$c,
            CAST(max(length($c)) AS BIGINT) AS lmax_$c,
            sum(CAST(length($c) AS BIGINT)) AS lsum_$c"""
      case _ => base
    }
  }

  private def selectBlock(c: String, kind: String): String = {
    val common =
      s"""SELECT '$c' AS "column", '$kind' AS kind,
          n AS total, n - cnt_$c AS nulls, (n - cnt_$c) * 100.0 / n AS null_pct,
          uni_$c AS "unique", uni_$c * 100.0 / n AS unique_pct,
          uni_$c <= 1 AS is_constant"""
    val stats = kind match {
      case "numeric" =>
        s""", round(min_$c, 2) AS min_val, round(max_$c, 2) AS max_val,
            round(CAST(sum_$c AS DOUBLE), 2) / cnt_$c AS mean_val,
            CASE WHEN cnt_$c > 1 THEN
              sqrt((CAST(cs2_$c AS DOUBLE) - CAST(cs1_$c AS DOUBLE) * CAST(cs1_$c AS DOUBLE)
                    / CAST(cnt_$c AS DOUBLE)) / (CAST(cnt_$c AS DOUBLE) - 1)) / 100.0
            ELSE NULL END AS std_val,
            CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len,
            CAST(NULL AS DOUBLE) AS avg_len"""
      case "string" =>
        s""", CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val,
            CAST(NULL AS DOUBLE) AS mean_val, CAST(NULL AS DOUBLE) AS std_val,
            lmin_$c AS min_len, lmax_$c AS max_len,
            round(CAST(lsum_$c AS DOUBLE), 2) / cnt_$c AS avg_len"""
      case _ =>
        s""", CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val,
            CAST(NULL AS DOUBLE) AS mean_val, CAST(NULL AS DOUBLE) AS std_val,
            CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len,
            CAST(NULL AS DOUBLE) AS avg_len"""
    }
    s"$common$stats FROM a"
  }

  private val q40Sql = {
    val aggs = profiled.map { case (c, k) => aggBlock(c, k) }.mkString(",\n")
    val sels = profiled.map { case (c, k) => selectBlock(c, k) }.mkString("\nUNION ALL\n")
    s"""WITH ${ValidationQueries.dirtySql},
        a AS (SELECT count(*) AS n,\n$aggs\nFROM dirty)
        $sels"""
  }

  // ---- q41 oracle: rounded quantiles → fences → filtered counts ----

  private val q41Sql = {
    val qs = iqrCols.map(c =>
      s"round(quantile_cont($c, 0.25), 4) AS q1_$c, round(quantile_cont($c, 0.75), 4) AS q3_$c")
      .mkString(", ")
    val sels = iqrCols.map { c =>
      val lower = s"q1_$c - 1.5 * (q3_$c - q1_$c)"
      val upper = s"q3_$c + 1.5 * (q3_$c - q1_$c)"
      s"""SELECT '$c' AS "column", q1_$c AS q1, q3_$c AS q3,
          $lower AS "lower", $upper AS "upper",
          (SELECT count(*) FROM lineitem, b WHERE $c < $lower OR $c > $upper) AS n_outliers
          FROM b"""
    }.mkString("\nUNION ALL\n")
    s"WITH b AS (SELECT $qs FROM lineitem)\n$sels"
  }

  // ---- q42 oracle: dataset-level score, identical term order ----

  private val q42Sql = {
    val cols = profiled.map(_._1)
    val n = cols.size
    val counts = cols.map(c => s"count($c) AS cnt_$c, count(DISTINCT $c) AS uni_$c").mkString(", ")
    val notNulls = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val nullCells = cols.map(c => s"(n - cnt_$c)").mkString(" + ")
    val compTerms = cols.map(c => s"(100.0 - (n - cnt_$c) * 100.0 / n)").mkString(" + ")
    val constTerms = cols.map(c => s"(CASE WHEN uni_$c <= 1 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ${ValidationQueries.dirtySql},
        a AS (SELECT count(*) AS n,
              (SELECT count(*) FROM (SELECT DISTINCT * FROM dirty)) AS dist,
              count(*) FILTER (WHERE $notNulls) AS complete,
              $counts
              FROM dirty)
        SELECT n AS row_count, $n AS column_count,
               n - dist AS duplicate_rows, complete AS complete_rows,
               (n * $n - ($nullCells)) * 100.0 / (n * $n) AS completeness_score,
               (($compTerms) / $n) * 0.4 +
               (100.0 - (n - dist) * 100.0 / n) * 0.2 +
               (100.0 - ($constTerms) * 100.0 / $n) * 0.2 +
               100.0 * 0.2 AS quality_score
        FROM a"""
  }

  // ---- q43 oracle: two mini-profiles full-outer-joined on column ----

  private def miniProfileSql(from: String, cols: Seq[(String, String)]): String = {
    val aggs = cols.map { case (c, k) =>
      val mean = if (k == "numeric") s"sum($c) AS sum_$c, " else ""
      s"count($c) AS cnt_$c, count(DISTINCT $c) AS uni_$c, $mean".stripSuffix(", ")
    }.mkString(", ")
    val sels = cols.map { case (c, k) =>
      val mean =
        if (k == "numeric") s"round(CAST(sum_$c AS DOUBLE), 2) / cnt_$c"
        else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS "column", (n - cnt_$c) * 100.0 / n AS null_pct,
          uni_$c * 100.0 / n AS unique_pct, $mean AS mean_val FROM agg_t"""
    }.mkString("\nUNION ALL\n")
    s"(WITH agg_t AS (SELECT count(*) AS n, $aggs FROM $from)\n$sels)"
  }

  private val q43Sql = {
    val beforeCols = profiled.filterNot(_._1 == "o_orderdate")
    s"""WITH ${ValidationQueries.dirtySql},
        bprof AS ${miniProfileSql("orders", beforeCols)},
        aprof AS ${miniProfileSql("dirty", profiled)}
        SELECT coalesce(b."column", a."column") AS "column",
               CASE WHEN b."column" IS NULL THEN 'added'
                    WHEN a."column" IS NULL THEN 'removed'
                    ELSE 'present' END AS status,
               b.null_pct AS null_pct_before,
               a.null_pct AS null_pct_after,
               a.null_pct - b.null_pct AS null_pct_diff,
               a.unique_pct - b.unique_pct AS unique_pct_diff,
               a.mean_val - b.mean_val AS mean_diff
        FROM bprof b FULL OUTER JOIN aprof a ON b."column" = a."column""""
  }

  val oracles: Map[String, String] = Map(
    "q40_profile" -> q40Sql,
    "q41_outliers" -> q41Sql,
    "q42_dataset_quality" -> q42Sql,
    "q43_profile_drift" -> q43Sql)
}
