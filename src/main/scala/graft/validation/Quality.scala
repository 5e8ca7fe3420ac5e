package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality profiling (ref validation/quality.py:146-440).
  *
  * The reference profiles column-by-column in a Python loop (one Polars
  * pass per column, quality.py:240). Here the ENTIRE profile — counts,
  * null/unique percentages, numeric moments, string lengths, for every
  * column — is a single wide `agg(...)` over one scan, then the 1-row
  * result is unpivoted with `explode` into the per-column report. At
  * 100 TB the difference is one table scan versus #columns scans.
  *
  * Float determinism: every cross-engine-checked statistic is derived
  * from exact aggregates — integer counts, `round(sum, 2)` (2-decimal
  * data ⇒ the true sum has 2 decimals, far from any rounding boundary),
  * and standard deviation from exact integer sums of value×100 (cents):
  * Spark sums them as DECIMAL, DuckDB as HUGEINT — both exact — so the
  * final double arithmetic runs on bit-identical inputs.
  */
object Quality {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: LongType | _: IntegerType | _: ShortType | _: ByteType |
        _: DoubleType | _: FloatType | _: DecimalType => true
    case _ => false
  }

  /** Exact scaled-integer sums for stddev: Σ(c×100) and Σ(c×100)² as
    * DECIMAL — overflow-free to ~1e20 and bit-reproducible anywhere.
    */
  private def centSums(c: String): (Column, Column) = {
    val cents = round(col(c) * 100).cast(DecimalType(18, 0))
    (sum(cents), sum(cents * cents))
  }

  /** quality.py:146 `profile`: one row per column —
    * (column, kind, total, nulls, null_pct, unique, unique_pct,
    * is_constant, min_val, max_val, mean_val, std_val, min_len,
    * max_len, avg_len). Numeric stats are null for strings and vice
    * versa; kind ∈ {numeric, string, other}.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    profileWith(df, columns, c => count_distinct(col(c)), splitDistincts = true)

  private def profileWith(
      df: DataFrame, columns: Seq[String], distinctAgg: String => Column,
      splitDistincts: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val kinds = columns.map { c =>
      val dt = df.schema(c).dataType
      c -> (if (isNumeric(dt)) "numeric" else if (dt == StringType) "string" else "other")
    }.toMap

    val uniqueAggs: Seq[Column] =
      columns.map(c => distinctAgg(c).cast("long").as(s"_uni_$c"))
    val plainAggs: Seq[Column] = count(lit(1)).as("_n") +: columns.flatMap { c =>
      val base = Seq(count(col(c)).as(s"_cnt_$c"))
      kinds(c) match {
        case "numeric" =>
          val (s1, s2) = centSums(c)
          base ++ Seq(
            min(col(c)).cast("double").as(s"_min_$c"),
            max(col(c)).cast("double").as(s"_max_$c"),
            sum(col(c)).as(s"_sum_$c"),
            s1.as(s"_cs1_$c"), s2.as(s"_cs2_$c"))
        case "string" =>
          base ++ Seq(
            min(length(col(c))).cast("long").as(s"_lmin_$c"),
            max(length(col(c))).cast("long").as(s"_lmax_$c"),
            sum(length(col(c)).cast("long")).as(s"_lsum_$c"))
        case _ => base
      }
    }
    // EXACT distincts plan through an Expand (one duplicated row-set
    // per count_distinct); fusing the moment aggregates into the SAME
    // aggregate makes every moment buffer ride the expanded row-set
    // and the wide partial-agg state dominates (measured q40 at sf0.1:
    // 4.2 s fused vs 0.68 s distincts + 0.15 s moments run apart —
    // r20, guide §2.3). So the exact path computes the two 1-row
    // frames SEPARATELY and cross-joins them (1 row × 1 row); the
    // sketch path (profileApprox) has no Expand and stays single-pass.
    val one =
      if (splitDistincts)
        df.agg(plainAggs.head, plainAggs.tail: _*)
          .crossJoin(df.agg(uniqueAggs.head, uniqueAggs.tail: _*))
      else
        df.agg((plainAggs ++ uniqueAggs).head, (plainAggs ++ uniqueAggs).tail: _*)

    val rows = columns.map { c =>
      val n = col("_n")
      val cnt = col(s"_cnt_$c")
      val nulls = (n - cnt).cast("long")
      val uni = col(s"_uni_$c").cast("long")
      val nullD = lit(null).cast("double")
      val nullL = lit(null).cast("long")
      val (minV, maxV, meanV, stdV) =
        if (kinds(c) == "numeric") {
          val nd = cnt.cast("double")
          val s1 = col(s"_cs1_$c").cast("double")
          val s2 = col(s"_cs2_$c").cast("double")
          (round(col(s"_min_$c"), 2), round(col(s"_max_$c"), 2),
            when(cnt > 0, round(col(s"_sum_$c"), 2) / cnt).otherwise(nullD),
            when(cnt > 1, sqrt((s2 - s1 * s1 / nd) / (nd - 1)) / 100.0).otherwise(nullD))
        } else (nullD, nullD, nullD, nullD)
      val (lmin, lmax, lavg) =
        if (kinds(c) == "string")
          (col(s"_lmin_$c"), col(s"_lmax_$c"),
            when(cnt > 0, round(col(s"_lsum_$c"), 2) / cnt).otherwise(nullD))
        else (nullL, nullL, nullD)
      // empty-input convention mirrors the reference: 0% rates when
      // there are no rows (quality.py:262 guards the same way)
      struct(
        lit(c).as("column"), lit(kinds(c)).as("kind"),
        n.cast("long").as("total"), nulls.as("nulls"),
        when(n > 0, nulls * 100.0 / n).otherwise(lit(0.0)).as("null_pct"),
        uni.as("unique"),
        when(n > 0, uni * 100.0 / n).otherwise(lit(0.0)).as("unique_pct"),
        (uni <= 1).as("is_constant"),
        minV.cast("double").as("min_val"), maxV.cast("double").as("max_val"),
        meanV.cast("double").as("mean_val"), stdV.cast("double").as("std_val"),
        lmin.as("min_len"), lmax.as("max_len"), lavg.cast("double").as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }

  /** Scale variant of [[profile]]: identical shape, but unique counts
    * come from HyperLogLog++ sketches (`approx_count_distinct`, default
    * ~2% relative error) instead of exact distinct aggregation — at
    * 100 TB the exact path's Expand operator multiplies the scan by
    * #distinct-aggregates, the sketch path does not. Use exact for
    * oracle comparisons, this for production profiling. */
  def profileApprox(df: DataFrame, columns: Seq[String], rsd: Double = 0.02): DataFrame =
    profileWith(df, columns, c => approx_count_distinct(col(c), rsd))

  /** quality.py:240 IQR outliers, per numeric column —
    * (column, q1, q3, lower, upper, n_outliers) with the Tukey fences
    * lower = q1 − k·IQR, upper = q3 + k·IQR.
    *
    * Two jobs: an exact-percentile aggregate producing one tiny bounds
    * row, broadcast back over the scan to count outliers for all
    * columns at once. Exact `percentile` sorts per group — fine for a
    * profile; at extreme scale swap `approx_percentile` in via
    * `exact = false` (bounds shift slightly; fences are heuristic
    * anyway). Quantiles are rounded to 4 decimals BEFORE the fence
    * arithmetic so both engines compute fences from identical doubles.
    */
  def outliersIqr(
      df: DataFrame,
      columns: Seq[String],
      factor: Double = 1.5,
      exact: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "outliersIqr needs at least one column")
    // Both quantiles from ONE percentile aggregate per column (array
    // form) — a single sort pass per column instead of two.
    def pcts(c: String): Column =
      if (exact) percentile(col(c), array(lit(0.25), lit(0.75)))
      else percentile_approx(col(c), array(lit(0.25), lit(0.75)), lit(10000))
    val boundExprs = columns.map(c => pcts(c).as(s"_qs_$c"))
    val bounds = df.agg(boundExprs.head, boundExprs.tail: _*)
      .select(columns.flatMap(c => Seq(
        round(element_at(col(s"_qs_$c"), 1), 4).as(s"_q1_$c"),
        round(element_at(col(s"_qs_$c"), 2), 4).as(s"_q3_$c"))): _*)

    val joined = df.crossJoin(broadcast(bounds))
    def lower(c: String) = col(s"_q1_$c") - lit(factor) * (col(s"_q3_$c") - col(s"_q1_$c"))
    def upper(c: String) = col(s"_q3_$c") + lit(factor) * (col(s"_q3_$c") - col(s"_q1_$c"))
    val countExprs = columns.flatMap(c => Seq(
      first(col(s"_q1_$c")).as(s"_fq1_$c"),
      first(col(s"_q3_$c")).as(s"_fq3_$c"),
      count(when(col(c) < lower(c) || col(c) > upper(c), 1)).as(s"_o_$c")))
    val counts = joined.agg(countExprs.head, countExprs.tail: _*)

    val rows = columns.map { c =>
      val q1 = col(s"_fq1_$c"); val q3 = col(s"_fq3_$c")
      struct(
        lit(c).as("column"), q1.as("q1"), q3.as("q3"),
        (q1 - lit(factor) * (q3 - q1)).as("lower"),
        (q3 + lit(factor) * (q3 - q1)).as("upper"),
        col(s"_o_$c").cast("long").as("n_outliers"))
    }
    counts.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }

  /** quality.py:341 `compare_profiles`: column-level drift between two
    * datasets — one [[profile]] pass per side (two scans total), then a
    * full outer join of the tiny per-column reports. Detects added /
    * removed columns and null-rate / unique-rate / mean drift.
    * → (column, status, null_pct_before, null_pct_after, null_pct_diff,
    *    unique_pct_diff, mean_diff)
    */
  def compareProfiles(
      before: DataFrame, beforeCols: Seq[String],
      after: DataFrame, afterCols: Seq[String]): DataFrame =
    compareProfilesWith(profile)(before, beforeCols, after, afterCols)

  /** Scale variant of [[compareProfiles]]: both sides profile via
    * [[profileApprox]] (HLL unique counts, no Expand — two plain scans
    * total). Null-rate and mean drift are exact either way; only the
    * unique_pct_diff column carries sketch error, and drift thresholds
    * (10 points, [[detectAnomalies]]) dwarf a ~2% relative error. The
    * production drift monitor for 100 TB snapshots. */
  def compareProfilesApprox(
      before: DataFrame, beforeCols: Seq[String],
      after: DataFrame, afterCols: Seq[String]): DataFrame =
    compareProfilesWith(profileApprox(_, _))(before, beforeCols, after, afterCols)

  private def compareProfilesWith(prof: (DataFrame, Seq[String]) => DataFrame)(
      before: DataFrame, beforeCols: Seq[String],
      after: DataFrame, afterCols: Seq[String]): DataFrame = {
    val b = prof(before, beforeCols).select(
      col("column"),
      col("null_pct").as("_b_null"), col("unique_pct").as("_b_uni"), col("mean_val").as("_b_mean"))
    val a = prof(after, afterCols).select(
      col("column"),
      col("null_pct").as("_a_null"), col("unique_pct").as("_a_uni"), col("mean_val").as("_a_mean"))
    b.join(a, Seq("column"), "full_outer")
      .select(
        col("column"),
        when(col("_b_null").isNull, "added")
          .when(col("_a_null").isNull, "removed")
          .otherwise("present").as("status"),
        col("_b_null").as("null_pct_before"),
        col("_a_null").as("null_pct_after"),
        (col("_a_null") - col("_b_null")).as("null_pct_diff"),
        (col("_a_uni") - col("_b_uni")).as("unique_pct_diff"),
        (col("_a_mean") - col("_b_mean")).as("mean_diff"))
  }

  /** quality.py:397 `detect_anomalies`: drift findings worth acting on
    * — columns added/removed or whose null rate moved more than
    * `nullPctThreshold` points (reference uses 10). */
  def detectAnomalies(drift: DataFrame, nullPctThreshold: Double = 10.0): DataFrame =
    drift.filter(
      col("status") =!= "present" ||
        abs(col("null_pct_diff")) > nullPctThreshold)

  /** quality.py:309 dataset-level quality: one row —
    * (row_count, column_count, duplicate_rows, complete_rows,
    * completeness_score, quality_score).
    *
    * quality_score mirrors quality.py:365 `_calculate_quality_score`:
    * 0.4·avg column completeness + 0.2·(100 − duplicate%) +
    * 0.2·(100 − constant-column%) + 0.2·100 (outlier component neutral
    * here — outlier scoring is [[outliersIqr]]'s job; wiring it in
    * would force a second scan for a heuristic penalty).
    */
  def datasetQuality(df: DataFrame): DataFrame =
    datasetQualityWith(df,
      c => count_distinct(col(c)),
      cols => count_distinct(struct(cols.map(col): _*)),
      splitDistincts = true)

  /** Scale variant of [[datasetQuality]]: identical shape, but the
    * per-column unique counts are HyperLogLog++ sketches and the
    * duplicate-row estimate comes from `approx_count_distinct` over a
    * single xxhash64 of the whole row (a 64-bit hash collides at
    * ~n²/2⁶⁵ — negligible next to the sketch's ~2% error). The exact
    * path plans one Expand per distinct-aggregate (the scan is
    * multiplied #cols+1 times); this path is a single pass with no
    * Expand — QualitySpec asserts the plan shape. Use exact for oracle
    * comparisons, this for production quality monitoring. */
  def datasetQualityApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    datasetQualityWith(df,
      c => approx_count_distinct(col(c), rsd),
      cols => approx_count_distinct(xxhash64(cols.map(col): _*), rsd))

  private def datasetQualityWith(
      df: DataFrame,
      uniqueAgg: String => Column,
      rowDistinctAgg: Seq[String] => Column,
      splitDistincts: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    val n = count(lit(1))
    val plainAggs: Seq[Column] =
      Seq(n.as("_n"),
        count(when(cols.map(col(_).isNotNull).reduce(_ && _), 1)).as("_complete")) ++
        cols.map(c => count(col(c)).as(s"_cnt_$c"))
    val uniqueAggs: Seq[Column] =
      rowDistinctAgg(cols).cast("long").as("_dist") +:
        cols.map(c => uniqueAgg(c).cast("long").as(s"_uni_$c"))
    // same split as [[profileWith]] (r20): the exact path's Expand must
    // not carry the plain-count buffers; the sketch path stays fused
    val one =
      if (splitDistincts)
        df.agg(plainAggs.head, plainAggs.tail: _*)
          .crossJoin(df.agg(uniqueAggs.head, uniqueAggs.tail: _*))
      else
        df.agg((plainAggs ++ uniqueAggs).head, (plainAggs ++ uniqueAggs).tail: _*)

    val nD = col("_n").cast("double")
    val ncols = cols.size
    val nullCells = cols.map(c => col("_n") - col(s"_cnt_$c")).reduce(_ + _)
    val totalCells = col("_n") * ncols
    val completenessTerms = cols
      .map(c => lit(100.0) - (col("_n") - col(s"_cnt_$c")) * 100.0 / col("_n"))
      .reduce(_ + _)
    val avgCompleteness = completenessTerms / ncols
    val dup = col("_n") - col("_dist")
    val constCols = cols.map(c => when(col(s"_uni_$c") <= 1, 1).otherwise(0)).reduce(_ + _)

    one.select(
      col("_n").cast("long").as("row_count"),
      lit(ncols).as("column_count"),
      dup.cast("long").as("duplicate_rows"),
      col("_complete").cast("long").as("complete_rows"),
      // empty dataset = vacuously perfect (quality.py:208 convention)
      when(col("_n") > 0, (totalCells - nullCells) * 100.0 / totalCells)
        .otherwise(lit(100.0)).as("completeness_score"),
      when(col("_n") > 0,
        avgCompleteness * 0.4 + (lit(100.0) - dup * 100.0 / nD) * 0.2 +
          (lit(100.0) - constCols * 100.0 / ncols) * 0.2 + lit(100.0) * 0.2)
        .otherwise(lit(100.0)).as("quality_score"))
  }
}
