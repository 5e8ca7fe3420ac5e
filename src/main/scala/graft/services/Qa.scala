package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transformation QA (ref services/qa.py:147 `compare_dataframes`).
  *
  * Before/after comparison as TWO aggregate scans (one per side) whose
  * single-row results cross-join into a long-format report — never a
  * row-level join of the two datasets, so cost is two scans regardless
  * of scale. Checks: row count, per-column null counts (shared columns),
  * duplicate rows on the key columns.
  */
object Qa {

  /** → (check, before, after), one row per check. */
  def compare(
      before: DataFrame,
      after: DataFrame,
      keyColumns: Seq[String] = Nil): DataFrame = {
    val shared = before.columns.filter(after.columns.contains).toSeq

    def sideAggs(df: DataFrame, prefix: String): DataFrame = {
      val base = Seq(count(lit(1)).as(s"${prefix}_n")) ++
        shared.map(c => (count(lit(1)) - count(col(c))).as(s"${prefix}_nulls_$c")) ++
        (if (keyColumns.nonEmpty)
           Seq((count(lit(1)) - count_distinct(struct(keyColumns.map(col): _*)))
             .as(s"${prefix}_dups"))
         else Nil)
      df.agg(base.head, base.tail: _*)
    }

    val b = sideAggs(before, "b")
    val a = sideAggs(after, "a")
    val one = b.crossJoin(a)

    val checks =
      Seq(struct(lit("row_count").as("check"),
        col("b_n").cast("long").as("before"), col("a_n").cast("long").as("after"))) ++
        shared.map(c => struct(lit(s"nulls_$c").as("check"),
          col(s"b_nulls_$c").cast("long").as("before"),
          col(s"a_nulls_$c").cast("long").as("after"))) ++
        (if (keyColumns.nonEmpty)
           Seq(struct(lit(s"duplicates_${keyColumns.mkString("-")}").as("check"),
             col("b_dups").cast("long").as("before"), col("a_dups").cast("long").as("after")))
         else Nil)

    one.select(explode(array(checks: _*)).as("_r")).select(col("_r.*"))
  }

  /** qa.py:293 `verify_entity_counts`: reconcile per-entity match
    * counts before and after redaction. Inputs are
    * [[Redaction.entityCounts]]-shaped frames (entity, n_matches) —
    * already one aggregate row per pattern, so everything here is
    * arithmetic over a pattern-count-sized frame, no data scan. A
    * `_total` row carries the reference's overall verdict. With
    * `expectZeroAfter` each entity passes iff nothing survived
    * redaction; otherwise rows are informational (the reference's
    * reduction report) and always pass.
    * → (entity, n_before, n_after, reduction_pct, passed) */
  def verifyEntityCounts(
      beforeCounts: DataFrame,
      afterCounts: DataFrame,
      expectZeroAfter: Boolean = true): DataFrame = {
    val b = beforeCounts.select(col("entity"), col("n_matches").cast("long").as("_nb"))
    val a = afterCounts.select(col("entity"), col("n_matches").cast("long").as("_na"))
    val j = b.join(a, Seq("entity"), "full_outer")
      .select(col("entity"),
        coalesce(col("_nb"), lit(0L)).as("n_before"),
        coalesce(col("_na"), lit(0L)).as("n_after"))
    val total = j.agg(sum("n_before").as("nb"), sum("n_after").as("na"))
      .select(lit("_total").as("entity"),
        coalesce(col("nb"), lit(0L)).as("n_before"),
        coalesce(col("na"), lit(0L)).as("n_after"))
    val passed = if (expectZeroAfter) col("n_after") === 0 else lit(true)
    j.unionByName(total).select(
      col("entity"), col("n_before"), col("n_after"),
      when(col("n_before") > 0,
        (col("n_before") - col("n_after")) * 100.0 / col("n_before")).as("reduction_pct"),
      passed.as("passed"))
  }

  /** qa.py:366 `generate_spot_check_samples`: a bounded set of
    * before/after text pairs, evenly spread over the id domain, for
    * HUMAN review of a transformation. The reference takes every
    * (rows/n)-th row by position; a positional stride needs a global
    * sort at scale, so this spreads by id QUANTILE instead — n bucket
    * boundaries from a bounded-error quantile sketch (driver reads n
    * doubles), then one min-by aggregate picks the first pair at or
    * above each boundary. One scan, one n-group shuffle, no global
    * sort; same evenly-spread intent. The after text resolves to
    * `textCol` or the redaction convention `<textCol>_redacted`
    * (absent → empty text, note=missing_after_column, mirroring the
    * reference). Empty inputs yield an empty frame rather than the
    * reference's sentinel row. → (id, before, after, changed, note),
    * ≤ nSamples rows, ordered by id. */
  def spotCheckSamples(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      textCol: String,
      nSamples: Int = 10): DataFrame = {
    require(nSamples > 0, s"nSamples must be positive, got $nSamples")
    require(before.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"spotCheckSamples spreads samples over a numeric id domain; '$idCol' is " +
        before.schema(idCol).dataType.simpleString)
    val (afterText, note) =
      if (after.columns.contains(textCol)) (col(textCol), "")
      else if (after.columns.contains(s"${textCol}_redacted"))
        (col(s"${textCol}_redacted"), "")
      else (lit(""), "missing_after_column")
    // equi-join on the ORIGINAL id (exact for 64-bit ids); the double
    // cast exists only for the quantile sketch + bucket arithmetic,
    // where ±1 ulp at the boundary moves a sample, not correctness
    val joined = before.select(col(idCol).as("_id"), col(textCol).as("before"))
      .join(after.select(col(idCol).as("_id"), afterText.as("after")), "_id")
      .withColumn("_idd", col("_id").cast("double"))
    // bounded driver read: nSamples quantile boundaries of the id domain
    val bounds = joined.stat.approxQuantile(
      "_idd", (0 until nSamples).map(_.toDouble / nSamples).toArray, 0.001)
    if (bounds.isEmpty) return joined.select(
      col("_id").as("id"), col("before"), col("after"),
      lit(false).as("changed"), lit(note).as("note")) // empty input
    val bucket = size(filter(array(bounds.map(lit).toIndexedSeq: _*), b => b <= col("_idd"))) - 1
    joined
      .groupBy(bucket.as("_bucket"))
      .agg(min_by(struct(col("_id"), col("before"), col("after")), col("_id")).as("_s"))
      .select(col("_s._id").as("id"), col("_s.before").as("before"), col("_s.after").as("after"),
        (col("_s.before") =!= col("_s.after")).as("changed"), lit(note).as("note"))
      .orderBy("id")
  }

  /** qa.py:215 `verify_redaction`, column form: TRUE when the redacted
    * text contains no residual pattern matches and (if given) at least
    * one expected tag. Composable into a validation CustomExpr rule. */
  def redactionVerified(
      redacted: Column,
      patterns: Seq[String],
      expectedTags: Seq[String] = Nil): Column = {
    val clean = patterns.map(p => not(regexp_like(redacted, lit(p)))).reduce(_ && _)
    val tagged =
      if (expectedTags.isEmpty) lit(true)
      else expectedTags.map(t => redacted.contains(t)).reduce(_ || _)
    clean && tagged
  }
}
