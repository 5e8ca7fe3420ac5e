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
