package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-set evaluation (ref validation/validator.py:118-258).
  *
  * [[report]] computes the whole rule set in a single aggregate job:
  * ForeignKey rules first left-join their (distinct, usually broadcast)
  * reference keys onto the scan, then every rule's failure count — plus
  * `count(*)` and the Unique rules' `count_distinct` — evaluates in one
  * `agg(...)`. The per-rule rows are then unpivoted driver-side from the
  * single 1-row result (O(#rules) tiny literals, not a data-sized
  * operation).
  */
object Validator {

  /** Left-join each FK rule's distinct reference keys, adding a boolean
    * match flag per rule. Distinct-then-join keeps the join side minimal
    * and lets size-based auto-broadcast kick in for dimension tables.
    */
  private def prepare(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.collect { case fk: ForeignKey => fk }.foldLeft(df) { (acc, fk) =>
      val refKeys = fk.reference
        .select(col(fk.referenceColumn).as(s"_ref_${fk.name}"))
        .distinct()
        .withColumn(fk.flagColumn, lit(true))
      acc.join(refKeys, acc(fk.column) === col(s"_ref_${fk.name}"), "left")
        .drop(s"_ref_${fk.name}")
    }

  private def fkFailPred(fk: ForeignKey): Column =
    col(fk.column).isNotNull && col(fk.flagColumn).isNull

  /** validator.py:118 `validate`: one row per rule —
    * (rule, severity, failed, total, passed, pass_rate). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "report needs at least one rule")
    val prepared = prepare(df, rules)

    val aggExprs: Seq[Column] = count(lit(1)).as("_n") +: rules.collect {
      case r: RowRule     => sum(r.failCount(prepared)).as(r.name)
      case u: Unique      =>
        (count(lit(1)) - count_distinct(struct(u.columns.map(col): _*))).as(u.name)
      case fk: ForeignKey => count(when(fkFailPred(fk), 1)).as(fk.name)
    }
    val one = prepared.agg(aggExprs.head, aggExprs.tail: _*)

    // Unpivot the 1-row aggregate into (rule, severity, failed, total).
    // stack() keeps this inside the same job; totals fold in the
    // reference's rows×columns weighting for multi-column NotNull.
    // SchemaRule is structural — its counts come from the schema (no
    // scan) and land here as literals.
    val stacked = rules.map {
      case s: SchemaRule =>
        struct(
          lit(s.name).as("rule"), lit(s.severity).as("severity"),
          lit(s.check(df).size.toLong).as("failed"),
          lit(s.expected.size.toLong).as("total"))
      case r =>
        val weight = r match { case rr: RowRule => rr.totalWeight; case _ => 1 }
        struct(
          lit(r.name).as("rule"),
          lit(r.severity).as("severity"),
          coalesce(col(r.name), lit(0L)).cast("long").as("failed"),
          (col("_n") * weight).cast("long").as("total"))
    }
    one.select(explode(array(stacked: _*)).as("_r"))
      .select(col("_r.*"))
      .withColumn("passed", col("total") - col("failed"))
      .withColumn("pass_rate",
        when(col("total") === 0, 100.0)
          .otherwise(col("passed") * 100.0 / col("total")))
  }

  /** validate_and_filter (validator.py:229 — stubbed in the reference;
    * implemented fully here): split rows by the conjunction of all
    * row-decidable rules (RowRule + ForeignKey). Unique rules are not
    * row-decidable and are ignored, matching the reference's documented
    * intent. Returns the valid rows; [[invalidRows]] gives the rest.
    */
  def validateAndFilter(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val prepared = prepare(df, rules)
    val fails: Seq[Column] = rules.collect {
      case r: RowRule     => r.failsRow(prepared)
      case fk: ForeignKey => fkFailPred(fk)
    }
    val keep = fails.reduceOption((a, b) => a || b).map(not).getOrElse(lit(true))
    prepared.filter(keep).select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Complement of [[validateAndFilter]]. */
  def invalidRows(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val prepared = prepare(df, rules)
    val fails: Seq[Column] = rules.collect {
      case r: RowRule     => r.failsRow(prepared)
      case fk: ForeignKey => fkFailPred(fk)
    }
    val any = fails.reduceOption(_ || _).getOrElse(lit(false))
    prepared.filter(any).select(df.columns.map(col).toIndexedSeq: _*)
  }
}
