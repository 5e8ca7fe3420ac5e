package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Validation rules (ref validation/rules.py:60-420).
  *
  * Each rule compiles to Catalyst columns, so a whole rule set evaluates
  * in ONE aggregate pass over the data (the reference runs one Polars
  * scan per rule — a Spark port must not: at 100 TB, N rules must not
  * mean N table scans).
  *
  * Rules fall into three shapes:
  *   - row-local ([[RowRule]]): a per-row failure count / predicate
  *     (NotNull, Range, Regex, InSet, CustomExpr);
  *   - [[Unique]]: failed = `count(*) − count_distinct(keys)` inside the
  *     same aggregate (Catalyst's Expand evaluates mixed distinct and
  *     non-distinct aggs in a single job);
  *   - [[ForeignKey]]: compiled by [[Validator]] to a left join against
  *     the distinct reference keys (size-based auto-broadcast) adding a
  *     match flag consumed as a row-local predicate.
  */
sealed trait Rule {
  def name: String
  def severity: String
}

/** A rule decidable per-row. `failCount` is the number of failures the
  * row contributes (0/1, or 0..n for multi-column NotNull — the
  * reference counts each null cell, rules.py:95); `failsRow` is the
  * boolean used by `validate_and_filter`.
  */
sealed trait RowRule extends Rule {
  def failCount(df: DataFrame): Column
  def failsRow(df: DataFrame): Column
  /** Rows-denominator multiplier (rules.py:101: total = rows × columns). */
  def totalWeight: Int = 1
}

/** rules.py:60 NotNullRule — null (or empty-string for strings, unless
  * allowEmpty) cells fail. */
final case class NotNull(
    columns: Seq[String],
    allowEmpty: Boolean = false,
    override val severity: String = "error") extends RowRule {
  val name = s"not_null_${columns.mkString("-")}"
  private def nullish(df: DataFrame)(c: String): Column =
    if (!allowEmpty && df.schema(c).dataType == StringType) col(c).isNull || col(c) === ""
    else col(c).isNull
  def failCount(df: DataFrame): Column =
    columns.map(c => when(nullish(df)(c), 1).otherwise(0)).reduce(_ + _)
  def failsRow(df: DataFrame): Column = columns.map(nullish(df)).reduce(_ || _)
  override def totalWeight: Int = columns.size
}

/** rules.py:149 RangeRule — values outside [min, max] fail; bounds pass
  * when `inclusive`. Nulls pass (null comparisons don't enter the
  * reference's failing mask sum). */
final case class Range(
    column: String,
    min: Option[Double] = None,
    max: Option[Double] = None,
    inclusive: Boolean = true,
    override val severity: String = "error") extends RowRule {
  val name = s"range_$column"
  private def pred: Column = {
    val lo = min.map(m => if (inclusive) col(column) < m else col(column) <= m)
    val hi = max.map(m => if (inclusive) col(column) > m else col(column) >= m)
    coalesce((lo ++ hi).reduceOption(_ || _).getOrElse(lit(false)), lit(false))
  }
  def failCount(df: DataFrame): Column = when(pred, 1).otherwise(0)
  def failsRow(df: DataFrame): Column = pred
}

/** rules.py:214 RegexRule — strings not matching (or matching, when
  * negated) the pattern fail. Nulls pass. Patterns must stay in the
  * RE2-compatible subset if oracle-checked (no lookaround). */
final case class Regex(
    column: String,
    pattern: String,
    negate: Boolean = false,
    override val severity: String = "error") extends RowRule {
  val name = s"regex_$column"
  private def pred: Column = {
    val m = regexp_like(col(column), lit(pattern))
    coalesce(if (negate) m else not(m), lit(false))
  }
  def failCount(df: DataFrame): Column = when(pred, 1).otherwise(0)
  def failsRow(df: DataFrame): Column = pred
}

/** rules.py:261 InSetRule — values outside the allowed set fail. */
final case class InSet(
    column: String,
    allowed: Seq[Any],
    caseSensitive: Boolean = true,
    override val severity: String = "error") extends RowRule {
  val name = s"in_set_$column"
  private def pred: Column = {
    val in =
      if (caseSensitive) col(column).isin(allowed: _*)
      else lower(col(column)).isin(allowed.map {
        case s: String => s.toLowerCase
        case v         => v
      }: _*)
    coalesce(not(in), lit(false))
  }
  def failCount(df: DataFrame): Column = when(pred, 1).otherwise(0)
  def failsRow(df: DataFrame): Column = pred
}

/** rules.py:373 CustomSQLRule — `failingWhere` selects FAILING rows. */
final case class CustomExpr(
    name: String,
    failingWhere: Column,
    override val severity: String = "error") extends RowRule {
  private def pred: Column = coalesce(failingWhere, lit(false))
  def failCount(df: DataFrame): Column = when(pred, 1).otherwise(0)
  def failsRow(df: DataFrame): Column = pred
}

/** rules.py:107 UniqueRule — duplicate rows beyond the first per key:
  * failed = count(*) − count(distinct keys). Not row-local (which
  * specific duplicate "fails" is undefined), so it reports but does not
  * participate in `validate_and_filter`. */
final case class Unique(
    columns: Seq[String],
    override val severity: String = "error") extends Rule {
  val name = s"unique_${columns.mkString("-")}"
}

/** rules.py:308 ForeignKeyRule — non-null values absent from the
  * reference column fail. */
final case class ForeignKey(
    column: String,
    reference: DataFrame,
    referenceColumn: String,
    override val severity: String = "error") extends Rule {
  val name = s"fk_$column"
  private[validation] def flagColumn: String = s"_fk_ok_$name"
}

/** rules.py:420 SchemaRule — structural check, evaluated against the
  * DataFrame's schema (no data scan): missing columns, type mismatches,
  * and (unless allowed) extra columns. */
final case class SchemaRule(
    expected: Map[String, org.apache.spark.sql.types.DataType],
    allowExtraColumns: Boolean = true,
    override val severity: String = "error") extends Rule {
  val name = "schema_validation"

  final case class SchemaIssue(column: String, issue: String, detail: String)

  def check(df: DataFrame): Seq[SchemaIssue] = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = expected.keys.toSeq.filterNot(actual.contains).sorted
      .map(c => SchemaIssue(c, "missing", s"expected ${expected(c).simpleString}"))
    val mismatched = expected.toSeq.sortBy(_._1).collect {
      case (c, t) if actual.get(c).exists(_ != t) =>
        SchemaIssue(c, "type_mismatch", s"expected ${t.simpleString}, got ${actual(c).simpleString}")
    }
    val extra =
      if (allowExtraColumns) Nil
      else actual.keys.toSeq.filterNot(expected.contains).sorted
        .map(c => SchemaIssue(c, "unexpected", "column not in expected schema"))
    missing ++ mismatched ++ extra
  }

  def passes(df: DataFrame): Boolean = check(df).isEmpty
}
