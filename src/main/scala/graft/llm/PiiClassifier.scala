package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.services.Redaction
import graft.services.Redaction.EntityPattern

/** PII column classification (ref llm/data_classifier.py:119
  * `detect_pii`, :191 `classify_columns`, :243
  * `suggest_access_controls`).
  *
  * The reference sends 10 sample values per column to an LLM and asks
  * for JSON. Re-expressed deterministically, the question "does this
  * column hold emails/SSNs/phones/cards?" is a MEASUREMENT: the
  * fraction of non-null values matching each
  * [[Redaction.CommonPatterns]] entity, computed for every column in
  * ONE aggregate pass over a bounded sample — no per-column jobs, no
  * model call, reproducible. The LLM belongs where the reference's
  * free-text reasoning does (naming a novel pattern); that seam stays
  * open via custom `EntityPattern`s, the same extension point the
  * redaction service uses.
  *
  * Composition is the point: `classify → pick flagged columns →
  * [[Redaction.redactDataFrame]]` is the reference's
  * detect-then-redact loop as two declarative plans, and the risk
  * rollup (`high` over 3 PII columns / `medium` / `low`,
  * data_classifier.py:186) plus per-level access suggestions
  * (:243) are pure functions of the report.
  */
object PiiClassifier {

  /** Per-column classification report row. */
  final case class ColumnReport(
      column: String, piiType: Option[String], confidence: Double,
      matchRates: Map[String, Double])

  final case class PiiReport(
      columnsAnalyzed: Seq[String],
      piiColumns: Seq[String],
      details: Seq[ColumnReport],
      overallRisk: String)

  /** data_classifier.py:119: classify string columns by pattern match
    * rate over a bounded sample (`sampleRows`, reference uses 10 —
    * default higher here since a one-pass aggregate makes samples
    * cheap). A column is PII when ≥ `threshold` of its non-null
    * sampled values match one entity; ties break by pattern priority.
    * One Spark job regardless of column count. */
  def detectPii(
      df: DataFrame,
      columns: Seq[String] = Seq.empty,
      patterns: Seq[EntityPattern] = Redaction.CommonPatterns,
      sampleRows: Int = 100,
      threshold: Double = 0.5): PiiReport = {
    val strCols =
      (if (columns.nonEmpty) columns else df.columns.toSeq)
        .filter(c => df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    require(strCols.nonEmpty, "no string columns to classify")
    val sample = df.select(strCols.map(col): _*).limit(sampleRows)
    def fullMatch(c: Column, p: EntityPattern): Column =
      p.patterns.map(rx => c.rlike("^(?:" + rx + ")$")).reduce(_ || _)
    val aggs = strCols.flatMap { c =>
      count(col(c)).as(s"_n_$c") +:
        patterns.map(p => count(when(fullMatch(col(c), p), 1)).as(s"_m_${p.name}_$c"))
    }
    val row = sample.agg(aggs.head, aggs.tail: _*).collect().head
    val details = strCols.map { c =>
      val n = row.getAs[Long](s"_n_$c")
      val rates = patterns.map { p =>
        p.name -> (if (n == 0) 0.0 else row.getAs[Long](s"_m_${p.name}_$c").toDouble / n)
      }.toMap
      val best = patterns.sortBy(-_.priority)
        .map(p => p -> rates(p.name)).filter(_._2 >= threshold)
        .sortBy { case (p, r) => (-r, -p.priority) }.headOption
      ColumnReport(c, best.map(_._1.name), best.map(_._2).getOrElse(0.0), rates)
    }
    val piiCols = details.filter(_.piiType.isDefined).map(_.column)
    PiiReport(strCols, piiCols, details, riskLevel(piiCols.size))
  }

  /** data_classifier.py:186 rollup. */
  def riskLevel(piiColumnCount: Int): String =
    if (piiColumnCount > 3) "high" else if (piiColumnCount > 0) "medium" else "low"

  /** data_classifier.py:243 `suggest_access_controls`, as data. */
  def suggestAccessControls(report: PiiReport): Map[String, String] =
    report.details.map { d =>
      d.column -> (d.piiType match {
        case Some("ssn") | Some("credit_card") => "restricted: masked by default, audit every read"
        case Some(_)                           => "sensitive: role-gated, redact in lower environments"
        case None                              => "general: standard access"
      })
    }.toMap

  /** The detect-then-redact loop, composed: classify, then redact every
    * flagged column with [[Redaction.redactDataFrame]]. */
  def autoRedact(
      df: DataFrame,
      patterns: Seq[EntityPattern] = Redaction.CommonPatterns,
      sampleRows: Int = 100,
      threshold: Double = 0.5,
      strategy: Redaction.Strategy = Redaction.Tag): (PiiReport, DataFrame) = {
    val report = detectPii(df, Seq.empty, patterns, sampleRows, threshold)
    (report, Redaction.redactDataFrame(df, report.piiColumns, patterns, strategy))
  }
}
