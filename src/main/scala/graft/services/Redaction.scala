package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex PII redaction (ref services/redaction.py:279-478).
  *
  * The reference redacts row-by-row in Python with compiled `re`
  * patterns. Here every strategy compiles to native column expressions
  * — `regexp_replace` chains for tag/mask/remove, and a higher-order
  * `aggregate` over `regexp_extract_all` for hash — so redaction runs
  * inside Spark's generated code with zero serialization boundary.
  * Patterns must stay in the RE2-compatible subset (no lookaround) to
  * remain portable across engines.
  */
object Redaction {

  /** redaction.py:27 EntityPattern: named patterns, priority-ordered
    * (higher first), optional tag override. */
  final case class EntityPattern(
      name: String,
      patterns: Seq[String],
      tag: Option[String] = None,
      priority: Int = 0) {
    def tagText: String = tag.getOrElse(s"[${name.toUpperCase}]")
  }

  /** redaction.py:16 RedactionStrategy. */
  sealed trait Strategy
  case object Tag extends Strategy
  final case class Mask(maskChar: String = "*", length: Int = 4) extends Strategy
  case object Remove extends Strategy
  /** md5(match) truncated to 8 hex chars (redaction.py:396). */
  case object Hash extends Strategy

  /** redaction.py:132 `with_common_patterns` (same pattern set, RE2-safe). */
  val CommonPatterns: Seq[EntityPattern] = Seq(
    EntityPattern("email", Seq("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"), priority = 10),
    EntityPattern("ssn", Seq("\\d{3}-\\d{2}-\\d{4}"), priority = 9),
    EntityPattern("phone", Seq("\\d{3}-\\d{3}-\\d{4}"), priority = 8),
    EntityPattern("credit_card", Seq("\\d{4}[-\\s]?\\d{4}[-\\s]?\\d{4}[-\\s]?\\d{4}"), priority = 7),
    EntityPattern("ip_address", Seq("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"), priority = 6))

  private def ordered(patterns: Seq[EntityPattern]): Seq[(EntityPattern, String)] =
    patterns.sortBy(-_.priority).flatMap(p => p.patterns.map(p -> _))

  /** Redact one text column. Patterns apply in priority order, each
    * replacing ALL its matches (redaction.py:308 `redact`). */
  def redactColumn(c: Column, patterns: Seq[EntityPattern], strategy: Strategy = Tag): Column =
    ordered(patterns).foldLeft(c) { case (acc, (p, pat)) =>
      strategy match {
        case Tag          => regexp_replace(acc, pat, p.tagText)
        case Mask(ch, n)  => regexp_replace(acc, pat, ch * n)
        case Remove       => regexp_replace(acc, pat, "")
        case Hash         =>
          // Replace each distinct match with md5(match)[0:8]: collect
          // matches, fold a string `replace` per match. Identical
          // matches share a hash, so replace-all is correct.
          aggregate(
            regexp_extract_all(acc, lit(pat), lit(0)),
            acc,
            (text, m) => replace(text, m, substring(md5(m), 1, 8)))
      }
    }

  /** redaction.py:408 `redact_dataframe`: adds `<col><suffix>` per column. */
  def redactDataFrame(
      df: DataFrame,
      columns: Seq[String],
      patterns: Seq[EntityPattern] = CommonPatterns,
      strategy: Strategy = Tag,
      suffix: String = "_redacted"): DataFrame =
    columns.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(s"$c$suffix", redactColumn(col(c), patterns, strategy))
    }

  /** redaction.py:459 `get_entity_counts`, dataset-wide: one aggregate
    * scan → (entity, n_matches) per pattern. */
  def entityCounts(df: DataFrame, column: String, patterns: Seq[EntityPattern]): DataFrame = {
    require(patterns.nonEmpty, "entityCounts needs at least one pattern")
    val aggs = patterns.map { p =>
      p.patterns
        .map(pat => sum(coalesce(regexp_count(col(column), lit(pat)), lit(0))))
        .reduce(_ + _).as(p.name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = patterns.map(p =>
      struct(lit(p.name).as("entity"), coalesce(col(p.name), lit(0L)).cast("long").as("n_matches")))
    one.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }

  /** Training-corpus PII scrub (the Dolma pass — Soldaini et al. 2024
    * mask emails, phone numbers and IP addresses in pretraining text
    * with special tokens; C4 and FineWeb run the same shape): per
    * document, the masked text plus a count per entity type and a
    * total — the counts are the curation signal (docs that are MOSTLY
    * PII get dropped, not scrubbed). Counts are measured BEFORE any
    * replacement, so an earlier pattern's tag can never hide or
    * manufacture a later pattern's match; replacement itself applies
    * in priority order ([[redactColumn]]).
    *
    * Scale shape: a narrow per-row projection — no shuffle, no UDF,
    * every regex codegen'd; at 100 TB this is a map-only pass that
    * pipelines into whatever scan feeds it.
    * → (idCol, textCol [masked], n_<entity> per pattern, n_pii)
    */
  def scrubTexts(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[EntityPattern] = CommonPatterns,
      strategy: Strategy = Tag): DataFrame = {
    require(patterns.nonEmpty, "scrubTexts needs at least one pattern")
    val counts = patterns.map { p =>
      p.patterns
        .map(pat => coalesce(regexp_count(col(textCol), lit(pat)), lit(0)).cast("long"))
        .reduce(_ + _).as(s"n_${p.name}")
    }
    df.select(
      Seq(col(idCol), redactColumn(col(textCol), patterns, strategy).as(textCol)) ++
        counts: _*)
      .withColumn("n_pii", patterns.map(p => col(s"n_${p.name}")).reduce(_ + _))
  }

  /** redaction.py:467 `extract_entities`: array of matches per row. */
  def extractEntities(c: Column, pattern: EntityPattern): Column =
    flatten(array(pattern.patterns.map(p => regexp_extract_all(c, lit(p), lit(0))): _*))

  /** redaction.py:461 `has_sensitive_content`. */
  def hasSensitiveContent(c: Column, patterns: Seq[EntityPattern]): Column =
    patterns.flatMap(_.patterns).map(p => regexp_like(c, lit(p))).reduce(_ || _)
}
