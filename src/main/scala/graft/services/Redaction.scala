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
    * (higher first), optional tag override. `wordBoundary` wraps each
    * pattern in `\b(?:…)\b` and `caseInsensitive` prefixes `(?i)` —
    * redaction.py:53's compile flags, expressed inline so the SAME
    * pattern string runs in Spark's Java regex and DuckDB's RE2 (both
    * support `\b` and `(?i)`). Both default OFF to keep the original
    * regex patterns byte-identical. */
  final case class EntityPattern(
      name: String,
      patterns: Seq[String],
      tag: Option[String] = None,
      priority: Int = 0,
      caseInsensitive: Boolean = false,
      wordBoundary: Boolean = false) {
    def tagText: String = tag.getOrElse(s"[${name.toUpperCase}]")

    /** The engine-ready pattern strings (redaction.py:53
      * get_compiled_patterns): plain terms are regex-escaped
      * (redaction.py:72 _is_regex heuristic), then boundary-wrapped
      * and flag-prefixed. */
    def effectivePatterns: Seq[String] = patterns.map { p =>
      val base = if (EntityPattern.isRegex(p)) p else EntityPattern.escape(p)
      val bounded = if (wordBoundary) s"\\b(?:$base)\\b" else base
      if (caseInsensitive) s"(?i)$bounded" else bounded
    }
  }

  object EntityPattern {
    /** redaction.py:72 `_is_regex`. */
    private[services] def isRegex(p: String): Boolean =
      p.exists(c => "[](){}*+?|^$\\".indexOf(c.toInt) >= 0)
    /** Metachar escape valid in both Java regex and RE2 (no \Q..\E —
      * portability over brevity). */
    private[services] def escape(p: String): String = p.flatMap {
      case c if "[](){}*+?|^$\\.".indexOf(c.toInt) >= 0 => "\\" + c
      case c => c.toString
    }
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

  /** redaction.py:163 `with_temporal_patterns`: weekday and month
    * names (whole-word, case-insensitive) plus the three numeric date
    * shapes. Terms apply ONE AT A TIME in list order, exactly as the
    * reference compiles one pattern per term — order is observable
    * when one term contains another. */
  val TemporalPatterns: Seq[EntityPattern] = Seq(
    EntityPattern("date", Seq(
      "\\d{1,2}/\\d{1,2}/\\d{2,4}",
      "\\d{4}-\\d{2}-\\d{2}",
      "\\d{1,2}-\\d{1,2}-\\d{2,4}"), priority = 8, caseInsensitive = true),
    EntityPattern("day", Seq(
      "Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday", "Sunday"),
      priority = 5, caseInsensitive = true, wordBoundary = true),
    EntityPattern("month", Seq(
      "January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December"),
      priority = 5, caseInsensitive = true, wordBoundary = true))

  /** redaction.py:209 `with_location_patterns`: US states then major
    * cities, whole-word and case-insensitive. Reference list order is
    * kept — "Virginia" precedes "West Virginia", so the latter redacts
    * as `West [STATE]`, the reference's observable behavior. */
  val LocationPatterns: Seq[EntityPattern] = Seq(
    EntityPattern("state", Seq(
      "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
      "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
      "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana",
      "Maine", "Maryland", "Massachusetts", "Michigan", "Minnesota",
      "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
      "New Hampshire", "New Jersey", "New Mexico", "New York",
      "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
      "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
      "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
      "West Virginia", "Wisconsin", "Wyoming"),
      priority = 5, caseInsensitive = true, wordBoundary = true),
    EntityPattern("city", Seq(
      "New York", "Los Angeles", "Chicago", "Houston", "Phoenix",
      "Philadelphia", "San Antonio", "San Diego", "Dallas", "San Jose",
      "Austin", "Jacksonville", "Fort Worth", "Columbus", "Indianapolis",
      "Charlotte", "San Francisco", "Seattle", "Denver", "Boston",
      "Nashville", "Detroit", "Portland", "Memphis", "Atlanta",
      "Miami", "Las Vegas", "Baltimore", "Milwaukee", "Minneapolis"),
      priority = 5, caseInsensitive = true, wordBoundary = true))

  /** Can whole-word literal terms `a` and `b` ever match OVERLAPPING
    * text? Under `\b` on both ends, an overlap requires a word-level
    * suffix of one to equal a word-level prefix of the other (which
    * covers containment and equality as the full-length case). Terms
    * that can't overlap are safe to merge into one alternation pass:
    * every sequential per-term match survives verbatim and no new
    * match appears, so the merged pass is bit-identical to the
    * reference's one-compiled-pattern-per-term loop. */
  private[services] def canOverlap(a: String, b: String): Boolean = {
    // \b fires at EVERY word/non-word transition, not just whitespace,
    // so a punctuation-bearing literal ("Washington D.C") exposes
    // interior boundaries — tokenize on \W+ (what \b actually
    // delimits), else two grouped terms could overlap undetected.
    val aw = a.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val bw = b.toLowerCase.split("\\W+").filter(_.nonEmpty)
    def sufPre(x: Array[String], y: Array[String]) =
      (1 to math.min(x.length, y.length))
        .exists(k => x.takeRight(k).sameElements(y.take(k)))
    sufPre(aw, bw) || sufPre(bw, aw) ||
      aw.containsSlice(bw) || bw.containsSlice(aw)
  }

  /** One entity's engine-ready pattern passes, with safe literal terms
    * GROUPED into single alternations: the reference applies one
    * compiled pattern per term (106 passes for the temporal+location
    * defaults — measured 5.2 s at sf0.1), but consecutive whole-word
    * terms that cannot overlap ([[canOverlap]]) collapse into
    * `\b(?:t1|t2|…)\b` with identical semantics — alternation order
    * preserves first-listed-wins at equal positions, and
    * non-overlapping matches make the sequential result order-free.
    * A term that CAN overlap an earlier group member (Virginia /
    * West Virginia) starts a new group, preserving the observable
    * earlier-term-eats-first behavior. Regex patterns and unbounded
    * literals keep their own pass (partial-word overlaps are possible
    * there). 8 passes instead of 106 for the default sets. */
  def groupedPatterns(p: EntityPattern): Seq[String] = {
    def render(group: Seq[String]): String = {
      val alt = group.map(EntityPattern.escape).mkString("|")
      val bounded = s"\\b(?:$alt)\\b"
      if (p.caseInsensitive) s"(?i)$bounded" else bounded
    }
    if (!p.wordBoundary) p.effectivePatterns
    else {
      val out = Seq.newBuilder[String]
      var cur = Vector.empty[String]
      def flush(): Unit = { if (cur.nonEmpty) { out += render(cur); cur = Vector.empty } }
      p.patterns.foreach { t =>
        if (EntityPattern.isRegex(t)) {
          // a regex keeps the per-pattern pass (its matches aren't
          // whole-word literals, so the overlap proof doesn't apply)
          flush()
          out += p.effectivePatterns(p.patterns.indexOf(t))
        } else {
          if (cur.exists(canOverlap(_, t))) flush()
          cur :+= t
        }
      }
      flush()
      out.result()
    }
  }

  /** The exact (pattern, tag) chain a redaction runs, priority-ordered
    * then grouped — PUBLIC so oracle SQL generates from the very same
    * strings the Spark plan compiles. */
  def compiledChain(patterns: Seq[EntityPattern]): Seq[(EntityPattern, String)] =
    patterns.sortBy(-_.priority).flatMap(p => groupedPatterns(p).map(p -> _))

  private def ordered(patterns: Seq[EntityPattern]): Seq[(EntityPattern, String)] =
    compiledChain(patterns)

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
      groupedPatterns(p)
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
      groupedPatterns(p)
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
    flatten(array(pattern.effectivePatterns.map(p => regexp_extract_all(c, lit(p), lit(0))): _*))

  /** redaction.py:461 `has_sensitive_content`. */
  def hasSensitiveContent(c: Column, patterns: Seq[EntityPattern]): Column =
    patterns.flatMap(_.effectivePatterns).map(p => regexp_like(c, lit(p))).reduce(_ || _)
}
