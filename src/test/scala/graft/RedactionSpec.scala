package graft

import org.apache.spark.sql.functions._

import graft.services.Redaction
import graft.services.Redaction._

/** Redaction strategies + entity extraction (ref services/redaction.py). */
class RedactionSpec extends SparkSpec {

  private val email = EntityPattern("email", Seq("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"))

  private def run(strategy: Strategy): String = {
    import spark.implicits._
    Seq("mail a@b.com and c@d.org now").toDF("t")
      .select(Redaction.redactColumn(col("t"), Seq(email), strategy))
      .head().getString(0)
  }

  test("tag strategy replaces every match with the entity tag") {
    assert(run(Tag) == "mail [EMAIL] and [EMAIL] now")
  }

  test("mask strategy uses fixed-length mask") {
    assert(run(Mask("*", 4)) == "mail **** and **** now")
  }

  test("remove strategy deletes matches") {
    assert(run(Remove) == "mail  and  now")
  }

  test("hash strategy replaces each match with md5[0:8]") {
    val out = run(Hash)
    // md5("a@b.com")[0:8] deterministic; both matches hashed, 8 hex chars
    assert(out.matches("mail [0-9a-f]{8} and [0-9a-f]{8} now"), out)
    assert(out != run(Tag))
  }

  test("scrubTexts: per-doc masked text + counts measured before replacement") {
    import spark.implicits._
    val pats = Seq(
      email,
      EntityPattern("phone", Seq("\\d{3}-\\d{3}-\\d{4}"), priority = 8),
      EntityPattern("ip_address", Seq("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"), priority = 6))
    val docs = Seq(
      (1L, "mail a@b.com or c@d.org call 555-123-4567"),
      (2L, "from 10.0.0.1 and 10.0.0.2 and 10.0.0.3"),
      (3L, "no pii at all")).toDF("id", "text")
    val got = Redaction.scrubTexts(docs, "id", "text", pats)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) == (("mail [EMAIL] or [EMAIL] call [PHONE]", 2L, 1L, 0L, 3L)))
    assert(got(2L) == (("from [IP_ADDRESS] and [IP_ADDRESS] and [IP_ADDRESS]", 0L, 0L, 3L, 3L)))
    assert(got(3L) == (("no pii at all", 0L, 0L, 0L, 0L)))
  }

  test("redactDataFrame adds suffixed columns; extract + detect helpers") {
    import spark.implicits._
    val df = Seq(("x@y.com here", "clean")).toDF("a", "b")
    val red = Redaction.redactDataFrame(df, Seq("a", "b"), Seq(email))
    assert(red.columns.toSet == Set("a", "b", "a_redacted", "b_redacted"))
    assert(red.head().getAs[String]("a_redacted") == "[EMAIL] here")
    assert(red.select(Redaction.extractEntities(col("a"), email)).head()
      .getSeq[String](0) == Seq("x@y.com"))
    assert(red.select(Redaction.hasSensitiveContent(col("a"), Seq(email))).head().getBoolean(0))
    assert(!red.select(Redaction.hasSensitiveContent(col("b"), Seq(email))).head().getBoolean(0))
  }

  test("effectivePatterns: word boundary + case-insensitivity wrap terms; regexes pass through") {
    val day = TemporalPatterns.find(_.name == "day").get
    assert(day.effectivePatterns.head == "(?i)\\b(?:Monday)\\b")
    val date = TemporalPatterns.find(_.name == "date").get
    assert(date.effectivePatterns.head == "(?i)\\d{1,2}/\\d{1,2}/\\d{2,4}") // regex: no \b wrap
    // plain terms with metachars get escaped (redaction.py:72 _is_regex
    // routes them to regex; a term like "Washington D.C." is NOT a regex
    // under the heuristic, so its dot escapes)
    val dc = EntityPattern("city", Seq("Washington D.C"), wordBoundary = true)
    assert(dc.effectivePatterns.head == "\\b(?:Washington D\\.C)\\b")
  }

  test("temporal patterns: dates outrank day/month words; matching ignores case") {
    import spark.implicits._
    val got = Seq("meet FRIDAY 3/14/2024 or monday in january")
      .toDF("t").select(Redaction.redactColumn(col("t"), TemporalPatterns)).head().getString(0)
    assert(got == "meet [DAY] [DATE] or [DAY] in [MONTH]")
  }

  test("location patterns: reference list order is observable — Virginia redacts inside West Virginia") {
    import spark.implicits._
    def redact(s: String) = Seq(s).toDF("t")
      .select(Redaction.redactColumn(col("t"), LocationPatterns)).head().getString(0)
    // redaction.py applies one compiled pattern per term in list order:
    // "Virginia" precedes "West Virginia", so the longer term never fires
    assert(redact("moved to West Virginia") == "moved to West [STATE]")
    // state list applies before the city list at equal priority, so the
    // shared term "New York" tags as [STATE]
    assert(redact("flights to New York and Boston") == "flights to [STATE] and [CITY]")
    // word boundary: no match inside a larger word
    assert(redact("the texansaurus") == "the texansaurus")
  }

  test("groupedPatterns: overlap-free terms collapse to one alternation pass; overlapping terms split") {
    val state = LocationPatterns.find(_.name == "state").get
    val grouped = Redaction.groupedPatterns(state)
    // "West Virginia" word-overlaps the earlier "Virginia" → 2 passes
    assert(grouped.size == 2, grouped)
    assert(grouped(1).contains("West Virginia") && !grouped(0).contains("West Virginia"))
    // days / months / cities: no overlaps → one pass each
    assert(Redaction.groupedPatterns(TemporalPatterns.find(_.name == "day").get).size == 1)
    assert(Redaction.groupedPatterns(TemporalPatterns.find(_.name == "month").get).size == 1)
    assert(Redaction.groupedPatterns(LocationPatterns.find(_.name == "city").get).size == 1)
    // regex patterns keep one pass per pattern (no grouping proof)
    assert(Redaction.groupedPatterns(TemporalPatterns.find(_.name == "date").get).size == 3)
  }

  test("grouped chain is bit-identical to the reference's sequential per-term loop") {
    import spark.implicits._
    val pats = TemporalPatterns ++ LocationPatterns
    // the reference loop: one regexp_replace per term, list order
    def sequential(c: org.apache.spark.sql.Column) =
      pats.sortBy(-_.priority)
        .flatMap(p => p.effectivePatterns.map(p -> _))
        .foldLeft(c) { case (acc, (p, pat)) => regexp_replace(acc, pat, p.tagText) }
    val texts = Seq(
      "West Virginia and Virginia and New York City on monday",
      "SAN JOSE to san diego 3/14/2024 then 2024-01-15 and 1-2-99",
      "Fort Worth Texas New Hampshire new york boston MAY may maybe",
      "Carolina alone; North Carolina; South Dakota; dakota",
      "nothing to redact at all 123")
    val df = texts.toDF("t")
    val got = df.select(Redaction.redactColumn(col("t"), pats).as("g"),
      sequential(col("t")).as("s")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"grouped='${r.getString(0)}' sequential='${r.getString(1)}'"))
  }
}
