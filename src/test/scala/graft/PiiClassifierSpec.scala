package graft

import graft.llm.PiiClassifier
import graft.services.Redaction

/** Deterministic PII column classification + detect-then-redact. */
class PiiClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    ("alice@example.com", "555-12-3456", "just some words", "10.0.0.1"),
    ("bob@test.io", "123-45-6789", "more plain text", "192.168.1.1"),
    ("carol@x.dev", null, "nothing here", "8.8.8.8"))
    .toDF("email_col", "gov_id", "notes", "addr")

  test("detectPii flags columns by full-match rate in one pass, ranks by priority") {
    val r = PiiClassifier.detectPii(fixture)
    assert(r.columnsAnalyzed == Seq("email_col", "gov_id", "notes", "addr"))
    val byCol = r.details.map(d => d.column -> d).toMap
    assert(byCol("email_col").piiType.contains("email"))
    assert(byCol("email_col").confidence == 1.0)
    assert(byCol("gov_id").piiType.contains("ssn")) // null excluded: 2/2 match
    assert(byCol("gov_id").confidence == 1.0)
    assert(byCol("notes").piiType.isEmpty)
    assert(byCol("addr").piiType.contains("ip_address"))
    assert(r.piiColumns == Seq("email_col", "gov_id", "addr"))
    assert(r.overallRisk == "medium") // 3 columns → not yet high
  }

  test("partial-match columns respect the threshold; embedded PII is not a full match") {
    val mixed = Seq("contact alice@example.com please", "no address here")
      .toDF("body")
    // embedded email ≠ the column IS emails — classification stays clean,
    // while redaction (substring-based) still catches it downstream
    val r = PiiClassifier.detectPii(mixed)
    assert(r.details.head.piiType.isEmpty && r.overallRisk == "low")
    val half = Seq("a@b.io", "plain", "c@d.io", "words").toDF("maybe")
    assert(PiiClassifier.detectPii(half, threshold = 0.5).piiColumns == Seq("maybe"))
    assert(PiiClassifier.detectPii(half, threshold = 0.6).piiColumns.isEmpty)
  }

  test("risk rollup and access suggestions follow the reference levels") {
    assert(PiiClassifier.riskLevel(0) == "low")
    assert(PiiClassifier.riskLevel(3) == "medium")
    assert(PiiClassifier.riskLevel(4) == "high")
    val r = PiiClassifier.detectPii(fixture)
    val acl = PiiClassifier.suggestAccessControls(r)
    assert(acl("gov_id").startsWith("restricted"))
    assert(acl("email_col").startsWith("sensitive"))
    assert(acl("notes").startsWith("general"))
  }

  test("autoRedact composes detection with the redaction service") {
    val (report, redacted) = PiiClassifier.autoRedact(fixture)
    assert(report.piiColumns.nonEmpty)
    assert(redacted.columns.contains("email_col_redacted"))
    val row = redacted.select("email_col_redacted").collect().head.getString(0)
    assert(row == "[EMAIL]")
    // flagged-but-absent columns: redactDataFrame only touches existing ones
    assert(!redacted.columns.contains("notes_redacted"))
    assert(Redaction.entityCounts(fixture, "email_col", Redaction.CommonPatterns)
      .filter(org.apache.spark.sql.functions.col("entity") === "email")
      .collect().head.getAs[Long]("n_matches") == 3L)
  }
}
