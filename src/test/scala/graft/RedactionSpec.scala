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
}
