package graft

import org.apache.spark.sql.functions._

import graft.services.{Qa, Redaction}
import graft.services.Redaction.EntityPattern

/** QA surfaces beyond the oracle-gated compare/verify queries:
  * entity-count reconciliation (ref qa.py:293) and the bounded
  * spot-check sampler (ref qa.py:366). */
class QaSpec extends SparkSpec {

  import spark.implicits._

  private val pats = Seq(
    EntityPattern("email", Seq("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"), priority = 10),
    EntityPattern("ssn", Seq("\\d{3}-\\d{2}-\\d{4}"), priority = 9))

  test("verifyEntityCounts: full redaction passes per entity and in total") {
    val before = Seq((1L, "mail a@b.com ssn 123-45-6789"), (2L, "mail c@d.org")).toDF("id", "text")
    val after = Redaction.redactDataFrame(before, Seq("text"), pats)
      .select(col("id"), col("text_redacted").as("text"))
    val r = Qa.verifyEntityCounts(
      Redaction.entityCounts(before, "text", pats),
      Redaction.entityCounts(after, "text", pats))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4)))).toMap
    assert(r("email") == ((2L, 0L, 100.0, true)))
    assert(r("ssn") == ((1L, 0L, 100.0, true)))
    assert(r("_total") == ((3L, 0L, 100.0, true)))
  }

  test("verifyEntityCounts: surviving entities fail; expectZeroAfter=false reports reduction") {
    val b = Seq(("email", 4L), ("ssn", 2L)).toDF("entity", "n_matches")
    val a = Seq(("email", 1L), ("ssn", 0L)).toDF("entity", "n_matches")
    val strict = Qa.verifyEntityCounts(b, a).collect()
      .map(x => x.getString(0) -> x.getBoolean(4)).toMap
    assert(!strict("email") && strict("ssn") && !strict("_total"))
    val lax = Qa.verifyEntityCounts(b, a, expectZeroAfter = false).collect()
      .map(x => x.getString(0) -> ((x.getDouble(3), x.getBoolean(4)))).toMap
    assert(lax("email") == ((75.0, true)) && lax("_total") == ((5L * 100.0 / 6L, true)))
    // an entity present on one side only reconciles against 0
    val extra = Qa.verifyEntityCounts(b.filter(col("entity") =!= "ssn"), a).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(extra("ssn") == ((0L, 0L)))
  }

  test("spotCheckSamples: bounded, evenly spread, change-flagged") {
    val before = (1L to 1000L).map(i => (i, s"text $i")).toDF("id", "text")
    val after = (1L to 1000L).map(i => (i, if (i % 2 == 0) s"TEXT $i" else s"text $i"))
      .toDF("id", "text")
    val s = Qa.spotCheckSamples(before, after, "id", "text", nSamples = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(s.length == 10)
    // evenly spread over the id domain: one sample per decile-ish
    assert(s.map(_._1).distinct.length == 10)
    assert(s.last._1 > 850, s"samples should reach the tail: ${s.map(_._1).mkString(",")}")
    s.foreach { case (id, b, a, changed) =>
      assert(b == s"text $id")
      assert(changed == (id % 2 == 0) && (a == b) != changed)
    }
  }

  test("spotCheckSamples: ids beyond 2^53 stay exact (no double collision)") {
    // 2^53 = 9007199254740992; +0 and +1 collide as doubles. The join
    // must keep them distinct and pair each with its OWN after-row.
    val base = (0L to 7L).map(i => (9007199254740992L + i, s"t$i"))
    val before = base.toDF("id", "text")
    val after = base.map { case (id, t) => (id, t.toUpperCase) }.toDF("id", "text")
    val s = Qa.spotCheckSamples(before, after, "id", "text", nSamples = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(s.nonEmpty)
    s.foreach { case (id, b, a) =>
      val i = id - 9007199254740992L
      assert(b == s"t$i" && a == s"T$i", s"id $id paired with wrong rows: ($b, $a)")
    }
  }

  test("spotCheckSamples: redacted-column convention, missing column, empty input") {
    val before = Seq((1L, "mail a@b.com")).toDF("id", "text")
    val red = Redaction.redactDataFrame(before, Seq("text"), pats).drop("text")
    val viaSuffix = Qa.spotCheckSamples(before, red, "id", "text", 3).collect()
    assert(viaSuffix.length == 1 && viaSuffix(0).getString(2) == "mail [EMAIL]"
      && viaSuffix(0).getBoolean(3) && viaSuffix(0).getString(4) == "")
    val missing = Qa.spotCheckSamples(before, red.drop("text_redacted"), "id", "text", 3).collect()
    assert(missing.length == 1 && missing(0).getString(2) == ""
      && missing(0).getString(4) == "missing_after_column")
    val empty = Qa.spotCheckSamples(before.limit(0), red, "id", "text", 3)
    assert(empty.count() == 0)
    intercept[IllegalArgumentException](
      Qa.spotCheckSamples(before.select(col("id").cast("string"), col("text")),
        before, "id", "text"))
  }
}
