package graft

import org.apache.spark.sql.functions._

import graft.validation._

/** Rule-engine semantics (ref validation/rules.py, validator.py). */
class ValidationSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1, Some("a@x.com"), Some(10.0), "A"),
      (2, Some(""), Some(-5.0), "A"),
      (3, None, Some(20.0), "B"),
      (3, Some("bad"), None, "Z")
    ).toDF("id", "email", "amount", "cat")
  }

  test("report computes per-rule failure counts in one pass") {
    val refDf = { import spark.implicits._; Seq(1, 2).toDF("ref_id") }
    val rules = Seq(
      NotNull(Seq("email")),
      Range("amount", min = Some(0)),
      Regex("email", "^[^@]+@[^@]+$"),
      InSet("cat", Seq("A", "B")),
      Unique(Seq("id")),
      ForeignKey("id", refDf, "ref_id"))
    val rep = Validator.report(df, rules).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("failed")).toMap
    assert(rep("not_null_email") == 2)      // "" and null
    assert(rep("range_amount") == 1)        // -5.0 (null passes)
    assert(rep("regex_email") == 2)         // "bad" and "" (null passes)
    assert(rep("in_set_cat") == 1)          // Z
    assert(rep("unique_id") == 1)           // id=3 twice
    assert(rep("fk_id") == 2)               // two id=3 rows
  }

  test("validateAndFilter + invalidRows partition the input") {
    val rules = Seq(NotNull(Seq("email")), Range("amount", min = Some(0)))
    val valid = Validator.validateAndFilter(df, rules)
    val invalid = Validator.invalidRows(df, rules)
    assert(valid.count() + invalid.count() == df.count())
    // (3, "bad", null, "Z") is valid here: email non-null, null amount
    // passes Range (null comparisons don't fail rows, matching reference)
    assert(valid.collect().map(_.getInt(0)).toSet == Set(1, 3))
  }

  test("SchemaRule detects missing, mismatched, and extra columns") {
    import org.apache.spark.sql.types._
    val rule = SchemaRule(
      Map("id" -> IntegerType, "email" -> StringType, "missing_col" -> LongType),
      allowExtraColumns = false)
    val issues = rule.check(df).map(i => i.column -> i.issue)
    assert(issues.contains("missing_col" -> "missing"))
    assert(issues.count(_._2 == "unexpected") == 2) // amount, cat
    assert(!rule.passes(df))
    val ok = SchemaRule(Map("id" -> IntegerType), allowExtraColumns = true)
    assert(ok.passes(df))
    // report row is structural: failed = issue count, total = expected cols
    val rep = Validator.report(df, Seq(rule)).collect().head
    assert(rep.getAs[Long]("failed") == 3 && rep.getAs[Long]("total") == 3)
  }

  test("pass_rate is 100 for empty input") {
    val empty = df.limit(0)
    val rep = Validator.report(empty, Seq(NotNull(Seq("email")))).collect()
    assert(rep.head.getAs[Double]("pass_rate") == 100.0)
  }
}
