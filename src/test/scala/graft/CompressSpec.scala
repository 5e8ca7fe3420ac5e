package graft

import org.apache.spark.sql.functions._

import graft.functions.DeflateRatio.deflateRatio

/** DeflateRatio expression: the semantic contract the rows-only ⊘
  * gate rests on — repetition compresses hard, prose doesn't, empty
  * judges nothing, and the kernel is stable and codegen'd. */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below varied prose") {
    val spam = ("buy cheap now " * 200).trim
    val prose = (0 until 200).map(i => s"w${i * 2654435761L % 99991}").mkString(" ")
    val r = Seq(("spam", spam), ("prose", prose)).toDF("id", "text")
      .select(col("id"), deflateRatio(col("text")).as("r"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("spam") < 0.05, s"200 copies of one phrase must crush: ${r("spam")}")
    assert(r("prose") > 0.3, s"high-entropy tokens must resist: ${r("prose")}")
  }

  test("empty -> 1.0, null -> null, short framing not charged as zlib header") {
    val rows = Seq((1, ""), (2, null), (3, "abcabcabcabcabcabc"))
      .toDF("id", "text")
      .select(col("id"), deflateRatio(col("text")).as("r"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.0)
    assert(rows(1).isNullAt(1))
    assert(rows(2).getDouble(1) < 1.0) // raw deflate: no 6-byte zlib frame
  }

  test("deterministic across evaluations and partitionings") {
    val df = Tables.documents(spark, sfDir).select(col("doc_id"),
      deflateRatio(col("text")).as("r"))
    val a = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = df.repartition(7).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    assert(a.values.forall(v => v > 0.0 && v <= 1.5))
  }

  test("stays inside whole-stage codegen over a real scan") {
    val plan = Tables.documents(spark, sfDir)
      .select(deflateRatio(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [deflate_ratio"), plan)
  }

  test("SQL registration and level validation") {
    graft.functions.DeflateRatio.registerSql(spark)
    val v = spark.sql("SELECT deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaa')")
      .head().getDouble(0)
    assert(v < 0.5)
    intercept[IllegalArgumentException] { deflateRatio(col("x"), level = 10) }
  }
}
