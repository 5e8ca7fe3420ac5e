package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.services.{Qa, Redaction}
import graft.sources.Sinks

/** Bucketed writes (exchange-free co-located joins), SQL-registered
  * cosine_similarity, redaction verification.
  */
class SinksSpec extends SparkSpec {

  test("bucketed tables join without a shuffle on either side") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 2.0)).toDF("k", "id", "v")
    Sinks.writeBucketed(facts, "bucketed_a", buckets = 4, bucketKeys = Seq("k"), sortKeys = Seq("k"))
    Sinks.writeBucketed(facts, "bucketed_b", buckets = 4, bucketKeys = Seq("k"), sortKeys = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000L * 10) // 100 keys x 10 x 10 matches... per key
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("cosine_similarity is SQL-callable after registration") {
    CosineSimilarity.registerSql(spark)
    val v = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 0.6) < 1e-7)
  }

  test("redactionVerified: clean + tagged text passes, residual PII fails") {
    import spark.implicits._
    val pats = Redaction.CommonPatterns.filter(_.name == "email").flatMap(_.patterns)
    val df = Seq(
      ("mail [EMAIL] ok", true),
      ("mail a@b.com leaked", false),
      ("no pii no tag", false) // expected tag required below
    ).toDF("t", "expected")
    val out = df.select(
      Qa.redactionVerified(col("t"), pats, expectedTags = Seq("[EMAIL]")).as("ok"),
      col("expected")).collect()
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }
}
