package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{ApproxDistinctRewrite, GraftExtensions}

/** The approx-count-distinct optimizer rule: direct rewrites + an
  * end-to-end session carrying the extension. */
class PlansSpec extends SparkSpec {

  test("rule rewrites single- and multi-column count distinct when the flag is on") {
    val df = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(count_distinct(col("o_custkey")).as("u1"),
        count_distinct(col("o_custkey"), col("o_orderpriority")).as("u2"))
    val analyzed = df.queryExecution.analyzed
    spark.conf.set(ApproxDistinctRewrite.Flag, "false")
    assert(ApproxDistinctRewrite(analyzed) == analyzed, "flag off must be a no-op")
    spark.conf.set(ApproxDistinctRewrite.Flag, "true")
    try {
      val rewritten = ApproxDistinctRewrite(analyzed)
      val s = rewritten.toString
      assert(s.contains("approx_count_distinct"), s)
      assert(!s.toLowerCase.contains("count(distinct"), s)
      // schema unchanged: same names, still longs
      assert(rewritten.schema == analyzed.schema)
    } finally spark.conf.set(ApproxDistinctRewrite.Flag, "false")
  }

  test("extension session: flag kills the Expand, sketches track exact within rsd") {
    // a session with GraftExtensions over the SAME SparkContext: clear
    // the default so getOrCreate builds a fresh session with extensions
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val extended =
      try SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      finally () // context is shared; nothing to tear down on failure
    try {
      def profile(s: SparkSession) = {
        val o = Tables.orders(s, sfDir)
        // ≥2 distinct aggregates: the exact path must plan an Expand
        o.agg(
          count_distinct(col("o_custkey")).as("u_cust"),
          count_distinct(col("o_orderpriority")).as("u_prio"),
          count(lit(1)).as("n"))
      }
      extended.conf.set(ApproxDistinctRewrite.Flag, "false")
      val exactPlan = profile(extended).queryExecution.executedPlan.toString
      assert(exactPlan.contains("Expand"), "exact multi-distinct should Expand")
      val exact = profile(extended).collect().head

      extended.conf.set(ApproxDistinctRewrite.Flag, "true")
      val approxPlan = profile(extended).queryExecution.executedPlan.toString
      assert(!approxPlan.contains("Expand"), s"flag must kill the Expand:\n$approxPlan")
      val approx = profile(extended).collect().head
      assert(approx.getAs[Long]("n") == exact.getAs[Long]("n")) // non-distinct agg untouched
      for (c <- Seq("u_cust", "u_prio")) {
        val (a, e) = (approx.getAs[Long](c), exact.getAs[Long](c))
        assert(math.abs(a - e).toDouble / math.max(e, 1) <= 0.1, s"$c: approx $a vs exact $e")
      }
      // a plain session without the extension is untouched by the flag
      prev.conf.set(ApproxDistinctRewrite.Flag, "true")
      try {
        val plain = profile(prev).queryExecution.executedPlan.toString
        assert(plain.contains("Expand"), "un-extended session must keep exact semantics")
      } finally prev.conf.set(ApproxDistinctRewrite.Flag, "false")
    } finally {
      extended.conf.set(ApproxDistinctRewrite.Flag, "false")
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
