package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lineage.Lineage
import graft.orchestration.Pipeline
import graft.orchestration.Pipeline.{Failed, Restored, Skipped, Stage, Succeeded}

/** Pipeline DAG orchestration: retry, downstream skip, restart,
  * lineage auto-registration, and the no-barrier plan-fusion stance. */
class OrchestrationSpec extends SparkSpec {

  private def srcOrders: DataFrame = Tables.orders(spark, sfDir)

  test("4-stage DAG: flaky stage retries to success; lineage edges recorded") {
    var bAttempts = 0
    val tracker = new Lineage.Tracker
    val stages = Seq(
      Stage("clean", Seq("orders"), in => in("orders").filter(col("o_totalprice") > 0)),
      Stage("enrich", Seq("clean"), in =>
        in("clean").withColumn("bucket", (col("o_orderkey") % 4).cast("int"))),
      Stage("agg", Seq("enrich"), { in =>
        bAttempts += 1
        if (bAttempts < 3) throw new RuntimeException(s"transient #$bAttempts")
        in("enrich").groupBy("bucket").agg(count(lit(1)).as("n"))
      }, maxRetries = 3),
      Stage("report", Seq("agg", "clean"), in =>
        in("agg").agg(sum(col("n")).as("total"))))
    val r = Pipeline.run("nightly", stages, Map("orders" -> srcOrders), Some(tracker))
    assert(r.success)
    assert(r.stages("agg") == Succeeded(attempts = 3))
    assert(r.stages.keys.toSeq == Seq("clean", "enrich", "agg", "report")) // deterministic topo order
    assert(r("report").collect().head.getLong(0) == srcOrders.count())
    // lineage: dep → stage edges tagged with the pipeline, impact works
    assert(tracker.graph.edges.exists(e =>
      e.from == "enrich" && e.to == "agg" && e.operation == "pipeline:nightly"))
    assert(tracker.graph.impactAnalysis("clean").totalImpact.toSet ==
      Set("enrich", "agg", "report"))
  }

  test("exhausted retries fail the stage and skip its transitive downstream only") {
    var attempts = 0
    val stages = Seq(
      Stage("a", Seq("orders"), in => in("orders")),
      Stage("bad", Seq("a"), { _ =>
        attempts += 1; throw new RuntimeException("boom")
      }, maxRetries = 1),
      Stage("after_bad", Seq("bad"), in => in("bad")),
      Stage("after_after", Seq("after_bad"), in => in("after_bad")),
      Stage("independent", Seq("a"), in => in("a").limit(5)))
    val r = Pipeline.run("p", stages, Map("orders" -> srcOrders))
    assert(!r.success)
    assert(attempts == 2) // initial + 1 retry
    assert(r.stages("bad") match { case Failed(2, msg) => msg.contains("boom"); case _ => false })
    assert(r.stages("after_bad") == Skipped("bad"))
    assert(r.stages("after_after") == Skipped("bad")) // root cause propagates
    assert(r.stages("independent").isSuccess) // unrelated branch still ran
  }

  test("restart seeds completed stages without re-executing them") {
    var ran = false
    val stages = Seq(
      Stage("expensive", Seq("orders"), { in => ran = true; in("orders") }),
      Stage("downstream", Seq("expensive"), in => in("expensive").limit(3)))
    val prior = srcOrders.limit(10)
    val r = Pipeline.run("p", stages, Map("orders" -> srcOrders),
      completed = Map("expensive" -> prior))
    assert(!ran && r.stages("expensive") == Restored)
    assert(r("downstream").count() == 3)
  }

  test("DAG validation rejects cycles, unknown deps, duplicate and shadowed names") {
    val ok = (in: Map[String, DataFrame]) => in.values.head
    intercept[IllegalArgumentException](Pipeline.run("p",
      Seq(Stage("a", Seq("b"), ok), Stage("b", Seq("a"), ok)), Map.empty))
    intercept[IllegalArgumentException](Pipeline.run("p",
      Seq(Stage("a", Seq("nope"), ok)), Map.empty))
    intercept[IllegalArgumentException](Pipeline.run("p",
      Seq(Stage("a", Nil, ok), Stage("a", Nil, ok)), Map.empty))
    intercept[IllegalArgumentException](Pipeline.run("p",
      Seq(Stage("orders", Nil, ok)), Map("orders" -> srcOrders)))
  }

  test("stages fuse into one plan: a late filter still pushes into the scan") {
    val stages = Seq(
      Stage("projected", Seq("orders"), in =>
        in("orders").select("o_orderkey", "o_orderstatus", "o_totalprice")),
      Stage("filtered", Seq("projected"), in =>
        in("projected").filter(col("o_orderstatus") === "F")))
    val r = Pipeline.run("fused", stages, Map("orders" -> srcOrders))
    val plan = r("filtered").queryExecution.executedPlan.toString
    // no materialization barrier between stages: the stage-2 predicate
    // reaches the parquet reader of the stage-1 (source) scan
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"),
      s"expected pushed filter in:\n$plan")
  }
}
