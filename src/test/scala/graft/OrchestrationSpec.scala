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

  test("structured event stream: every stage transition emits one JSON event") {
    // utils/logging.py vocabulary over a 3-stage run with one failure:
    // pipeline_started → (started/completed | failed | skipped) per
    // stage → pipeline_completed, pipeline_id bound on every event
    var t = 0L
    val lines = Seq.newBuilder[String]
    val log = new graft.ops.Log.Emitter(
      service = "graft-test", sink = lines += _, clock = () => { t += 1000; t })
    val stages = Seq(
      Stage("clean", Seq("orders"), in => in("orders").filter(col("o_totalprice") > 0)),
      Stage("boom", Seq("clean"), _ => throw new RuntimeException("nope")),
      Stage("report", Seq("boom"), in => in("boom")))
    val r = Pipeline.run("nightly", stages, Map("orders" -> srcOrders), log = Some(log))
    assert(!r.success)
    val evs = log.history.map(e => (e.level, e.event, e.fields.get("stage")))
    assert(evs == Seq(
      ("info", "pipeline_started", None),
      ("info", "stage_started", Some("clean")),
      ("info", "stage_completed", Some("clean")),
      ("info", "stage_started", Some("boom")),
      ("error", "stage_failed", Some("boom")),
      ("warning", "stage_skipped", Some("report")),
      ("info", "pipeline_completed", None)))
    // pipeline_id rides every event as an explicit field (NOT emitter-
    // bound context: two runs sharing one driver-wide emitter must not
    // overwrite each other's binding)
    assert(log.history.forall(_.fields.get("pipeline_id").contains("nightly")))
    assert(log.history.last.fields("success") == "false")
    assert(log.history(4).fields("error").contains("nope"))
    assert(log.history(5).fields("because_of") == "boom")
    // the wire form is real JSON with the ISO-UTC timestamp first
    val first = lines.result().head
    assert(first.startsWith("{\"timestamp\":\"1970-01-01T00:00:01Z\""))
    assert(first.contains("\"logger\":\"graft-test\"") &&
      first.contains("\"event\":\"pipeline_started\""))
    // the run leaves no residue on the emitter: an unrelated later
    // event carries no pipeline_id
    log.info("after")
    assert(!log.history.last.fields.contains("pipeline_id"))
    // and a SECOND run on the same emitter labels its own events — the
    // concurrent-runs case emitter-bound context would corrupt
    val r2 = Pipeline.run("weekly",
      Seq(Stage("clean", Seq("orders"), in => in("orders"))),
      Map("orders" -> srcOrders), log = Some(log))
    assert(r2.success)
    assert(log.history.takeRight(4).forall(_.fields.get("pipeline_id").contains("weekly")))
  }

  test("timed combinator logs duration on success and on rethrown failure") {
    var t = 0L
    val log = new graft.ops.Log.Emitter(clock = () => { t += 250; t })
    assert(log.timed("load")(7) == 7)
    val ok = log.history.last
    assert(ok.event == "operation_completed" && ok.fields("function") == "load" &&
      ok.fields("duration_ms") == "250" && ok.fields("status") == "success")
    val e = intercept[RuntimeException](log.timed("boom") {
      throw new RuntimeException("nope")
    })
    assert(e.getMessage == "nope") // the exception is preserved, not swallowed
    val fail = log.history.last
    assert(fail.level == "error" && fail.event == "operation_failed" &&
      fail.fields("error").contains("nope") && fail.fields("duration_ms") == "250")
  }

  test("log emitter sanitizes credential-shaped keys and bounds history") {
    val log = new graft.ops.Log.Emitter(clock = () => 0L, maxHistory = 3)
    val e = log.info("connected",
      "url" -> "jdbc:postgresql://db/x", "sfPassword" -> "hunter2",
      "api_key" -> "sk-123", "user_token" -> "abc", "user" -> "etl")
    assert(e.fields("sfPassword") == "[REDACTED]")
    assert(e.fields("api_key") == "[REDACTED]")
    assert(e.fields("user_token") == "[REDACTED]")
    assert(e.fields("url") == "jdbc:postgresql://db/x" && e.fields("user") == "etl")
    (1 to 5).foreach(i => log.info(s"e$i"))
    assert(log.history.size == 3 && log.history.map(_.event) == Seq("e3", "e4", "e5"))
  }

  test("log emitter drops envelope-colliding caller fields before the Event is built") {
    val lines = scala.collection.mutable.Buffer.empty[String]
    val log = new graft.ops.Log.Emitter(sink = lines += _, clock = () => 0L)
    val e = log.info("real_event",
      "event" -> "spoofed", "level" -> "error", "timestamp" -> "1999",
      "logger" -> "other", "table" -> "orders")
    // history and wire agree on what the event IS: the colliding keys
    // are gone from fields, not merely hidden from the JSON line
    assert(e.fields.keySet == Set("table"))
    assert(e.fields("table") == "orders")
    assert(log.jsonLines == lines.toSeq)
    assert(lines.head.contains("\"event\":\"real_event\"") &&
      lines.head.contains("\"level\":\"info\"") && !lines.head.contains("spoofed"))
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
