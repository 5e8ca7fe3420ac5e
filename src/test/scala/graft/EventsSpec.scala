package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.services.Alerts.Notification
import graft.services.Events
import graft.services.Events._

/** Event-driven notification service: rule matching, condition
  * evaluation, cooldown + dedupe throttling, channel fan-out
  * (ref notifications/event_service.py). No SparkSession needed —
  * driver-side by design. */
class EventsSpec extends AnyFunSuite {

  private val t0 = LocalDateTime.of(2026, 8, 12, 12, 0)

  private def recordingTransport(ok: Boolean = true) = {
    val sent = scala.collection.mutable.Buffer.empty[Notification]
    val f = (n: Notification) => { sent += n; ok }
    (sent, f)
  }

  test("rules match on event type and conditions; fan-out records per-channel results") {
    val (slackSent, slack) = recordingTransport()
    val (pagerSent, pager) = recordingTransport(ok = false)
    val svc = new Service(
      rules = Seq(
        EventRule("r_fail", Set("pipeline_failed"), severity = "critical",
          channels = Seq("slack", "pagerduty")),
        EventRule("r_other", Set("job_failed"), channels = Seq("slack"))),
      transports = Map("slack" -> slack, "pagerduty" -> pager))

    val r = svc.pipelineFailed("nightly", "p1", "boom", Some("silver"), t0)
    assert(r.sent) // slack succeeded even though pagerduty failed
    assert(r.fired.map(_.ruleId) == Seq("r_fail")) // job rule did not match
    assert(r.fired.head.deliveries == Map("slack" -> true, "pagerduty" -> false))
    assert(slackSent.head.title == "Pipeline Failed: nightly")
    assert(slackSent.head.message == "Pipeline 'nightly' failed at step 'silver': boom")
    assert(slackSent.head.severity == "critical")
    assert(pagerSent.size == 1)
  }

  test("conditions: equals/contains/greater_than/less_than; missing keys pass (narrowing, not demanding)") {
    val d = Map[String, Any]("rows" -> 100L, "name" -> "orders_load", "rate" -> 0.25)
    assert(Equals("name", "orders_load").holds(d))
    assert(!Equals("name", "other").holds(d))
    assert(Contains("name", "orders").holds(d))
    assert(GreaterThan("rows", 50).holds(d))
    assert(!GreaterThan("rows", 100).holds(d)) // strict
    assert(LessThan("rate", 0.5).holds(d))
    assert(!LessThan("rate", 0.25).holds(d))
    assert(GreaterThan("absent_key", 1e9).holds(d)) // event_service.py:245 continue
    assert(!GreaterThan("name", 1).holds(d)) // non-numeric present value never passes a numeric check

    val (_, ch) = recordingTransport()
    val svc = new Service(
      Seq(EventRule("big_only", Set("validation_failed"),
        conditions = Seq(GreaterThan("failure_rate", 0.5)), channels = Seq("c"))),
      Map("c" -> ch))
    assert(!svc.validationFailed("t", "nn_check", 1, 100, t0).fired.nonEmpty)
    assert(svc.validationFailed("t", "other_check", 90, 100, t0).fired.map(_.ruleId) == Seq("big_only"))
  }

  test("per-rule cooldown throttles; expiry re-arms") {
    val (sent, ch) = recordingTransport()
    val svc = new Service(
      Seq(EventRule("r", Set("system_error"), cooldownMinutes = 15, channels = Seq("c"))),
      Map("c" -> ch), dedupeWindowMinutes = 0)
    assert(svc.systemError("fs", "e1", t0).sent)
    val during = svc.systemError("fs2", "e2", t0.plusMinutes(5))
    assert(!during.sent && during.suppressedByCooldown == Seq("r"))
    assert(svc.systemError("fs3", "e3", t0.plusMinutes(15)).sent)
    assert(sent.size == 2)
  }

  test("identical events dedupe inside the window; different sources do not") {
    val (sent, ch) = recordingTransport()
    val svc = new Service(
      Seq(EventRule("r", Set("pipeline_failed"), cooldownMinutes = 0, channels = Seq("c"))),
      Map("c" -> ch), dedupeWindowMinutes = 5)
    assert(svc.pipelineFailed("nightly", "p1", "boom", None, t0).sent)
    // the crash-looping retry: same event inside the window
    val dup = svc.pipelineFailed("nightly", "p2", "boom again", None, t0.plusMinutes(1))
    assert(!dup.sent && dup.suppressedAsDuplicate)
    // a different pipeline failing is NOT a duplicate
    assert(svc.pipelineFailed("hourly", "p3", "boom", None, t0.plusMinutes(1)).sent)
    // window expiry re-arms
    assert(svc.pipelineFailed("nightly", "p4", "boom", None, t0.plusMinutes(7)).sent)
    assert(sent.size == 3)
  }

  test("fixed-window dedupe: a suppressed recurrence does not refresh the window") {
    val (sent, ch) = recordingTransport()
    val svc = new Service(
      Seq(EventRule("r", Set("pipeline_failed"), cooldownMinutes = 0, channels = Seq("c"))),
      Map("c" -> ch), dedupeWindowMinutes = 5)
    // a persistent failure retrying every 4 min: sliding-window dedupe
    // would page once and then silence it FOREVER; the fixed window
    // re-pages once per window
    assert(svc.pipelineFailed("nightly", "p1", "boom", None, t0).sent)
    assert(!svc.pipelineFailed("nightly", "p2", "boom", None, t0.plusMinutes(4)).sent)
    assert(svc.pipelineFailed("nightly", "p3", "boom", None, t0.plusMinutes(8)).sent)
    assert(!svc.pipelineFailed("nightly", "p4", "boom", None, t0.plusMinutes(12)).sent)
    assert(sent.size == 2)
  }

  test("convenience emitters render the reference's message shapes") {
    val (sent, ch) = recordingTransport()
    val svc = new Service(
      Seq(EventRule("all", EventTypes, cooldownMinutes = 0, channels = Seq("c"))),
      Map("c" -> ch), dedupeWindowMinutes = 0)
    svc.pipelineCompleted("nightly", "p1", 12.34, 1234567L, t0)
    assert(sent.last.message == "Pipeline 'nightly' completed in 12.3s, processed 1,234,567 rows.")
    svc.validationFailed("orders", "not_null", 1500, 10000, t0)
    assert(sent.last.message ==
      "Validation rule 'not_null' failed on table 'orders': 1,500/10,000 rows failed.")
    svc.dataQualityAlert("orders", Seq("null spike", "drift"), "medium", t0)
    assert(sent.last.message == "Data quality issues found in 'orders':\n- null spike\n- drift")
    assert(sent.last.metadata("issue_count") == "2")
  }

  test("disabled rules never fire; unknown event types are rejected; unknown channel is a failed delivery") {
    val (_, ch) = recordingTransport()
    val svc = new Service(
      Seq(
        EventRule("off", Set("system_error"), enabled = false, channels = Seq("c")),
        EventRule("on", Set("system_error"), cooldownMinutes = 0,
          channels = Seq("c", "ghost"))),
      Map("c" -> ch), dedupeWindowMinutes = 0)
    val r = svc.systemError("x", "e", t0)
    assert(r.fired.map(_.ruleId) == Seq("on"))
    assert(r.fired.head.deliveries == Map("c" -> true, "ghost" -> false))
    intercept[IllegalArgumentException](Event("not_a_type", "t", "m"))
  }

  test("end-to-end with Alerts.evaluate: row-scale rule hits feed event emission") {
    // the composition the reference wires through its DB: a metrics
    // frame violation becomes an event through the service
    val spark = SparkSpec.session
    import spark.implicits._
    val metrics = Seq(("orders", 0.21), ("customer", 0.01)).toDF("table_name", "null_rate")
    val hits = graft.services.Alerts.evaluate(metrics,
      Seq(graft.services.Alerts.Rule.threshold("high nulls", "null_rate", ">", 0.2)))
      .collect()
    assert(hits.length == 1)
    val (sent, ch) = recordingTransport()
    val svc = new Service(
      Seq(EventRule("dq", Set("data_quality_alert"), cooldownMinutes = 0, channels = Seq("c"))),
      Map("c" -> ch), dedupeWindowMinutes = 0)
    hits.foreach { row =>
      svc.dataQualityAlert("orders", Seq(row.getAs[String]("rule_name")), "medium", t0)
    }
    assert(sent.size == 1 && sent.head.message.contains("high nulls"))
  }
}
