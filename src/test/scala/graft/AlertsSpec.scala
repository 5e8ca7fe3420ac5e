package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.services.Alerts
import graft.services.Alerts.{Notification, Rule}
import graft.validation.Quality

/** Alert rules over metric frames, cooldown, channel payloads. */
class AlertsSpec extends SparkSpec {

  test("evaluate runs all rules in one pass over a quality report") {
    val base = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val dirty = base.withColumn("o_totalprice", // nulls + dup rows so rules have something to catch
      when(col("o_orderkey") % 10 === 0, lit(null)).otherwise(col("o_totalprice")))
      .unionAll(base.limit(5))
    val quality = Quality.datasetQuality(dirty)
    val rules = Seq(
      Rule.threshold("low quality", "quality_score", "<", 99.9999, severity = "high"),
      Rule.threshold("has duplicates", "duplicate_rows", ">", 0.0),
      Rule.threshold("impossible", "row_count", "<", 0.0))
    val alerts = Alerts.evaluate(quality, rules).collect()
    val names = alerts.map(_.getAs[String]("rule_name")).toSet
    assert(names.contains("low quality") && !names.contains("impossible"))
    assert(alerts.forall(_.getAs[String]("context").contains("row_count")))
    // single projection: no per-rule jobs — one Generate, no Union fan-out
    import spark.implicits._
    val flat = Seq((1.0, 2.0)).toDF("quality_score", "duplicate_rows")
    val plan = Alerts.evaluate(flat, rules.take(2)).queryExecution.executedPlan.toString
    assert(!plan.contains("Union") && plan.split("Generate").length == 2,
      s"rules must evaluate in one pass:\n$plan")
  }

  test("per-column profile rows alert row-wise (null-rate watchdog)") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1)), ("a", None), ("a", None), ("a", None), ("b", Some(2))).toDF("g", "v")
    val profile = Quality.profile(df, Seq("g", "v"))
    val rule = Rule.threshold("nulls over 40%", "null_pct", ">", 40.0, severity = "critical")
    val hit = Alerts.evaluate(profile, Seq(rule)).collect()
    assert(hit.length == 1 && hit.head.getAs[String]("context").contains("\"column\":\"v\""))
  }

  test("missing-data rule fires on null metric; disabled rules are skipped") {
    import spark.implicits._
    val m = Seq((Option.empty[Double], 5.0)).toDF("freshness_hours", "volume")
    val fired = Alerts.evaluate(m, Seq(
      Rule.missingData("no freshness signal", "freshness_hours"),
      Rule.threshold("volume", "volume", ">", 0.0).copy(enabled = false))).collect()
    assert(fired.map(_.getAs[String]("rule_name")).toSeq == Seq("no freshness signal"))
    intercept[IllegalArgumentException](Rule.threshold("bad", "x", "~", 1.0))
  }

  test("cooldown suppresses refires inside the window, one timestamp per rule") {
    val rule = Rule.threshold("r", "m", ">", 0.0, cooldownMinutes = 15)
    val mgr = new Alerts.Manager(Seq(rule))
    val a = (rule.ruleId, "r", "medium", "{}")
    val t0 = LocalDateTime.parse("2026-03-10T10:00:00")
    assert(mgr.fire(Seq(a), t0) == Seq(a))
    assert(mgr.fire(Seq(a), t0.plusMinutes(10)).isEmpty) // inside cooldown
    assert(mgr.fire(Seq(a), t0.plusMinutes(15)) == Seq(a)) // window reopens
  }

  test("channel payloads render deterministically; delivery fans out over transports") {
    val n = Notification("Drift on \"orders\"", "null_pct moved 12.3 points",
      "high", Map("table" -> "orders"))
    val slack = Alerts.slackPayload(n, channelOverride = Some("#data-alerts"))
    assert(slack.contains("\"channel\":\"#data-alerts\"") && slack.contains(":warning:"))
    assert(slack.contains("Drift on \\\"orders\\\"")) // quotes escaped
    val (subj, body) = Alerts.emailPayload(n)
    assert(subj == "[HIGH] Drift on \"orders\"" && body.contains("table: orders"))
    assert(Alerts.webhookPayload(n) ==
      """{"title":"Drift on \"orders\"","message":"null_pct moved 12.3 points","severity":"high","metadata":{"table":"orders"}}""")
    var sent = List.empty[String]
    val res = Alerts.deliver(n, Seq("slack", "email", "pager"),
      Map("slack" -> ((x: Notification) => { sent ::= "slack"; true }),
        "email" -> ((_: Notification) => false)))
    assert(res == Map("slack" -> true, "email" -> false, "pager" -> false))
    assert(sent == List("slack"))
  }

  test("notifier: channel registry, severity + rate gates, probes, history") {
    import graft.services.Notifier
    var clock = 0L
    var slackSent = List.empty[String]
    var mailSent = List.empty[String]
    val notifier = new Notifier(minSeverity = "info", ratePerMinute = Some(3),
      maxHistory = 2, nowMs = () => clock)
    // addChannel composes a payload renderer with an injected transport
    notifier.addChannel("slack", Notifier.channel(
      Alerts.slackPayload(_), p => { slackSent ::= p; true }))
    notifier.addChannel("mail", Notifier.channel(
      n => Alerts.emailPayload(n)._1, p => { mailSent ::= p; true },
      probe = () => false))
    assert(notifier.channelNames == Seq("slack", "mail"))
    // test_connection fan-out; unknown channel probes false, no crash
    assert(notifier.testConnections() == Map("slack" -> true, "mail" -> false))
    assert(notifier.testConnections(Seq("pager")) == Map("pager" -> false))
    // severity gate: below-min drops before any channel sees it
    assert(!notifier.send(Notification("t", "m", "debug")))
    assert(slackSent.isEmpty)
    // fan-out hits every channel; alert-vocabulary severities rank too
    assert(notifier.send(Notification("disk", "low space", "high")))
    assert(slackSent.length == 1 && mailSent == List("[HIGH] disk"))
    // named-subset send; a throwing channel is a failed delivery only
    notifier.addChannel("flaky", Notifier.channel(_ => "x",
      _ => throw new RuntimeException("down")))
    assert(notifier.send(Notification("a", "b", "warning"), only = Seq("flaky", "slack")))
    assert(mailSent.length == 1, "subset send must not touch mail")
    // rate limit counts deliveries per rolling minute, resets with the clock
    assert(!notifier.send(Notification("c", "d", "error")),
      "3 deliveries used the per-minute budget")
    clock += 60001L
    assert(notifier.send(Notification("c", "d", "error")))
    // bounded history keeps the most recent
    assert(notifier.history.map(_.title) == Seq("a", "c"))
    assert(notifier.removeChannel("flaky") && !notifier.removeChannel("flaky"))
    intercept[IllegalArgumentException](new Notifier(minSeverity = "loud"))
  }
}
