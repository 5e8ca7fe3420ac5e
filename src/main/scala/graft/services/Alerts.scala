package graft.services

import java.time.{Duration, LocalDateTime}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alerting over pipeline metrics (ref notifications/alerts.py:50
  * `AlertRule`, :227 `Alert`, :293 `AlertManager`; channels.py:22,144).
  *
  * The reference evaluates rules one-by-one against a Python dict
  * context. Spark-first, a rule is a `Column` PREDICATE and the
  * context is a DataFrame of metric rows — the natural inputs are this
  * library's own report outputs (q30 validation report, q40 profile,
  * q42 dataset quality, q43 drift), so [[evaluate]] runs every enabled
  * rule over every row in ONE pass (a single projection — no per-rule
  * scans) and returns an alerts DataFrame. That keeps alerting on a
  * 10k-table lakehouse a single small job instead of a driver loop.
  *
  * Driver-side pieces mirror the reference where driver-side is the
  * right scale: cooldown suppression ([[Manager]], alerts.py:91-95 —
  * state is one timestamp per rule) and channel delivery. Channels
  * follow the [[graft.sources.Rest]] stance: payload RENDERING is
  * deterministic and tested (Slack blocks / email subject-body /
  * webhook JSON), transport is an injected `send` edge.
  */
object Alerts {

  // alerts.py:22 AlertSeverity
  val Severities: Seq[String] = Seq("low", "medium", "high", "critical")

  /** alerts.py:50 AlertRule — `predicate` references metric columns of
    * the context frame; rows where it holds raise the alert. */
  final case class Rule(
      ruleId: String,
      name: String,
      conditionType: String,
      predicate: Column,
      severity: String = "medium",
      channels: Seq[String] = Seq.empty,
      cooldownMinutes: Int = 15,
      enabled: Boolean = true) {
    require(Severities.contains(severity), s"severity must be one of $Severities")
  }

  object Rule {
    /** alerts.py:75 `AlertRule.threshold`. */
    def threshold(
        name: String, metric: String, operator: String, value: Double,
        severity: String = "medium", channels: Seq[String] = Seq.empty,
        cooldownMinutes: Int = 15): Rule = {
      val pred = operator match {
        case ">"  => col(metric) > value
        case ">=" => col(metric) >= value
        case "<"  => col(metric) < value
        case "<=" => col(metric) <= value
        case "==" => col(metric) === value
        case "!=" => col(metric) =!= value
        case other => throw new IllegalArgumentException(s"Invalid operator: $other")
      }
      // a null metric never alerts (alerts.py:102 context.get → False)
      Rule(s"threshold:$metric$operator$value", name, "threshold",
        col(metric).isNotNull && pred, severity, channels, cooldownMinutes)
    }

    /** alerts.py:144 missing-data flavor: null or absent metric. */
    def missingData(name: String, metric: String, severity: String = "high"): Rule =
      Rule(s"missing:$metric", name, "missing_data", col(metric).isNull, severity)
  }

  /** Evaluate every enabled rule against every context row in one
    * projection → (rule_id, rule_name, condition_type, severity,
    * context) with `context` the full triggering row as a JSON string
    * (alerts.py:240 Alert.context). */
  def evaluate(metrics: DataFrame, rules: Seq[Rule]): DataFrame = {
    val active = rules.filter(_.enabled)
    require(active.nonEmpty, "no enabled rules")
    val hits = array(active.map { r =>
      when(r.predicate, struct(
        lit(r.ruleId).as("rule_id"), lit(r.name).as("rule_name"),
        lit(r.conditionType).as("condition_type"), lit(r.severity).as("severity")))
    }: _*)
    metrics
      .withColumn("_ctx", to_json(struct(metrics.columns.map(col).toIndexedSeq: _*)))
      .select(explode(filter(hits, h => h.isNotNull)).as("_a"), col("_ctx").as("context"))
      .select(col("_a.*"), col("context"))
  }

  /** alerts.py:293 AlertManager — cooldown suppression with one
    * last-fired timestamp per rule. Time is injected (testable; the
    * host loop owns the clock, same stance as
    * [[graft.orchestration.Schedule]]). */
  final class Manager(rules: Seq[Rule]) {
    private val byId = rules.map(r => r.ruleId -> r).toMap
    private val lastFired = scala.collection.mutable.Map.empty[String, LocalDateTime]

    /** Filter raised alerts through per-rule cooldown; fired rules
      * advance their timestamp (alerts.py:91-95). Input rows need
      * (rule_id, rule_name, severity, context) — [[evaluate]] output.
      * Driver-side by design: #alerts ≈ #violated rules, not #rows. */
    def fire(alerts: Seq[(String, String, String, String)], now: LocalDateTime)
        : Seq[(String, String, String, String)] =
      alerts.filter { case (ruleId, _, _, _) =>
        val cooldown = byId.get(ruleId).map(_.cooldownMinutes).getOrElse(0)
        val ok = lastFired.get(ruleId).forall(last =>
          Duration.between(last, now).toMinutes >= cooldown)
        if (ok) lastFired(ruleId) = now
        ok
      }
  }

  // ---- channel payload rendering (channels.py; transport injected) ----

  final case class Notification(
      title: String, message: String, severity: String, metadata: Map[String, String] = Map.empty)

  /** channels.py:144 SlackNotifier payload: blocks with a severity
    * emoji header — rendered as the exact webhook JSON body. */
  def slackPayload(n: Notification, channelOverride: Option[String] = None): String = {
    val emoji = n.severity match {
      case "critical" => ":rotating_light:"
      case "high"     => ":warning:"
      case "medium"   => ":large_orange_diamond:"
      case _          => ":information_source:"
    }
    val esc = graft.ops.Log.jsonEscape _
    val channel = channelOverride.map(c => s""""channel":"${esc(c)}",""").getOrElse("")
    s"""{$channel"text":"$emoji ${esc(n.title)}","blocks":[{"type":"header","text":{"type":"plain_text","text":"${esc(n.title)}"}},{"type":"section","text":{"type":"mrkdwn","text":"${esc(n.message)}"}}]}"""
  }

  /** channels.py:22 EmailNotifier: (subject, body) with the severity
    * tag the reference prepends. */
  def emailPayload(n: Notification): (String, String) = {
    val meta = if (n.metadata.isEmpty) ""
      else "\n\n" + n.metadata.toSeq.sortBy(_._1).map { case (k, v) => s"$k: $v" }.mkString("\n")
    (s"[${n.severity.toUpperCase}] ${n.title}", n.message + meta)
  }

  /** channels.py webhook flavor: canonical JSON (sorted metadata). */
  def webhookPayload(n: Notification): String = {
    val esc = graft.ops.Log.jsonEscape _
    val meta = n.metadata.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    s"""{"title":"${esc(n.title)}","message":"${esc(n.message)}","severity":"${n.severity}","metadata":$meta}"""
  }

  /** Deliver through injected transports: channel name → send edge
    * returning success (channels.py NotificationChannel.send). Returns
    * per-channel results; an unknown channel is a failed delivery, not
    * a crash (notifier.py:multi-channel fan-out semantics). */
  def deliver(
      n: Notification, channels: Seq[String],
      transports: Map[String, Notification => Boolean]): Map[String, Boolean] =
    channels.map(c => c -> transports.get(c).exists(send => send(n))).toMap
}
