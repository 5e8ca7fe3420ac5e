package graft.services

import java.time.{Duration, LocalDateTime}
import java.util.Locale

import graft.services.Alerts.Notification

/** Event-driven notification service
  * (ref notifications/event_service.py:45 `NotificationEventService`).
  *
  * The reference connects pipeline/job/validation events to alert
  * rules loaded from a database, with per-rule trigger throttling and
  * channel fan-out. Here the same machine is a deterministic driver
  * -side component composing with [[Alerts]]: rules match on event
  * type + detail conditions (event_service.py:240
  * `_evaluate_condition` — equals / contains / greater_than /
  * less_than, missing keys skip the check), firing passes through
  * per-rule cooldown AND an identical-event dedupe window, and
  * delivery fans out through the injected transport map with
  * per-channel success accounting (event_service.py:218). Driver-side
  * is the right scale by design: #events ≈ #pipeline runs, not #rows
  * — the ROW-scale half of alerting is [[Alerts.evaluate]]'s one-pass
  * DataFrame rule evaluation, whose output feeds [[emit]] here.
  *
  * Time is injected everywhere (the host loop owns the clock — same
  * stance as [[Alerts.Manager]] and [[graft.orchestration.Schedule]]).
  */
object Events {

  /** event_service.py:26 `EventType`. */
  val EventTypes: Set[String] = Set(
    "pipeline_started", "pipeline_completed", "pipeline_failed",
    "job_started", "job_completed", "job_failed",
    "validation_passed", "validation_failed", "data_quality_alert",
    "connector_connected", "connector_failed",
    "system_error", "custom")

  final case class Event(
      eventType: String,
      title: String,
      message: String,
      severity: String = "info",
      source: Option[String] = None,
      details: Map[String, Any] = Map.empty) {
    require(EventTypes.contains(eventType), s"unknown event type: $eventType")
  }

  /** event_service.py:240 condition vocabulary. A condition on a key
    * the event does not carry PASSES (the reference's `continue`) —
    * conditions narrow on what is present, they don't demand
    * presence. */
  sealed trait Condition { def key: String; def holds(details: Map[String, Any]): Boolean }

  private def numeric(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue)
    case s: String => s.toDoubleOption
    case _         => None
  }

  final case class Equals(key: String, value: Any) extends Condition {
    def holds(d: Map[String, Any]): Boolean = d.get(key).forall(_ == value)
  }
  final case class Contains(key: String, substring: String) extends Condition {
    def holds(d: Map[String, Any]): Boolean =
      d.get(key).forall(_.toString.contains(substring))
  }
  final case class GreaterThan(key: String, value: Double) extends Condition {
    def holds(d: Map[String, Any]): Boolean =
      d.get(key).forall(v => numeric(v).exists(_ > value))
  }
  final case class LessThan(key: String, value: Double) extends Condition {
    def holds(d: Map[String, Any]): Boolean =
      d.get(key).forall(v => numeric(v).exists(_ < value))
  }

  /** db AlertRuleModel's deterministic fields: which event types the
    * rule listens to, detail conditions, severity override, channels,
    * and the trigger cooldown (`can_trigger_alert`). */
  final case class EventRule(
      ruleId: String,
      eventTypes: Set[String],
      conditions: Seq[Condition] = Seq.empty,
      severity: String = "medium",
      channels: Seq[String] = Seq.empty,
      cooldownMinutes: Int = 15,
      enabled: Boolean = true) {
    require(Alerts.Severities.contains(severity), s"severity must be one of ${Alerts.Severities}")
    def matches(e: Event): Boolean =
      enabled && eventTypes.contains(e.eventType) && conditions.forall(_.holds(e.details))
  }

  final case class FiredAlert(
      ruleId: String,
      event: Event,
      deliveries: Map[String, Boolean])

  final case class EmitResult(
      sent: Boolean,
      fired: Seq[FiredAlert],
      suppressedByCooldown: Seq[String],
      suppressedAsDuplicate: Boolean)

  /** The service: rules + transports, with cooldown state per rule and
    * a dedupe window over identical (type, source, title) events —
    * a crash-looping pipeline emits ONE page, not one per retry. */
  final class Service(
      rules: Seq[EventRule],
      transports: Map[String, Notification => Boolean],
      dedupeWindowMinutes: Int = 5) {

    private val lastFired = scala.collection.mutable.Map.empty[String, LocalDateTime]
    private val lastSeen = scala.collection.mutable.Map.empty[(String, Option[String], String), LocalDateTime]

    /** event_service.py:159 `emit_event`: dedupe → rule match →
      * per-rule cooldown → channel fan-out. Returns what fired, what
      * was suppressed, and per-channel delivery results. */
    def emit(event: Event, now: LocalDateTime): EmitResult = {
      val dedupeKey = (event.eventType, event.source, event.title)
      val dup = lastSeen.get(dedupeKey).exists(last =>
        Duration.between(last, now).toMinutes < dedupeWindowMinutes)
      // Fixed-window dedupe: a suppressed event must NOT refresh the
      // window, or a failure recurring faster than the window is
      // silenced forever after its first page — the per-rule cooldown
      // is the intended re-arm, and it only sees events that pass here.
      if (dup) return EmitResult(sent = false, Seq.empty, Seq.empty, suppressedAsDuplicate = true)
      lastSeen(dedupeKey) = now

      val matching = rules.filter(_.matches(event))
      val (ready, cooling) = matching.partition { r =>
        lastFired.get(r.ruleId).forall(last =>
          Duration.between(last, now).toMinutes >= r.cooldownMinutes)
      }
      val fired = ready.map { r =>
        lastFired(r.ruleId) = now
        val n = Notification(event.title, event.message, r.severity,
          event.details.map { case (k, v) => k -> v.toString })
        FiredAlert(r.ruleId, event, Alerts.deliver(n, r.channels, transports))
      }
      EmitResult(
        sent = fired.exists(_.deliveries.values.exists(identity)),
        fired = fired,
        suppressedByCooldown = cooling.map(_.ruleId),
        suppressedAsDuplicate = false)
    }

    // ---- convenience emitters (event_service.py:263-441), rendering
    // ---- the reference's exact message shapes ----

    private def fmt(d: Double): String = String.format(Locale.US, "%.1f", d)
    private def thousands(n: Long): String = String.format(Locale.US, "%,d", n)

    def pipelineStarted(name: String, id: String, now: LocalDateTime): EmitResult =
      emit(Event("pipeline_started", s"Pipeline Started: $name",
        s"Pipeline '$name' has started execution.", "info", Some(name),
        Map("pipeline_id" -> id, "pipeline_name" -> name)), now)

    def pipelineCompleted(
        name: String, id: String, durationSeconds: Double, rowsProcessed: Long,
        now: LocalDateTime): EmitResult =
      emit(Event("pipeline_completed", s"Pipeline Completed: $name",
        s"Pipeline '$name' completed in ${fmt(durationSeconds)}s, " +
          s"processed ${thousands(rowsProcessed)} rows.", "info", Some(name),
        Map("pipeline_id" -> id, "pipeline_name" -> name,
          "duration_seconds" -> durationSeconds, "rows_processed" -> rowsProcessed)), now)

    def pipelineFailed(
        name: String, id: String, error: String, step: Option[String],
        now: LocalDateTime): EmitResult = {
      val at = step.map(s => s" at step '$s'").getOrElse("")
      emit(Event("pipeline_failed", s"Pipeline Failed: $name",
        s"Pipeline '$name' failed$at: $error", "critical", Some(name),
        Map("pipeline_id" -> id, "pipeline_name" -> name, "error" -> error) ++
          step.map("step" -> _)), now)
    }

    def jobFailed(name: String, id: String, error: String, now: LocalDateTime): EmitResult =
      emit(Event("job_failed", s"Job Failed: $name",
        s"Scheduled job '$name' failed: $error", "high", Some(name),
        Map("job_id" -> id, "job_name" -> name, "error" -> error)), now)

    def validationFailed(
        tableName: String, ruleName: String, failedRows: Long, totalRows: Long,
        now: LocalDateTime): EmitResult =
      emit(Event("validation_failed", s"Validation Failed: $ruleName",
        s"Validation rule '$ruleName' failed on table '$tableName': " +
          s"${thousands(failedRows)}/${thousands(totalRows)} rows failed.",
        "high", Some(tableName),
        Map("table_name" -> tableName, "rule_name" -> ruleName,
          "failed_rows" -> failedRows, "total_rows" -> totalRows,
          "failure_rate" -> (if (totalRows > 0) failedRows.toDouble / totalRows else 0.0))), now)

    def dataQualityAlert(
        tableName: String, issues: Seq[String], severity: String,
        now: LocalDateTime): EmitResult =
      emit(Event("data_quality_alert", s"Data Quality Alert: $tableName",
        s"Data quality issues found in '$tableName':\n" +
          issues.map(i => s"- $i").mkString("\n"), severity, Some(tableName),
        Map("table_name" -> tableName, "issues" -> issues.mkString("; "),
          "issue_count" -> issues.size)), now)

    def systemError(component: String, error: String, now: LocalDateTime): EmitResult =
      emit(Event("system_error", s"System Error: $component",
        s"A system error occurred in '$component': $error", "critical", Some(component),
        Map("component" -> component, "error" -> error)), now)
  }
}
