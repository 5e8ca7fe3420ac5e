package graft.ops

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** Structured JSON log/event surface (ref utils/logging.py:1-430):
  * the reference configures structlog with an ISO-UTC timestamper,
  * level + logger-name fields, bound request/pipeline context
  * propagation, and a sanitizer that redacts credential-shaped keys —
  * then every pipeline stage and extraction emits one event dict per
  * transition. This object is that vocabulary as a dependency-free
  * emitter: one JSON line per event, bound context merged into every
  * event, sensitive keys `[REDACTED]`, injected clock so suites
  * assert the stream deterministically.
  *
  * Spark-first note: this is DRIVER-side orchestration telemetry
  * (stage transitions, per-table extraction reports — O(stages) and
  * O(tables) event volume), not a per-row logging path; nothing here
  * ever executes inside a task, so the emitter needs no serialization
  * story and can hold plain driver state. Per-row observability at
  * 100 TB rides [[org.apache.spark.sql.Observation]] metrics
  * (BatchExtract) and the SQL metrics UI, never a log call in a hot
  * loop.
  */
object Log {

  /** logging.py:57-63 sensitive_keys — key SUBSTRINGS that force
    * redaction (matching is case-insensitive substring, exactly the
    * reference's `any(s in key_lower …)`). */
  val SensitiveKeys: Set[String] = Set(
    "password", "secret", "token", "api_key", "apikey",
    "authorization", "auth", "credential", "private_key",
    "access_key", "secret_key", "connection_string")

  private def redacts(key: String): Boolean = {
    val k = key.toLowerCase
    SensitiveKeys.exists(k.contains)
  }

  /** The four wire-envelope keys (timestamp/level/logger/event) always
    * carry the Event struct's values: a caller field with a colliding
    * name is dropped AT EMIT TIME, before the Event is built, so
    * `fields`, the history surface, and the wire line all agree on
    * what the event is. */
  val EnvelopeKeys: Set[String] = Set("timestamp", "level", "logger", "event")

  /** One emitted event: level + event name + merged (context ++
    * fields) in insertion order. [[Emitter.emit]] guarantees `fields`
    * never contains an [[EnvelopeKeys]] key; `json` re-filters anyway
    * so a hand-constructed Event can't smuggle one onto the wire. */
  final case class Event(
      tsMs: Long, level: String, event: String, fields: ListMap[String, String]) {
    def json(service: String): String = {
      val base = ListMap(
        "timestamp" -> java.time.Instant.ofEpochMilli(tsMs).toString,
        "level" -> level,
        "logger" -> service,
        "event" -> event)
      (base ++ fields.filter { case (k, _) => !base.contains(k) })
        .map { case (k, v) => s"${q(k)}:${q(v)}" }
        .mkString("{", ",", "}")
    }
  }

  /** JSON string-body escaping (no surrounding quotes) — the ONE
    * escaper shared by every hand-rolled JSON emitter in the library
    * (this file's events, Verify's oracle dump, Alerts' webhook
    * payloads): quote, backslash, and ALL control characters — a
    * newline in a notification title must never produce an invalid
    * payload. */
  def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** [[jsonEscape]] with the surrounding quotes. */
  def jsonQuote(s: String): String = "\"" + jsonEscape(s) + "\""

  private def q(s: String): String = jsonQuote(s)

  /** The emitter: `bind` context keys (logging.py's ContextVar
    * propagation — pipeline_id/request_id ride every subsequent
    * event), `info`/`warn`/`error` emit one sanitized JSON line to
    * `sink` and append to the bounded in-memory `history` (the test /
    * inspection surface; oldest events drop first, the emitter never
    * grows without bound on a long-running driver). Thread-safe: the
    * driver-side pools in BatchExtract emit concurrently. */
  final class Emitter(
      service: String = "graft",
      sink: String => Unit = _ => (),
      clock: () => Long = () => System.currentTimeMillis(),
      sanitize: Boolean = true,
      maxHistory: Int = 1000) {
    require(maxHistory >= 1, s"maxHistory must be positive, got $maxHistory")
    private val bound = mutable.LinkedHashMap.empty[String, String]
    private val events = mutable.ArrayDeque.empty[Event]

    /** logging.py contextvars: every later event carries k=v. */
    def bind(kvs: (String, Any)*): this.type = synchronized {
      kvs.foreach { case (k, v) => bound(k) = String.valueOf(v) }
      this
    }

    def unbind(keys: String*): this.type = synchronized {
      keys.foreach(bound.remove); this
    }

    def info(event: String, fields: (String, Any)*): Event = emit("info", event, fields)
    def warn(event: String, fields: (String, Any)*): Event = emit("warning", event, fields)
    def error(event: String, fields: (String, Any)*): Event = emit("error", event, fields)

    // The sink runs OUTSIDE the monitor: a slow collector must not
    // serialize every concurrently-extracting table on the emitter
    // lock (or deadlock against a sink that itself logs from another
    // thread). History order stays authoritative; under contention two
    // threads' wire lines may reach the sink in the opposite order.
    private def emit(level: String, event: String, fields: Seq[(String, Any)]): Event = {
      val (e, line) = synchronized {
        val merged = ListMap.from(
          (bound.toSeq ++ fields.map { case (k, v) => k -> String.valueOf(v) })
            .filter { case (k, _) => !EnvelopeKeys.contains(k) }
            .map { case (k, v) =>
              k -> (if (sanitize && redacts(k)) "[REDACTED]" else v)
            })
        val ev = Event(clock(), level, event, merged)
        events.append(ev)
        if (events.size > maxHistory) events.removeHead()
        (ev, ev.json(service))
      }
      sink(line)
      e
    }

    /** logging.py:226 `log_execution_time`, as a combinator instead of
      * a decorator: run `body`, emit `operation_completed` with
      * function/duration/status on success, `operation_failed` (level
      * error, exception preserved and RETHROWN — the reference
      * re-raises too) on failure. Durations come from the injected
      * clock, so suites assert them exactly. */
    def timed[A](operation: String, level: String = "info")(body: => A): A = {
      val t0 = clock()
      try {
        val r = body
        emit(level, "operation_completed", Seq(
          "function" -> operation, "duration_ms" -> (clock() - t0),
          "status" -> "success"))
        r
      } catch {
        case e: Throwable =>
          emit("error", "operation_failed", Seq(
            "function" -> operation, "duration_ms" -> (clock() - t0),
            "status" -> "error",
            "error" -> s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          throw e
      }
    }

    /** Emitted events, oldest first (bounded at `maxHistory`). */
    def history: Seq[Event] = synchronized(events.toSeq)

    /** The JSON lines of [[history]] — what a collector would have
      * received, re-renderable deterministically from the events. */
    def jsonLines: Seq[String] = synchronized(events.toSeq.map(_.json(service)))
  }

  /** logging.py:326 `AuditLogger`, DATA-MODIFICATION flavor
    * (`log_data_event`: `data.<operation>` + table + rows_affected +
    * event_type): the audit family that belongs to a data engine. The
    * reference's auth/access/admin audit events are its web-platform
    * auth stack — out of deterministic scope with the rest of
    * `ui/ api/ auth/` (SURVEY §2 adjudication), so they are not
    * mirrored here. */
  final class Audit(log: Emitter) {
    def dataEvent(
        operation: String, table: String,
        rowsAffected: Option[Long],
        details: (String, Any)*): Event =
      log.info(s"data.$operation",
        Seq[(String, Any)]("event_type" -> "data_modification", "table" -> table) ++
          rowsAffected.map(r => "rows_affected" -> (r: Any)) ++ details: _*)
  }
}
