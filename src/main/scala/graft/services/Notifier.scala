package graft.services

import graft.services.Alerts.Notification

/** Central notification manager (ref notifications/notifier.py:63
  * `Notifier`): the top-level channel REGISTRY that
  * [[Alerts.deliver]]'s per-call transport map deliberately isn't —
  * `addChannel`/`removeChannel` named channels once, then every send
  * fans out to all of them (or a named subset), gated by a minimum
  * severity and a per-minute rate limit, with bounded history.
  *
  * A channel is the reference's `NotificationChannel` ABC: a send
  * edge plus a connection probe. Payload RENDERING stays in
  * [[Alerts]] (slackPayload/emailPayload/webhookPayload) — a channel
  * composes a renderer with an injected transport, so this class
  * holds no I/O of its own and tests drive it hermetically.
  *
  * Severity ordering accepts BOTH vocabularies in play — the
  * reference's notifier levels (debug/info/warning/error/critical)
  * and the alert rules' severities (low/medium/high/critical) — so an
  * [[Alerts.evaluate]] row feeds straight through without mapping.
  *
  * Driver-side by design, like [[Alerts.Manager]]: notifications per
  * run ≈ violated rules, not rows. The clock is injected for the rate
  * limiter so behavior is deterministic under test. */
final class Notifier(
    minSeverity: String = "info",
    ratePerMinute: Option[Int] = None,
    maxHistory: Int = 1000,
    nowMs: () => Long = () => System.currentTimeMillis()) {

  import Notifier._
  require(rank.contains(minSeverity),
    s"unknown minSeverity '$minSeverity'; one of ${rank.keys.toSeq.sorted.mkString(", ")}")
  require(ratePerMinute.forall(_ > 0), "ratePerMinute must be positive")
  require(maxHistory >= 0, "maxHistory must be >= 0")

  private val channels = scala.collection.mutable.LinkedHashMap.empty[String, Channel]
  private val sent = scala.collection.mutable.ArrayDeque.empty[Notification]
  private var windowStartMs = nowMs()
  private var windowCount = 0

  /** notifier.py:94 `add_channel` (later add of the same name wins,
    * like the reference's dict assignment). */
  def addChannel(name: String, channel: Channel): Unit =
    synchronized { channels(name) = channel }

  /** notifier.py:99 `remove_channel`. */
  def removeChannel(name: String): Boolean =
    synchronized { channels.remove(name).isDefined }

  def channelNames: Seq[String] = synchronized { channels.keys.toSeq }

  /** notifier.py `test_connection` fan-out: probe one channel or all,
    * name → reachable (an unknown name probes false, not a crash). */
  def testConnections(names: Seq[String] = Nil): Map[String, Boolean] = synchronized {
    val targets = if (names.isEmpty) channels.keys.toSeq else names
    targets.map(n => n -> channels.get(n).exists(c =>
      try c.testConnection() catch { case _: Exception => false })).toMap
  }

  /** notifier.py:153 `send_notification`: severity gate → rate gate →
    * history → fan-out; a channel that throws is a failed delivery,
    * not a crash, and success means AT LEAST ONE channel accepted
    * (the reference's any-success contract). */
  def send(n: Notification, only: Seq[String] = Nil): Boolean = synchronized {
    if (rank.getOrElse(n.severity, rank("info")) < rank(minSeverity)) return false
    val now = nowMs()
    if (now - windowStartMs >= 60000L) { windowStartMs = now; windowCount = 0 }
    if (ratePerMinute.exists(windowCount >= _)) return false
    sent.append(n)
    if (sent.length > maxHistory) sent.removeHead()
    val targets = if (only.isEmpty) channels.toSeq
      else only.flatMap(name => channels.get(name).map(name -> _))
    var ok = false
    targets.foreach { case (_, c) =>
      val accepted = try c.send(n) catch { case _: Exception => false }
      if (accepted) { ok = true; windowCount += 1 }
    }
    ok
  }

  /** notifier.py:192-204 severity conveniences. */
  def info(title: String, message: String): Boolean =
    send(Notification(title, message, "info"))
  def warning(title: String, message: String): Boolean =
    send(Notification(title, message, "warning"))
  def error(title: String, message: String): Boolean =
    send(Notification(title, message, "error"))

  /** notifier.py history, most recent last. */
  def history: Seq[Notification] = synchronized { sent.toSeq }
}

object Notifier {

  /** notifier.py:49 `NotificationChannel`. */
  trait Channel {
    def send(n: Notification): Boolean
    def testConnection(): Boolean
  }

  /** Merged severity order: reference notifier levels interleaved
    * with the alert-rule vocabulary at their natural ranks. */
  val rank: Map[String, Int] = Map(
    "debug" -> 0, "info" -> 1, "low" -> 1, "medium" -> 2, "warning" -> 2,
    "high" -> 3, "error" -> 3, "critical" -> 4)

  /** Bridge a rendered payload to an injected transport — the shape
    * every concrete channel (Slack webhook, SMTP, generic webhook)
    * takes: `Notifier.channel(Alerts.slackPayload(_), post, probe)`. */
  def channel(
      render: Notification => String,
      transport: String => Boolean,
      probe: () => Boolean = () => true): Channel = new Channel {
    def send(n: Notification): Boolean = transport(render(n))
    def testConnection(): Boolean = probe()
  }
}
