package graft.orchestration

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** Job scheduling surface (ref orchestration/scheduler.py:33-106
  * `Schedule`/`ScheduledJob`).
  *
  * The reference delegates cron arithmetic to croniter; no such
  * library exists here, so the 5-field cron grammar (minute, hour,
  * day-of-month, month, day-of-week — `*`, lists, ranges, steps) and
  * next-fire computation are implemented directly over `java.time`.
  * Everything is a pure function of (schedule, after) — the actual
  * wall-clock loop belongs to whatever process hosts the scheduler
  * (the reference's thread loop, an Airflow trigger, a k8s cron);
  * keeping time injected is what makes this testable and what a
  * driver-side job manager on a long-lived Spark cluster needs.
  *
  * Vixie-cron day rule implemented faithfully: when BOTH day-of-month
  * and day-of-week are restricted (non-`*`), a day matching EITHER
  * field fires (scheduler.py inherits this from croniter).
  */
object Schedule {

  sealed trait Spec {
    /** Strictly-after `after`, the next fire time (None = never). */
    def nextRun(after: LocalDateTime): Option[LocalDateTime]
  }

  /** scheduler.py:43 `Schedule.cron`. */
  final case class Cron(expression: String) extends Spec {
    private val Seq(minutes, hours, doms, months, dows) = {
      val fields = expression.trim.split("\\s+").toSeq
      require(fields.size == 5,
        s"cron expression needs 5 fields (minute hour dom month dow), got: $expression")
      Seq(
        parseField(fields(0), 0, 59), parseField(fields(1), 0, 23),
        parseField(fields(2), 1, 31), parseField(fields(3), 1, 12),
        // 7 is Sunday too (both 0 and 7 accepted, normalized to 0)
        parseField(fields(4), 0, 7).map(d => if (d == 7) 0 else d))
    }
    private val domRestricted = !fieldIsStar(expression.trim.split("\\s+")(2))
    private val dowRestricted = !fieldIsStar(expression.trim.split("\\s+")(4))

    private def dayMatches(t: LocalDateTime): Boolean = {
      val domOk = doms.contains(t.getDayOfMonth)
      val dowOk = dows.contains(t.getDayOfWeek.getValue % 7) // java: Mon=1..Sun=7 → cron Sun=0
      if (domRestricted && dowRestricted) domOk || dowOk // vixie either-match rule
      else domOk && dowOk
    }

    def nextRun(after: LocalDateTime): Option[LocalDateTime] = {
      var t = after.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      val bound = after.plusYears(5) // "0 0 30 2 *" never fires; don't spin forever
      while (t.isBefore(bound)) {
        if (!months.contains(t.getMonthValue))
          t = t.plusMonths(1).withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
        else if (!dayMatches(t))
          t = t.plusDays(1).truncatedTo(ChronoUnit.DAYS)
        else if (!hours.contains(t.getHour))
          t = t.plusHours(1).truncatedTo(ChronoUnit.HOURS)
        else if (!minutes.contains(t.getMinute))
          t = t.plusMinutes(1)
        else return Some(t)
      }
      None
    }
  }

  /** scheduler.py:48 `Schedule.interval`. */
  final case class Interval(seconds: Long) extends Spec {
    require(seconds > 0, "interval must be positive")
    def nextRun(after: LocalDateTime): Option[LocalDateTime] = Some(after.plusSeconds(seconds))
  }

  /** scheduler.py:54 `Schedule.once`. */
  final case class Once(runAt: LocalDateTime) extends Spec {
    def nextRun(after: LocalDateTime): Option[LocalDateTime] =
      if (runAt.isAfter(after)) Some(runAt) else None
  }

  /** scheduler.py:59/64/69 conveniences. */
  def daily(hour: Int = 0, minute: Int = 0): Cron = Cron(s"$minute $hour * * *")
  def hourly(minute: Int = 0): Cron = Cron(s"$minute * * * *")
  def weekly(dayOfWeek: Int = 0, hour: Int = 0): Cron = Cron(s"0 $hour * * $dayOfWeek")

  // ---- retry backoff (job.py:78 retry_delay_seconds, generalized) ----

  sealed trait Backoff { def delaySeconds(attempt: Int): Long }
  /** job.py's fixed `retry_delay_seconds`. */
  final case class FixedBackoff(seconds: Long) extends Backoff {
    def delaySeconds(attempt: Int): Long = seconds
  }
  /** base·2^(attempt−1), capped — deterministic (no jitter: replayable
    * schedules beat thundering-herd smoothing for a single driver). */
  final case class ExponentialBackoff(baseSeconds: Long, capSeconds: Long) extends Backoff {
    def delaySeconds(attempt: Int): Long = {
      require(attempt >= 1, "attempts are 1-based")
      val exp = attempt - 1
      // overflow-safe: beyond 62 doublings (or multiplication overflow)
      // the cap has long since won
      val raw =
        if (exp >= 62) Long.MaxValue
        else if (baseSeconds > (Long.MaxValue >> exp)) Long.MaxValue
        else baseSeconds << exp
      math.min(capSeconds, raw)
    }
  }

  // ---- cron field grammar ----

  private def fieldIsStar(f: String): Boolean = f == "*" || f.startsWith("*/")

  /** Star, star-slash-step, single values, ranges, range-steps, and
    * comma lists thereof. */
  private[orchestration] def parseField(field: String, lo: Int, hi: Int): Set[Int] =
    field.split(",").toSeq.flatMap { part =>
      val (rangePart, step) = part.split("/") match {
        case Array(r)    => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field: $part")
      }
      require(step >= 1, s"bad cron step in $part")
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-"); (x.toInt, y.toInt)
        case n => val v = n.toInt; (v, v)
      }
      require(a >= lo && b <= hi && a <= b, s"cron field $part out of range [$lo,$hi]")
      (a to b by step)
    }.toSet
}
