package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.orchestration.Schedule
import graft.orchestration.Schedule._

/** Cron/interval/once next-fire arithmetic + backoff policies. */
class ScheduleSpec extends AnyFunSuite {

  private def t(s: String): LocalDateTime = LocalDateTime.parse(s)
  private def next(expr: String, after: String): String =
    Cron(expr).nextRun(t(after)).map(_.toString).orNull

  test("cron basics: every-15-min steps, daily, exact minute rollover") {
    assert(next("*/15 * * * *", "2026-03-10T10:07:00") == "2026-03-10T10:15")
    assert(next("*/15 * * * *", "2026-03-10T10:45:00") == "2026-03-10T11:00")
    assert(next("30 2 * * *", "2026-03-10T03:00:00") == "2026-03-11T02:30")
    // strictly after: a fire time equal to `after` moves to the next one
    assert(next("0 * * * *", "2026-03-10T10:00:00") == "2026-03-10T11:00")
    assert(next("5 4 * * *", "2026-03-10T04:05:00") == "2026-03-11T04:05")
  }

  test("cron lists, ranges, range-steps") {
    assert(next("0 9-17/4 * * *", "2026-03-10T09:30:00") == "2026-03-10T13:00")
    assert(next("10,40 6 * * *", "2026-03-10T06:15:00") == "2026-03-10T06:40")
    assert(next("0 0 1,15 * *", "2026-03-02T00:00:00") == "2026-03-15T00:00")
  }

  test("month boundaries: Jan 31 cron skips short months") {
    assert(next("0 0 31 * *", "2026-01-31T01:00:00") == "2026-03-31T00:00") // no Feb 31
    assert(next("0 0 29 2 *", "2026-03-01T00:00:00") == "2028-02-29T00:00") // next leap year
    assert(Cron("0 0 30 2 *").nextRun(t("2026-01-01T00:00:00")).isEmpty) // never fires
  }

  test("vixie day rule: restricted dom AND dow fire on EITHER match") {
    // 2026-03-13 is a Friday and the 13th — both match
    assert(next("0 0 13 * 5", "2026-03-01T00:00:00") == "2026-03-06T00:00") // first Friday
    assert(next("0 0 13 * 5", "2026-03-06T00:00:00") == "2026-03-13T00:00") // the 13th (both)
    assert(next("0 0 13 * 5", "2026-03-13T00:00:00") == "2026-03-20T00:00") // next Friday
    // unrestricted dom: dow alone governs; sunday accepts both 0 and 7
    assert(next("0 12 * * 0", "2026-03-10T00:00:00") == "2026-03-15T12:00")
    assert(next("0 12 * * 7", "2026-03-10T00:00:00") == "2026-03-15T12:00")
  }

  test("interval, once, convenience constructors") {
    assert(Interval(3600).nextRun(t("2026-03-10T10:07:00")).contains(t("2026-03-10T11:07:00")))
    assert(Once(t("2026-04-01T00:00:00")).nextRun(t("2026-03-10T00:00:00"))
      .contains(t("2026-04-01T00:00:00")))
    assert(Once(t("2026-04-01T00:00:00")).nextRun(t("2026-05-01T00:00:00")).isEmpty)
    assert(Schedule.daily(hour = 6, minute = 30).expression == "30 6 * * *")
    assert(Schedule.hourly(15).expression == "15 * * * *")
    assert(Schedule.weekly(dayOfWeek = 1, hour = 9).expression == "0 9 * * 1")
  }

  test("validation rejects malformed expressions") {
    intercept[IllegalArgumentException](Cron("* * * *"))       // 4 fields
    intercept[IllegalArgumentException](Cron("61 * * * *"))    // out of range
    intercept[IllegalArgumentException](Cron("* * 0 * *"))     // dom 0
    intercept[IllegalArgumentException](Cron("*/0 * * * *"))   // zero step
  }

  test("backoff: fixed and capped exponential, no overflow at high attempts") {
    assert(FixedBackoff(60).delaySeconds(7) == 60)
    val e = ExponentialBackoff(baseSeconds = 10, capSeconds = 600)
    assert(Seq(1, 2, 3, 4, 5, 6, 7, 80).map(e.delaySeconds) ==
      Seq(10, 20, 40, 80, 160, 320, 600, 600))
  }
}
