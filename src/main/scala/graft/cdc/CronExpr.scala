package graft.cdc

import java.time.ZonedDateTime
import java.time.temporal.ChronoUnit

/** Minimal 5-field cron matcher (minute hour day-of-month month day-of-week)
  * for pull scheduling (reference: Quartz `CronExpression` in
  * DataPullTableUtil.scala:98-101; Quartz isn't available offline, and the
  * pull scheduler only needs "is due / next fire").
  *
  * Supported syntax per field: `*`, `n`, `a-b`, `a,b,c`, `*&#47;s`, `a-b/s`.
  */
final case class CronExpr(expr: String) {
  private val Array(minF, hourF, domF, monF, dowF) = {
    val parts = expr.trim.split("\\s+")
    require(parts.length == 5, s"cron '$expr' must have 5 fields")
    parts
  }

  private def parseField(f: String, min: Int, max: Int): Set[Int] =
    f.split(',').flatMap { part =>
      val (rangePart, step) = part.split('/') match {
        case Array(r)    => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field '$part'")
      }
      val (lo, hi) = rangePart match {
        case "*" => (min, max)
        case r if r.contains('-') =>
          val Array(a, b) = r.split('-'); (a.toInt, b.toInt)
        case n => val v = n.toInt; (v, v)
      }
      (lo to hi by step)
    }.toSet

  private val mins = parseField(minF, 0, 59)
  private val hours = parseField(hourF, 0, 23)
  private val doms = parseField(domF, 1, 31)
  private val mons = parseField(monF, 1, 12)
  private val dows = parseField(dowF, 0, 7).map(_ % 7) // 0 and 7 = Sunday

  def matches(t: ZonedDateTime): Boolean =
    mins(t.getMinute) && hours(t.getHour) && doms(t.getDayOfMonth) &&
      mons(t.getMonthValue) && dows(t.getDayOfWeek.getValue % 7)

  /** Next fire time strictly after `t` (minute resolution; bounded scan). */
  def nextAfter(t: ZonedDateTime): ZonedDateTime = {
    var c = t.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = t.plusYears(4)
    while (!matches(c)) {
      c = c.plusMinutes(1)
      if (c.isAfter(limit))
        throw new IllegalStateException(s"cron '$expr' never fires")
    }
    c
  }
}
