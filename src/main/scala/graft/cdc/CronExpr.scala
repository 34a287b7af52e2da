package graft.cdc

import java.time.{DayOfWeek, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** 5-field cron matcher (minute hour day-of-month month day-of-week) for
  * pull scheduling (reference: Quartz `CronExpression` in
  * DataPullTableUtil.scala:98-101; Quartz isn't available offline, and the
  * pull scheduler only needs "is due / next fire").
  *
  * Supported syntax per field: `*`, `?`, `n`, `a-b`, `a,b,c`, `*&#47;s`,
  * `a-b/s`, plus the Quartz extras reference configs use:
  *
  *   - day-of-month: `L` (last day), `L-n` (n days before last), `LW` (last
  *     weekday), `nW` (nearest weekday to day n, within the month)
  *   - day-of-week: `dL` (last weekday d of the month), `d#n` (the nth
  *     weekday d of the month); days are cron-style 0-7 with 0 and 7 = Sunday
  *
  * Restricted day-of-month AND day-of-week must both match (Quartz requires
  * `?` on one side; passing `?`/`*` for the unused side reproduces its
  * behavior exactly).
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
        case "*" | "?" => (min, max)
        case r if r.contains('-') =>
          val Array(a, b) = r.split('-'); (a.toInt, b.toInt)
        case n => val v = n.toInt; (v, v)
      }
      (lo to hi by step)
    }.toSet

  private val mins = parseField(minF, 0, 59)
  private val hours = parseField(hourF, 0, 23)
  private val mons = parseField(monF, 1, 12)

  private def isWeekday(t: ZonedDateTime): Boolean = {
    val d = t.getDayOfWeek
    d != DayOfWeek.SATURDAY && d != DayOfWeek.SUNDAY
  }

  /** Nearest weekday (Mon-Fri) to day `n`, staying inside the month —
    * Quartz `nW` semantics.
    */
  private def nearestWeekday(t: ZonedDateTime, n: Int): Int = {
    val len = t.toLocalDate.lengthOfMonth
    val day = math.min(n, len)
    val target = t.toLocalDate.withDayOfMonth(day)
    target.getDayOfWeek match {
      case DayOfWeek.SATURDAY => if (day > 1) day - 1 else day + 2
      case DayOfWeek.SUNDAY   => if (day < len) day + 1 else day - 2
      case _ => day
    }
  }

  private val DomLMinus = raw"L-(\d+)".r
  private val DomW = raw"(\d+)W".r
  private val DowLast = raw"(\d+)L".r
  private val DowNth = raw"(\d+)#(\d+)".r

  private val domMatch: ZonedDateTime => Boolean = domF match {
    case "L" => t => t.getDayOfMonth == t.toLocalDate.lengthOfMonth
    case DomLMinus(n) => t => t.getDayOfMonth == t.toLocalDate.lengthOfMonth - n.toInt
    case "LW" => t =>
      isWeekday(t) && {
        val len = t.toLocalDate.lengthOfMonth
        val lastDow = t.toLocalDate.withDayOfMonth(len).getDayOfWeek
        val lw = lastDow match {
          case DayOfWeek.SATURDAY => len - 1
          case DayOfWeek.SUNDAY   => len - 2
          case _ => len
        }
        t.getDayOfMonth == lw
      }
    case DomW(n) => t => t.getDayOfMonth == nearestWeekday(t, n.toInt)
    case f =>
      val set = parseField(f, 1, 31)
      t => set(t.getDayOfMonth)
  }

  private val dowMatch: ZonedDateTime => Boolean = dowF match {
    case DowLast(d) => t =>
      t.getDayOfWeek.getValue % 7 == d.toInt % 7 &&
        t.getDayOfMonth + 7 > t.toLocalDate.lengthOfMonth // no same weekday later
    case DowNth(d, n) => t =>
      t.getDayOfWeek.getValue % 7 == d.toInt % 7 &&
        (t.getDayOfMonth - 1) / 7 + 1 == n.toInt
    case f =>
      val set = parseField(f, 0, 7).map(_ % 7) // 0 and 7 = Sunday
      t => set(t.getDayOfWeek.getValue % 7)
  }

  def matches(t: ZonedDateTime): Boolean =
    mins(t.getMinute) && hours(t.getHour) && domMatch(t) &&
      mons(t.getMonthValue) && dowMatch(t)

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
