package graft.core

import java.time.{DayOfWeek, LocalDate, LocalDateTime, Month, ZoneOffset}
import scala.util.matching.Regex

/** Graphite-style `from`/`until` datetime expression parser.
  *
  * Re-implements the grammar of the reference's query-time parser
  * (reference: blueflood-http/.../utils/DateTimeParser.java:29-196):
  * epoch seconds, `HH:mm yyyyMMdd`, `now`/`today`/`yesterday`/`tomorrow`,
  * `noon`/`teatime`/`midnight`, `h:mm[am|pm]`, date forms
  * `MM/dd/yy[yy]`, `yyyyMMdd`, `MonthNameDD[YYYY]`, day-of-week names, and
  * trailing signed offsets like `-4h`, `+30min`, `-2mon`.
  *
  * A pure plan-build-time function: it produces a millisecond literal that
  * feeds a Catalyst filter; it is never evaluated per-row. All arithmetic is
  * UTC (the engine pins spark.sql.session.timeZone=UTC).
  */
object DateTimeParser {

  def parseMillis(s: String, nowMillis: Long = System.currentTimeMillis()): Long = {
    val cleaned = s.replace(" ", "").replace(",", "").replace("_", "").toLowerCase
    if (cleaned.nonEmpty && cleaned.forall(_.isDigit) && !isLikelyDateTime(cleaned))
      return cleaned.toLong * 1000L

    parseHHmmYYYYMMdd(cleaned) match {
      case Some(ms) => return ms
      case None     =>
    }

    val (dtPart, offset) = splitOffset(cleaned)
    val base = LocalDateTime.ofEpochSecond(nowMillis / 1000, 0, ZoneOffset.UTC)
    val (timed, afterTime) = updateTime(base, dtPart)
    var result = updateDate(timed, afterTime)
    if (offset.nonEmpty) result = applyOffset(result, offset)
    result.toInstant(ZoneOffset.UTC).toEpochMilli
  }

  /** 8-digit strings that look like yyyyMMdd are dates, not epochs
    * (reference: DateTimeParser.java isLikelyDateTime). */
  private def isLikelyDateTime(s: String): Boolean =
    s.length == 8 && s.substring(0, 4).toInt > 1900 &&
      s.substring(4, 6).toInt < 13 && s.substring(6).toInt < 32

  private val hhmmDate: Regex = """(\d{1,2}):(\d{2})(\d{8})""".r
  private def parseHHmmYYYYMMdd(s: String): Option[Long] = s match {
    case hhmmDate(h, m, ymd) if ymd.substring(4, 6).toInt <= 12 =>
      try {
        val d = LocalDate.of(ymd.substring(0, 4).toInt, ymd.substring(4, 6).toInt, ymd.substring(6).toInt)
        Some(d.atTime(h.toInt, m.toInt).toInstant(ZoneOffset.UTC).toEpochMilli)
      } catch { case _: Exception => None }
    case _ => None
  }

  private def splitOffset(s: String): (String, String) =
    if (s.contains("+")) { val p = s.split("\\+", 2); (p(0), if (p.length > 1) p(1) else "") }
    else if (s.contains("-")) { val p = s.split("-", 2); (p(0), if (p.length > 1) "-" + p(1) else "") }
    else (s, "")

  private val timeRe: Regex = """(\d{1,2}):(\d{2})([ap]m)?(.*)""".r

  /** Returns (datetime with time-of-day applied, remaining date string). */
  private def updateTime(base: LocalDateTime, dtIn: String): (LocalDateTime, String) = {
    val truncated = base.withSecond(0).withNano(0)
    if (dtIn.isEmpty || dtIn.contains("now")) return (truncated, dtIn.replace("now", ""))
    var dt = dtIn
    var hour = 0
    var minute = 0
    dt match {
      case timeRe(h, m, ampm, rest) =>
        hour = h.toInt; minute = m.toInt
        if (ampm == "pm") hour = (hour + 12) % 24
        dt = rest
      case _ =>
    }
    if (dt.contains("noon")) { hour = 12; dt = dt.replace("noon", "") }
    else if (dt.contains("teatime")) { hour = 16; dt = dt.replace("teatime", "") }
    else if (dt.contains("midnight")) dt = dt.replace("midnight", "")
    (truncated.withHour(hour).withMinute(minute), dt)
  }

  private val monthNames: Map[String, Int] =
    Month.values().map(m => m.toString.toLowerCase -> m.getValue).toMap ++
      Month.values().map(m => m.toString.toLowerCase.take(3) -> m.getValue).toMap
  private val dayNames: Map[String, DayOfWeek] =
    DayOfWeek.values().map(d => d.toString.toLowerCase -> d).toMap ++
      DayOfWeek.values().map(d => d.toString.toLowerCase.take(3) -> d).toMap

  private val slashDate: Regex = """(\d{1,2})/(\d{1,2})/(\d{2}|\d{4})""".r
  private val compactDate: Regex = """(\d{4})(\d{2})(\d{2})""".r
  private val monthDayYear: Regex = """([a-z]+)(\d{1,2})(\d{4})""".r
  private val monthDay: Regex = """([a-z]+)(\d{1,2})""".r

  private def updateDate(base0: LocalDateTime, dtIn: String): LocalDateTime = {
    var base = base0
    var dt = dtIn
    if (dt.contains("tomorrow")) { base = base.plusDays(1); dt = dt.replace("tomorrow", "") }
    else if (dt.contains("yesterday")) { base = base.minusDays(1); dt = dt.replace("yesterday", "") }
    else if (dt.contains("today")) dt = dt.replace("today", "")
    if (dt.isEmpty) return base

    dt match {
      case slashDate(mm, dd, yy) =>
        val year = if (yy.length == 2) 2000 + yy.toInt else yy.toInt
        return base.withYear(year).withMonth(mm.toInt).withDayOfMonth(dd.toInt)
      case compactDate(y, m, d) if m.toInt >= 1 && m.toInt <= 12 =>
        return base.withYear(y.toInt).withMonth(m.toInt).withDayOfMonth(d.toInt)
      case monthDayYear(mon, dd, y) if monthNames.contains(mon) =>
        return base.withYear(y.toInt).withMonth(monthNames(mon)).withDayOfMonth(dd.toInt)
      case monthDay(mon, dd) if monthNames.contains(mon) =>
        // month-day keeps the base year (reference: DateTimeParser.java:150-156)
        return base.withMonth(monthNames(mon)).withDayOfMonth(dd.toInt)
      case _ =>
    }
    dayNames.get(dt) match {
      case Some(dow) =>
        var b = base
        while (b.getDayOfWeek != dow) b = b.minusDays(1)
        b
      case None => base
    }
  }

  private val offsetRe: Regex = """(-?\d+)([a-z]*)""".r
  private def applyOffset(base: LocalDateTime, offset: String): LocalDateTime = offset match {
    case offsetRe(n, unit) =>
      val count = n.toInt
      if (unit.startsWith("s")) base.plusSeconds(count)
      else if (unit.startsWith("min")) base.plusMinutes(count)
      else if (unit.startsWith("h")) base.plusHours(count)
      else if (unit.startsWith("d")) base.plusDays(count)
      else if (unit.startsWith("mon")) base.plusMonths(count)
      else if (unit.startsWith("y")) base.plusYears(count)
      else base
    case _ => base
  }
}
