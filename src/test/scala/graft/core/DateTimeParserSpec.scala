package graft.core

import org.scalatest.funsuite.AnyFunSuite

class DateTimeParserSpec extends AnyFunSuite {
  // fixed "now": 2024-01-20 10:37:42 UTC
  private val now = 1705747062000L
  private def p(s: String) = DateTimeParser.parseMillis(s, now)
  private val jan20_0000 = 1705708800000L

  test("epoch seconds pass through as millis") {
    assert(p("1704067200") === 1704067200000L)
  }

  test("8-digit strings that look like dates are dates, not epochs") {
    assert(p("20240105") === 1704412800000L) // 2024-01-05 00:00 UTC
  }

  test("HH:mm yyyyMMdd") {
    assert(p("14:30 20240110") === 1704897000000L)
  }

  test("now truncates to the minute") {
    assert(p("now") === 1705747020000L)
  }

  test("today / yesterday / tomorrow at midnight-relative times") {
    assert(p("00:00 today") === jan20_0000)
    assert(p("00:00 yesterday") === jan20_0000 - 86400000L)
    assert(p("00:00 tomorrow") === jan20_0000 + 86400000L)
  }

  test("noon, teatime, midnight") {
    assert(p("noon today") === jan20_0000 + 12L * 3600000L)
    assert(p("teatime today") === jan20_0000 + 16L * 3600000L)
    assert(p("midnight today") === jan20_0000)
  }

  test("am/pm clock times") {
    assert(p("8:50pm today") === jan20_0000 + (20L * 3600 + 50 * 60) * 1000)
    assert(p("8:50 today") === jan20_0000 + (8L * 3600 + 50 * 60) * 1000)
  }

  test("offsets: -4h, +30min, -2mon") {
    assert(p("00:00 today-4h") === jan20_0000 - 4L * 3600000L)
    assert(p("00:00 today+30min") === jan20_0000 + 30L * 60000L)
    assert(p("00:00 today-7d") === jan20_0000 - 7L * 86400000L)
  }

  test("month and year offsets") {
    assert(p("00:00 today-2mon") === 1700438400000L) // 2023-11-20
    assert(p("00:00 today+1y") === jan20_0000 + 366L * 86400000L) // 2024 is leap
    assert(p("00:00 today-30s") === jan20_0000 - 30000L)
  }

  test("slash dates") {
    assert(p("00:00 01/05/2024") === 1704412800000L)
    assert(p("00:00 01/05/24") === 1704412800000L)
  }

  test("day-of-week walks backwards to that day") {
    // Jan 20 2024 is a Saturday; "monday" → Jan 15
    assert(p("00:00 monday") === 1705276800000L)
  }

  test("month-day keeps the base year") {
    assert(p("00:00 january10") === 1704844800000L)
  }
}
