package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GranularitySpec extends AnyFunSuite {
  import Granularity._

  test("ladder order and coarser/finer navigation") {
    assert(all === Seq(FULL, MIN_5, MIN_20, MIN_60, MIN_240, MIN_1440))
    assert(MIN_5.coarser.contains(MIN_20))
    assert(MIN_20.finer.contains(MIN_5))
    assert(MIN_1440.coarser.isEmpty)
    assert(FULL.finer.isEmpty)
  }

  test("snap floors to epoch-aligned bucket (reference snapMillis semantics)") {
    assert(MIN_5.snap(1704067200000L) === 1704067200000L) // already aligned
    assert(MIN_5.snap(1704067200000L + 299999) === 1704067200000L)
    assert(MIN_5.snap(1704067200000L + 300000) === 1704067500000L)
    assert(MIN_1440.snap(1704103199999L) === 1704067200000L) // mid-day → day start
    assert(FULL.snap(12345L) === 12345L) // FULL passes through
  }

  test("GEOMETRIC minimizes the >=1 point-density ratio") {
    val now = 1706659200000L
    val from = now - 2L * 86400000L
    // 2 days, 500 points: full→5760 (11.5x), 5m→576 (1.15x), 20m→144 (3.5x)
    assert(granularityFromPointsInInterval(from, now, 500, Geometric, nowMillis = now) === MIN_5)
    // 100 points: 5m 5.76x, 20m 1.44x, 60m 2.08x
    assert(granularityFromPointsInInterval(from, now, 100, Geometric, nowMillis = now) === MIN_20)
  }

  test("GEOMETRIC skips retention-expired tiers (reference TTL skip)") {
    val now = 1706659200000L
    val from = 1704240000000L // 28 days before now: full/5m/20m retention expired
    val to = 1705968000000L
    assert(granularityFromPointsInInterval(from, to, 5000, Geometric, nowMillis = now) === MIN_60)
    assert(granularityFromPointsInInterval(from, to, 200, Geometric, nowMillis = now) === MIN_240)
  }

  test("LINEAR minimizes |points - provided| with int truncation") {
    val now = 1706659200000L
    val from = now - 2L * 86400000L
    assert(granularityFromPointsInInterval(from, now, 500, Linear, nowMillis = now) === MIN_5)
  }

  test("LESSTHANEQUAL steps coarser when provided > requested") {
    val now = 1706659200000L
    val from = now - 2L * 86400000L
    // 5m would provide 576 > 500 ⇒ 20m
    assert(granularityFromPointsInInterval(from, now, 500, LessThanEqual, nowMillis = now) === MIN_20)
  }

  test("invalid interval rejected") {
    intercept[IllegalArgumentException] {
      granularityFromPointsInInterval(10, 10, 5)
    }
  }
}
