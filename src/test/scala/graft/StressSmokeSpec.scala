package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI tripwire for the Stress harness (VERDICT r9 #6): a scale-0.001 pass
  * with a generous wall-clock bound, so a reintroduced O(points²) window
  * frame (the resampleLinear `[currentRow, unboundedFollowing]` bug the r9
  * full-scale run caught after the fact) fails the SUITE instead of
  * waiting for the next manual stress run. At this scale the hot series is
  * 10⁴ points — a quadratic frame costs ~10⁸ frame-row visits in one task
  * and blows the bound; every incremental form finishes in seconds. The
  * full-scale numbers live in STRESS_r10.json / docs/SCALE.md. */
class StressSmokeSpec extends AnyFunSuite with SparkSuite {

  test("Stress.run at scale 0.001 completes inside the smoke bound with " +
    "every arm present and non-empty") {
    val t0 = System.nanoTime()
    val results = Stress.run(spark, 0.001)
    val wallSecs = (System.nanoTime() - t0) / 1e9
    val byOp = results.map { case (l, n, _) => l -> n }.toMap
    // every arm of the full-scale table must run here too — a silently
    // skipped arm would let its regression through
    val expected = Seq(
      "mad_hot_global", "mad_hot_sharded", "m4_hot_b1000", "alert_hot_1pct",
      "asof_hot_1h", "deriv_hot", "moving_frame_hot_60s",
      "moving_prefix_hot_60s", "moving_prefix_hot_1h",
      "moving_window_std_hot_1h", "resample_hold_hot", "resample_linear_hot",
      "mad_wide_global", "mad_wide_sharded", "m4_wide_b4",
      "hamming_clique_cap64", "cascade_ingest_wide", "cascade_ladder_wide",
      "cascade_files_metrics_5m", "cascade_files_metrics_1440m")
    for (op <- expected)
      assert(byOp.contains(op), s"stress arm '$op' missing: ${byOp.keys}")
    // non-vacuous: the window/dedup/cascade arms actually produced rows
    for (op <- expected.filterNot(_.startsWith("cascade_files")))
      assert(byOp(op) > 0, s"stress arm '$op' produced no rows")
    // the dirty-day snapshot publish keeps each tier at a sane file count
    // (≤ shuffle partitions per day per tier at this scale)
    assert(byOp("cascade_files_metrics_5m") <= 64,
      s"5m tier fragmented: ${byOp("cascade_files_metrics_5m")} files")
    // generous bound: ~20× the healthy runtime on this box; a quadratic
    // frame on the 10⁴-point hot series exceeds it by orders of magnitude
    assert(wallSecs < 600.0, f"stress smoke took $wallSecs%.0f s — a " +
      "re-aggregating window frame (O(points²)) has likely been reintroduced")
  }
}
