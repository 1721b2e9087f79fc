package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over the metric-point stream — the
  * alerting-side consumer of the ingest pipeline (the reference stops at
  * serving rollups; any monitoring product layered on it computes exactly
  * this from the served points, e.g. a Graphite `stdev`/`offset` alert
  * expression over a trailing window).
  *
  * Each point is scored against the TRAILING window `[ts - windowMs, ts)`
  * of its own series — left bound inclusive (`rangeBetween(-windowMs, -1)`
  * keeps the point exactly windowMs old), current point excluded, so a
  * lone spike cannot inflate the std it is judged against.
  *
  * Oracle-parity discipline (api/QDef.scala): window sums accumulate in
  * exact DECIMAL on both engines; mean/std/z are then scalar IEEE-double
  * expressions over those exact aggregates (sqrt is correctly rounded per
  * IEEE 754, so both engines agree bit-for-bit). Variance is clamped at 0
  * before sqrt (FP cancellation can drive the two-pass formula a few ulp
  * negative on near-constant series).
  *
  * Scale shape: one range-frame window partitioned by locator — series
  * score independently and in parallel, no cross-series shuffle; a single
  * hot locator serializes only its own timeline (inherent to exact
  * trailing stats; the remedy at 100 TB is scoring against the already
  * materialized 5m rollup tier instead of raw points, which this operator
  * accepts unchanged — any (tenant_id, metric_name, ts_ms, value) frame).
  */
object Anomaly {

  /** Score every point: adds n_win (trailing-window population), mean_win /
    * std_win (population stats, null until the window is non-empty), z
    * (null unless n_win >= minPoints and std_win > 0), and is_anomaly
    * (|value - mean| > threshold * std). */
  def rollingZScores(points: DataFrame, windowMs: Long,
      threshold: Double = 3.0, minPoints: Int = 5): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    require(minPoints >= 2, s"minPoints must be >= 2, got $minPoints")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val w = Window.partitionBy("tenant_id", "metric_name")
      .orderBy(col("ts_ms"))
      .rangeBetween(-windowMs, -1L)
    points
      // all three aggregates in ONE projection so they land in a single
      // Window node (one pass over the sorted partition, not three)
      .select(col("*"),
        count(lit(1)).over(w).as("n_win"),
        sum(col("value").cast("decimal(28,2)")).over(w).cast("double")
          .as("__s"),
        sum((col("value") * col("value")).cast("decimal(38,8)")).over(w)
          .cast("double").as("__q"))
      .withColumn("mean_win",
        when(col("n_win") > 0, col("__s") / col("n_win")))
      .withColumn("std_win",
        when(col("n_win") > 0, sqrt(greatest(
          col("__q") / col("n_win") - col("mean_win") * col("mean_win"),
          lit(0.0)))))
      .withColumn("z",
        when(col("n_win") >= minPoints && col("std_win") > 0,
          (col("value") - col("mean_win")) / col("std_win")))
      .withColumn("is_anomaly",
        col("n_win") >= minPoints && col("std_win") > 0 &&
          abs(col("value") - col("mean_win")) > col("std_win") * threshold)
      .drop("__s", "__q")
  }

  /** Just the outliers: scored points whose |z| exceeds the threshold. */
  def anomalies(points: DataFrame, windowMs: Long,
      threshold: Double = 3.0, minPoints: Int = 5): DataFrame =
    rollingZScores(points, windowMs, threshold, minPoints)
      .filter(col("is_anomaly"))
}
