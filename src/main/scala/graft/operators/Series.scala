package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series time-derivative operators — the Graphite-family transforms
  * (`derivative`, `nonNegativeDerivative`, `perSecond`) a monitoring UI
  * applies to counter metrics served by the engine. The reference serves
  * cumulative counters and leaves differentiation to the grapher; doing it
  * engine-side turns one full-series client download into a pushed-down
  * relational pass.
  *
  * Scale shape: a single lag window partitioned by locator — series
  * differentiate independently and in parallel, no cross-series shuffle
  * (the same contract as [[Anomaly.rollingZScores]], and it composes:
  * `rollingZScores(perSecondRate(points))` alerts on rate anomalies). */
object Series {

  /** Adds per-point deltas against the previous sample of the same series:
    *  - `delta_v`    value − previous value (null for the first point);
    *  - `is_reset`   delta_v < 0 — a counter restart
    *    (nonNegativeDerivative's condition);
    *  - `nn_delta`   delta_v with resets nulled — Graphite's
    *    nonNegativeDerivative;
    *  - `rate_per_s` nn_delta / elapsed seconds — Graphite's perSecond;
    *    null on resets, first points, and zero elapsed (duplicate ts).
    * Ordering ties on ts_ms break by value so the output is total and
    * layout-invariant. */
  def derivatives(points: DataFrame): DataFrame = {
    val w = Window.partitionBy("tenant_id", "metric_name")
      .orderBy(col("ts_ms"), col("value"))
    points
      .select(col("*"),
        lag(col("value"), 1).over(w).as("__pv"),
        lag(col("ts_ms"), 1).over(w).as("__pt"))
      .withColumn("delta_v",
        when(col("__pv").isNotNull, col("value") - col("__pv")))
      .withColumn("is_reset",
        coalesce(col("delta_v") < 0, lit(false)))
      .withColumn("nn_delta",
        when(col("delta_v") >= 0, col("delta_v")))
      .withColumn("rate_per_s",
        when(col("nn_delta").isNotNull && col("ts_ms") - col("__pt") > 0,
          col("nn_delta") / ((col("ts_ms") - col("__pt")) / lit(1000.0))))
      .drop("__pv", "__pt")
  }
}
