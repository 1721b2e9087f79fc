package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One metric point in the streaming scorer. */
case class AnomalyEv(tenant_id: String, metric_name: String,
    ets: java.sql.Timestamp, value: Double)

/** Per-series trailing-window state: the points still inside any future
  * admissible event's window. */
case class SeriesWindowState(points: List[(Long, Double)])

/** A scored point emitted by the streaming scorer — the streaming twin of
  * [[Anomaly.rollingZScores]]'s output row. */
case class ScoredPoint(tenant_id: String, metric_name: String, ts_ms: Long,
    value: Double, n_win: Long, mean_win: Option[Double],
    std_win: Option[Double], z: Option[Double], is_anomaly: Boolean)

/** Per-series EWMA recurrence state for the streaming band scorer — O(1)
  * per series (the whole appeal of the exponential family online). */
case class EwmaState(rn: Int, s: Double, d: Double, lastTs: Long)

/** One raw metric point for the segmented batch scorers' typed fold. */
case class SeriesPoint(tenant_id: String, metric_name: String,
    ts_ms: Long, value: Double)

/** Per-series Holt-Winters state for the streaming band scorer — O(season)
  * per series (level, trend, and the two per-phase circular arrays). */
case class HwState(rn: Int, l: Double, b: Double, seas: List[Double],
    dev: List[Double], lastTs: Long)

/** A band-scored point emitted by the streaming Holt-Winters scorer — the
  * streaming twin of [[Anomaly.holtWintersBands]]'s output row. */
case class HwPoint(tenant_id: String, metric_name: String, ts_ms: Long,
    value: Double, rn: Int, level: Double, trend: Double, seasonal: Double,
    dev: Double, forecast: Option[Double], dev_used: Option[Double],
    upper: Option[Double], lower: Option[Double], is_aberrant: Boolean)

/** One scored point entering the streaming alert sessionizer — anomalous
  * AND healthy (healthy points advance the watermark and prompt their own
  * series' ripeness check; the anomaly filter runs INSIDE the state
  * function, because a pre-state `filter(is_anomaly)` gets pushed BELOW
  * the EventTimeWatermark node by Catalyst and starves the watermark on
  * recovered series). */
case class AlertEvent(tenant_id: String, metric_name: String,
    ets: java.sql.Timestamp, az: Option[Double], is_anomaly: Boolean)

/** One not-yet-ripe alert segment kept per series between micro-batches. */
case class OpenAlert(start: Long, last: Long, n_points: Long,
    peak_abs_z: Option[Double])

/** The per-series state: every segment whose gap the watermark has not yet
  * proven elapsed (steady state: one; bounded by the admissible gaps
  * inside the watermark delay). */
case class AlertSegments(segs: List[OpenAlert])

/** A closed alert episode (gap elapsed, proven by the event-time
  * watermark) — the streaming twin of [[Anomaly.alertIntervals]]'s row. */
case class ClosedAlert(tenant_id: String, metric_name: String,
    start_ms: Long, end_ms: Long, duration_ms: Long, n_points: Long,
    peak_abs_z: Option[Double])

/** A band-scored point emitted by the streaming EWMA scorer — the
  * streaming twin of [[Anomaly.ewmaBands]]'s output row. */
case class EwmaPoint(tenant_id: String, metric_name: String, ts_ms: Long,
    value: Double, rn: Int, ewma: Double, dev: Double,
    s_prev: Option[Double], d_prev: Option[Double],
    upper: Option[Double], lower: Option[Double], is_aberrant: Boolean)

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
      // null-valued points are excluded from the stats AND the output —
      // counting them in n_win while the decimal sums skip them would
      // silently bias mean/std low (ingest-validated series can't carry
      // null values; this guards direct library calls)
      .filter(col("value").isNotNull)
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

  /** EWMA forecast bands + aberration flags — Graphite's
    * `holtWintersForecast` / `holtWintersConfidenceBands` /
    * `holtWintersAberration` family, reduced to single exponential
    * smoothing with an EWMA absolute-deviation band (the classic
    * statsd/Kale "ewma + dev" detector): per point,
    *
    *   forecast  = s_{t−1}            (the smoothed level BEFORE the point)
    *   band      = forecast ± k·d_{t−1}
    *   aberrant  ⇔ rn > minPoints ∧ d_{t−1} > 0 ∧ |x_t − forecast| > k·d_{t−1}
    *
    * where s/d follow [[graft.functions.EwmaScan]]'s recurrence. Judging
    * against the PRE-update state means a spike can't absorb itself into
    * the band it is tested on; `minPoints` suppresses flags until the
    * level has burned in. Complements [[rollingZScores]]: the EWMA level
    * tracks trends (no fixed window to age out of), and the deviation
    * band adapts at the same exponential rate.
    *
    * Output per point: rn (1-based time rank), value, ewma (s), dev (d),
    * s_prev / d_prev (null at rn=1), upper / lower bands, is_aberrant.
    *
    * Scale shape: one shuffle (groupBy locator), then the sequential
    * recurrence runs inside the codegen'd [[graft.functions.EwmaScan]]
    * over each series' collected points — series scan independently and
    * in parallel; the per-series array is bounded by the queried range
    * (the [[rollingZScores]] contract: at 100 TB score a rollup tier, not
    * raw points). posexplode(arrays_zip(...)) restores rows with zero
    * further shuffle.
    *
    * The bounded-series contract is ENFORCED, not just documented: a
    * series longer than `maxPointsPerSeries` fails the job with a
    * descriptive error instead of silently violating the contract. The
    * check necessarily runs AFTER collect_list materializes the array, so
    * it upgrades the failure mode in the band where collection survives;
    * a series so large that the collection buffer itself OOMs still dies
    * opaquely — which is why the real unbounded answers are
    * [[ewmaBandsSegmented]] (identical output, O(1) task memory) and the
    * O(1)-state [[streamingEwmaBands]], and the guard exists to catch the
    * misuse early rather than to make it safe. */
  def ewmaBands(points: DataFrame, alpha: Double = 0.3, k: Double = 3.0,
      minPoints: Int = 5, maxPointsPerSeries: Int = 1 << 20): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(k > 0, s"k must be positive, got $k")
    require(minPoints >= 1, s"minPoints must be >= 1, got $minPoints")
    require(maxPointsPerSeries >= 1,
      s"maxPointsPerSeries must be >= 1, got $maxPointsPerSeries")
    import org.apache.spark.sql.graft.ColumnBridge
    val scan = ColumnBridge.column(graft.functions.EwmaScan(
      ColumnBridge.expression(col("__pts")), alpha))
    points
      .groupBy(col("tenant_id"), col("metric_name"))
      .agg(sort_array(collect_list(struct(col("ts_ms"), col("value"))))
        .as("__pts0"))
      .withColumn("__pts",
        when(size(col("__pts0")) <= maxPointsPerSeries, col("__pts0"))
          .otherwise(raise_error(concat(
            lit("ewmaBands: series "), col("tenant_id"), lit("."),
            col("metric_name"),
            lit(s" exceeds maxPointsPerSeries=$maxPointsPerSeries — use " +
              "ewmaBandsSegmented (unbounded, same output) or score a " +
              "rollup tier")))))
      .drop("__pts0")
      .withColumn("__st", scan)
      .select(col("tenant_id"), col("metric_name"),
        posexplode(arrays_zip(col("__pts"), col("__st"))).as(Seq("__i", "__z")))
      .select(
        col("tenant_id"), col("metric_name"),
        (col("__i") + 1).cast("int").as("rn"),
        col("__z.__pts.ts_ms").as("ts_ms"),
        col("__z.__pts.value").as("value"),
        col("__z.__st.s").as("ewma"),
        col("__z.__st.d").as("dev"),
        col("__z.__st.sp").as("s_prev"),
        col("__z.__st.dp").as("d_prev"))
      .withColumn("upper", col("s_prev") + lit(k) * col("d_prev"))
      .withColumn("lower", col("s_prev") - lit(k) * col("d_prev"))
      .withColumn("is_aberrant", coalesce(
        col("rn") > minPoints && col("d_prev") > 0 &&
          abs(col("value") - col("s_prev")) > lit(k) * col("d_prev"),
        lit(false)))
  }

  /** Additive triple-exponential (Holt-Winters) forecast bands — the FULL
    * Graphite `holtWintersForecast` / `holtWintersConfidenceBands` /
    * `holtWintersAberration` semantics that [[ewmaBands]] reduces to single
    * smoothing: level + trend + a per-phase seasonal term, with SEASONAL
    * deviations, so a diurnal series' morning ramp is forecast instead of
    * flagged and the band width is "how noisy is this hour-of-day"
    * ([[graft.functions.HwScan]] for the exact recurrence; Graphite
    * defaults α=0.1, β=0.0035 — graphite-web functions.py
    * holtWintersAnalysis — kept as this operator's defaults).
    *
    * Cold start: seasonal/deviation terms are zero until their phase's
    * first wrap (the first season behaves like pure Holt level+trend and,
    * with `minPoints` ≥ season, can never flag) — deterministic and
    * oracle-restatable, unlike backfitting a warm-up season.
    *
    * Per point: rn, value, level, trend, seasonal, dev (post-update),
    * forecast = l+b+s⁻ (pre-update, null at rn=1), dev_used = d⁻ (the
    * judging deviation), upper/lower = forecast ± k·d⁻, is_aberrant ⇔
    * rn > minPoints ∧ d⁻ > 0 ∧ |value − forecast| > k·d⁻.
    *
    * Same scale shape and ENFORCED bounded-series contract as
    * [[ewmaBands]] (including its caveat: the size check runs after
    * collection, so it catches misuse early rather than making unbounded
    * input safe — [[streamingHoltWintersBands]] is the O(season)-state
    * unbounded answer): one groupBy shuffle, the sequential fold in
    * codegen over each collected series, maxPointsPerSeries failing loud.
    * Input
    * buckets must arrive at a REGULAR cadence for phases to mean anything
    * — feed a rollup tier (gaps shift every later phase, as in any
    * positional seasonal model). */
  def holtWintersBands(points: DataFrame, season: Int,
      alpha: Double = 0.1, beta: Double = 0.0035, gamma: Double = 0.1,
      k: Double = 3.0, minPoints: Int = 0,
      maxPointsPerSeries: Int = 1 << 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minPoints >= 0, s"minPoints must be >= 0, got $minPoints")
    require(maxPointsPerSeries >= 1,
      s"maxPointsPerSeries must be >= 1, got $maxPointsPerSeries")
    import org.apache.spark.sql.graft.ColumnBridge
    val scan = ColumnBridge.column(graft.functions.HwScan(
      ColumnBridge.expression(col("__pts")), alpha, beta, gamma, season))
    points
      .groupBy(col("tenant_id"), col("metric_name"))
      .agg(sort_array(collect_list(struct(col("ts_ms"), col("value"))))
        .as("__pts0"))
      .withColumn("__pts",
        when(size(col("__pts0")) <= maxPointsPerSeries, col("__pts0"))
          .otherwise(raise_error(concat(
            lit("holtWintersBands: series "), col("tenant_id"), lit("."),
            col("metric_name"),
            lit(s" exceeds maxPointsPerSeries=$maxPointsPerSeries — " +
              "score a rollup tier")))))
      .drop("__pts0")
      .withColumn("__st", scan)
      .select(col("tenant_id"), col("metric_name"),
        posexplode(arrays_zip(col("__pts"), col("__st"))).as(Seq("__i", "__z")))
      .select(
        col("tenant_id"), col("metric_name"),
        (col("__i") + 1).cast("int").as("rn"),
        col("__z.__pts.ts_ms").as("ts_ms"),
        col("__z.__pts.value").as("value"),
        col("__z.__st.l").as("level"),
        col("__z.__st.b").as("trend"),
        col("__z.__st.s").as("seasonal"),
        col("__z.__st.d").as("dev"),
        col("__z.__st.f").as("forecast"),
        col("__z.__st.dp").as("dev_used"))
      .withColumn("upper", col("forecast") + lit(k) * col("dev_used"))
      .withColumn("lower", col("forecast") - lit(k) * col("dev_used"))
      .withColumn("is_aberrant", coalesce(
        col("rn") > minPoints && col("dev_used") > 0 &&
          abs(col("value") - col("forecast")) > lit(k) * col("dev_used"),
        lit(false)))
  }

  /** STREAMING Holt-Winters band scorer — the alerting twin of
    * [[holtWintersBands]], completing the family ([[streamingEwmaBands]]
    * is the single-smoothing sibling): every arriving point is judged
    * against its series' pre-update (forecast, seasonal deviation) state
    * and emitted immediately (append mode), then folded in. State is
    * O(season) per series — level, trend, and the two per-phase arrays —
    * still constant in STREAM LENGTH, the property that matters online.
    *
    * Identical recurrence, op order, and flag condition as the batch
    * operator (the [[graft.functions.HwScan]] scaladoc recurrence with the
    * same precomputed complements), points folded in (ts, value) order
    * within each micro-batch — bit-identical to [[holtWintersBands]] on
    * in-order feeds. PHASE IS ARRIVAL-ORDINAL (i mod season), exactly like
    * the batch scan, so feed a regular-cadence rollup stream; a point
    * older than the last folded timestamp is SKIPPED (no retroactive
    * folding — the [[streamingEwmaBands]] discipline, with the batch
    * operator over the stored points as the exhaustive pass). A series
    * quiet for `stateTtlMs` of event time drops its state and restarts at
    * rn = 1. */
  def streamingHoltWintersBands(points: DataFrame, season: Int,
      alpha: Double = 0.1, beta: Double = 0.0035, gamma: Double = 0.1,
      k: Double = 3.0, minPoints: Int = 0,
      watermarkDelay: String = "0 seconds",
      stateTtlMs: Long = 86400000L): Dataset[HwPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0, 1], got $gamma")
    require(season >= 1, s"season must be >= 1, got $season")
    require(k > 0, s"k must be positive, got $k")
    require(minPoints >= 0, s"minPoints must be >= 0, got $minPoints")
    require(stateTtlMs > 0, s"stateTtlMs must be positive, got $stateTtlMs")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("tenant_id").cast("string").as("tenant_id"),
        col("metric_name").cast("string").as("metric_name"),
        timestamp_millis(col("ts_ms").cast("long")).as("ets"),
        col("value").cast("double").as("value"))
      .withWatermark("ets", watermarkDelay)
      .as[AnomalyEv]
      .groupByKey(e => (e.tenant_id, e.metric_name))
      .flatMapGroupsWithState[HwState, HwPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        hwScoreBatch(season, alpha, beta, gamma, k, minPoints, stateTtlMs))
  }

  private def hwScoreBatch(season: Int, alpha: Double, bt: Double,
      g: Double, k: Double, minPoints: Int, stateTtlMs: Long)(
      key: (String, String), batch: Iterator[AnomalyEv],
      state: GroupState[HwState]): Iterator[HwPoint] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val (ia, ib, ig) = (1.0 - alpha, 1.0 - bt, 1.0 - g)
      var st = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[HwPoint]
      for (e <- batch.toSeq.sortBy(e => (e.ets.getTime, e.value))) {
        val t = e.ets.getTime
        val x = e.value
        st match {
          case None =>
            val seas = List.fill(season)(0.0)
            val dev = List.fill(season)(0.0)
            // i = 0: l = x, b = 0; seasonal/dev update to exactly 0.0 (the
            // HwScan cold-start identity), phase 0 entry rotates through
            out += HwPoint(key._1, key._2, t, x, 1, x, 0.0, 0.0, 0.0,
              None, None, None, None, is_aberrant = false)
            st = Some(HwState(1, x, 0.0, seas.tail :+ 0.0, dev.tail :+ 0.0, t))
          case Some(HwState(rn, l, b, seas, dev, lastTs)) =>
            if (t >= lastTs) { // late points skip: no retroactive folding
              val spre = seas.head
              val dpre = dev.head
              val f = l + b + spre
              val lN = alpha * (x - spre) + ia * (l + b)
              val bN = bt * (lN - l) + ib * b
              val sN = g * (x - lN) + ig * spre
              val dN = g * math.abs(x - f) + ig * dpre
              val rn2 = rn + 1
              out += HwPoint(key._1, key._2, t, x, rn2, lN, bN, sN, dN,
                Some(f), Some(dpre), Some(f + k * dpre), Some(f - k * dpre),
                is_aberrant =
                  rn2 > minPoints && dpre > 0 && math.abs(x - f) > k * dpre)
              st = Some(HwState(rn2, lN, bN, seas.tail :+ sN, dev.tail :+ dN, t))
            }
        }
      }
      st.foreach { v =>
        state.update(v)
        state.setTimeoutTimestamp(math.max(
          v.lastTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** UNBOUNDED twin of [[ewmaBands]] — identical output (the recurrence
    * folds the same doubles in the same order, so every emitted ewma/dev/
    * band bit matches), but the series is never materialized as one array
    * in one row: points repartition by locator, sort within partitions by
    * (locator, ts, value) — the exact order [[ewmaBands]]' sort_array
    * imposes — and a single streaming fold walks each partition with O(1)
    * state per series (three doubles + a rank), emitting as it goes. Task
    * memory is a sort spill buffer, independent of series length: two
    * years of raw points on one locator stream through where the
    * collect_list form would OOM the task.
    *
    * What this does NOT remove is the single-task TIME serialization of
    * one hot series — inherent to an exact sequential recurrence (the
    * reference's analog: a rollup never materializes a series in one
    * place but each slot still processes serially,
    * RollupHandler.java:357-371). An approximate parallel-prefix over
    * per-chunk affine maps (s is linear in s_in; compose (β^n, Σαβ^i·x))
    * would parallelize within a series but reassociates the float fold —
    * the bit-parity contract with [[ewmaBands]] and the q_series_ewma
    * oracle is worth more here than intra-series parallelism, and the
    * throughput answer for live feeds is [[streamingEwmaBands]].
    *
    * One contract divergence, by necessity: [[ewmaBands]] inherits
    * [[graft.functions.EwmaScan]]'s whole-series-null rule (any null value
    * erases that series from the output); a streaming fold cannot
    * retroactively unemit, so a null value here FAILS with a descriptive
    * error — filter or impute upstream. */
  def ewmaBandsSegmented(points: DataFrame, alpha: Double = 0.3,
      k: Double = 3.0, minPoints: Int = 5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(k > 0, s"k must be positive, got $k")
    require(minPoints >= 1, s"minPoints must be >= 1, got $minPoints")
    val spark = points.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha
    points
      .select(col("tenant_id").cast("string").as("tenant_id"),
        col("metric_name").cast("string").as("metric_name"),
        col("ts_ms").cast("long").as("ts_ms"),
        when(col("value").isNotNull, col("value").cast("double"))
          .otherwise(raise_error(concat(
            lit("ewmaBandsSegmented: null value in series "),
            col("tenant_id"), lit("."), col("metric_name"),
            lit(" — filter upstream (ewmaBands drops the whole series)"))))
          .as("value"))
      .repartition(col("tenant_id"), col("metric_name"))
      .sortWithinPartitions("tenant_id", "metric_name", "ts_ms", "value")
      .as[SeriesPoint]
      .mapPartitions { it =>
        var curT: String = null
        var curM: String = null
        var rn = 0
        var s = 0.0
        var d = 0.0
        it.map { p =>
          if (p.tenant_id != curT || p.metric_name != curM) {
            curT = p.tenant_id; curM = p.metric_name; rn = 0
          }
          rn += 1
          val x = p.value
          if (rn == 1) {
            s = x; d = 0.0
            EwmaPoint(p.tenant_id, p.metric_name, p.ts_ms, x, 1, s, d,
              None, None, None, None, is_aberrant = false)
          } else {
            val sp = s
            val dp = d
            s = alpha * x + beta * sp
            d = alpha * math.abs(x - sp) + beta * dp
            EwmaPoint(p.tenant_id, p.metric_name, p.ts_ms, x, rn, s, d,
              Some(sp), Some(dp), Some(sp + k * dp), Some(sp - k * dp),
              is_aberrant =
                rn > minPoints && dp > 0 && math.abs(x - sp) > k * dp)
          }
        }
      }
      .toDF()
      .select(col("tenant_id"), col("metric_name"), col("rn"), col("ts_ms"),
        col("value"), col("ewma"), col("dev"), col("s_prev"), col("d_prev"),
        col("upper"), col("lower"), col("is_aberrant"))
  }

  /** STREAMING EWMA band scorer — the alerting twin of [[ewmaBands]]:
    * every arriving point is judged against its series' pre-update
    * (s, d) state and emitted immediately (append mode), then folded in.
    * State is THREE DOUBLES + a timestamp per series — the O(1)-state
    * property is why the exponential family is the classic online
    * detector (vs [[streamingZScores]]' retained window).
    *
    * Identical recurrence and flag condition as the batch operator
    * (alpha·x + beta·s etc., beta = 1 − alpha computed once), points
    * folded in (ts, value) order within each micro-batch — bit-identical
    * to [[ewmaBands]] on in-order feeds. A point older than the last
    * folded timestamp is SKIPPED (an EWMA cannot fold retroactively);
    * the batch operator over the stored points remains the exhaustive
    * pass, the same streaming-then-recompute discipline as the cascade.
    * A series quiet for `stateTtlMs` of event time times out and drops
    * its state; its next point restarts at rn = 1. */
  def streamingEwmaBands(points: DataFrame, alpha: Double = 0.3,
      k: Double = 3.0, minPoints: Int = 5,
      watermarkDelay: String = "0 seconds",
      stateTtlMs: Long = 86400000L): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(k > 0, s"k must be positive, got $k")
    require(minPoints >= 1, s"minPoints must be >= 1, got $minPoints")
    require(stateTtlMs > 0, s"stateTtlMs must be positive, got $stateTtlMs")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("tenant_id").cast("string").as("tenant_id"),
        col("metric_name").cast("string").as("metric_name"),
        timestamp_millis(col("ts_ms").cast("long")).as("ets"),
        col("value").cast("double").as("value"))
      .withWatermark("ets", watermarkDelay)
      .as[AnomalyEv]
      .groupByKey(e => (e.tenant_id, e.metric_name))
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        ewmaScoreBatch(alpha, k, minPoints, stateTtlMs))
  }

  private def ewmaScoreBatch(alpha: Double, k: Double, minPoints: Int,
      stateTtlMs: Long)(
      key: (String, String), batch: Iterator[AnomalyEv],
      state: GroupState[EwmaState]): Iterator[EwmaPoint] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val beta = 1.0 - alpha
      var st = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[EwmaPoint]
      for (e <- batch.toSeq.sortBy(e => (e.ets.getTime, e.value))) {
        val t = e.ets.getTime
        val x = e.value
        st match {
          case None =>
            out += EwmaPoint(key._1, key._2, t, x, 1, x, 0.0,
              None, None, None, None, is_aberrant = false)
            st = Some(EwmaState(1, x, 0.0, t))
          case Some(EwmaState(rn, sp, dp, lastTs)) =>
            if (t >= lastTs) { // late points skip: no retroactive folding
              val s = alpha * x + beta * sp
              val d = alpha * math.abs(x - sp) + beta * dp
              val rn2 = rn + 1
              out += EwmaPoint(key._1, key._2, t, x, rn2, s, d,
                Some(sp), Some(dp), Some(sp + k * dp), Some(sp - k * dp),
                is_aberrant =
                  rn2 > minPoints && dp > 0 && math.abs(x - sp) > k * dp)
              st = Some(EwmaState(rn2, s, d, t))
            }
        }
      }
      st.foreach { v =>
        state.update(v)
        state.setTimeoutTimestamp(math.max(
          v.lastTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** SEASONAL z-score: each point scored against its series' historical
    * distribution for the SAME phase of the period — "is this 3pm unusual
    * for 3pm", the cyclic complement to [[rollingZScores]]'s trailing
    * window (which would flag every normal morning ramp on a diurnal
    * series). Default period/phase = day/hour: 24 hour-of-day baselines
    * per series.
    *
    * The baseline is leave-one-out: per (series, phase) the exact DECIMAL
    * totals n/S/Q accumulate once, then each point subtracts its OWN
    * snapped contribution — `mean = (S − x̂)/(n−1)`,
    * `var = (Q − x̂²)/(n−1) − mean²` — so a lone spike cannot inflate the
    * std it is judged against (same self-exclusion contract as the
    * trailing scorer, without its per-point window pass). All subtractions
    * happen on the same snapped terms both engines accumulated, keeping
    * the scalar-double finish bit-identical to a DuckDB restatement.
    *
    * Scale shape: a groupBy and an equi-join on the identical
    * (tenant, metric, phase) key — the join reuses the aggregation's
    * partitioning, and the stats side is |series|×|phases| rows (AQE
    * broadcasts it when small). No window node at all: phases of a series
    * score in parallel even within one hot series. */
  def seasonalZScores(points: DataFrame, periodMs: Long = 86400000L,
      phaseMs: Long = 3600000L, threshold: Double = 3.0,
      minPoints: Int = 5): DataFrame = {
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    require(phaseMs > 0 && periodMs % phaseMs == 0,
      s"phaseMs must divide periodMs, got $phaseMs / $periodMs")
    require(minPoints >= 2, s"minPoints must be >= 2, got $minPoints")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val phase = expr(s"pmod(ts_ms, ${periodMs}L) div ${phaseMs}L")
    val withPhase = points.withColumn("phase", phase)
    val exact = withPhase
      .groupBy(col("tenant_id"), col("metric_name"), col("phase"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("__s"),
        sum((col("value") * col("value")).cast("decimal(38,8)"))
          .cast("double").as("__q"))
    val x = col("value").cast("decimal(28,2)").cast("double")
    val xx = (col("value") * col("value")).cast("decimal(38,8)").cast("double")
    withPhase
      .join(exact, Seq("tenant_id", "metric_name", "phase"))
      .withColumn("n_base", col("__n") - 1L)
      .withColumn("mean_base",
        when(col("n_base") > 0, (col("__s") - x) / col("n_base")))
      .withColumn("std_base",
        when(col("n_base") > 0, sqrt(greatest(
          (col("__q") - xx) / col("n_base") -
            col("mean_base") * col("mean_base"),
          lit(0.0)))))
      .withColumn("z",
        when(col("n_base") >= minPoints && col("std_base") > 0,
          (col("value") - col("mean_base")) / col("std_base")))
      .withColumn("is_anomaly",
        col("n_base") >= minPoints && col("std_base") > 0 &&
          abs(col("value") - col("mean_base")) > col("std_base") * threshold)
      .drop("__n", "__s", "__q")
  }

  /** STREAMING scorer — the alerting consumer: every arriving point is
    * scored IMMEDIATELY against its series' trailing window and emitted
    * (append mode; no watermark wait, since a point's baseline is entirely
    * in its past). `flatMapGroupsWithState` keeps, per series, only the
    * points still inside some future admissible event's window: anything
    * older than `watermark − windowMs` is evicted each batch, and a series
    * quiet past its window times out and drops its state entirely — state
    * is bounded by (windowMs + watermark delay) × arrival rate per ACTIVE
    * series.
    *
    * Scoring matches the batch operator exactly on in-order feeds: the
    * same [ts − windowMs, ts) frame, sums through exact decimal (cents /
    * 1e-8-scaled squares, the DECIMAL(28,2)/(38,8) batch semantics), same
    * guards. A watermark-admitted out-of-order point scores against the
    * retained window content — correct for its own baseline; points
    * already scored are never retracted (append-mode limit). */
  def streamingZScores(points: DataFrame, windowMs: Long,
      threshold: Double = 3.0, minPoints: Int = 5,
      watermarkDelay: String = "0 seconds"): Dataset[ScoredPoint] = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    require(minPoints >= 2, s"minPoints must be >= 2, got $minPoints")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("tenant_id").cast("string").as("tenant_id"),
        col("metric_name").cast("string").as("metric_name"),
        timestamp_millis(col("ts_ms").cast("long")).as("ets"),
        col("value").cast("double").as("value"))
      .withWatermark("ets", watermarkDelay)
      .as[AnomalyEv]
      .groupByKey(e => (e.tenant_id, e.metric_name))
      .flatMapGroupsWithState[SeriesWindowState, ScoredPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        scoreBatch(windowMs, threshold, minPoints))
  }

  private def scoreBatch(windowMs: Long, threshold: Double, minPoints: Int)(
      key: (String, String), batch: Iterator[AnomalyEv],
      state: GroupState[SeriesWindowState]): Iterator[ScoredPoint] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var pts = state.getOption.map(_.points).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[ScoredPoint]
      for (e <- batch.toSeq.sortBy(_.ets.getTime)) {
        val t = e.ets.getTime
        out += scoreOne(key, t, e.value, pts, windowMs, threshold, minPoints)
        pts = (t -> e.value) :: pts
      }
      val evictBelow = state.getCurrentWatermarkMs() - windowMs
      pts = pts.filter(_._1 >= evictBelow)
      if (pts.isEmpty) state.remove()
      else {
        state.update(SeriesWindowState(pts))
        state.setTimeoutTimestamp(math.max(
          pts.map(_._1).max + windowMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** Exact-decimal window stats over the retained points — the same
    * DECIMAL(28,2) value / DECIMAL(38,8) square accumulation and scalar
    * double math as the batch operator. Each score is an O(window) rescan
    * with two BigDecimal snaps per point: the price of exact stats under
    * out-of-order arrivals (pre-snapped integer state would overflow a
    * Long on the square term for large values, where the batch
    * DECIMAL(38,8) does not). Series too hot for that should score
    * against the 5m rollup tier, which the batch operator serves. */
  private def scoreOne(key: (String, String), t: Long, v: Double,
      pts: List[(Long, Double)], windowMs: Long, threshold: Double,
      minPoints: Int): ScoredPoint = {
    val win = pts.filter { case (pt, _) => pt >= t - windowMs && pt < t }
    val n = win.size.toLong
    if (n == 0)
      ScoredPoint(key._1, key._2, t, v, 0L, None, None, None, is_anomaly = false)
    else {
      val s = win.map { case (_, pv) =>
        java.math.BigDecimal.valueOf(pv).setScale(2, java.math.RoundingMode.HALF_UP)
      }.reduce(_.add(_)).doubleValue()
      val q = win.map { case (_, pv) =>
        java.math.BigDecimal.valueOf(pv * pv)
          .setScale(8, java.math.RoundingMode.HALF_UP)
      }.reduce(_.add(_)).doubleValue()
      val mean = s / n
      val std = math.sqrt(math.max(q / n - mean * mean, 0.0))
      val z = if (n >= minPoints && std > 0) Some((v - mean) / std) else None
      val anom = n >= minPoints && std > 0 && math.abs(v - mean) > std * threshold
      ScoredPoint(key._1, key._2, t, v, n, Some(mean), Some(std), z, anom)
    }
  }

  /** STREAMING alert episodes — the alerting daemon's view: a scored
    * stream (any streaming scorer's output, e.g. [[streamingEwmaBands]]
    * with is_aberrant renamed is_anomaly) in, an append-mode stream of
    * [[ClosedAlert]]s out, one per sustained incident once its gap has
    * PROVABLY elapsed. Two deliberate choices make the emitted episodes
    * equal the batch [[alertIntervals]] answer on every admissible stream:
    *
    *  1. The anomaly filter runs INSIDE the state function, never before
    *     the watermark — healthy points advance event time too, so a
    *     resolved incident pages as soon as normal traffic carries the
    *     watermark past its gap deadline. (A pre-state filter is not
    *     merely reordered code: Catalyst PUSHES a non-event-time
    *     predicate below the EventTimeWatermark node, so even
    *     watermark-then-filter starves — the filter must be unobservable
    *     to the optimizer, i.e. inside the function.)
    *  2. Segments are held in state until `last + gapMs ≤ watermark` —
    *     never closed eagerly on a same-batch gap. The watermark admits
    *     only events with ets > watermark, and such an event is > gapMs
    *     after any ripe segment's end, so a ripe close can never lose a
    *     late BRIDGING point: out-of-order arrivals merge runs, exactly
    *     like batch, instead of splitting one incident into two pages
    *     (or silently suppressing a split piece under `minPoints`).
    *
    * `minPoints` suppression is decided at close (an open episode may
    * still grow). State per series is the pending segment list — in the
    * steady state one open episode (pathological worst case: one segment
    * per still-admissible gap inside the watermark delay). */
  def streamingAlertIntervals(scored: DataFrame, gapMs: Long,
      watermarkDelay: String, minPoints: Int = 1): Dataset[ClosedAlert] = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    require(minPoints >= 1, s"minPoints must be >= 1, got $minPoints")
    val spark = scored.sparkSession
    import spark.implicits._
    val zCol = if (scored.columns.contains("z")) abs(col("z"))
      else lit(null).cast("double")
    scored
      .select(col("tenant_id").cast("string").as("tenant_id"),
        col("metric_name").cast("string").as("metric_name"),
        timestamp_millis(col("ts_ms").cast("long")).as("ets"),
        zCol.as("az"), col("is_anomaly").as("is_anomaly"))
      .withWatermark("ets", watermarkDelay)
      .as[AlertEvent] // healthy points included — filtered in-function (1)
      .groupByKey(e => (e.tenant_id, e.metric_name))
      .flatMapGroupsWithState[AlertSegments, ClosedAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        alertUpdate(gapMs, minPoints))
  }

  private def maxOpt(a: Option[Double], b: Option[Double]): Option[Double] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(math.max(x, y))
      case (x, y) => x.orElse(y)
    }

  private def alertUpdate(gapMs: Long, minPoints: Int)(
      key: (String, String), batch: Iterator[AlertEvent],
      state: GroupState[AlertSegments]): Iterator[ClosedAlert] = {
    def close(s: OpenAlert): Iterator[ClosedAlert] =
      if (s.n_points >= minPoints)
        Iterator.single(ClosedAlert(key._1, key._2, s.start, s.last,
          s.last - s.start, s.n_points, s.peak_abs_z))
      else Iterator.empty
    val prior = state.getOption.map(_.segs).getOrElse(Nil)
    val segs = (prior ++ batch.filter(_.is_anomaly).map(e =>
      OpenAlert(e.ets.getTime, e.ets.getTime, 1L, e.az)))
      .sortBy(s => (s.start, s.last))
    if (segs.isEmpty) { state.remove(); return Iterator.empty }
    val merged = segs.tail.foldLeft(Vector(segs.head)) { (acc, s) =>
      val cur = acc.last
      if (s.start - cur.last <= gapMs)
        acc.init :+ OpenAlert(cur.start, math.max(cur.last, s.last),
          cur.n_points + s.n_points, maxOpt(cur.peak_abs_z, s.peak_abs_z))
      else acc :+ s
    }
    // ripe = gap provably elapsed: any still-admissible event has
    // ets > watermark >= last + gapMs, so it can neither extend nor
    // bridge into these segments
    val wm = state.getCurrentWatermarkMs()
    val (ripe, pending) = merged.partition(_.last + gapMs <= wm)
    if (pending.isEmpty) state.remove()
    else {
      state.update(AlertSegments(pending.toList))
      state.setTimeoutTimestamp(
        math.max(pending.map(_.last + gapMs).min, wm + 1))
    }
    ripe.iterator.flatMap(close)
  }

  /** Collapse per-point anomaly flags into ALERT EPISODES — the
    * deduplication between "a detector fired" and "page someone": one
    * alert per sustained incident, never one per point (Prometheus'
    * `for:` semantics, Graphite/alerting-bridge behavior). Anomalous
    * points of a series merge into one episode while consecutive gaps are
    * ≤ `gapMs` (boundary-INCLUSIVE, the [[Sessionize]] convention — a
    * point exactly `gapMs` after the previous extends the episode);
    * episodes with fewer than `minPoints` anomalous points are suppressed
    * (one noisy sample never pages).
    *
    * Input: any scored frame with (tenant_id, metric_name, ts_ms,
    * is_anomaly) and an optional `z` column ([[rollingZScores]],
    * [[ewmaBands]]' is_aberrant renamed, [[seasonalZScores]]). Output per
    * episode: start_ms, end_ms, duration_ms, n_points, peak_abs_z (null
    * when the input has no z). All decision math is integer gap
    * arithmetic over flags — hash-provable over any hash-proven scorer.
    *
    * Scale shape: one filter (anomalies only — the window runs over the
    * ALERT stream, not the corpus), one lag window per series, one
    * aggregation reusing the same exchange. */
  def alertIntervals(scored: DataFrame, gapMs: Long,
      minPoints: Int = 1): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    require(minPoints >= 1, s"minPoints must be >= 1, got $minPoints")
    val ser = Seq("tenant_id", "metric_name")
    val zCol = if (scored.columns.contains("z")) abs(col("z"))
      else lit(null).cast("double")
    val w = Window.partitionBy(ser.map(col): _*).orderBy(col("ts_ms"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.filter(col("is_anomaly"))
      .select(ser.map(col) ++ Seq(col("ts_ms"), zCol.as("__az")): _*)
      .withColumn("__nf",
        when(lag(col("ts_ms"), 1).over(w).isNull ||
          col("ts_ms") - lag(col("ts_ms"), 1).over(w) > gapMs, 1)
          .otherwise(0))
      .withColumn("__ep", sum(col("__nf")).over(wRun))
      .groupBy((ser :+ "__ep").map(col): _*)
      .agg(
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_points"),
        max(col("__az")).as("peak_abs_z"))
      .filter(col("n_points") >= minPoints)
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
      .select(ser.map(col) ++ Seq(col("start_ms"), col("end_ms"),
        col("duration_ms"), col("n_points"), col("peak_abs_z")): _*)
  }
}
