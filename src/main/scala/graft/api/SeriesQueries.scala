package graft.api

import graft.core.{OracleViews, Tables}
import graft.operators.{Anomaly, Series}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gate queries for the series-analytics surface ([[graft.operators.Series]]
  * selectors/reports and [[graft.operators.Anomaly]]'s seasonal scorer) —
  * the dashboard-facing operations a monitoring product layers on the
  * engine's served points. Oracle-parity per [[QDef]]'s scaladoc. */
object SeriesQueries {

  /** Top-5 series per tenant by whole-range mean
    * ([[Series.topSeries]], Graphite's highestAverage): exact-DECIMAL
    * mean, ties to smallest name, rank restated as a DuckDB row_number. */
  private val topk = QDef(
    "q_series_topk",
    s"""WITH ${OracleViews.metricsCte},
       |a AS (
       |  SELECT tenant_id, metric_name,
       |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
       |           / COUNT(value) AS stat_value
       |  FROM metrics GROUP BY 1, 2
       |),
       |r AS (
       |  SELECT tenant_id, metric_name, stat_value,
       |         CAST(row_number() OVER (PARTITION BY tenant_id
       |           ORDER BY stat_value DESC, metric_name) AS INT) AS rk
       |  FROM a
       |)
       |SELECT tenant_id, metric_name, stat_value, rk FROM r
       |WHERE rk <= 5 ORDER BY tenant_id, rk""".stripMargin) { (s, dir) =>
    Series.topSeries(Tables.metrics(s, dir), k = 5, stat = "mean")
      .orderBy("tenant_id", "rk")
  }

  /** Per-series completeness / gap report at day buckets
    * ([[Series.completenessReport]]): integer bucket arithmetic on both
    * sides, scalar-double completeness ratio. */
  private val gaps = {
    val bMs = 86400000L
    QDef(
      "q_series_gaps",
      s"""WITH ${OracleViews.metricsCte},
         |p AS (
         |  SELECT DISTINCT tenant_id, metric_name,
         |         CAST(ts_ms - ts_ms % $bMs AS BIGINT) AS bucket_ms
         |  FROM metrics
         |),
         |g AS (
         |  SELECT tenant_id, metric_name,
         |         min(bucket_ms) AS first_ms, max(bucket_ms) AS last_ms,
         |         CAST(count(*) AS BIGINT) AS n_present
         |  FROM p GROUP BY 1, 2
         |)
         |SELECT tenant_id, metric_name, first_ms, last_ms,
         |       (last_ms - first_ms) // $bMs + 1 AS n_expected, n_present,
         |       (last_ms - first_ms) // $bMs + 1 - n_present AS n_missing,
         |       CAST(n_present AS DOUBLE) /
         |         CAST((last_ms - first_ms) // $bMs + 1 AS DOUBLE)
         |         AS completeness
         |FROM g ORDER BY tenant_id, metric_name""".stripMargin) { (s, dir) =>
      Series.completenessReport(Tables.metrics(s, dir), bMs)
        .orderBy("tenant_id", "metric_name")
    }
  }

  /** Seasonal (hour-of-day) anomaly scan over per-tenant hourly sums
    * ([[Anomaly.seasonalZScores]]): the input series is itself a rollup
    * (the operator's documented 100 TB shape — score the tier, not raw
    * points); leave-one-out baselines restated in SQL via the same
    * snapped-term subtraction. */
  private val seasonal = {
    val hourMs = 3600000L
    val dayMs = 86400000L
    val th = 2.5
    val minP = 10
    QDef(
      "q_seasonal_anomaly",
      s"""WITH ${OracleViews.metricsCte},
         |h AS (
         |  SELECT tenant_id, 'tenant.' || tenant_id AS metric_name,
         |         CAST(ts_ms - ts_ms % $hourMs AS BIGINT) AS ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value
         |  FROM metrics GROUP BY 1, 2, 3
         |),
         |p AS (
         |  SELECT *, (ts_ms % $dayMs) // $hourMs AS phase FROM h
         |),
         |st AS (
         |  SELECT tenant_id, metric_name, phase,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS s,
         |         CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE) AS q
         |  FROM p GROUP BY 1, 2, 3
         |),
         |j AS (
         |  SELECT p.tenant_id, p.metric_name, p.ts_ms, p.value, p.phase,
         |         st.n - 1 AS n_base,
         |         CASE WHEN st.n - 1 > 0 THEN
         |           (st.s - CAST(CAST(p.value AS DECIMAL(28,2)) AS DOUBLE))
         |             / (st.n - 1) END AS mean_base,
         |         CASE WHEN st.n - 1 > 0 THEN st.q -
         |           CAST(CAST(p.value * p.value AS DECIMAL(38,8)) AS DOUBLE)
         |           END AS q_rest
         |  FROM p JOIN st USING (tenant_id, metric_name, phase)
         |),
         |sc AS (
         |  SELECT tenant_id, metric_name, ts_ms, value, phase, n_base,
         |         mean_base,
         |         CASE WHEN n_base > 0 THEN sqrt(greatest(
         |           q_rest / n_base - mean_base * mean_base, 0)) END AS std_base
         |  FROM j
         |)
         |SELECT tenant_id, metric_name, ts_ms, value, phase, n_base,
         |       mean_base, std_base,
         |       CASE WHEN n_base >= $minP AND std_base > 0
         |            THEN (value - mean_base) / std_base END AS z,
         |       (n_base >= $minP AND std_base > 0 AND
         |        abs(value - mean_base) > std_base * $th) AS is_anomaly
         |FROM sc
         |ORDER BY tenant_id, metric_name, ts_ms""".stripMargin) { (s, dir) =>
      val hourly = Tables.metrics(s, dir)
        .groupBy(col("tenant_id"),
          (col("ts_ms") - pmod(col("ts_ms"), lit(hourMs))).cast("long")
            .as("ts_ms"))
        .agg(sum(col("value").cast(DecimalType(28, 2))).cast("double")
          .as("value"))
        .withColumn("metric_name", concat(lit("tenant."), col("tenant_id")))
      Anomaly.seasonalZScores(hourly, periodMs = dayMs, phaseMs = hourMs,
          threshold = th, minPoints = minP)
        .select("tenant_id", "metric_name", "ts_ms", "value", "phase",
          "n_base", "mean_base", "std_base", "z", "is_anomaly")
        .orderBy("tenant_id", "metric_name", "ts_ms")
    }
  }

  /** Trailing 10-minute moving stats per series ([[Series.movingStats]],
    * Graphite's movingAverage-over-time family): one fused range-frame
    * window, exact-DECIMAL mean, restated verbatim in DuckDB (identical
    * frame and peer semantics). Scoped to one tenant's counters — the
    * dashboard shape (smooth the series you're looking at, not the
    * corpus). */
  private val movingAvg = {
    val wMs = 600000L
    QDef(
      "q_series_moving_avg",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, metric_name, ts_ms, value,
         |       CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
         |         / COUNT(*) OVER w AS mavg,
         |       MAX(value) OVER w AS mmax,
         |       MIN(value) OVER w AS mmin
         |FROM metrics
         |WHERE tenant_id = 'purchase'
         |WINDOW w AS (PARTITION BY tenant_id, metric_name ORDER BY ts_ms
         |             RANGE BETWEEN $wMs PRECEDING AND CURRENT ROW)
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) { (s, dir) =>
      Series.movingStats(
          Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"), wMs)
        .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** The prefix-sum moving average ([[Series.movingAvgPrefix]]) against
    * the SAME window-mean restatement as q_series_moving_avg (minus the
    * non-prefixable extremes): the claim is bit-identity of the exact
    * DECIMAL prefix-difference with the frame sum, so any divergence —
    * boundary off-by-one, duplicate-ts peer handling, null accounting —
    * is a hash failure here. */
  private val movingAvgPrefix = {
    val wMs = 600000L
    QDef(
      "q_series_moving_avg_prefix",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, metric_name, ts_ms, value,
         |       CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
         |         / COUNT(*) OVER w AS mavg
         |FROM metrics
         |WHERE tenant_id = 'purchase'
         |WINDOW w AS (PARTITION BY tenant_id, metric_name ORDER BY ts_ms
         |             RANGE BETWEEN $wMs PRECEDING AND CURRENT ROW)
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) { (s, dir) =>
      Series.movingAvgPrefix(
          Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"), wMs)
        .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** The full prefixable trailing-window family
    * ([[Series.movingWindowPrefix]] — Graphite's movingSum /
    * movingWindow-stddev beside the mean) against the RANGE-frame
    * restatement: window sum and mean are the exact-DECIMAL
    * prefix-difference ≡ frame-sum claim, and the stddev is the basic
    * rollup's (Σx² − (Σx)²/n)/n derived double (0-clamped, IEEE-exact
    * sqrt) over those same exact sums — identical scalar expressions both
    * sides, so boundary, peer, and clamp-branch decisions all hash. */
  private val movingWindowQ = {
    val wMs = 1800000L
    val winSumSql = "CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)"
    val varSql = s"""(CAST(SUM(CAST(value * value AS DECIMAL(38,8))) OVER w AS DOUBLE)
       |            - $winSumSql * $winSumSql / COUNT(*) OVER w)
       |            / COUNT(*) OVER w""".stripMargin
    QDef(
      "q_series_moving_window",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, metric_name, ts_ms, value,
         |       CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
         |       CASE WHEN COUNT(value) OVER w > 0
         |            THEN $winSumSql END AS msum,
         |       CASE WHEN COUNT(value) OVER w > 0
         |            THEN $winSumSql / COUNT(*) OVER w END AS mavg,
         |       CASE WHEN COUNT(value) OVER w > 0 THEN
         |         CASE WHEN $varSql > 0
         |              THEN SQRT($varSql) ELSE 0.0 END END AS mstd
         |FROM metrics
         |WHERE tenant_id = 'purchase'
         |WINDOW w AS (PARTITION BY tenant_id, metric_name ORDER BY ts_ms
         |             RANGE BETWEEN $wMs PRECEDING AND CURRENT ROW)
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) { (s, dir) =>
      Series.movingWindowPrefix(
          Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"), wMs)
        .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** Cross-series aggregation under a glob ([[Series.aggregateSeries]],
    * Graphite's sumSeries/averageSeries): all purchase-app series collapse
    * into one synthetic hourly mean series. The glob `app.purchase.*`
    * restates as a LIKE prefix in DuckDB; exact-DECIMAL mean. */
  private val seriesAgg = {
    val bMs = 3600000L
    QDef(
      "q_series_agg",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, 'agg.mean.app.purchase.*' AS metric_name,
         |       CAST(ts_ms - ts_ms % $bMs AS BIGINT) AS bucket_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
         |         AS value,
         |       COUNT(DISTINCT metric_name) AS n_series
         |FROM metrics
         |WHERE metric_name LIKE 'app.purchase.%'
         |GROUP BY 1, 3
         |ORDER BY tenant_id, bucket_ms""".stripMargin) { (s, dir) =>
      Series.aggregateSeries(Tables.metrics(s, dir), "app.purchase.*",
          "mean", bMs)
        .orderBy("tenant_id", "bucket_ms")
    }
  }

  /** Cross-series population STDDEV per bucket ([[Series.aggregateSeries]]
    * with the `stddev` stat, Graphite's stddevSeries): the basic rollup's
    * exact-sum/exact-sum-of-squares derived-double recipe, expanded form
    * 0-clamped where double cancellation goes fractionally negative —
    * the SAME scalar expression (including the clamp CASE) on both sides,
    * so the branch decision and the IEEE-exact sqrt agree bit-for-bit. */
  private val seriesAggStd = {
    val bMs = 3600000L
    val varSql = """(CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE)
       |          - CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
       |            * CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
       |            / COUNT(*)) / COUNT(*)""".stripMargin
    QDef(
      "q_series_agg_std",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, 'agg.stddev.app.purchase.*' AS metric_name,
         |       CAST(ts_ms - ts_ms % $bMs AS BIGINT) AS bucket_ms,
         |       CASE WHEN $varSql IS NULL THEN NULL
         |            WHEN $varSql > 0
         |            THEN SQRT($varSql) ELSE 0.0 END AS value,
         |       COUNT(DISTINCT metric_name) AS n_series
         |FROM metrics
         |WHERE metric_name LIKE 'app.purchase.%'
         |GROUP BY 1, 3
         |ORDER BY tenant_id, bucket_ms""".stripMargin) { (s, dir) =>
      Series.aggregateSeries(Tables.metrics(s, dir), "app.purchase.*",
          "stddev", bMs)
        .orderBy("tenant_id", "bucket_ms")
    }
  }

  /** Token-grouped aggregation ([[Series.groupByNode]], Graphite's
    * groupByNode): series sharing dot-token 1 of their name collapse into
    * one hourly-sum series per token, NAMED by the token — the legend
    * grouping dashboards build with. The token restates as DuckDB's
    * 1-based `string_split(...)[2]`; the distinct-contributor count needs
    * the pre-projection name, hence the staged CTE. */
  private val groupNode = {
    val bMs = 3600000L
    QDef(
      "q_series_group_node",
      s"""WITH ${OracleViews.metricsCte},
         |m2 AS (
         |  SELECT tenant_id, string_split(metric_name, '.')[2] AS node,
         |         ts_ms - ts_ms % $bMs AS bucket_ms, value,
         |         metric_name AS orig
         |  FROM metrics
         |)
         |SELECT tenant_id, node AS metric_name,
         |       CAST(bucket_ms AS BIGINT) AS bucket_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value,
         |       COUNT(DISTINCT orig) AS n_series
         |FROM m2
         |GROUP BY 1, 2, 3
         |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
      Series.groupByNode(Tables.metrics(s, dir), 1, "sum", bMs)
        .orderBy("tenant_id", "metric_name", "bucket_ms")
    }
  }

  /** Multi-node token grouping ([[Series.groupByNodes]], Graphite's
    * groupByNodes): the grouping key (and output name) is the dot-joined
    * selection of name tokens — here tokens 0 and 1 at daily buckets,
    * exact-DECIMAL mean. */
  private val groupNodes = {
    val bMs = 86400000L
    QDef(
      "q_series_group_nodes",
      s"""WITH ${OracleViews.metricsCte},
         |m2 AS (
         |  SELECT tenant_id,
         |         string_split(metric_name, '.')[1] || '.' ||
         |           string_split(metric_name, '.')[2] AS node,
         |         ts_ms - ts_ms % $bMs AS bucket_ms, value,
         |         metric_name AS orig
         |  FROM metrics
         |)
         |SELECT tenant_id, node AS metric_name,
         |       CAST(bucket_ms AS BIGINT) AS bucket_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
         |         AS value,
         |       COUNT(DISTINCT orig) AS n_series
         |FROM m2
         |GROUP BY 1, 2, 3
         |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
      Series.groupByNodes(Tables.metrics(s, dir), Seq(0, 1), "mean", bMs)
        .orderBy("tenant_id", "metric_name", "bucket_ms")
    }
  }

  /** Wildcard-collapse aggregation ([[Series.aggregateWithWildcards]],
    * Graphite's sumSeriesWithWildcards): series whose names match after
    * REMOVING node 2 (the per-user token of `app.<type>.user_<id>`)
    * sum into one series per collapsed name. The collapse restates in
    * DuckDB as `list_filter` with the 1-BASED index lambda (position p
    * 0-based → `i != p+1`); exact-DECIMAL sum. */
  private val aggWildcards = {
    val bMs = 3600000L
    QDef(
      "q_series_agg_wildcards",
      s"""WITH ${OracleViews.metricsCte},
         |m2 AS (
         |  SELECT tenant_id,
         |         array_to_string(list_filter(string_split(metric_name, '.'),
         |           (x, i) -> i != 3), '.') AS gname,
         |         ts_ms - ts_ms % $bMs AS bucket_ms, value,
         |         metric_name AS orig
         |  FROM metrics
         |)
         |SELECT tenant_id, gname AS metric_name,
         |       CAST(bucket_ms AS BIGINT) AS bucket_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value,
         |       COUNT(DISTINCT orig) AS n_series
         |FROM m2
         |GROUP BY 1, 2, 3
         |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
      Series.aggregateWithWildcards(Tables.metrics(s, dir), Seq(2), "sum", bMs)
        .orderBy("tenant_id", "metric_name", "bucket_ms")
    }
  }

  /** Node-paired weighted average ([[Series.weightedAverage]], Graphite's
    * weightedAverage): purchase-tenant series averaged with view-tenant
    * weights, paired on the user token (node 2). Orderless exactness via
    * floor(x·1e10) LONG units (one IEEE product + floor is bit-identical
    * everywhere, integer sums commute — the Similarity.lloyd remedy); the
    * served value is the long-ratio, restated verbatim. 1e10 is written in
    * E-notation on the SQL side so DuckDB parses it directly as DOUBLE. */
  private val weightedAvg = {
    val bMs = 3600000L
    QDef(
      "q_series_weighted_avg",
      s"""WITH ${OracleViews.metricsCte},
         |a AS (
         |  SELECT tenant_id, string_split(metric_name, '.')[3] AS k,
         |         ts_ms - ts_ms % $bMs AS b,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |           / COUNT(value) AS av
         |  FROM metrics WHERE tenant_id = 'purchase' GROUP BY 1, 2, 3
         |),
         |w AS (
         |  SELECT string_split(metric_name, '.')[3] AS k,
         |         ts_ms - ts_ms % $bMs AS b,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |           / COUNT(value) AS wv
         |  FROM metrics WHERE tenant_id = 'view' GROUP BY 1, 2
         |)
         |SELECT a.tenant_id, 'weightedAverage' AS metric_name,
         |       CAST(a.b AS BIGINT) AS bucket_ms,
         |       CASE WHEN SUM(CAST(FLOOR(wv * 1E10) AS BIGINT)) <> 0 THEN
         |       CAST(SUM(CAST(FLOOR(av * wv * 1E10) AS BIGINT)) AS DOUBLE)
         |         / CAST(SUM(CAST(FLOOR(wv * 1E10) AS BIGINT)) AS DOUBLE)
         |       END AS value,
         |       COUNT(*) AS n_keys
         |FROM a JOIN w ON a.k = w.k AND a.b = w.b
         |GROUP BY 1, 3
         |ORDER BY tenant_id, bucket_ms""".stripMargin) { (s, dir) =>
      val m = Tables.metrics(s, dir)
      Series.weightedAverage(
          m.filter(col("tenant_id") === "purchase"),
          m.filter(col("tenant_id") === "view"), Seq(2), bMs)
        .orderBy("tenant_id", "bucket_ms")
    }
  }

  /** Rate→count re-bucketing with exact interval proration
    * ([[Series.hitcount]], Graphite's hitcount for an irregular store):
    * each sample's per-second rate covers [ts, next_ts) capped at the 1 h
    * gap bound, hits prorate across every overlapped hourly bucket, and
    * accumulation runs in floor(rate·overlap_ms·1e4) LONG units served as
    * the long-ratio. DuckDB restates the bounded explode as a LATERAL
    * generate_series over integer bucket indexes (`//` = `div`), the lead
    * over (ts, value) so ties stay total-ordered, and the identical
    * floor-unit algebra. */
  private val hitcountQ = {
    val bMs = 3600000L
    QDef(
      "q_series_hitcount",
      s"""WITH ${OracleViews.metricsCte},
         |n0 AS (
         |  -- the null filter runs BEFORE the lead on both sides: a null
         |  -- sample neither contributes hits nor terminates the previous
         |  -- sample's interval (fix-both-sides convention; HitcountSpec
         |  -- pins the null-bearing fixture)
         |  SELECT tenant_id, metric_name, ts_ms, value,
         |         LEAD(ts_ms) OVER (PARTITION BY tenant_id, metric_name
         |                           ORDER BY ts_ms, value) AS ld
         |  FROM metrics WHERE value IS NOT NULL
         |),
         |n AS (
         |  -- LEAST skips NULLs: gate on the lead so the LAST sample of a
         |  -- series contributes nothing (the engine's exact rule)
         |  SELECT tenant_id, metric_name, ts_ms, value,
         |         CASE WHEN ld IS NOT NULL
         |              THEN LEAST(ld, ts_ms + 3600000) END AS nxt
         |  FROM n0
         |),
         |x AS (
         |  SELECT tenant_id, metric_name, ts_ms, value, nxt,
         |         b.b * $bMs AS bucket_ms
         |  FROM n, LATERAL (SELECT UNNEST(generate_series(
         |         ts_ms // $bMs, (nxt - 1) // $bMs)) AS b) b
         |  WHERE nxt IS NOT NULL AND nxt > ts_ms
         |)
         |SELECT tenant_id, metric_name, CAST(bucket_ms AS BIGINT) AS bucket_ms,
         |       CAST(SUM(CAST(FLOOR(value *
         |         (LEAST(nxt, bucket_ms + $bMs) - GREATEST(ts_ms, bucket_ms))
         |         * 1E4) AS BIGINT)) AS DOUBLE) / 1E7 AS hits
         |FROM x
         |GROUP BY 1, 2, 3
         |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
      Series.hitcount(Tables.metrics(s, dir), bMs)
        .orderBy("tenant_id", "metric_name", "bucket_ms")
    }
  }

  /** Week-over-week self-comparison at daily buckets
    * ([[Series.timeShiftCompare]], Graphite's timeShift + delta panel):
    * the shifted lookup restates as the same point-pinned RANGE frame in
    * DuckDB; delta/ratio are scalar-double over identical inputs. */
  private val timeshift = {
    val bMs = 86400000L
    val shiftMs = 7L * 86400000L
    QDef(
      "q_series_timeshift",
      s"""WITH ${OracleViews.metricsCte},
         |b AS (
         |  SELECT tenant_id, metric_name,
         |         CAST(ts_ms - ts_ms % $bMs AS BIGINT) AS bucket_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
         |           AS value
         |  FROM metrics GROUP BY 1, 2, 3
         |),
         |s AS (
         |  SELECT tenant_id, metric_name, bucket_ms, value,
         |         MAX(value) OVER (PARTITION BY tenant_id, metric_name
         |           ORDER BY bucket_ms RANGE BETWEEN $shiftMs PRECEDING
         |           AND $shiftMs PRECEDING) AS shifted_value
         |  FROM b
         |)
         |SELECT tenant_id, metric_name, bucket_ms, value, shifted_value,
         |       value - shifted_value AS delta,
         |       CASE WHEN shifted_value <> 0 THEN value / shifted_value END
         |         AS ratio
         |FROM s
         |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
      Series.timeShiftCompare(Tables.metrics(s, dir), bMs, shiftMs, "mean")
        .orderBy("tenant_id", "metric_name", "bucket_ms")
    }
  }

  /** Per-series running total ([[Series.integral]], Graphite's integral):
    * the exact-DECIMAL running-sum frame restated verbatim in DuckDB.
    * Scoped to one tenant — the dashboard shape. */
  private val integral = QDef(
    "q_series_integral",
    s"""WITH ${OracleViews.metricsCte}
       |SELECT tenant_id, metric_name, ts_ms, value,
       |       CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER (
       |         PARTITION BY tenant_id, metric_name
       |         ORDER BY ts_ms, value
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |         AS cumsum
       |FROM metrics
       |WHERE tenant_id = 'purchase'
       |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) { (s, dir) =>
    Series.integral(Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"))
      .orderBy("tenant_id", "metric_name", "ts_ms", "value")
  }

  /** Cross-series p90 under a glob at daily buckets
    * ([[Series.quantileOfSeries]], Graphite's percentileOfSeries): exact
    * interpolated percentile over per-series bucket means, snapped to
    * DECIMAL(18,6) on both sides (quantile_cont ≡ Spark percentile). */
  private val quantile = {
    val bMs = 86400000L
    QDef(
      "q_series_quantile",
      s"""WITH ${OracleViews.metricsCte},
         |b AS (
         |  SELECT tenant_id, metric_name,
         |         CAST(ts_ms - ts_ms % $bMs AS BIGINT) AS bucket_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
         |           AS v
         |  FROM metrics
         |  WHERE metric_name LIKE 'app.%.%'
         |  GROUP BY 1, 2, 3
         |)
         |SELECT tenant_id, 'quantile.0.9.app.*.*' AS metric_name, bucket_ms,
         |       CAST(CAST(quantile_cont(v, 0.9) AS DECIMAL(18,6)) AS DOUBLE)
         |         AS qvalue,
         |       CAST(COUNT(*) AS BIGINT) AS n_series
         |FROM b GROUP BY 1, 3
         |ORDER BY tenant_id, bucket_ms""".stripMargin) { (s, dir) =>
      Series.quantileOfSeries(Tables.metrics(s, dir), "app.*.*", 0.9, bMs)
        .orderBy("tenant_id", "bucket_ms")
    }
  }

  /** EWMA forecast bands over per-tenant hourly sums
    * ([[Anomaly.ewmaBands]], the holtWinters-family aberration detector):
    * the inherently SEQUENTIAL recurrence runs in the codegen
    * [[graft.functions.EwmaScan]] on the engine side and as a recursive
    * CTE on the oracle side — one iteration per time rank, all series in
    * lockstep. Both engines fold the identical doubles in the identical
    * order (α and β = 1 − α are interpolated from the same Scala doubles),
    * so every smoothed level, deviation, and band double hashes equal with
    * no snapping. Input = hourly per-tenant sums (the q_seasonal_anomaly
    * shape: score a rollup, not raw points). */
  private def ewmaHourly(s: SparkSession, dir: String,
      hourMs: Long): DataFrame =
    Tables.metrics(s, dir)
      .groupBy(col("tenant_id"),
        (col("ts_ms") - pmod(col("ts_ms"), lit(hourMs))).cast("long")
          .as("ts_ms"))
      .agg(sum(col("value").cast(DecimalType(28, 2))).cast("double")
        .as("value"))
      .withColumn("metric_name", concat(lit("tenant."), col("tenant_id")))

  private def ewmaOracleSql(hourMs: Long, alpha: Double, beta: Double,
      k: Double, minP: Int): String =
      s"""WITH RECURSIVE ${OracleViews.metricsCte},
         |h AS (
         |  SELECT tenant_id, 'tenant.' || tenant_id AS metric_name,
         |         CAST(ts_ms - ts_ms % $hourMs AS BIGINT) AS ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value
         |  FROM metrics GROUP BY 1, 2, 3
         |),
         |p AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY tenant_id,
         |    metric_name ORDER BY ts_ms) AS INT) AS rn FROM h
         |),
         |rec AS (
         |  SELECT tenant_id, metric_name, ts_ms, value, rn,
         |         value AS s, CAST(0.0 AS DOUBLE) AS d,
         |         CAST(NULL AS DOUBLE) AS sp, CAST(NULL AS DOUBLE) AS dp
         |  FROM p WHERE rn = 1
         |  UNION ALL
         |  SELECT p.tenant_id, p.metric_name, p.ts_ms, p.value, p.rn,
         |         $alpha * p.value + $beta * r.s,
         |         $alpha * abs(p.value - r.s) + $beta * r.d,
         |         r.s, r.d
         |  FROM p JOIN rec r ON p.tenant_id = r.tenant_id
         |    AND p.metric_name = r.metric_name AND p.rn = r.rn + 1
         |)
         |SELECT tenant_id, metric_name, rn, ts_ms, value,
         |       s AS ewma, d AS dev, sp AS s_prev, dp AS d_prev,
         |       sp + $k * dp AS upper, sp - $k * dp AS lower,
         |       COALESCE(rn > $minP AND dp > 0
         |         AND abs(value - sp) > $k * dp, FALSE) AS is_aberrant
         |FROM rec
         |ORDER BY tenant_id, metric_name, ts_ms""".stripMargin

  private val ewma = {
    val hourMs = 3600000L
    val alpha = 0.3
    val beta = 1.0 - alpha // the same double EwmaScan derives from alpha
    val k = 3.0
    val minP = 24
    QDef("q_series_ewma", ewmaOracleSql(hourMs, alpha, beta, k, minP)) {
      (s, dir) =>
        Anomaly.ewmaBands(ewmaHourly(s, dir, hourMs), alpha, k, minP)
          .select("tenant_id", "metric_name", "rn", "ts_ms", "value",
            "ewma", "dev", "s_prev", "d_prev", "upper", "lower", "is_aberrant")
          .orderBy("tenant_id", "metric_name", "ts_ms")
    }
  }

  /** The SEGMENTED (unbounded, O(1)-task-memory) EWMA fold
    * ([[Anomaly.ewmaBandsSegmented]]) against the IDENTICAL recursive-CTE
    * oracle as q_series_ewma — the q_text_bm25_index discipline: two
    * engine access paths, one oracle, so the streaming fold is hash-proven
    * bit-equal to both the collect_list scan and DuckDB's recurrence. */
  private val ewmaSeg = {
    val hourMs = 3600000L
    val alpha = 0.3
    val beta = 1.0 - alpha
    val k = 3.0
    val minP = 24
    QDef("q_series_ewma_seg", ewmaOracleSql(hourMs, alpha, beta, k, minP)) {
      (s, dir) =>
        Anomaly.ewmaBandsSegmented(ewmaHourly(s, dir, hourMs), alpha, k, minP)
          .orderBy("tenant_id", "metric_name", "ts_ms")
    }
  }

  /** Additive Holt-Winters bands over per-tenant hourly sums
    * ([[Anomaly.holtWintersBands]], Graphite's real holtWintersForecast
    * family — level + trend + 24-phase seasonality on hourly buckets, with
    * seasonal deviations): the triple recurrence restated as a DuckDB
    * recursive CTE whose state carries the per-phase seasonal/deviation
    * arrays as length-24 LISTs (front = the phase entry from one season
    * ago; step = drop-front-append, `sarr[2:] || [s]`). Every emitted
    * level/trend/seasonal/dev/forecast/band double hashes equal with no
    * snapping: both engines fold identical doubles in identical order (the
    * complements 1−α, 1−β, 1−γ interpolate from the very Scala doubles
    * [[graft.functions.HwScan]] derives). */
  private val holtWinters = {
    val hourMs = 3600000L
    val season = 24
    val alpha = 0.1
    val bt = 0.0035
    val g = 0.1
    val ia = 1.0 - alpha
    val ib = 1.0 - bt
    val ig = 1.0 - g
    val k = 3.0
    val minP = 24
    QDef(
      "q_series_holtwinters",
      s"""WITH RECURSIVE ${OracleViews.metricsCte},
         |h AS (
         |  SELECT tenant_id, 'tenant.' || tenant_id AS metric_name,
         |         CAST(ts_ms - ts_ms % $hourMs AS BIGINT) AS ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value
         |  FROM metrics GROUP BY 1, 2, 3
         |),
         |p AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY tenant_id,
         |    metric_name ORDER BY ts_ms) AS INT) AS rn FROM h
         |),
         |rec AS (
         |  SELECT tenant_id, metric_name, ts_ms, value, rn,
         |         value AS l, CAST(0.0 AS DOUBLE) AS b,
         |         CAST(0.0 AS DOUBLE) AS s, CAST(0.0 AS DOUBLE) AS d,
         |         CAST(NULL AS DOUBLE) AS f, CAST(NULL AS DOUBLE) AS dpre,
         |         list_transform(range($season), i -> CAST(0.0 AS DOUBLE))
         |           AS sarr,
         |         list_transform(range($season), i -> CAST(0.0 AS DOUBLE))
         |           AS darr
         |  FROM p WHERE rn = 1
         |  UNION ALL
         |  SELECT tenant_id, metric_name, ts_ms, value, rn, l, b, s, d,
         |         f, dpre, sarr[2:] || [s], darr[2:] || [d]
         |  FROM (
         |    SELECT p.tenant_id, p.metric_name, p.ts_ms, p.value, p.rn,
         |           $alpha * (p.value - r.sarr[1]) + $ia * (r.l + r.b) AS l,
         |           $bt * ($alpha * (p.value - r.sarr[1])
         |             + $ia * (r.l + r.b) - r.l) + $ib * r.b AS b,
         |           $g * (p.value - ($alpha * (p.value - r.sarr[1])
         |             + $ia * (r.l + r.b))) + $ig * r.sarr[1] AS s,
         |           $g * abs(p.value - (r.l + r.b + r.sarr[1]))
         |             + $ig * r.darr[1] AS d,
         |           r.l + r.b + r.sarr[1] AS f,
         |           r.darr[1] AS dpre,
         |           r.sarr AS sarr, r.darr AS darr
         |    FROM p JOIN rec r ON p.tenant_id = r.tenant_id
         |      AND p.metric_name = r.metric_name AND p.rn = r.rn + 1
         |  )
         |)
         |SELECT tenant_id, metric_name, rn, ts_ms, value, l AS level,
         |       b AS trend, s AS seasonal, d AS dev, f AS forecast,
         |       dpre AS dev_used, f + $k * dpre AS upper,
         |       f - $k * dpre AS lower,
         |       COALESCE(rn > $minP AND dpre > 0
         |         AND abs(value - f) > $k * dpre, FALSE) AS is_aberrant
         |FROM rec
         |ORDER BY tenant_id, metric_name, ts_ms""".stripMargin) { (s, dir) =>
      Anomaly.holtWintersBands(ewmaHourly(s, dir, hourMs), season,
          alpha, bt, g, k, minP)
        .orderBy("tenant_id", "metric_name", "ts_ms")
    }
  }

  /** Per-series least-squares trend + capacity forecast
    * ([[Series.linearTrend]], Graphite's linearRegression/timeToReach):
    * the full OLS restated in SQL over the identical per-term-snapped
    * DECIMAL(38,8) accumulators; slope/intercept/r²/forecast/reach are
    * scalar doubles over those exact sums on both sides. */
  private val trend = {
    val horizonS = 604800.0
    val horizonMin = horizonS / 60.0 // the same double the operator derives
    val th = 500.0
    QDef(
      "q_series_trend",
      s"""WITH ${OracleViews.metricsCte},
         |t0 AS (
         |  SELECT tenant_id, metric_name, MIN(ts_ms) AS min_ms
         |  FROM metrics GROUP BY 1, 2
         |),
         |j AS (
         |  SELECT m.tenant_id, m.metric_name, t0.min_ms,
         |         (m.ts_ms - t0.min_ms) // 60000 AS dt_min,
         |         CAST((m.ts_ms - t0.min_ms) // 60000 AS DECIMAL(19,0)) AS dt,
         |         CAST(CAST(m.value AS DECIMAL(18,2)) * 100
         |           AS DECIMAL(19,0)) AS vc
         |  FROM metrics m JOIN t0 USING (tenant_id, metric_name)
         |),
         |a AS (
         |  SELECT tenant_id, metric_name,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         MIN(min_ms) AS min_ms,
         |         MAX(dt_min) AS t_max_min,
         |         CAST(SUM(dt_min) AS DOUBLE) AS st,
         |         CAST(SUM(vc) AS DOUBLE) / 100.0 AS sv,
         |         CAST(SUM(dt * dt) AS DOUBLE) AS stt,
         |         CAST(SUM(dt * vc) AS DOUBLE) / 100.0 AS stv,
         |         CAST(SUM(vc * vc) AS DOUBLE) / 10000.0 AS svv
         |  FROM j GROUP BY 1, 2
         |),
         |f AS (
         |  SELECT tenant_id, metric_name, n, min_ms, t_max_min, st, sv, svv,
         |         n * stt - st * st AS var_t,
         |         n * svv - sv * sv AS var_v,
         |         n * stv - st * sv AS cov,
         |         CASE WHEN n * stt - st * st > 0
         |              THEN (n * stv - st * sv) / (n * stt - st * st) END
         |           AS slope_per_min
         |  FROM a
         |),
         |g AS (
         |  SELECT *, (sv - slope_per_min * st) / n AS intercept FROM f
         |)
         |SELECT tenant_id, metric_name, n, t_max_min,
         |       slope_per_min / 60.0 AS slope_per_s,
         |       slope_per_min * 1440.0 AS slope_per_d, intercept,
         |       CASE WHEN var_t > 0 AND var_v > 0
         |            THEN (cov * cov) / (var_t * var_v) END AS r2,
         |       intercept + slope_per_min * (t_max_min + $horizonMin)
         |         AS forecast_value,
         |       CASE WHEN slope_per_min <> 0 THEN
         |         min_ms + ($th - intercept) / slope_per_min * 60000.0 END
         |         AS reach_ts_ms
         |FROM g
         |ORDER BY tenant_id, metric_name""".stripMargin) { (s, dir) =>
      Series.linearTrend(Tables.metrics(s, dir), horizonS, th)
        .orderBy("tenant_id", "metric_name")
    }
  }

  /** Per-series p95 outlier clamp ([[Series.clampOutliers]], Graphite's
    * removeAbovePercentile + the clamped variant): series percentile
    * snapped to DECIMAL(18,6) on both sides, then a plain comparison
    * join-back. */
  private val clamp = QDef(
    "q_series_clamp",
    s"""WITH ${OracleViews.metricsCte},
       |q AS (
       |  SELECT tenant_id, metric_name,
       |         CAST(CAST(quantile_cont(value, 0.95) AS DECIMAL(18,6))
       |           AS DOUBLE) AS p_value
       |  FROM metrics WHERE tenant_id = 'purchase' GROUP BY 1, 2
       |)
       |SELECT m.tenant_id, m.metric_name, m.ts_ms, m.value, q.p_value,
       |       LEAST(m.value, q.p_value) AS clamped,
       |       m.value > q.p_value AS is_outlier
       |FROM metrics m JOIN q USING (tenant_id, metric_name)
       |WHERE m.tenant_id = 'purchase'
       |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) { (s, dir) =>
    Series.clampOutliers(
        Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"), 0.95)
      .orderBy("tenant_id", "metric_name", "ts_ms", "value")
  }

  /** Incident annotation — the bucketed time-range join
    * ([[graft.operators.TimeJoin.within]]): every purchase-series anomaly
    * (the q_metric_anomaly scan) pairs with the error events that fired
    * within ±1 h of it, cross-tenant. The oracle restates the z-scan
    * verbatim and the range join as a BETWEEN predicate — same pairs, so
    * the bucketed equi-join rewrite is hash-proven against the naive
    * form. */
  private val anomalyEvents = {
    val winMs = 7L * 86400000L
    val th = 2.5
    val minP = 5
    val wMs = 3600000L
    QDef(
      "q_anomaly_events",
      s"""WITH ${OracleViews.metricsCte},
         |z AS (
         |  SELECT tenant_id, metric_name, ts_ms, value,
         |         CAST(count(*) OVER w AS BIGINT) AS n_win,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS s,
         |         CAST(SUM(CAST(value * value AS DECIMAL(38,8))) OVER w AS DOUBLE) AS q
         |  FROM metrics WHERE tenant_id = 'purchase'
         |  WINDOW w AS (PARTITION BY tenant_id, metric_name ORDER BY ts_ms
         |               RANGE BETWEEN $winMs PRECEDING AND 1 PRECEDING)
         |),
         |sc AS (
         |  SELECT tenant_id, metric_name, ts_ms, value, n_win,
         |         s / n_win AS mean_win,
         |         sqrt(greatest(q / n_win - (s / n_win) * (s / n_win), 0)) AS std_win
         |  FROM z WHERE n_win >= $minP
         |),
         |a AS (
         |  SELECT tenant_id, metric_name, ts_ms,
         |         (value - mean_win) / std_win AS z
         |  FROM sc
         |  WHERE std_win > 0 AND abs(value - mean_win) > $th * std_win
         |),
         |e AS (
         |  SELECT metric_name AS event_name, ts_ms AS event_ts,
         |         value AS event_value
         |  FROM metrics WHERE tenant_id = 'error'
         |)
         |SELECT a.tenant_id, a.metric_name, a.ts_ms, a.z,
         |       e.event_name, e.event_ts, e.event_value,
         |       e.event_ts - a.ts_ms AS dt_ms
         |FROM a JOIN e
         |  ON e.event_ts BETWEEN a.ts_ms - $wMs AND a.ts_ms + $wMs
         |ORDER BY tenant_id, metric_name, ts_ms, z, event_name, event_ts,
         |         event_value""".stripMargin) { (s, dir) =>
      val anoms = Anomaly.rollingZScores(
          Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"),
          windowMs = winMs, threshold = th, minPoints = minP)
        .filter(col("is_anomaly"))
        .select(col("tenant_id"), col("metric_name"), col("ts_ms"), col("z"))
      val events = Tables.metrics(s, dir)
        .filter(col("tenant_id") === "error")
        .select(col("metric_name").as("event_name"),
          col("ts_ms").as("event_ts"), col("value").as("event_value"))
      graft.operators.TimeJoin.within(anoms, "ts_ms", events, "event_ts", wMs)
        .withColumn("dt_ms", col("event_ts") - col("ts_ms"))
        .select("tenant_id", "metric_name", "ts_ms", "z", "event_name",
          "event_ts", "event_value", "dt_ms")
        .orderBy("tenant_id", "metric_name", "ts_ms", "z", "event_name",
          "event_ts", "event_value")
    }
  }

  /** Shared shape of the two as-of gate queries: every purchase point
    * against its own series' most recent COMPLETED 60m baseline mean
    * ([[graft.operators.TimeJoin.asOf]] — the "current value vs last
    * finished window" enrichment). The baseline for the hour starting at
    * B becomes available at B + 60m, so points in a series' first hour
    * have no baseline (left-join nulls exercised). The oracle is DuckDB's
    * native `ASOF LEFT JOIN` — the union+window rewrite is hash-proven
    * against the engine-native operator, including tie (point exactly at
    * a completion instant → inclusive match) and no-match rows. */
  private def asofPlan(s: SparkSession, dir: String,
      withinMs: Option[Long]): DataFrame = {
    val m = Tables.metrics(s, dir).filter(col("tenant_id") === "purchase")
    val right = m.groupBy(col("tenant_id"), col("metric_name"),
        (col("ts_ms") - pmod(col("ts_ms"), lit(3600000L)) + 3600000L)
          .as("baseline_ms"))
      .agg((sum(col("value").cast(DecimalType(28, 2))).cast("double") /
        count(lit(1))).as("baseline_avg"))
    graft.operators.TimeJoin.asOf(m, "ts_ms", right, "baseline_ms",
        Seq("tenant_id", "metric_name"), withinMs)
      .withColumn("delta", col("value") - col("baseline_avg"))
      .orderBy("tenant_id", "metric_name", "ts_ms", "value")
  }

  private def asofOracle(mask: Option[Long]): String = {
    val proj = mask match {
      case None => """baseline_ms, baseline_avg, value - baseline_avg AS delta"""
      case Some(w) =>
        s"""CASE WHEN ts_ms - baseline_ms <= $w THEN baseline_ms END AS baseline_ms,
           |       CASE WHEN ts_ms - baseline_ms <= $w THEN baseline_avg END AS baseline_avg,
           |       CASE WHEN ts_ms - baseline_ms <= $w THEN value - baseline_avg END AS delta""".stripMargin
    }
    s"""WITH ${OracleViews.metricsCte},
       |b AS (
       |  SELECT tenant_id, metric_name,
       |         ts_ms - (ts_ms % 3600000) + 3600000 AS baseline_ms,
       |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
       |           AS baseline_avg
       |  FROM metrics WHERE tenant_id = 'purchase' GROUP BY 1, 2, 3
       |),
       |l AS (
       |  SELECT tenant_id, metric_name, ts_ms, value
       |  FROM metrics WHERE tenant_id = 'purchase'
       |),
       |j AS (
       |  SELECT l.tenant_id, l.metric_name, l.ts_ms, l.value,
       |         b.baseline_ms, b.baseline_avg
       |  FROM l ASOF LEFT JOIN b
       |    ON l.tenant_id = b.tenant_id AND l.metric_name = b.metric_name
       |   AND l.ts_ms >= b.baseline_ms
       |)
       |SELECT tenant_id, metric_name, ts_ms, value,
       |       $proj
       |FROM j ORDER BY 1, 2, 3, 4""".stripMargin
  }

  /** Unbounded as-of (per-key window arm). */
  private val asofBaseline = QDef("q_asof_baseline", asofOracle(None)) {
    (s, dir) => asofPlan(s, dir, None)
  }

  /** Bounded as-of (time-bucket-sharded arm, lookback ≤ 2 h): series gaps
    * longer than the tolerance surface as nulls, proving the bucketed
    * rewrite's post-filter against the oracle's masked ASOF result. */
  private val asofWithin = {
    val w = 7200000L
    QDef("q_asof_within", asofOracle(Some(w))) { (s, dir) =>
      asofPlan(s, dir, Some(w))
    }
  }

  /** Render-side triangle downsampling ([[Series.downsampleTriangle]],
    * the LTTB family): every purchase series decimated to ≤ 20 points.
    * The oracle restates the whole pipeline — rank bucketing, exact-
    * DECIMAL centroids, lag/lead anchors with endpoint fallback, the
    * double area expression, the per-bucket argmax — so the selection is
    * hash-proven point for point. */
  private val lttb = {
    val b = 20
    QDef(
      "q_series_lttb",
      s"""WITH ${OracleViews.metricsCte},
         |base AS (
         |  SELECT tenant_id, metric_name, ts_ms, value,
         |         CAST(row_number() OVER w AS BIGINT) AS rn,
         |         CAST(count(*) OVER (PARTITION BY tenant_id, metric_name)
         |           AS BIGINT) AS n
         |  FROM metrics WHERE tenant_id = 'purchase'
         |  WINDOW w AS (PARTITION BY tenant_id, metric_name
         |               ORDER BY ts_ms, value)
         |),
         |ends AS (
         |  SELECT tenant_id, metric_name,
         |         CAST(CASE WHEN rn = 1 THEN 0 ELSE ${b - 1} END AS INT)
         |           AS bucket,
         |         ts_ms, value
         |  FROM base WHERE rn = 1 OR rn = n
         |),
         |mid AS (
         |  SELECT tenant_id, metric_name, ts_ms, value, rn, n,
         |         CAST(1 + ((rn - 2) * ${b - 2}) // (n - 2) AS INT) AS bucket
         |  FROM base WHERE rn > 1 AND rn < n
         |),
         |fl AS (
         |  SELECT tenant_id, metric_name,
         |         MAX(CASE WHEN rn = 1 THEN ts_ms END) AS f_ts,
         |         MAX(CASE WHEN rn = 1 THEN value END) AS f_v,
         |         MAX(CASE WHEN rn = n THEN ts_ms END) AS l_ts,
         |         MAX(CASE WHEN rn = n THEN value END) AS l_v
         |  FROM base GROUP BY 1, 2
         |),
         |cent AS (
         |  SELECT tenant_id, metric_name, bucket,
         |         CAST(SUM(CAST(ts_ms AS DECIMAL(28,0))) AS DOUBLE)
         |           / COUNT(*) AS ct,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |           / COUNT(*) AS cv
         |  FROM mid GROUP BY 1, 2, 3
         |),
         |anch AS (
         |  SELECT c.tenant_id, c.metric_name, c.bucket,
         |         COALESCE(lag(ct) OVER wb, CAST(f_ts AS DOUBLE)) AS a1_ts,
         |         COALESCE(lag(cv) OVER wb, f_v) AS a1_v,
         |         COALESCE(lead(ct) OVER wb, CAST(l_ts AS DOUBLE)) AS a2_ts,
         |         COALESCE(lead(cv) OVER wb, l_v) AS a2_v
         |  FROM cent c JOIN fl USING (tenant_id, metric_name)
         |  WINDOW wb AS (PARTITION BY c.tenant_id, c.metric_name
         |                ORDER BY c.bucket)
         |),
         |scored AS (
         |  SELECT m.tenant_id, m.metric_name, m.bucket, m.ts_ms, m.value,
         |         abs((a.a1_ts - CAST(m.ts_ms AS DOUBLE)) * (a.a2_v - m.value) -
         |             (a.a2_ts - CAST(m.ts_ms AS DOUBLE)) * (a.a1_v - m.value))
         |           AS area
         |  FROM mid m JOIN anch a USING (tenant_id, metric_name, bucket)
         |),
         |win AS (
         |  SELECT *, row_number() OVER (
         |           PARTITION BY tenant_id, metric_name, bucket
         |           ORDER BY area DESC, ts_ms, value) AS rk
         |  FROM scored
         |)
         |SELECT tenant_id, metric_name, bucket, ts_ms, value
         |FROM win WHERE rk = 1
         |UNION ALL
         |SELECT tenant_id, metric_name, bucket, ts_ms, value FROM ends
         |ORDER BY tenant_id, metric_name, bucket, ts_ms, value""".stripMargin) {
      (s, dir) =>
        Series.downsampleTriangle(
            Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"), b)
          .orderBy("tenant_id", "metric_name", "bucket", "ts_ms", "value")
    }
  }

  /** Strict canonical LTTB ([[Series.lttbExact]], the codegen
    * [[graft.functions.LttbScan]] chain), HASH-PROVEN against a DuckDB
    * restatement of the full sequential selection — the q_series_ewma
    * recursive-CTE discipline applied to the previously-selected-point
    * recurrence. Bucket boundaries restate `lo(k) = 1 + (k·(n−2)) div m`
    * directly (never the floor-division dual, which disagrees off exact
    * multiples); candidates and centroid terms carry in per-bucket LISTs
    * ordered by point index, with `list_reduce` folding the centroid sums
    * in exactly the engine loop's left-to-right order (a plain SUM could
    * reassociate); the recursion then walks buckets k = 0..m−1, each step
    * list_reduce-folding the bucket's candidates against the PREVIOUS
    * step's selected point and the precomputed next-bucket anchor with the
    * identical double area expression, strict `>` keeping the earliest
    * point on ties, exactly like the codegen scan. n ≤ B series short-cut
    * to select-everything on both sides. Every selected (bucket, ts,
    * value) hashes equal. */
  private val lttbExact = {
    val b = 20
    QDef(
      "q_series_lttb_exact",
      s"""WITH RECURSIVE ${OracleViews.metricsCte},
         |base AS (
         |  SELECT tenant_id, metric_name, ts_ms, value,
         |         CAST(row_number() OVER w - 1 AS BIGINT) AS idx,
         |         CAST(count(*) OVER (PARTITION BY tenant_id, metric_name)
         |           AS BIGINT) AS n
         |  FROM metrics WHERE tenant_id = 'purchase'
         |  WINDOW w AS (PARTITION BY tenant_id, metric_name
         |               ORDER BY ts_ms, value)
         |),
         |small AS (
         |  SELECT tenant_id, metric_name, CAST(idx AS INT) AS bucket,
         |         ts_ms, value
         |  FROM base WHERE n <= $b
         |),
         |big AS (SELECT * FROM base WHERE n > $b),
         |ser AS (SELECT tenant_id, metric_name, MAX(n) AS n
         |        FROM big GROUP BY 1, 2),
         |lastp AS (
         |  SELECT tenant_id, metric_name, CAST(ts_ms AS DOUBLE) AS lx,
         |         value AS ly
         |  FROM big WHERE idx = n - 1
         |),
         |bkt AS (
         |  SELECT s.tenant_id, s.metric_name, k.k,
         |         1 + (k.k * (s.n - 2)) // ${b - 2} AS lo,
         |         1 + ((k.k + 1) * (s.n - 2)) // ${b - 2} AS hi
         |  FROM ser s CROSS JOIN
         |    (SELECT unnest(range(0, ${b - 2})) AS k) k
         |),
         |binfo AS (
         |  SELECT bb.tenant_id, bb.metric_name, bb.k,
         |         list(struct_pack(idx := p.idx,
         |                          tx := CAST(p.ts_ms AS DOUBLE),
         |                          ty := p.value, rts := p.ts_ms)
         |              ORDER BY p.idx) AS cand,
         |         list_reduce(list(CAST(p.ts_ms AS DOUBLE) ORDER BY p.idx),
         |                     (a, x) -> a + x) / COUNT(*) AS cx,
         |         list_reduce(list(p.value ORDER BY p.idx),
         |                     (a, x) -> a + x) / COUNT(*) AS cy
         |  FROM bkt bb JOIN big p USING (tenant_id, metric_name)
         |  WHERE p.idx >= bb.lo AND p.idx < bb.hi
         |  GROUP BY 1, 2, 3
         |),
         |anch AS (
         |  SELECT bb.tenant_id, bb.metric_name, bb.k, bb.cand,
         |         COALESCE(nx.cx, l.lx) AS ax, COALESCE(nx.cy, l.cy2) AS ay
         |  FROM binfo bb
         |  LEFT JOIN (SELECT tenant_id, metric_name, k - 1 AS k, cx, cy
         |             FROM binfo) nx
         |    USING (tenant_id, metric_name, k)
         |  JOIN (SELECT tenant_id, metric_name, lx, ly AS cy2 FROM lastp) l
         |    USING (tenant_id, metric_name)
         |),
         |rec AS (
         |  SELECT f.tenant_id, f.metric_name, -1 AS k,
         |         CAST(f.ts_ms AS DOUBLE) AS sx, f.value AS sy,
         |         0 AS bucket, f.ts_ms AS sel_ts, f.value AS sel_v
         |  FROM big f WHERE f.idx = 0
         |  UNION ALL
         |  SELECT tenant_id, metric_name, k,
         |         best.tx AS sx, best.ty AS sy,
         |         k + 1 AS bucket, best.rts AS sel_ts, best.ty AS sel_v
         |  FROM (
         |    SELECT a.tenant_id, a.metric_name, a.k,
         |           list_reduce(a.cand, (bst, c) -> CASE WHEN
         |               abs((r.sx - c.tx) * (a.ay - c.ty) -
         |                   (a.ax - c.tx) * (r.sy - c.ty)) >
         |               abs((r.sx - bst.tx) * (a.ay - bst.ty) -
         |                   (a.ax - bst.tx) * (r.sy - bst.ty))
         |             THEN c ELSE bst END) AS best
         |    FROM rec r
         |    JOIN anch a ON a.tenant_id = r.tenant_id
         |      AND a.metric_name = r.metric_name AND a.k = r.k + 1
         |  )
         |),
         |selmid AS (
         |  SELECT tenant_id, metric_name, CAST(bucket AS INT) AS bucket,
         |         sel_ts AS ts_ms, sel_v AS value
         |  FROM rec WHERE k >= 0
         |),
         |ends AS (
         |  SELECT tenant_id, metric_name, CAST(0 AS INT) AS bucket,
         |         ts_ms, value
         |  FROM big WHERE idx = 0
         |  UNION ALL
         |  SELECT tenant_id, metric_name, CAST(${b - 1} AS INT) AS bucket,
         |         ts_ms, value
         |  FROM big WHERE idx = n - 1
         |)
         |SELECT * FROM small
         |UNION ALL SELECT * FROM selmid
         |UNION ALL SELECT * FROM ends
         |ORDER BY tenant_id, metric_name, bucket, ts_ms, value""".stripMargin) {
      (s, dir) =>
        Series.lttbExact(
            Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"), b)
          .orderBy("tenant_id", "metric_name", "bucket", "ts_ms", "value")
    }
  }

  /** M4 downsampling ([[Series.m4Downsample]]): integer bin math and four
    * struct-ordered role aggregates whose tie rules restate exactly as the
    * oracle's four row_number orderings; a point filling several roles
    * emits once (DISTINCT both sides). */
  private val m4 = {
    val b = 12
    QDef(
      "q_series_m4",
      s"""WITH ${OracleViews.metricsCte},
         |ext AS (
         |  SELECT tenant_id, metric_name, min(ts_ms) AS t0, max(ts_ms) AS t1
         |  FROM metrics GROUP BY 1, 2
         |),
         |b AS (
         |  SELECT m.tenant_id, m.metric_name, m.ts_ms, m.value,
         |         CAST(((m.ts_ms - e.t0) * $b) // (e.t1 - e.t0 + 1) AS INT)
         |           AS bucket
         |  FROM metrics m JOIN ext e USING (tenant_id, metric_name)
         |),
         |r AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY tenant_id, metric_name, bucket
         |      ORDER BY ts_ms, value) AS r_f,
         |    row_number() OVER (PARTITION BY tenant_id, metric_name, bucket
         |      ORDER BY ts_ms DESC, value DESC) AS r_l,
         |    row_number() OVER (PARTITION BY tenant_id, metric_name, bucket
         |      ORDER BY value, ts_ms) AS r_n,
         |    row_number() OVER (PARTITION BY tenant_id, metric_name, bucket
         |      ORDER BY value DESC, ts_ms DESC) AS r_x
         |  FROM b
         |)
         |SELECT DISTINCT tenant_id, metric_name, bucket, ts_ms, value
         |FROM r WHERE r_f = 1 OR r_l = 1 OR r_n = 1 OR r_x = 1
         |ORDER BY tenant_id, metric_name, bucket, ts_ms, value""".stripMargin) {
      (s, dir) =>
        Series.m4Downsample(Tables.metrics(s, dir), b)
          .orderBy("tenant_id", "metric_name", "bucket", "ts_ms", "value")
    }
  }

  /** MAD robust outliers ([[Series.madOutliers]]): both medians are
    * rank-selected LOWER medians (never interpolated — a ranked element is
    * a value both engines already hold), the deviation is one IEEE op over
    * identical operands, and the flag compares against `mad·k` with k cast
    * to DOUBLE on the oracle side (bare SQL decimal literals type as
    * DECIMAL and change the multiply). The SQL is shared verbatim with
    * [[madSharded]] — the two engine forms must agree with ONE truth. */
  private val madSql =
    s"""WITH ${OracleViews.metricsCte},
       |rk AS (
       |  SELECT tenant_id, metric_name, ts_ms, value,
       |         row_number() OVER (PARTITION BY tenant_id, metric_name
       |           ORDER BY value, ts_ms) AS rn,
       |         count(*) OVER (PARTITION BY tenant_id, metric_name) AS n
       |  FROM metrics
       |),
       |med AS (
       |  SELECT tenant_id, metric_name, value AS med
       |  FROM rk WHERE rn = (n + 1) // 2
       |),
       |dev AS (
       |  SELECT r.tenant_id, r.metric_name, r.ts_ms, r.value, m.med,
       |         abs(r.value - m.med) AS adev, r.n
       |  FROM rk r JOIN med m USING (tenant_id, metric_name)
       |),
       |dr AS (
       |  SELECT *, row_number() OVER (PARTITION BY tenant_id, metric_name
       |           ORDER BY adev, ts_ms) AS rd
       |  FROM dev
       |),
       |mad AS (
       |  SELECT tenant_id, metric_name, adev AS mad
       |  FROM dr WHERE rd = (n + 1) // 2
       |)
       |SELECT d.tenant_id, d.metric_name, d.ts_ms, d.value, d.med,
       |       md.mad, d.adev,
       |       (md.mad > 0 AND d.adev > md.mad * CAST(3.0 AS DOUBLE))
       |         AS is_outlier
       |FROM dev d JOIN mad md USING (tenant_id, metric_name)
       |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin

  private val mad = QDef("q_series_mad", madSql) { (s, dir) =>
    Series.madOutliers(Tables.metrics(s, dir), k = 3.0)
      .orderBy("tenant_id", "metric_name", "ts_ms", "value")
  }

  /** [[Series.madOutliersSharded]] — the hot-series scale path: two-phase
    * rank selection over order-preserving value-bit buckets
    * ([[graft.functions.DoubleOrderBits]]), no per-series sort anywhere.
    * Deliberately proven against the SAME oracle SQL as [[mad]]: the
    * sharded rewrite's whole claim is bit-identity with the global-sort
    * form (bucketing monotonicity ⇒ membership-invariant selection), so a
    * shared oracle makes any divergence a loud hash failure. The bucket
    * image itself never surfaces (it steers work placement only), which
    * is why nothing here needs restating in DuckDB. */
  private val madSharded = QDef("q_series_mad_sharded", madSql) { (s, dir) =>
    Series.madOutliersSharded(Tables.metrics(s, dir), k = 3.0)
      .orderBy("tenant_id", "metric_name", "ts_ms", "value")
  }

  /** Graphite `summarize` ([[Series.summarize]]): per-series re-bucketing
    * onto a display interval — exact-DECIMAL sums surfaced as DOUBLE (the
    * rollup recipe), integer-snap bucketing, so the whole row is one
    * GROUP BY both engines state identically. */
  private val summarizeQ = {
    val bucketMs = 21600000L // the 6h display interval of the resample twin
    QDef(
      "q_series_summarize",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, metric_name,
         |       (ts_ms // $bucketMs) * $bucketMs AS bucket_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value,
         |       COUNT(value) AS n_points
         |FROM metrics GROUP BY 1, 2, 3
         |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) {
      (s, dir) =>
        Series.summarize(Tables.metrics(s, dir), bucketMs, "sum")
          .orderBy("tenant_id", "metric_name", "bucket_ms")
    }
  }

  /** From-anchored re-bucketing ([[Series.smartSummarize]], Graphite's
    * smartSummarize): identical algebra to q_series_summarize with the
    * bucket arithmetic anchored at a deliberately misaligned request
    * `from` — both sides filter ts >= anchor and state the same integer
    * bucket expression, exact-DECIMAL sums as DOUBLE. */
  private val smartSummarizeQ = {
    val bucketMs = 21600000L
    val anchorMs = 1704067200999L // day0 + 999 ms: exercises the filter
    QDef(
      "q_series_smart_summarize",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, metric_name,
         |       CAST($anchorMs + ((ts_ms - $anchorMs) // $bucketMs)
         |         * $bucketMs AS BIGINT) AS bucket_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value,
         |       COUNT(value) AS n_points
         |FROM metrics WHERE ts_ms >= $anchorMs
         |GROUP BY 1, 2, 3
         |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) {
      (s, dir) =>
        Series.smartSummarize(Tables.metrics(s, dir), anchorMs, bucketMs, "sum")
          .orderBy("tenant_id", "metric_name", "bucket_ms")
    }
  }

  /** Interval-reset running total ([[Series.integralByInterval]],
    * Graphite's integralByInterval): the q_series_integral window with an
    * additional epoch-snapped-bucket partition key — same exact-DECIMAL
    * accumulation, same (ts, value) total order, stated identically by
    * both engines. */
  private val integralByIntervalQ = {
    val bucketMs = 86400000L // daily reset
    QDef(
      "q_series_integral_interval",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, metric_name, ts_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER (
         |         PARTITION BY tenant_id, metric_name,
         |           ts_ms - ts_ms % $bucketMs
         |         ORDER BY ts_ms, value NULLS FIRST
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS DOUBLE) AS value
         |FROM metrics
         |WHERE tenant_id = 'purchase'
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
      (s, dir) =>
        Series.integralByInterval(
            Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"),
            bucketMs)
          .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** mapSeries/reduceSeries pairing ([[Series.reduceSeriesPairs]]):
    * hourly exact-ratio means per series, then purchase-vs-view series
    * paired on everything but the tenant token (node 1) and served as
    * asPercent — the join key is the name with node 1 replaced by
    * `reduce.asPercent` (graphite-web's output naming), restated in
    * DuckDB from the corpus' literal 3-token name shape. The percent is
    * the identical scalar-double a/b·100 over identical inputs; zero
    * denominators serve null (F6). */
  private val reducePairsQ = {
    val bMs = 3600000L
    QDef(
      "q_series_reduce_pairs",
      s"""WITH ${OracleViews.metricsCte},
         |h AS (
         |  SELECT metric_name,
         |         string_split(metric_name, '.')[2] AS tok,
         |         'app.reduce.asPercent.' || string_split(metric_name, '.')[3]
         |           AS key,
         |         (ts_ms // $bMs) * $bMs AS ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |           / COUNT(value) AS value
         |  FROM metrics GROUP BY 1, 2, 3, 4
         |)
         |SELECT 'all' AS tenant_id, a.key AS metric_name,
         |       CAST(a.ts_ms AS BIGINT) AS ts_ms,
         |       CASE WHEN b.value <> 0 THEN a.value / b.value * 100 END
         |         AS value
         |FROM h a JOIN h b ON a.key = b.key AND a.ts_ms = b.ts_ms
         |WHERE a.tok = 'purchase' AND b.tok = 'view'
         |ORDER BY tenant_id, metric_name, ts_ms""".stripMargin) { (s, dir) =>
      val hourly = Series.summarize(Tables.metrics(s, dir), bMs, "mean")
        .withColumnRenamed("bucket_ms", "ts_ms")
        .withColumn("tenant_id", lit("all"))
        .drop("n_points")
      Series.reduceSeriesPairs(hourly, 1, "purchase", "view", "asPercent")
        .orderBy("tenant_id", "metric_name", "ts_ms")
    }
  }

  /** Full-outer instant alignment for cross-series arithmetic
    * ([[Series.reduceSeriesPairs]] `alignOuter = true` — graphite-web's
    * None-parity, the render facade's default): the view side is thinned
    * to even hours, so every odd-hour purchase instant has NO divisor —
    * the outer join serves it with a NULL value instead of dropping it
    * (the inner-join convention q_series_reduce_pairs pins). Oracle = the
    * same hourly CTE FULL-JOINed in DuckDB; division is the identical
    * scalar double, zero/missing denominators null (F6). */
  private val reducePairsOuterQ = {
    val bMs = 3600000L
    QDef(
      "q_series_reduce_outer",
      s"""WITH ${OracleViews.metricsCte},
         |h AS (
         |  SELECT metric_name,
         |         string_split(metric_name, '.')[2] AS tok,
         |         'app.reduce.divideSeries.' || string_split(metric_name, '.')[3]
         |           AS key,
         |         (ts_ms // $bMs) * $bMs AS ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |           / COUNT(value) AS value
         |  FROM metrics GROUP BY 1, 2, 3, 4
         |),
         |a AS (SELECT * FROM h WHERE tok = 'purchase'),
         |b AS (SELECT * FROM h WHERE tok = 'view'
         |      AND (ts_ms // $bMs) % 2 = 0)
         |SELECT 'all' AS tenant_id,
         |       COALESCE(a.key, b.key) AS metric_name,
         |       CAST(COALESCE(a.ts_ms, b.ts_ms) AS BIGINT) AS ts_ms,
         |       CASE WHEN b.value <> 0 THEN a.value / b.value END AS value
         |FROM a FULL JOIN b ON a.key = b.key AND a.ts_ms = b.ts_ms
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
      (s, dir) =>
        val hourly = Series.summarize(Tables.metrics(s, dir), bMs, "mean")
          .withColumnRenamed("bucket_ms", "ts_ms")
          .withColumn("tenant_id", lit("all"))
          .drop("n_points")
        // thin the VIEW side to even hours — one-sided instants on both
        // sides (odd-hour purchases have no divisor; a view-only instant
        // would have no dividend)
        val sparse = hourly.filter(
          get(split(col("metric_name"), "\\."), lit(1)) =!= "view" ||
            expr(s"(ts_ms div ${bMs}L) % 2 = 0"))
        Series.reduceSeriesPairs(sparse, 1, "purchase", "view",
            "divideSeries", alignOuter = true)
          .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** Per-series min-max feature scaling ([[Series.minMaxNormalize]],
    * Graphite's minMax): one unordered per-series window (min+max share
    * the WindowExec) and the identical (v−min)/(max−min) IEEE scalar on
    * both sides; zero-range series serve null (F6). */
  private val minMaxQ = QDef(
    "q_series_minmax",
    s"""WITH ${OracleViews.metricsCte}
       |SELECT tenant_id, metric_name, ts_ms,
       |       CASE WHEN mx - mn <> 0 THEN (value - mn) / (mx - mn) END
       |         AS value
       |FROM (
       |  SELECT tenant_id, metric_name, ts_ms, value,
       |         MIN(value) OVER w AS mn, MAX(value) OVER w AS mx
       |  FROM metrics
       |  WINDOW w AS (PARTITION BY tenant_id, metric_name))
       |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
    (s, dir) =>
      Series.minMaxNormalize(Tables.metrics(s, dir))
        .orderBy("tenant_id", "metric_name", "ts_ms", "value")
  }

  /** Trailing ROWS-window stddev ([[Series.stdevRows]], Graphite's
    * stdev(series, points)): the engine's two-unbounded-prefix form is
    * claimed ≡ the plain ROWS frame — exact DECIMAL sums make the prefix
    * difference equal the frame sum bit-for-bit, and the variance/sqrt
    * tail is the q_series_moving_window derived-double recipe (0-clamped,
    * IEEE-exact sqrt) with COUNT(value) denominators (null samples skip —
    * graphite's safe stddev). */
  private val stdevRowsQ = {
    val nPts = 20
    val winSumSql = "CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)"
    val varSql = s"""(CAST(SUM(CAST(value * value AS DECIMAL(38,8))) OVER w AS DOUBLE)
       |            - $winSumSql * $winSumSql / COUNT(value) OVER w)
       |            / COUNT(value) OVER w""".stripMargin
    QDef(
      "q_series_stdev_rows",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, metric_name, ts_ms,
         |       CASE WHEN COUNT(value) OVER w > 0 THEN
         |         CASE WHEN $varSql > 0
         |              THEN SQRT($varSql) ELSE 0.0 END END AS value
         |FROM metrics
         |WHERE tenant_id = 'purchase'
         |WINDOW w AS (PARTITION BY tenant_id, metric_name
         |             ORDER BY ts_ms, value NULLS FIRST
         |             ROWS BETWEEN ${nPts - 1} PRECEDING AND CURRENT ROW)
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
      (s, dir) =>
        Series.stdevRows(
            Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"),
            nPts)
          .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** Trailing exact median ([[Series.movingMedianRows]], Graphite's
    * movingMedian(series, points)): a rank statistic has no prefix form,
    * so the engine runs the render-sized bounded collect + sorted-buffer
    * scan; the oracle restates the WINDOW verbatim — `list(value)` over
    * the identical ROWS frame, null-filtered, sorted, LOWER median
    * selected by rank (c+1) div 2. A ranked element is a value both
    * engines already hold (the madOutliers parity rule), so no rounding
    * or interpolation can diverge. Frame membership ties on
    * (ts, value NULLS FIRST) — Spark's struct sort order spelled out for
    * DuckDB. */
  private val movingMedianQ = {
    val nPts = 20
    QDef(
      "q_series_moving_median",
      s"""WITH ${OracleViews.metricsCte},
         |w AS (
         |  SELECT tenant_id, metric_name, ts_ms, value,
         |         list(value) OVER (PARTITION BY tenant_id, metric_name
         |                           ORDER BY ts_ms, value NULLS FIRST
         |                           ROWS BETWEEN ${nPts - 1} PRECEDING
         |                             AND CURRENT ROW) AS lv
         |  FROM metrics WHERE tenant_id = 'view'
         |)
         |SELECT tenant_id, metric_name, ts_ms,
         |       CASE WHEN len(nn) > 0 THEN nn[(len(nn) + 1) // 2] END
         |         AS value
         |FROM (
         |  SELECT tenant_id, metric_name, ts_ms,
         |         list_sort(list_filter(lv, x -> x IS NOT NULL)) AS nn
         |  FROM w)
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
      (s, dir) =>
        Series.movingMedianRows(
            Tables.metrics(s, dir).filter(col("tenant_id") === "view"), nPts)
          .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** Trailing TIME-window exact median ([[Series.movingMedianTime]],
    * Graphite's movingMedian(series, "1hour") form): the frame is a SQL
    * RANGE window — every sample with ts in [ts − w, ts], PEERS included
    * — which DuckDB restates verbatim (`RANGE BETWEEN w PRECEDING AND
    * CURRENT ROW` over the BIGINT ts). Same lower-median held-value rule
    * as q_series_moving_median. */
  private val movingMedianTimeQ = {
    val wMs = 3600000L
    QDef(
      "q_series_moving_median_time",
      s"""WITH ${OracleViews.metricsCte},
         |w AS (
         |  SELECT tenant_id, metric_name, ts_ms, value,
         |         list(value) OVER (PARTITION BY tenant_id, metric_name
         |                           ORDER BY ts_ms
         |                           RANGE BETWEEN $wMs PRECEDING
         |                             AND CURRENT ROW) AS lv
         |  FROM metrics WHERE tenant_id = 'purchase'
         |)
         |SELECT tenant_id, metric_name, ts_ms,
         |       CASE WHEN len(nn) > 0 THEN nn[(len(nn) + 1) // 2] END
         |         AS value
         |FROM (
         |  SELECT tenant_id, metric_name, ts_ms,
         |         list_sort(list_filter(lv, x -> x IS NOT NULL)) AS nn
         |  FROM w)
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
      (s, dir) =>
        Series.movingMedianTime(
            Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"),
            wMs)
          .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** Positional list pairing ([[Series.divideSeriesLists]], Graphite's
    * divideSeriesLists): hourly exact-sum dividends divided by their own
    * series' hourly sample counts — the pairing is rank-by-name on both
    * sides (identical ASCII name ordering in both engines), the division
    * the identical scalar double, zero denominators null (F6), output
    * named divideSeries(a,b). */
  private val divideListsQ = {
    val bMs = 3600000L
    QDef(
      "q_series_divide_lists",
      s"""WITH ${OracleViews.metricsCte},
         |h AS (
         |  SELECT tenant_id, metric_name,
         |         CAST((ts_ms // $bMs) * $bMs AS BIGINT) AS ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS s,
         |         CAST(COUNT(value) AS DOUBLE) AS c
         |  FROM metrics WHERE tenant_id = 'purchase' GROUP BY 1, 2, 3
         |)
         |SELECT tenant_id,
         |       'divideSeries(' || metric_name || ',' || metric_name || ')'
         |         AS metric_name,
         |       ts_ms, CASE WHEN c <> 0 THEN s / c END AS value
         |FROM h
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
      (s, dir) =>
        val hourly = Series.summarize(
          Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"),
          bMs, "sum")
        val dividends = hourly.select(col("tenant_id"), col("metric_name"),
          col("bucket_ms").as("ts_ms"), col("value"))
        val divisors = hourly.select(col("tenant_id"), col("metric_name"),
          col("bucket_ms").as("ts_ms"),
          col("n_points").cast("double").as("value"))
        Series.divideSeriesLists(dividends, divisors)
          .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** Outer-aligned positional list division ([[Series.divideSeriesLists]]
    * `alignOuter = true` — the render facade's default, graphite-web
    * None-parity): the divisor list is thinned to even hours, so odd-hour
    * dividend instants keep their time axis with a NULL value instead of
    * vanishing (q_series_divide_lists pins the inner default). Both lists
    * carry the same names, so the rank pairing is the identity and the
    * oracle is a plain per-name FULL JOIN on the instant. */
  private val divideListsOuterQ = {
    val bMs = 3600000L
    QDef(
      "q_series_divide_outer",
      s"""WITH ${OracleViews.metricsCte},
         |h AS (
         |  SELECT tenant_id, metric_name,
         |         CAST((ts_ms // $bMs) * $bMs AS BIGINT) AS ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS s,
         |         CAST(COUNT(value) AS DOUBLE) AS c
         |  FROM metrics WHERE tenant_id = 'purchase' GROUP BY 1, 2, 3
         |),
         |a AS (SELECT tenant_id, metric_name, ts_ms, s FROM h),
         |b AS (SELECT tenant_id, metric_name, ts_ms, c FROM h
         |      WHERE (ts_ms // $bMs) % 2 = 0)
         |SELECT COALESCE(a.tenant_id, b.tenant_id) AS tenant_id,
         |       'divideSeries(' || COALESCE(a.metric_name, b.metric_name)
         |         || ',' || COALESCE(a.metric_name, b.metric_name) || ')'
         |         AS metric_name,
         |       COALESCE(a.ts_ms, b.ts_ms) AS ts_ms,
         |       CASE WHEN b.c <> 0 THEN a.s / b.c END AS value
         |FROM a FULL JOIN b
         |  ON a.tenant_id = b.tenant_id AND a.metric_name = b.metric_name
         |  AND a.ts_ms = b.ts_ms
         |ORDER BY tenant_id, metric_name, ts_ms, value""".stripMargin) {
      (s, dir) =>
        val hourly = Series.summarize(
          Tables.metrics(s, dir).filter(col("tenant_id") === "purchase"),
          bMs, "sum")
        val dividends = hourly.select(col("tenant_id"), col("metric_name"),
          col("bucket_ms").as("ts_ms"), col("value"))
        val divisors = hourly
          .filter(expr(s"(bucket_ms div ${bMs}L) % 2 = 0"))
          .select(col("tenant_id"), col("metric_name"),
            col("bucket_ms").as("ts_ms"),
            col("n_points").cast("double").as("value"))
        Series.divideSeriesLists(dividends, divisors, alignOuter = true)
          .orderBy("tenant_id", "metric_name", "ts_ms", "value")
    }
  }

  /** Linear grid resampling ([[Series.resampleLinear]]): duplicate
    * timestamps collapse to exact-DECIMAL means first; prev/next restate
    * as two DuckDB ASOF joins (the q_asof_* pattern — the "next" side
    * negates the time key to flip the inequality); the interpolation is
    * the identical scalar double expression on both sides, short-circuited
    * to the sample value on exact grid hits. */
  private val resample = {
    val stepMs = 21600000L // 6h grid over the ~30-day fixture
    QDef(
      "q_series_resample",
      s"""WITH ${OracleViews.metricsCte},
         |pts AS (
         |  SELECT tenant_id, metric_name, ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |           / COUNT(*) AS value
         |  FROM metrics WHERE value IS NOT NULL GROUP BY 1, 2, 3
         |),
         |ext AS (
         |  SELECT tenant_id, metric_name, min(ts_ms) AS t0, max(ts_ms) AS t1
         |  FROM pts GROUP BY 1, 2
         |),
         |grid AS (
         |  SELECT tenant_id, metric_name,
         |         unnest(generate_series(((t0 + ${stepMs - 1}) // $stepMs)
         |           * $stepMs, (t1 // $stepMs) * $stepMs, $stepMs)) AS gts
         |  FROM ext
         |  WHERE ((t0 + ${stepMs - 1}) // $stepMs) * $stepMs
         |          <= (t1 // $stepMs) * $stepMs
         |),
         |prev AS (
         |  SELECT g.tenant_id, g.metric_name, g.gts, p.ts_ms AS pt,
         |         p.value AS pv
         |  FROM grid g ASOF JOIN pts p
         |    ON g.tenant_id = p.tenant_id AND g.metric_name = p.metric_name
         |       AND g.gts >= p.ts_ms
         |),
         |gridn AS (SELECT tenant_id, metric_name, gts, -gts AS ngts FROM grid),
         |ptsn AS (SELECT tenant_id, metric_name, ts_ms, value,
         |                -ts_ms AS nts FROM pts),
         |nxt AS (
         |  SELECT g.tenant_id, g.metric_name, g.gts, p.ts_ms AS nt,
         |         p.value AS nv
         |  FROM gridn g ASOF JOIN ptsn p
         |    ON g.tenant_id = p.tenant_id AND g.metric_name = p.metric_name
         |       AND g.ngts >= p.nts
         |)
         |SELECT p.tenant_id, p.metric_name, p.gts AS ts_ms,
         |       CASE WHEN n.nt = p.pt THEN p.pv
         |            ELSE p.pv + (n.nv - p.pv) *
         |              (CAST(p.gts - p.pt AS DOUBLE)
         |                / CAST(n.nt - p.pt AS DOUBLE)) END AS value
         |FROM prev p JOIN nxt n USING (tenant_id, metric_name, gts)
         |ORDER BY tenant_id, metric_name, ts_ms""".stripMargin) { (s, dir) =>
      Series.resampleLinear(Tables.metrics(s, dir), stepMs)
        .orderBy("tenant_id", "metric_name", "ts_ms")
    }
  }

  /** Hold/forward-fill resampling ([[Series.resampleHold]]): the same
    * duplicate-collapse and interior grid as q_series_resample, but each
    * grid instant serves its ASOF-previous sample VERBATIM — one DuckDB
    * ASOF join, no interpolation arithmetic to restate, so the hash proof
    * is value-identity between the two engines' forward fills. */
  private val resampleHoldQ = {
    val stepMs = 21600000L // 6h grid over the ~30-day fixture
    QDef(
      "q_series_resample_hold",
      s"""WITH ${OracleViews.metricsCte},
         |pts AS (
         |  SELECT tenant_id, metric_name, ts_ms,
         |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
         |           / COUNT(*) AS value
         |  FROM metrics WHERE value IS NOT NULL GROUP BY 1, 2, 3
         |),
         |ext AS (
         |  SELECT tenant_id, metric_name, min(ts_ms) AS t0, max(ts_ms) AS t1
         |  FROM pts GROUP BY 1, 2
         |),
         |grid AS (
         |  SELECT tenant_id, metric_name,
         |         unnest(generate_series(((t0 + ${stepMs - 1}) // $stepMs)
         |           * $stepMs, (t1 // $stepMs) * $stepMs, $stepMs)) AS gts
         |  FROM ext
         |  WHERE ((t0 + ${stepMs - 1}) // $stepMs) * $stepMs
         |          <= (t1 // $stepMs) * $stepMs
         |)
         |SELECT g.tenant_id, g.metric_name, g.gts AS ts_ms,
         |       p.value AS value
         |FROM grid g ASOF JOIN pts p
         |  ON g.tenant_id = p.tenant_id AND g.metric_name = p.metric_name
         |     AND g.gts >= p.ts_ms
         |ORDER BY g.tenant_id, g.metric_name, g.gts""".stripMargin) { (s, dir) =>
      Series.resampleHold(Tables.metrics(s, dir), stepMs)
        .orderBy("tenant_id", "metric_name", "ts_ms")
    }
  }

  val defs: Seq[QDef] = Seq(topk, gaps, seasonal, movingAvg, movingAvgPrefix,
    movingWindowQ, seriesAgg, seriesAggStd, aggWildcards, weightedAvg,
    hitcountQ, groupNode, groupNodes,
    anomalyEvents, timeshift, integral, quantile, ewma, ewmaSeg,
    holtWinters, trend, clamp, asofBaseline, asofWithin, lttb, lttbExact,
    m4, mad, madSharded, summarizeQ, smartSummarizeQ, integralByIntervalQ,
    reducePairsQ, reducePairsOuterQ, resample, resampleHoldQ, minMaxQ,
    stdevRowsQ, movingMedianQ, movingMedianTimeQ, divideListsQ,
    divideListsOuterQ)
}
