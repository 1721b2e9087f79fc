package graft.api

import graft.core.{Granularity, OracleViews, Tables}
import graft.operators.Preaggregated
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pre-aggregated (statsd) kinds: tier-1 states built from the events
  * stream, then merged up the ladder with each kind's own algebra — the
  * merges the reference implements in Blueflood*Rollup.buildRollupFromRollups.
  * Oracles recompute from raw (merge ≡ raw) or restate the same algebra.
  *
  * Determinism: tier-1 states derive from exact integer/decimal math;
  * merge-level small double sums are snapped to DECIMAL(18,6) on output. */
object PreaggQueries {

  private def snap6(c: Column): Column = c.cast(DecimalType(18, 6)).cast("double")
  private def bucketSql(g: Granularity) = s"(ts_ms // ${g.millis}) * ${g.millis}"

  /** Counter merge with the total-time rate formula
    * (rate = Σcount / Σ(countᵢ/rateᵢ), BluefloodCounterRollup.java:102-115). */
  private val counterMerge = QDef(
    "q_preagg_counter_merge",
    s"""WITH ${OracleViews.metricsCte},
       |c20 AS (
       |  SELECT tenant_id, metric_name, ${bucketSql(Granularity.MIN_20)} AS bucket_ms,
       |         COUNT(*) AS count, MIN(ts_ms) AS min_ts, MAX(ts_ms) AS max_ts
       |  FROM metrics GROUP BY 1, 2, 3
       |),
       |r20 AS (
       |  SELECT tenant_id, metric_name, bucket_ms, count,
       |         CASE WHEN max_ts > min_ts THEN count / ((max_ts - min_ts) / 1000.0)
       |              ELSE 0.0 END AS rate
       |  FROM c20
       |)
       |SELECT tenant_id, metric_name,
       |       (bucket_ms // ${Granularity.MIN_60.millis}) * ${Granularity.MIN_60.millis} AS bucket_ms,
       |       CAST(SUM(count) AS BIGINT) AS count,
       |       CAST(CAST(CASE WHEN SUM(CASE WHEN rate <> 0.0 THEN count / rate ELSE 0.0 END) <> 0.0
       |            THEN SUM(count) / SUM(CASE WHEN rate <> 0.0 THEN count / rate ELSE 0.0 END)
       |            ELSE 0.0 END AS DECIMAL(18,6)) AS DOUBLE) AS rate
       |FROM r20 GROUP BY 1, 2, 3
       |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
    val c20 = Tables.metrics(s, dir)
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("ts_ms"), Granularity.MIN_20).as("bucket_ms"))
      .agg(count(lit(1)).as("count"),
        min(col("ts_ms")).as("min_ts"), max(col("ts_ms")).as("max_ts"))
      .withColumn("rate",
        when(col("max_ts") > col("min_ts"),
          col("count") / ((col("max_ts") - col("min_ts")) / lit(1000.0)))
          .otherwise(lit(0.0)))
      .select("tenant_id", "metric_name", "bucket_ms", "count", "rate")
    Preaggregated.counterMerge(c20, Granularity.MIN_60)
      .withColumn("rate", snap6(col("rate")))
      .orderBy("tenant_id", "metric_name", "bucket_ms")
  }

  /** Timer percentile MAP state merged relationally (explode → unweighted
    * avg per label → map_from_entries), surfaced as rows for the oracle. */
  private val timerPmapMerge = QDef(
    "q_preagg_timer_pmap",
    s"""WITH ${OracleViews.metricsCte},
       |t20 AS (
       |  SELECT tenant_id, metric_name, ${bucketSql(Granularity.MIN_20)} AS bucket_ms,
       |         CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
       |         CAST(CAST(quantile_cont(value, 0.95) AS DECIMAL(18,6)) AS DOUBLE) AS p95
       |  FROM metrics GROUP BY 1, 2, 3
       |),
       |unpvt AS (
       |  SELECT tenant_id, metric_name, bucket_ms, '50' AS label, p50 AS p_mean FROM t20
       |  UNION ALL
       |  SELECT tenant_id, metric_name, bucket_ms, '95', p95 FROM t20
       |)
       |SELECT tenant_id, metric_name,
       |       (bucket_ms // ${Granularity.MIN_60.millis}) * ${Granularity.MIN_60.millis} AS bucket_ms,
       |       label,
       |       CAST(CAST(AVG(p_mean) AS DECIMAL(18,6)) AS DOUBLE) AS p_mean
       |FROM unpvt GROUP BY 1, 2, 3, 4
       |ORDER BY tenant_id, metric_name, bucket_ms, label""".stripMargin) { (s, dir) =>
    val t20 = Tables.metrics(s, dir)
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("ts_ms"), Granularity.MIN_20).as("bucket_ms"))
      .agg(percentile(col("value"), array(lit(0.5), lit(0.95))).as("ps"))
      .withColumn("p50", snap6(col("ps").getItem(0)))
      .withColumn("p95", snap6(col("ps").getItem(1)))
      .drop("ps")
      .withColumn("percentiles",
        map(lit("50"), col("p50"), lit("95"), col("p95")))
      .select("tenant_id", "metric_name", "bucket_ms", "percentiles")
    Preaggregated.timerPercentileMerge(t20, Granularity.MIN_60)
      .select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
        explode(col("percentiles")).as(Seq("label", "p_mean")))
      .withColumn("p_mean", snap6(col("p_mean")))
      .orderBy("tenant_id", "metric_name", "bucket_ms", "label")
  }

  /** Gauge state merge: latest-by-max-ts survives the merge
    * (merge ≡ raw oracle at 60m). */
  private val gaugeMerge = QDef(
    "q_preagg_gauge_merge",
    s"""WITH ${OracleViews.metricsCte}
       |SELECT tenant_id, metric_name, ${bucketSql(Granularity.MIN_60)} AS bucket_ms,
       |       COUNT(*) AS num_points,
       |       MAX(ts_ms) AS latest_ts,
       |       (MAX({'ts': ts_ms, 'v': value})).v AS latest_v,
       |       MIN(value) AS min_v, MAX(value) AS max_v
       |FROM metrics GROUP BY 1, 2, 3
       |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
    val g20 = Tables.metrics(s, dir)
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("ts_ms"), Granularity.MIN_20).as("bucket_ms"))
      .agg(
        count(lit(1)).as("num_points"),
        max(col("ts_ms")).as("latest_ts"),
        max(struct(col("ts_ms"), col("value"))).getField("value").as("latest_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
    Preaggregated.gaugeMerge(g20, Granularity.MIN_60)
      .orderBy("tenant_id", "metric_name", "bucket_ms")
  }

  /** Exact set-state (ARRAY<INT>) merge across tiers: 20m hash arrays
    * union'd into daily cardinality — the declarative SetRollupAggregator. */
  private val setStateMerge = QDef(
    "q_preagg_set_merge",
    s"""WITH ${OracleViews.metricsCte}
       |SELECT tenant_id, metric_name, ${bucketSql(Granularity.MIN_1440)} AS bucket_ms,
       |       CAST(COUNT(DISTINCT CAST(round(value * 100, 0) AS INTEGER)) AS INTEGER) AS distinct_count
       |FROM metrics GROUP BY 1, 2, 3
       |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin) { (s, dir) =>
    val s20 = Tables.metrics(s, dir)
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("ts_ms"), Granularity.MIN_20).as("bucket_ms"))
      .agg(collect_set(round(col("value") * 100, 0).cast("int")).as("set_state"))
    Preaggregated.setStateMerge(s20, Granularity.MIN_1440)
      .select("tenant_id", "metric_name", "bucket_ms", "distinct_count")
      .orderBy("tenant_id", "metric_name", "bucket_ms")
  }

  /** The JSON→state ingest conversion itself, oracle-backed end to end:
    * statsd aggregated payloads are CONSTRUCTED from the metrics view (one
    * payload per tenant × 5m flush, counters/gauges/timers/sets sections,
    * alternating flushInterval to exercise both sampleCount branches),
    * routed through [[Preaggregated.fromAggregatedJson]] — real JSON
    * serialization, schema parse, per-kind explode, sampleCount math
    * (PreaggregateConversions.java:48-130) — then flattened to
    * (locator, ts, kind, stat, value) rows. The oracle restates the same
    * conversion arithmetic directly over the events table, so any drift in
    * the parse schema, the kind dispatch, or the conversion formulas
    * hash-fails. Doubles survive the JSON round-trip exactly (shortest
    * round-trip printing); per-window derived stats are decimal-snapped on
    * both sides per the oracle-parity convention. */
  private val preaggIngest = QDef(
    "q_preagg_ingest",
    s"""WITH ${OracleViews.metricsCte},
       |per AS (
       |  SELECT tenant_id, metric_name, ${bucketSql(Granularity.MIN_5)} AS bucket_ms,
       |         COUNT(value) AS cnt,
       |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_v,
       |         MIN(value) AS min_v, MAX(value) AS max_v,
       |         CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
       |         CAST(CAST(quantile_cont(value, 0.95) AS DECIMAL(18,6)) AS DOUBLE) AS p95,
       |         CAST(COUNT(DISTINCT CAST(round(value * 100, 0) AS INTEGER)) AS DOUBLE) AS set_card,
       |         (MAX({'ts': ts_ms, 'v': value})).v AS latest
       |  FROM metrics WHERE tenant_id = 'error' GROUP BY 1, 2, 3
       |),
       |conv AS (
       |  SELECT *, cnt / 300.0 AS rate,
       |         CASE WHEN (bucket_ms // 300000) % 2 = 0 THEN 45000 ELSE 0 END AS flush_ms
       |  FROM per
       |)
       |SELECT * FROM (
       |  SELECT tenant_id, metric_name, bucket_ms AS ts_ms, 'counter' AS kind,
       |         'count' AS stat, CAST(cnt AS DOUBLE) AS value_d FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'counter', 'rate', rate FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'counter', 'sample_count',
       |    CASE WHEN flush_ms > 0 THEN FLOOR(rate * flush_ms / 1000.0) ELSE 1.0 END FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'gauge', 'latest', latest FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'timer', 'count', CAST(cnt AS DOUBLE) FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'timer', 'sum', sum_v FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'timer', 'min', min_v FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'timer', 'max', max_v FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'timer', 'rate', rate FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'timer', 'p50', p50 FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'timer', 'p95', p95 FROM conv
       |  UNION ALL SELECT tenant_id, metric_name, bucket_ms, 'set', 'set_card', set_card FROM conv
       |)
       |ORDER BY tenant_id, metric_name, ts_ms, kind, stat""".stripMargin) { (s, dir) =>
    val per = Tables.metrics(s, dir).filter(col("tenant_id") === "error")
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("ts_ms"), Granularity.MIN_5).as("bucket_ms"))
      .agg(
        count(col("value")).as("cnt"),
        sum(col("value").cast(DecimalType(28, 2))).cast("double").as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        percentile(col("value"), array(lit(0.5), lit(0.95))).as("ps"),
        collect_set(round(col("value") * 100, 0).cast("int")).as("svals"),
        max(struct(col("ts_ms"), col("value"))).getField("value").as("latest"))
      .withColumn("p50", snap6(col("ps").getItem(0)))
      .withColumn("p95", snap6(col("ps").getItem(1)))
      .drop("ps")
      .withColumn("rate", col("cnt") / lit(300.0))
      .withColumn("flush_ms",
        when(expr("bucket_ms div 300000 % 2") === 0, lit(45000L)).otherwise(lit(0L)))
    val payloads = per
      .groupBy(col("tenant_id"), col("bucket_ms"), col("flush_ms"))
      .agg(
        collect_list(struct(col("metric_name").as("name"),
          col("cnt").cast("double").as("value"), col("rate"))).as("counters"),
        collect_list(struct(col("metric_name").as("name"),
          col("latest"))).as("gauges"),
        collect_list(struct(col("metric_name").as("name"),
          col("cnt").as("count"), col("sum_v").as("sum"), col("min_v").as("min"),
          col("max_v").as("max"), col("rate"),
          map(lit("50"), col("p50"), lit("95"), col("p95")).as("percentiles")))
          .as("timers"),
        collect_list(struct(col("metric_name").as("name"),
          col("svals").as("values"))).as("sets"))
      .select(to_json(struct(col("tenant_id"), col("bucket_ms").as("timestamp"),
        col("flush_ms").as("flushInterval"), col("gauges"), col("counters"),
        col("timers"), col("sets"))).as("value"))
    val parsed = Preaggregated.fromAggregatedJson(payloads)
    // SINGLE-PASS flatten: one kind-routed stat array + one explode. The
    // previous 4-way filter+stack union made Catalyst duplicate the whole
    // upstream subtree (payload construction AND the json parse) per kind —
    // 4 scans and 4 from_json over the same lines. One explode keeps one.
    def sv(stat: String, v: Column) =
      struct(lit(stat).as("stat"), v.cast("double").as("value_d"))
    val statArr =
      when(col("kind") === "counter", array(
        sv("count", col("counter.count")),
        sv("rate", col("counter.rate")),
        sv("sample_count", col("counter.sample_count"))))
      .when(col("kind") === "gauge", array(
        sv("latest", col("gauge.latest"))))
      .when(col("kind") === "timer", array(
        sv("count", col("timer.count")),
        sv("sum", col("timer.sum")),
        sv("min", col("timer.min")),
        sv("max", col("timer.max")),
        sv("rate", col("timer.rate")),
        sv("p50", col("timer.percentiles").getItem("50")),
        sv("p95", col("timer.percentiles").getItem("95"))))
      .when(col("kind") === "set", array(
        sv("set_card", size(col("set")))))
    parsed
      .select(col("tenant_id"), col("metric_name"), col("ts_ms"), col("kind"),
        explode(statArr).as("m"))
      .select(col("tenant_id"), col("metric_name"), col("ts_ms"), col("kind"),
        col("m.stat").as("stat"), col("m.value_d").as("value_d"))
      .orderBy("tenant_id", "metric_name", "ts_ms", "kind", "stat")
  }

  val defs: Seq[QDef] = Seq(
    counterMerge, timerPmapMerge, gaugeMerge, setStateMerge, preaggIngest)
}
