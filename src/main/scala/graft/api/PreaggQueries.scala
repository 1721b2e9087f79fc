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

  /** STORE-BACKED read of the timer pre-aggregated family — the
    * kind-dispatched arm of the reference read path
    * (MetricsRWDelegator.java:79-113 routes a locator's read to its
    * rollup_type's column family) as a driver-gate query. Timer is the
    * probe kind because its ladder replay is PATH-DEPENDENT: the stored
    * percentile merge is an unweighted mean-of-means per hop
    * (BluefloodTimerRollup.java:242-254), so 5m→20m→60m differs from a
    * direct 5m→60m — a gap repair that skipped the ladder would hash-fail
    * here.
    *
    * Build (cached per sfDir via [[graft.core.ArtifactCache]], so reruns
    * measure the serve path): statsd timer payloads constructed per 5m
    * flush from the error tenant's metrics over integer cents (double sums
    * of integers are exact in any partition order), pushed through the REAL
    * ingest (JSON parse → preagg_raw → kind-routed cascade), then one
    * rolled day is DELIBERATELY dropped from the 60m tier. The facade must
    * serve covered days from `preagg_timer_60m` and replay the missing day
    * from `preagg_raw` hop-by-hop. The oracle restates flush construction
    * and both ladder hops in SQL; per-hop scalar algebra is associative
    * (sums, min/max, total-time rate) while percentile means are laddered
    * exactly as stored. Derived doubles snap to DECIMAL(18,6) per the
    * oracle-parity convention. */
  private val timerStored = {
    val fromMs = 1704240000000L  // 2024-01-03 00:00 UTC
    val toMs = 1704844800000L    // 2024-01-10 00:00 UTC
    val missingDay = 1704499200000L // 2024-01-06: dropped from the 60m tier
    val m5 = Granularity.MIN_5.millis
    val snapSql = (c: String) => s"CAST(CAST($c AS DECIMAL(18,6)) AS DOUBLE)"
    def hopSql(src: String, g: Granularity): String =
      s"""SELECT tenant_id, metric_name,
         |       (bucket_ms // ${g.millis}) * ${g.millis} AS bucket_ms,
         |       SUM(count) AS count, SUM(sum) AS sum,
         |       MIN(min) AS min, MAX(max) AS max,
         |       CASE WHEN SUM(CASE WHEN rate <> 0.0 THEN count / rate ELSE 0.0 END) <> 0.0
         |            THEN SUM(count) / SUM(CASE WHEN rate <> 0.0 THEN count / rate ELSE 0.0 END)
         |            ELSE 0.0 END AS rate,
         |       AVG(p50) AS p50, AVG(p95) AS p95
         |FROM $src GROUP BY 1, 2, 3""".stripMargin
    QDef(
      "q_preagg_timer_stored",
      s"""WITH ${OracleViews.metricsCte},
         |cents AS (
         |  SELECT tenant_id, metric_name, ts_ms, round(value * 100, 0) AS v
         |  FROM metrics
         |  WHERE tenant_id = 'error' AND ts_ms >= $fromMs AND ts_ms < $toMs
         |),
         |f5 AS (
         |  SELECT tenant_id, metric_name, (ts_ms // $m5) * $m5 AS bucket_ms,
         |         COUNT(*) AS count, SUM(v) AS sum, MIN(v) AS min, MAX(v) AS max,
         |         COUNT(*) / 300.0 AS rate,
         |         ${snapSql("quantile_cont(v, 0.5)")} AS p50,
         |         ${snapSql("quantile_cont(v, 0.95)")} AS p95
         |  FROM cents GROUP BY 1, 2, 3
         |),
         |t20 AS (${hopSql("f5", Granularity.MIN_20)}),
         |t60 AS (${hopSql("t20", Granularity.MIN_60)})
         |SELECT metric_name, bucket_ms,
         |       CAST(count AS BIGINT) AS num_points, sum AS sum_v,
         |       sum / count AS average, min AS min_v, max AS max_v,
         |       ${snapSql("rate")} AS rate,
         |       ${snapSql("p50")} AS p50, ${snapSql("p95")} AS p95
         |FROM t60 ORDER BY metric_name, bucket_ms""".stripMargin) { (s, dir) =>
      val store = graft.core.ArtifactCache.cached("preagg_timer_store", dir,
          s"$dir/events.parquet") { buildDir =>
        val per = Tables.metricsRange(s, dir, Some((fromMs, toMs)))
          .filter(col("tenant_id") === "error")
          .withColumn("v", round(col("value") * 100, 0))
          .groupBy(col("tenant_id"), col("metric_name"),
            Tables.bucketMs(col("ts_ms"), Granularity.MIN_5).as("bucket_ms"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("v")).as("sum_v"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"),
            percentile(col("v"), array(lit(0.5), lit(0.95))).as("ps"))
          .withColumn("p50", snap6(col("ps").getItem(0)))
          .withColumn("p95", snap6(col("ps").getItem(1)))
          .withColumn("rate", col("cnt") / lit(300.0))
        val payloads = per
          .groupBy(col("tenant_id"), col("bucket_ms"))
          .agg(collect_list(struct(col("metric_name").as("name"),
            col("cnt").as("count"), col("sum_v").as("sum"),
            col("min_v").as("min"), col("max_v").as("max"), col("rate"),
            map(lit("50"), col("p50"), lit("95"), col("p95"))
              .as("percentiles"))).as("timers"))
          .select(to_json(struct(col("tenant_id"),
            col("bucket_ms").as("timestamp"),
            lit(0L).as("flushInterval"), col("timers"))).as("value"))
        graft.streaming.IngestStream.processAggregatedBatch(
          Preaggregated.fromAggregatedJson(payloads), buildDir)
        // drop one rolled day from the tier the query reads: the facade
        // must ladder-replay it from preagg_raw, indistinguishably
        val p = new org.apache.hadoop.fs.Path(
          s"$buildDir/preagg_timer_60m/ts_day=$missingDay")
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      graft.query.MetricsQueryApi.getPreaggStored(s, store,
        graft.query.MetricsQueryApi.Params("error", "app.error.*",
          from = "20240103", to = "20240110",
          resolution = Some(Granularity.MIN_60),
          select = Seq("numPoints", "sum", "average", "min", "max", "rate",
            "p50", "p95")),
        "timer", nowMillis = 1706659200000L, maxBatch = 1000000)
        .withColumn("rate", snap6(col("rate")))
        .withColumn("p50", snap6(col("p50")))
        .withColumn("p95", snap6(col("p95")))
        .select("metric_name", "bucket_ms", "num_points", "sum_v", "average",
          "min_v", "max_v", "rate", "p50", "p95")
        .orderBy("metric_name", "bucket_ms")
    }
  }

  val defs: Seq[QDef] = Seq(
    counterMerge, timerPmapMerge, gaugeMerge, setStateMerge, preaggIngest,
    timerStored)
}
