package graft.api

import graft.core.{Granularity, OracleViews, Tables}
import graft.operators.Rollups
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The rollup surface of the engine expressed as named, oracle-checked
  * queries over the driver's `events` table (mapped to metric points by
  * [[graft.core.Tables.metrics]]). */
object RollupQueries {

  /** Exact decimal accumulation of a 2-decimal double column, surfaced back
    * as DOUBLE — makes sums engine-order-independent. */
  private def sumDec(c: Column): Column = sum(c.cast(DecimalType(28, 2))).cast("double")

  /** Same for squared values (4 exact decimals; 8 kept for headroom). */
  private def sumSqDec(c: Column): Column =
    sum((c * c).cast(DecimalType(38, 8))).cast("double")

  private val sumDecSql = "CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE)"
  private val sumSqDecSql = "CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE)"

  /** Basic rollup from raw at a granularity, with deterministic stats:
    * avg = exactSum/n; var = (exactSumSq − exactSum²/n)/n (population —
    * reference Variance.java:74). Same scalar expressions in the oracle. */
  private def basicDeterministic(spark: SparkSession, dir: String, g: Granularity): DataFrame = {
    val n = count(col("value"))
    Tables.metrics(spark, dir)
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("ts_ms"), g).as("bucket_ms"))
      .agg(
        n.as("num_points"),
        sumDec(col("value")).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        sumSqDec(col("value")).as("sum_sq"))
      .withColumn("avg_v", col("sum_v") / col("num_points"))
      .withColumn("var_v",
        (col("sum_sq") - col("sum_v") * col("sum_v") / col("num_points")) / col("num_points"))
      .drop("sum_sq")
      .orderBy("tenant_id", "metric_name", "bucket_ms")
  }

  private def basicSql(g: Granularity): String =
    s"""WITH ${OracleViews.metricsCte},
       |agg AS (
       |  SELECT tenant_id, metric_name,
       |         (ts_ms // ${g.millis}) * ${g.millis} AS bucket_ms,
       |         COUNT(value) AS num_points,
       |         $sumDecSql AS sum_v,
       |         MIN(value) AS min_v,
       |         MAX(value) AS max_v,
       |         $sumSqDecSql AS sum_sq
       |  FROM metrics
       |  GROUP BY 1, 2, 3
       |)
       |SELECT tenant_id, metric_name, bucket_ms, num_points, sum_v, min_v, max_v,
       |       sum_v / num_points AS avg_v,
       |       (sum_sq - sum_v * sum_v / num_points) / num_points AS var_v
       |FROM agg
       |ORDER BY tenant_id, metric_name, bucket_ms""".stripMargin

  /** Raw time-range slice for one locator, time-ordered — the core scan
    * (reference: DMetricsCFPreparedStatements.java:40 single-partition slice;
    * ordering Points.java:26 TreeMap). Filter + projection push down to the
    * parquet scan. */
  private val rangeScan = QDef(
    "q_range_scan",
    s"""WITH ${OracleViews.metricsCte}
       |SELECT metric_name, ts_ms, value
       |FROM metrics
       |WHERE tenant_id = 'click' AND metric_name = 'app.click.user_7'
       |  AND ts_ms >= 1704067200000 AND ts_ms < 1705276800000
       |ORDER BY ts_ms""".stripMargin) { (s, dir) =>
    Tables.metricsRange(s, dir, Some((1704067200000L, 1705276800000L)))
      .filter(col("tenant_id") === "click" && col("metric_name") === "app.click.user_7")
      .select("metric_name", "ts_ms", "value")
      .orderBy("ts_ms")
  }

  /** Ingest validation filter (reference: JSONMetric.java:28-39 epoch-range
    * bean validation + HttpMetricsIngestionHandler.java:116-128): counts of
    * valid vs out-of-range points per tenant. The "now" reference is pinned
    * to the dataset's end for determinism. */
  private val ingestValidate = QDef(
    "q_ingest_validate",
    s"""WITH ${OracleViews.metricsCte}
       |SELECT tenant_id,
       |       CAST(SUM(CASE WHEN ts_ms >= 1704067200000 AND ts_ms < 1706745600000
       |                      AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS valid_points,
       |       CAST(SUM(CASE WHEN ts_ms < 1704067200000 OR ts_ms >= 1706745600000
       |                      OR value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS invalid_points
       |FROM metrics
       |GROUP BY tenant_id
       |ORDER BY tenant_id""".stripMargin) { (s, dir) =>
    val valid = (col("ts_ms") >= 1704067200000L && col("ts_ms") < 1706745600000L &&
      col("value").isNotNull)
    Tables.metrics(s, dir)
      .groupBy(col("tenant_id"))
      .agg(
        sum(when(valid, 1L).otherwise(0L)).as("valid_points"),
        sum(when(valid, 0L).otherwise(1L)).as("invalid_points"))
      .orderBy("tenant_id")
  }

  private val basic5m = QDef("q_rollup_basic_5m", basicSql(Granularity.MIN_5)) {
    (s, dir) => basicDeterministic(s, dir, Granularity.MIN_5)
  }

  private val basic1440m = QDef("q_rollup_basic_1440m", basicSql(Granularity.MIN_1440)) {
    (s, dir) => basicDeterministic(s, dir, Granularity.MIN_1440)
  }

  /** Merge path: 5m rollups combined into 60m via the rollup-merge algebra
    * (reference: BasicRollup.java:108-112). The oracle aggregates raw
    * directly at 60m — matching results prove merge ≡ from-raw, the
    * reference's core invariant. Exact decimal partials make the algebra
    * bit-deterministic. */
  private val basicMerge60m = QDef("q_rollup_basic_merge_60m", basicSql(Granularity.MIN_60)) {
    (s, dir) =>
      // Tier-1 partials stay DECIMAL so the tier-2 re-sum is exact
      // (decimal addition is associative; double addition is not).
      val g5 = Tables.metrics(s, dir)
        .groupBy(col("tenant_id"), col("metric_name"),
          Tables.bucketMs(col("ts_ms"), Granularity.MIN_5).as("bucket_ms"))
        .agg(
          count(col("value")).as("num_points"),
          sum(col("value").cast(DecimalType(28, 2))).as("sum_v_dec"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          sum((col("value") * col("value")).cast(DecimalType(38, 8))).as("sum_sq_dec"))
      g5.groupBy(col("tenant_id"), col("metric_name"),
          Tables.bucketMs(col("bucket_ms"), Granularity.MIN_60).as("bucket_ms"))
        .agg(
          sum(col("num_points")).as("num_points"),
          sum(col("sum_v_dec")).cast("double").as("sum_v"),
          min(col("min_v")).as("min_v"),
          max(col("max_v")).as("max_v"),
          sum(col("sum_sq_dec")).cast("double").as("sum_sq"))
        .withColumn("avg_v", col("sum_v") / col("num_points"))
        .withColumn("var_v",
          (col("sum_sq") - col("sum_v") * col("sum_v") / col("num_points")) / col("num_points"))
        .drop("sum_sq")
        .orderBy("tenant_id", "metric_name", "bucket_ms")
  }

  /** Full cascade: 5m → 20m → 60m → 240m → 1440m, each hop using only the
    * previous tier (never re-reading raw) — the reference's tiered rollup
    * pipeline end to end (§3.3). The oracle aggregates raw directly at
    * 1440m, so a match proves the merge algebra is exact across all four
    * hops. DECIMAL partials ride the whole ladder. */
  private val cascade1440m = QDef("q_rollup_cascade_1440m", basicSql(Granularity.MIN_1440)) {
    (s, dir) =>
      val tier5 = Tables.metrics(s, dir)
        .groupBy(col("tenant_id"), col("metric_name"),
          Tables.bucketMs(col("ts_ms"), Granularity.MIN_5).as("bucket_ms"))
        .agg(
          count(col("value")).as("num_points"),
          sum(col("value").cast(DecimalType(28, 2))).as("sum_v_dec"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          sum((col("value") * col("value")).cast(DecimalType(38, 8))).as("sum_sq_dec"))
      def hop(finer: org.apache.spark.sql.DataFrame, g: Granularity) =
        finer.groupBy(col("tenant_id"), col("metric_name"),
            Tables.bucketMs(col("bucket_ms"), g).as("bucket_ms"))
          .agg(
            sum(col("num_points")).as("num_points"),
            sum(col("sum_v_dec")).as("sum_v_dec"),
            min(col("min_v")).as("min_v"),
            max(col("max_v")).as("max_v"),
            sum(col("sum_sq_dec")).as("sum_sq_dec"))
      val tier1440 = Seq(Granularity.MIN_20, Granularity.MIN_60,
        Granularity.MIN_240, Granularity.MIN_1440).foldLeft(tier5)(hop)
      tier1440
        .withColumn("sum_v", col("sum_v_dec").cast("double"))
        .withColumn("sum_sq", col("sum_sq_dec").cast("double"))
        .withColumn("avg_v", col("sum_v") / col("num_points"))
        .withColumn("var_v",
          (col("sum_sq") - col("sum_v") * col("sum_v") / col("num_points")) / col("num_points"))
        .select("tenant_id", "metric_name", "bucket_ms", "num_points",
          "sum_v", "min_v", "max_v", "avg_v", "var_v")
        .orderBy("tenant_id", "metric_name", "bucket_ms")
  }

  val defs: Seq[QDef] = Seq(rangeScan, ingestValidate, basic5m, basic1440m,
    basicMerge60m, cascade1440m)
}
