package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables and the canonical
  * metric-point view the engine's rollup/query operators run over.
  *
  * The engine's native data model is a metric point
  * `(tenant_id, metric_name, ts_ms, value)` — reference: blueflood-core/...
  * /types/Locator.java:25-101 (tenant + dotted name identity) and
  * types/Metric.java:28-62 (point = locator, value, collectionTime). The
  * driver's synthetic `events` table is adapted to that model with a fixed,
  * deterministic mapping so every rollup operator has a DuckDB-checkable
  * oracle over the same parquet.
  */
object Tables {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Epoch-aligned bucket start in millis for a granularity — integer math
    * only, so Spark and the DuckDB oracle agree bit-for-bit
    * (reference snapMillis: Granularity.java:130-133). */
  def bucketMs(tsMs: Column, g: Granularity): Column =
    (tsMs - pmod(tsMs, lit(g.millis))).cast("long")

  /** The canonical raw metric-point view over `events`:
    *   tenant_id   = event_type
    *   metric_name = 'app.' || event_type || '.user_' || user_id   (3 dotted tokens)
    *   ts_ms       = epoch millis of ts (UTC)
    *   value       = value
    * DuckDB oracle equivalent (see [[OracleViews.metricsCte]]):
    *   SELECT event_type AS tenant_id,
    *          'app.' || event_type || '.user_' || CAST(user_id AS VARCHAR) AS metric_name,
    *          epoch_ms(ts) AS ts_ms, value FROM events
    */
  def metrics(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    // events.ts is parquet TIMESTAMP(NANOS): with
    // spark.sql.legacy.parquet.nanosAsLong=true it arrives as LongType nanos;
    // integer `div` keeps the full 64-bit precision (a double division would
    // lose bits above 2^53).
    val tsMs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unix_millis(col("ts").cast("timestamp"))
    }
    ev.select(
      col("event_type").as("tenant_id"),
      concat(lit("app."), col("event_type"), lit(".user_"),
        col("user_id").cast("string")).as("metric_name"),
      tsMs.as("ts_ms"),
      col("value"))
  }

  /** Derived metric catalog (reference keeps this in a metadata CF + ES
    * discovery index — types/MetricMetadata.java:22-31, ElasticIO.java:49-94;
    * here it is a small dimension meant to be broadcast at query time).
    * unit/rollup_type are deterministic functions of the tenant so the
    * DuckDB oracle can re-derive them. */
  def catalog(spark: SparkSession, dir: String): DataFrame =
    metrics(spark, dir)
      .select(col("tenant_id"), col("metric_name")).distinct()
      .withColumn("unit",
        when(col("tenant_id") === "purchase", lit("dollars"))
          .when(col("tenant_id") === "error", lit("errors"))
          .otherwise(lit("count")))
      .withColumn("rollup_type",
        when(col("tenant_id").isin("click", "view"), lit("counter"))
          .otherwise(lit("basic")))
}

/** DuckDB-side equivalents of the derived views, shared by every oracle SQL
  * string so Spark and the oracle always agree on the mapping. */
object OracleViews {
  /** CTE body defining `metrics` over the driver-registered `events` table. */
  val metricsCte: String =
    """metrics AS (
      |  SELECT event_type AS tenant_id,
      |         'app.' || event_type || '.user_' || CAST(user_id AS VARCHAR) AS metric_name,
      |         epoch_ms(ts) AS ts_ms,
      |         value
      |  FROM events
      |)""".stripMargin

  val catalogCte: String =
    """catalog AS (
      |  SELECT tenant_id, metric_name,
      |         CASE WHEN tenant_id = 'purchase' THEN 'dollars'
      |              WHEN tenant_id = 'error' THEN 'errors'
      |              ELSE 'count' END AS unit,
      |         CASE WHEN tenant_id IN ('click','view') THEN 'counter'
      |              ELSE 'basic' END AS rollup_type
      |  FROM (SELECT DISTINCT tenant_id, metric_name FROM metrics)
      |)""".stripMargin
}
