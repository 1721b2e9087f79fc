package graft.query

import graft.core.{DateTimeParser, Granularity, GlobPattern, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The user-facing query API — the §3.1 lifecycle as one facade
  * (reference: HttpRollupsQueryHandler.java:115-161 +
  * HttpMultiRollupsQueryHandler + RollupHandler.getRollupByGranularity):
  * parse graphite-style from/to, resolve the metric set by glob, pick the
  * resolution (points-mode or explicit), aggregate the range, join units,
  * project requested stats, return time-ordered buckets.
  */
object MetricsQueryApi {

  /** Reference default MAX_METRICS_PER_BATCH_QUERY (HttpConfig.java:36,
    * enforced HttpMultiRollupsQueryHandler.java:110-114). */
  val MaxMetricsPerBatchQuery = 100

  final case class Params(
      tenantId: String,
      metricGlob: String,
      from: String,
      to: String,
      points: Option[Int] = None,
      resolution: Option[Granularity] = None,
      select: Seq[String] = Nil)

  /** Per-type default stat lists when `select=` is absent (reference:
    * PlotRequestParser.java:26-59). */
  val defaultStats: Map[String, Seq[String]] = Map(
    "basic" -> Seq("average", "numPoints", "sum"),
    "counter" -> Seq("numPoints", "sum"),
    "gauge" -> Seq("numPoints", "latest"),
    "timer" -> Seq("rate", "numPoints", "average"),
    "set" -> Seq("numPoints"))

  private val statCols: Map[String, String] = Map(
    "average" -> "average", "numPoints" -> "num_points", "sum" -> "sum_v",
    "min" -> "min_v", "max" -> "max_v", "variance" -> "var_v",
    "latest" -> "latest_v", "rate" -> "rate")

  /** Full read path. `nowMillis` pins both datetime parsing and the
    * retention clock (injectable for tests); `catalogOverride` injects a
    * discovery source other than the derived catalog (the reference's
    * discovery backend is pluggable the same way, DiscoveryIO).
    *
    * When `select=` is absent, defaults apply PER METRIC from its catalog
    * rollup_type (PlotRequestParser.java:26-59 +
    * BasicRollupsOutputSerializer — a mixed basic+counter glob returns each
    * metric its own default stat set, not the first metric's): the frame
    * keeps the union of the needed stat columns plus a per-row `stat_set`
    * listing the metric's own stats, which [[toJsonResponse]] uses to emit
    * exactly that metric's fields.
    *
    * Result schema contract: with `select=` given, the frame holds exactly
    * `(tenant_id, metric_name, unit, bucket_ms)` + the selected stat
    * columns. With `select=` ABSENT the frame instead carries the UNION of
    * every resolved rollup_type's default stat columns plus a `stat_set`
    * array naming each row's own stats (reference parity: per-metric
    * defaults, PlotRequestParser.java:26-59) — consumers doing positional
    * or fixed-column access must request an explicit `select=` or filter by
    * `stat_set`, as [[toJsonResponse]] does. */
  def getRollups(spark: SparkSession, dir: String, p: Params,
      nowMillis: Long = System.currentTimeMillis(),
      maxBatch: Int = MaxMetricsPerBatchQuery,
      catalogOverride: Option[DataFrame] = None): DataFrame = {
    require(p.points.isDefined ^ p.resolution.isDefined,
      "exactly one of points= or resolution= required")
    val fromMs = DateTimeParser.parseMillis(p.from, nowMillis)
    val toMs = DateTimeParser.parseMillis(p.to, nowMillis)
    require(fromMs < toMs, "from must precede to")

    val g = p.resolution.getOrElse(
      Granularity.granularityFromPointsInInterval(fromMs, toMs, p.points.get,
        nowMillis = nowMillis))

    // resolve locators via discovery, then guard the batch width (O2).
    // One scan: the guard caps the set at maxBatch rows, so collect once and
    // rebuild a local broadcast side instead of re-running the
    // catalog-derivation pipeline for count/type-lookup/join.
    val resolved = catalogOverride.getOrElse(Tables.catalog(spark, dir))
      .filter(col("tenant_id") === p.tenantId &&
        col("metric_name").rlike(GlobPattern.toAnchoredRegex(p.metricGlob)))
      .limit(maxBatch + 1)
      .collect()
    require(resolved.length <= maxBatch,
      s"batch query resolves > $maxBatch metrics")
    import spark.implicits._
    val names = resolved.toSeq
      .map(r => (r.getAs[String]("tenant_id"), r.getAs[String]("metric_name"),
        r.getAs[String]("unit"), r.getAs[String]("rollup_type")))
      .toDF("tenant_id", "metric_name", "unit", "rollup_type")

    // select= given → one uniform stat set; absent → per-metric defaults
    // by rollup_type, so keep the union of every resolved type's columns
    val perMetricDefaults = p.select.isEmpty
    val select =
      if (!perMetricDefaults) p.select
      else resolved.toSeq
        .map(r => r.getAs[String]("rollup_type")).distinct
        .flatMap(t => defaultStats.getOrElse(t, defaultStats("basic")))
        .distinct match {
          case Nil => defaultStats("basic")
          case u => u
        }

    val gEff = if (g.isFull) Granularity.MIN_5 else g
    // snap with the EFFECTIVE bucket granularity: FULL selection still
    // buckets at 5m, and an unsnapped start would truncate the first window
    val snappedFrom = gEff.snap(fromMs)
    val pts = Tables.metricsRange(spark, dir, Some((snappedFrom, toMs)))
      .filter(col("tenant_id") === p.tenantId)
      .join(broadcast(names), Seq("tenant_id", "metric_name"))
    val agged = pts
      .groupBy(col("tenant_id"), col("metric_name"), col("unit"),
        col("rollup_type"),
        Tables.bucketMs(col("ts_ms"), gEff).as("bucket_ms"))
      .agg(
        count(col("value")).as("num_points"),
        sum(col("value")).as("sum_v"),
        avg(col("value")).as("average"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        var_pop(col("value")).as("var_v"),
        max(struct(col("ts_ms"), col("value"))).getField("value").as("latest_v"))
      .withColumn("rate", col("num_points") / lit(gEff.millis / 1000.0))

    val keep = Seq("tenant_id", "metric_name", "unit", "bucket_ms") ++
      select.flatMap(statCols.get).distinct
    val projected =
      if (!perMetricDefaults) agged.select(keep.map(col): _*)
      else {
        // per-row list of this metric's own stat columns, consumed by the
        // serializer; the frame carries the union of columns
        val statSet = defaultStats.foldLeft(
            array(defaultStats("basic").flatMap(statCols.get).map(lit): _*)) {
          case (els, (t, stats)) =>
            when(col("rollup_type") === t,
              array(stats.flatMap(statCols.get).map(lit): _*)).otherwise(els)
        }
        agged.withColumn("stat_set", statSet)
          .select((keep :+ "stat_set").map(col): _*)
      }
    projected.orderBy("metric_name", "bucket_ms")
  }

  /** The reference's JSON response shape (S13,
    * JSONBasicRollupsOutputSerializer.java:55-151 /
    * BatchedMetricsJSONOutputSerializer: per metric
    * `{unit, values: [{timestamp, <stats>}...], metadata: {count, limit,
    * marker, next_href}}`). Driver-side by design — this is the API
    * serialization step, bounded by MaxMetricsPerBatchQuery. */
  def toJsonResponse(rollups: DataFrame): String = {
    val statFields = rollups.columns
      .filterNot(Set("tenant_id", "metric_name", "unit", "bucket_ms", "stat_set"))
    val hasStatSet = rollups.columns.contains("stat_set")
    val byMetric = rollups.collect()
      .groupBy(r => (r.getAs[String]("metric_name"), r.getAs[String]("unit")))
      .toSeq.sortBy(_._1)
    def jNum(v: Any): String = v match {
      case null => "null"
      case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
      case x => x.toString
    }
    // metric names/units are arbitrary ingested strings — escape them
    def jStr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val metrics = byMetric.map { case ((name, unit), rows) =>
      val values = rows.sortBy(_.getAs[Long]("bucket_ms")).map { r =>
        // per-metric default stat sets: emit only this metric's own stats
        val fields =
          if (hasStatSet) {
            val own = r.getSeq[String](r.fieldIndex("stat_set"))
            statFields.filter(own.contains)
          } else statFields
        val stats = fields.map(f => s""""$f": ${jNum(r.getAs[Any](f))}""")
        (Seq(s""""timestamp": ${r.getAs[Long]("bucket_ms")}""") ++ stats)
          .mkString("{", ", ", "}")
      }
      s"""{"metric": ${jStr(name)}, "unit": ${jStr(Option(unit).getOrElse("unknown"))}, """ +
        s""""values": [${values.mkString(", ")}], """ +
        s""""metadata": {"count": ${rows.length}, "limit": null, "marker": null, "next_href": null}}"""
    }
    s"""{"metrics": [${metrics.mkString(", ")}]}"""
  }
}
