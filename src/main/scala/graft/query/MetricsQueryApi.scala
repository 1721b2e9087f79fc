package graft.query

import graft.core.{DateTimeParser, Granularity, GlobPattern, Tables}
import graft.operators.Rollups
import graft.streaming.IngestStream
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

  /** The ONE JSON string escaper — shared by the serializer and the HTTP
    * facade so a future escaping fix cannot land on one and not the other. */
  private[graft] def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

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
    "latest" -> "latest_v", "rate" -> "rate",
    // the reference's MetricStat.PERCENTILE ("percentiles"), flattened to
    // the two labels the statsd ingest carries — timer family only
    "p50" -> "p50", "p95" -> "p95")

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
    val r = resolveQuery(spark, p, nowMillis, maxBatch,
      catalogOverride.getOrElse(Tables.catalog(spark, dir)))
    if (r.g.isFull) {
      // FULL serves the RAW SAMPLES themselves, not buckets (reference:
      // RollupType.classOf → SimpleNumber at FULL, RollupType.java:73-88;
      // serialized via getFilteredStatsForFullRes,
      // JSONBasicRollupsOutputSerializer.java:101-106, 173-183) — a user
      // zooming into an incident window gets actual points with their
      // actual timestamps. No snapping: samples in [from, to) as-is.
      val raw = Tables.metricsRange(spark, dir, Some((r.fromMs, r.toMs)))
        .filter(col("tenant_id") === p.tenantId)
        .join(broadcast(r.names), Seq("tenant_id", "metric_name"))
      return projectStats(rawAsStats(raw), r.select, r.perMetricDefaults)
        .orderBy("metric_name", "bucket_ms")
    }
    val gEff = r.g
    // snap so an unaligned start doesn't truncate the first window
    val snappedFrom = gEff.snap(r.fromMs)
    val pts = Tables.metricsRange(spark, dir, Some((snappedFrom, r.toMs)))
      .filter(col("tenant_id") === p.tenantId)
      .join(broadcast(r.names), Seq("tenant_id", "metric_name"))
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
    projectStats(agged, r.select, r.perMetricDefaults)
      .orderBy("metric_name", "bucket_ms")
  }

  /** The resolved prelude every read-path variant shares: datetime parse,
    * §4.1 resolution selection, glob → locator resolution with the O2 batch
    * guard, and the stat-selection rules (explicit `select=` vs per-metric
    * defaults by rollup_type). */
  private final case class ResolvedQuery(
      fromMs: Long, toMs: Long, g: Granularity,
      names: DataFrame, select: Seq[String], perMetricDefaults: Boolean)

  private def resolveQuery(spark: SparkSession, p: Params, nowMillis: Long,
      maxBatch: Int, catalog: DataFrame): ResolvedQuery = {
    require(p.points.isDefined ^ p.resolution.isDefined,
      "exactly one of points= or resolution= required")
    // fail loud on unknown stat names: silently dropping a typo'd
    // `select=mean` would serve timestamp-only buckets with a 200 (the
    // known-but-uncarried case still degrades to NULL columns)
    p.select.foreach(s => require(statCols.contains(s),
      s"unknown stat '$s' (one of ${statCols.keys.toSeq.sorted.mkString(", ")})"))
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
    val resolved = catalog
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
    ResolvedQuery(fromMs, toMs, g, names, select, perMetricDefaults)
  }

  /** A raw sample as a one-point pseudo-rollup row, per the reference's
    * FULL-resolution stat mapping (BasicRollupsOutputSerializer.MetricStat
    * .convertRawSampleToObject, each enum arm): average/min/max/latest/
    * rate/sum → the sample value, variance → 0, numPoints → 1; the sample's
    * own timestamp is the row's `bucket_ms`. Expects the joined frame
    * carrying (tenant_id, metric_name, unit, rollup_type, ts_ms, value). */
  private def rawAsStats(raw: DataFrame): DataFrame = {
    val v = col("value").cast("double")
    raw.select(col("tenant_id"), col("metric_name"), col("unit"),
      col("rollup_type"), col("ts_ms").as("bucket_ms"),
      lit(1L).as("num_points"), v.as("sum_v"), v.as("average"),
      v.as("min_v"), v.as("max_v"), lit(0.0).as("var_v"),
      v.as("latest_v"), v.as("rate"))
  }

  /** Shared stat projection: explicit `select=` keeps exactly those columns;
    * per-metric defaults keep the union plus a `stat_set` array naming each
    * row's own stats (see the schema contract on [[getRollups]]). */
  private def projectStats(agged0: DataFrame, select: Seq[String],
      perMetricDefaults: Boolean): DataFrame = {
    val keep = Seq("tenant_id", "metric_name", "unit", "bucket_ms") ++
      select.flatMap(statCols.get).distinct
    // a selected stat the serving path doesn't carry (p50 on the basic
    // store, say) degrades to a NULL column, matching preaggToStats'
    // padding — never an unresolved-column analysis error
    val agged = keep.filterNot(agged0.columns.contains)
      .foldLeft(agged0)((d, c) => d.withColumn(c, lit(null).cast("double")))
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
  }

  /** Catalog over an engine store (a directory produced by
    * [[graft.streaming.IngestStream]]): distinct locators plus their ingested
    * unit. Served from the PERSISTED catalog dimension the ingest path
    * maintains ([[graft.streaming.IngestStream.metricCatalog]] — the
    * reference's metrics_metadata CF + ES discovery index, SURVEY §1.1)
    * whenever the store has one: a metadata read of O(distinct locators)
    * rows, covering ALL ingested families like the reference's ES index
    * (one row per locator even when it spans families — `rollup_type`
    * takes the lexicographic min, ambiguity being the read path's problem
    * to flag, [[graft.http.MetricsHttpServer]] routeKind). Stores written
    * before the catalog existed (or via raw [[graft.streaming.IngestStream
    * .writeRaw]]) fall back to deriving basic locators by scanning the
    * name/unit columns of the raw store. */
  def storeCatalog(spark: SparkSession, storeDir: String): DataFrame =
    graft.streaming.IngestStream.metricCatalog(spark, storeDir)
      .map(_.groupBy(col("tenant_id"), col("metric_name"))
        .agg(max(col("unit")).as("unit"),
          min(col("family")).as("rollup_type")))
      .getOrElse(catalogFromRaw(spark.read.parquet(s"$storeDir/metrics_full")))

  private def catalogFromRaw(raw: DataFrame): DataFrame = {
    val unitCol =
      if (raw.columns.contains("unit")) max(col("unit")) else max(lit("unknown"))
    raw.groupBy(col("tenant_id"), col("metric_name"))
      .agg(unitCol.as("unit"))
      .withColumn("rollup_type", lit("basic"))
  }

  private val DayMs = 86400000L

  /** STORE-BACKED read path — the reference's core read: scan the rollup
    * table for the planner-selected granularity and recompute only the gaps
    * from raw (RollupHandler.getRollupByGranularity, RollupHandler.java:
    * 126-223 → MetricsRWDelegator.getDatapointsForRange; repair union
    * RollupHandler.java:241-297). [[getRollups]] re-aggregates the raw view
    * on every call — correct, but a scale-killer for a long-range query; this
    * variant reads ~range/granularity rows per metric from the materialized
    * tier the ingest cascade maintains, touching `metrics_full` only for:
    *
    *  - days ABSENT from the tier (never rolled, or deliberately dropped).
    *    Coverage is day-atomic by construction: the ingest path recomputes
    *    whole dirty days (dynamic partition overwrite, [[IngestStream
    *    .processBatch]]), so a `ts_day` present in a tier is fully rolled —
    *    the gap test is a cheap distinct over the tier's partition column,
    *    never a per-bucket anti-join against a full raw scan;
    *  - the tail PARTIAL bucket when `to` is not bucket-aligned: a stored
    *    bucket covers its whole window, so serving it would include points
    *    past `to`; it is recomputed from raw instead (the reference serves
    *    the full stored bucket here — we keep raw-path equivalence instead).
    *
    * `rollupFromRaw` computes the gap fill and must use the same algebra the
    * stored tiers were built with (the reference dispatches repair per rollup
    * type the same way, RollupRunnable.getRollupComputer). The basic store
    * serves BasicRollup stats (+ derived rate); `latest` belongs to the gauge
    * pre-aggregated family ([[graft.operators.Preaggregated]] tiers), as in
    * the reference where BasicRollup carries no latest value.
    *
    * `rawOverride` points the gap fill at a raw source other than the
    * store's own `metrics_full` — e.g. a view over an external full-
    * resolution table when only the rollup tiers are materialized in
    * `storeDir` (the reference's pluggable MetricsRW the same way). A source
    * without a `ts_day` column gets per-day `ts_ms` range predicates
    * instead of partition pruning.
    *
    * `dirtyDays` names days the caller KNOWS hold raw points newer than
    * the stored tier (the facade's deferred-rollup pending set — the
    * reference's ROLLUP_DELAY window): those days are served from the raw
    * recompute path even when the tier covers them, so a query between an
    * ingest and its background re-roll never reads a stale day. */
  def getRollupsStored(spark: SparkSession, storeDir: String, p: Params,
      nowMillis: Long = System.currentTimeMillis(),
      maxBatch: Int = MaxMetricsPerBatchQuery,
      catalogOverride: Option[DataFrame] = None,
      rollupFromRaw: (DataFrame, Granularity) => DataFrame = Rollups.basicFromRaw,
      rawOverride: Option[DataFrame] = None,
      dirtyDays: Set[Long] = Set.empty): DataFrame = {
    graft.core.Instrumentation.global.inc("query.reads.basic")
    val r = resolveQuery(spark, p, nowMillis, maxBatch,
      catalogOverride.getOrElse(rawOverride.map(catalogFromRaw)
        .getOrElse(storeCatalog(spark, storeDir))))
    if (r.g.isFull) {
      // FULL reads the full-resolution store itself — raw samples with
      // their own timestamps (the reference's FULL read targets the
      // full-res CF the same way, RollupType.classOf → SimpleNumber). The
      // tier/gap machinery below is moot: raw IS the source. `latest` is
      // legitimate here — a raw sample is its own latest value. A
      // tier-only store (no metrics_full, no rawOverride) serves empty,
      // not a schema-inference crash.
      val raw = rawOverride.getOrElse(rawStoreOrEmpty(spark, storeDir))
        .filter(col("ts_ms") >= r.fromMs && col("ts_ms") < r.toMs &&
          col("tenant_id") === p.tenantId)
        .select("tenant_id", "metric_name", "ts_ms", "value")
        .join(broadcast(r.names), Seq("tenant_id", "metric_name"))
      return projectStats(rawAsStats(raw), r.select, r.perMetricDefaults)
        .orderBy("metric_name", "bucket_ms")
    }
    // only an EXPLICIT latest request is an error — with select= absent the
    // computed per-metric default union may carry `latest` merely because
    // the glob matched a gauge-family catalog entry; the basic store just
    // serves without it (the gauge locator's rows come from its own family)
    require(!p.select.contains("latest"),
      "latest is served by the gauge preagg tiers, not the basic rollup store")
    val selEff = r.select.filterNot(_ == "latest")
    val gEff = r.g
    val snappedFrom = gEff.snap(r.fromMs)
    val toMs = r.toMs
    // tail partial bucket: when `to` is not bucket-aligned the stored bucket
    // at floor(to) covers points past `to`; recompute it from raw
    val tailStart = if (toMs % gEff.millis == 0) toMs else gEff.snap(toMs)
    val rangeDays: Seq[Long] =
      (snappedFrom - math.floorMod(snappedFrom, DayMs)) to (toMs - 1) by DayMs
    val nameKeys = r.names.select("tenant_id", "metric_name")

    val tierPath = s"$storeDir/metrics_${gEff.name}"
    // snapshot-resolved read (graft.core.SnapshotStore): the file set is
    // pinned per-day at planning time, so a concurrent dirty-day re-roll
    // can never serve this query a missing or partial day. Resolution is
    // range-pruned (only rangeDays' dirs are listed — planning cost
    // scales with the query, not the tier's retention age) and memoized
    // per publish generation. useCache is safe for MULTI-process
    // deployments too (a separate ingest JVM feeding the same store):
    // the memo's validity check stats the _version fence file every
    // publish rewrites, so a foreign publish is visible at this reader's
    // NEXT request — the 30 s TTL remains only as the backstop for
    // writers that bypass SnapshotStore.publish entirely
    val (coveredDays, stored) =
      graft.core.SnapshotStore.read(spark, tierPath,
          days = Some(rangeDays.filterNot(dirtyDays)), useCache = true) match {
        case None => (Set.empty[Long], None)
        case Some(tier0) =>
        // dirty (pending re-roll) days are excluded from BOTH the covered
        // set and the served slice: they fall into missingDays below and
        // recompute from raw — the repair that keeps deferred-rollup
        // serving exact
        val tier = tier0
          .filter(col("ts_day").isin(rangeDays.filterNot(dirtyDays): _*))
        // tiny collect: one long per day in range (partition-pruned scan of
        // the partition column only)
        val covered = tier.select("ts_day").distinct()
          .collect().map(_.getLong(0)).toSet
        val slice = tier
          .filter(col("bucket_ms") >= snappedFrom &&
            col("bucket_ms") < tailStart &&
            col("tenant_id") === p.tenantId)
          .join(broadcast(nameKeys), Seq("tenant_id", "metric_name"), "left_semi")
          .select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
            col("num_points"), col("sum_v"), col("avg_v"),
            col("min_v"), col("max_v"), col("var_v"))
        (covered, Some(slice))
      }

    val missingDays = rangeDays.filterNot(coveredDays)
    val gapFilled =
      if (missingDays.isEmpty && tailStart >= toMs) None
      else {
        // raw is touched ONLY for uncovered days and the tail partial
        // bucket; a raw store wholly pruned by retention (tier-only store)
        // reads as EMPTY — the tiers serve what they cover, gaps serve
        // nothing, never a PATH_NOT_FOUND crash
        val rawSrc = rawOverride.getOrElse(rawStoreOrEmpty(spark, storeDir))
        val hasDay = rawSrc.columns.contains("ts_day")
        val dayCond =
          if (missingDays.isEmpty) lit(false)
          else if (hasDay) col("ts_day").isin(missingDays: _*)
          else missingDays
            .map(d => col("ts_ms") >= d && col("ts_ms") < d + DayMs)
            .reduce(_ || _)
        // the tail read prunes to its own day partitions too — without the
        // ts_day bound a fully tier-covered `to=now` query would list every
        // raw day directory to recompute one bucket
        val tailCond =
          if (tailStart >= toMs) lit(false)
          else if (hasDay) col("ts_ms") >= tailStart &&
            col("ts_day").between(tailStart - math.floorMod(tailStart, DayMs),
              (toMs - 1) - math.floorMod(toMs - 1, DayMs))
          else col("ts_ms") >= tailStart
        val raw = rawSrc
          .filter(col("ts_ms") >= snappedFrom && col("ts_ms") < toMs &&
            (dayCond || tailCond) && col("tenant_id") === p.tenantId)
          .join(broadcast(nameKeys), Seq("tenant_id", "metric_name"), "left_semi")
          .select("tenant_id", "metric_name", "ts_ms", "value")
        Some(rollupFromRaw(raw, gEff))
      }

    // stored buckets and gap-filled buckets are disjoint by construction
    // (every tier window is day-contained and gap days exclude covered days),
    // so plain union — no anti-join needed
    val combined = (stored.toSeq ++ gapFilled.toSeq).reduce(_ unionByName _)
    val agged = combined
      .join(broadcast(r.names), Seq("tenant_id", "metric_name"))
      .withColumnRenamed("avg_v", "average")
      .withColumn("rate", col("num_points") / lit(gEff.millis / 1000.0))
    projectStats(agged, selEff, r.perMetricDefaults)
      .orderBy("metric_name", "bucket_ms")
  }

  /** The raw store, or an EMPTY frame of its query schema when retention
    * has pruned the whole table (tier-only store) — the read paths degrade
    * to tiers-only service instead of PATH_NOT_FOUND. */
  private def rawStoreOrEmpty(spark: SparkSession, storeDir: String): DataFrame =
    if (IngestStream.hasParquetData(spark, s"$storeDir/metrics_full"))
      spark.read.parquet(s"$storeDir/metrics_full")
    else {
      import spark.implicits._
      Seq.empty[(String, String, Long, Double)]
        .toDF("tenant_id", "metric_name", "ts_ms", "value")
    }

  /** The parsed-flush preagg store, or an empty frame of its schema when
    * `preagg_raw` aged out at the finest-tier TTL while the coarser kind
    * tiers (up to 1825d) still serve — same degrade contract as
    * [[rawStoreOrEmpty]]. */
  private def preaggRawOrEmpty(spark: SparkSession, storeDir: String): DataFrame =
    if (IngestStream.hasParquetData(spark, s"$storeDir/preagg_raw"))
      spark.read.parquet(s"$storeDir/preagg_raw")
    else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.operators.Preaggregated.preaggSchema)
      // the stored table carries its ts_day partition column; the reads'
      // day predicates must resolve against the empty stand-in too
      .withColumn("ts_day", lit(null).cast("long"))

  /** String/boolean metric read — the reference's metrics_string CF serve
    * path (ABasicMetricsRW.java:19; serialized as `{"value": <raw>}` via
    * getFilteredStatsForString/Boolean,
    * JSONBasicRollupsOutputSerializer.java:107-112, 185-197): strings have
    * NO rollups, so every read returns the raw values with their own
    * timestamps regardless of the points/resolution request — granularity
    * selection is a numeric concept the reference never applies here.
    * Result schema: (tenant_id, metric_name, unit, bucket_ms, value_str);
    * [[toJsonResponse]] renders value_str as a JSON string, with bare
    * `true`/`false` passed through as JSON booleans exactly like the
    * reference's Boolean points. */
  def getStringPoints(spark: SparkSession, storeDir: String, p: Params,
      nowMillis: Long = System.currentTimeMillis(),
      maxBatch: Int = MaxMetricsPerBatchQuery,
      catalogOverride: Option[DataFrame] = None): DataFrame = {
    graft.core.Instrumentation.global.inc("query.reads.string")
    val path = s"$storeDir/metrics_string"
    if (!IngestStream.hasParquetData(spark, path)) {
      // a store that ingested no strings serves an empty result, not a
      // schema-inference crash (same guard discipline as the tier reads)
      import spark.implicits._
      return Seq.empty[(String, String, String, Long, String, Boolean)]
        .toDF("tenant_id", "metric_name", "unit", "bucket_ms", "value_str",
          "is_bool")
    }
    val store = spark.read.parquet(path)
    // persisted catalog first (metadata read), table-derivation fallback —
    // same discipline as storeCatalog/preaggStoreCatalog
    val catalog = catalogOverride.getOrElse(
      graft.streaming.IngestStream.metricCatalog(spark, storeDir)
        .map(_.filter(col("family") === "string")
          .select(col("tenant_id"), col("metric_name"), col("unit"))
          .withColumn("rollup_type", lit("string")))
        .getOrElse(store.groupBy(col("tenant_id"), col("metric_name"))
          .agg(max(col("unit")).as("unit"))
          .withColumn("rollup_type", lit("string"))))
    val r = resolveQuery(spark, p, nowMillis, maxBatch, catalog)
    store
      .filter(col("ts_ms") >= r.fromMs && col("ts_ms") < r.toMs &&
        col("tenant_id") === p.tenantId)
      .select("tenant_id", "metric_name", "ts_ms", "value_str", "is_bool")
      .join(broadcast(r.names.select("tenant_id", "metric_name", "unit")),
        Seq("tenant_id", "metric_name"))
      .select(col("tenant_id"), col("metric_name"), col("unit"),
        col("ts_ms").as("bucket_ms"), col("value_str"), col("is_bool"))
      .orderBy("metric_name", "bucket_ms")
  }

  /** Locator catalog for one pre-aggregated family: served from the
    * PERSISTED catalog dimension when the store carries a complete one
    * ([[graft.streaming.IngestStream.metricCatalog]] records every kind as
    * its family — an O(locators) metadata read), falling back to deriving
    * from the parsed-flush store. The fallback reads EMPTY once retention
    * prunes `preagg_raw` (finest-tier TTL) — the coarser kind tiers can
    * outlive it by years, and their locators must stay resolvable. Statsd
    * payloads carry no unit; rollup_type is the family itself (the
    * reference's metrics_metadata records the same discriminator). */
  def preaggStoreCatalog(spark: SparkSession, storeDir: String,
      kind: String): DataFrame =
    graft.streaming.IngestStream.metricCatalog(spark, storeDir)
      .map(_.filter(col("family") === kind)
        .select("tenant_id", "metric_name"))
      .getOrElse(preaggRawOrEmpty(spark, storeDir)
        .filter(col("kind") === kind)
        .select("tenant_id", "metric_name").distinct())
      .withColumn("unit", lit("unknown"))
      .withColumn("rollup_type", lit(kind))

  // single source of truth with the cascade's dispatch — see
  // Preaggregated.merges (gap repair must agree with what the cascade
  // stored, which only holds if both use the same map)
  private def preaggMerges = graft.operators.Preaggregated.merges

  /** Recompute a pre-aggregated tier slice from parsed flush rows by
    * replicating the STORED LADDER hop-by-hop (5m tier-1, then each
    * cascade tier's kind merge up to `gEff`). A direct single-hop
    * aggregation at `gEff` would NOT match the store for path-dependent
    * algebra — the timer percentile merge is an unweighted mean-of-means
    * per hop (reference-lossy by design, BluefloodTimerRollup.java:242-254),
    * so 5m→20m→60m differs from 5m→60m. Gap repair must agree with what
    * the cascade would have stored, hence the ladder walk. */
  private def preaggLadder(parsed: DataFrame, kind: String,
      gEff: Granularity): DataFrame = {
    val tier1 = graft.operators.Preaggregated
      .tier1FromParsed(parsed, Granularity.MIN_5)(kind)
    Granularity.rollupTiers.filter(g =>
        g.millis > Granularity.MIN_5.millis && g.millis <= gEff.millis)
      .foldLeft(tier1)((finer, g) => preaggMerges(kind)(finer, g))
  }

  /** Map one family's stored state columns onto the facade's stat-column
    * contract (reference serializer dispatch,
    * JSONBasicRollupsOutputSerializer.java:55-151: counter numPoints =
    * sampleCount and sum = accumulated count; timer scalars; gauge latest;
    * set cardinality). Stats a family doesn't carry surface as NULL
    * columns, so an explicit cross-family `select=` degrades to nulls
    * instead of an analysis error. */
  private def preaggToStats(df: DataFrame, kind: String): DataFrame = {
    val keys = Seq(col("tenant_id"), col("metric_name"), col("bucket_ms"))
    val mapped = kind match {
      case "counter" => df.select(keys ++ Seq(
        col("sample_count").as("num_points"), col("count").as("sum_v"),
        col("rate")): _*)
      case "gauge" => df.select(keys ++ Seq(
        col("num_points"), col("latest_v"), col("min_v"), col("max_v")): _*)
      case "timer" => df.select(keys ++ Seq(
        col("count").as("num_points"), col("sum").as("sum_v"),
        when(col("count") =!= 0, col("sum") / col("count")).as("average"),
        col("min").as("min_v"), col("max").as("max_v"), col("rate"),
        element_at(col("percentiles"), "50").as("p50"),
        element_at(col("percentiles"), "95").as("p95")): _*)
      case "set" => df.select(keys ++ Seq(
        col("distinct_count").cast("long").as("num_points")): _*)
    }
    statCols.values.toSeq.distinct.filterNot(mapped.columns.contains)
      .foldLeft(mapped)((d, c) => d.withColumn(c, lit(null).cast("double")))
  }

  /** STORE-BACKED read for a pre-aggregated family — the kind-dispatched
    * arm of the reference's read path (RollupHandler routes a locator's
    * read to its rollup_type's column family the same way,
    * MetricsRWDelegator.java:79-113): scan `preagg_<kind>_<g>` for the
    * planner-selected granularity, recompute only tier-absent days and the
    * tail partial bucket from the `preagg_raw` parsed-flush store via the
    * SAME ladder algebra the cascade used ([[preaggLadder]]). Day-atomic
    * coverage holds for the preagg tiers exactly as for the basic ones
    * (dirty-day dynamic overwrite, [[IngestStream.processAggregatedBatch]]).
    * This serves `latest` (gauge family) — the stat [[getRollupsStored]]
    * refuses because BasicRollup does not carry it. */
  def getPreaggStored(spark: SparkSession, storeDir: String, p: Params,
      kind: String,
      nowMillis: Long = System.currentTimeMillis(),
      maxBatch: Int = MaxMetricsPerBatchQuery,
      catalogOverride: Option[DataFrame] = None,
      dirtyDays: Set[Long] = Set.empty): DataFrame = {
    require(preaggMerges.contains(kind),
      s"unknown pre-aggregated kind '$kind' (one of ${preaggMerges.keys.mkString(", ")})")
    graft.core.Instrumentation.global.inc(s"query.reads.$kind")
    val r = resolveQuery(spark, p, nowMillis, maxBatch,
      catalogOverride.getOrElse(preaggStoreCatalog(spark, storeDir, kind)))
    if (r.g.isFull) {
      // FULL serves each ingested flush as its own point (the reference's
      // RollupType.classOf returns the preagg rollup class itself at FULL —
      // statsd rollups are stored full-resolution and served as ingested).
      // tier1FromParsed at FULL is the identity bucketing (bucket_ms =
      // ts_ms), merging only exact-timestamp duplicate flushes — the same
      // single-slot merge the reference applies on write.
      val parsed = preaggRawOrEmpty(spark, storeDir)
        .filter(col("ts_ms") >= r.fromMs && col("ts_ms") < r.toMs &&
          col("tenant_id") === p.tenantId && col("kind") === kind)
        .join(broadcast(r.names.select("tenant_id", "metric_name")),
          Seq("tenant_id", "metric_name"), "left_semi")
      val tier = graft.operators.Preaggregated
        .tier1FromParsed(parsed, Granularity.FULL)(kind)
      val agged = preaggToStats(tier, kind)
        .join(broadcast(r.names), Seq("tenant_id", "metric_name"))
      return projectStats(agged, r.select, r.perMetricDefaults)
        .orderBy("metric_name", "bucket_ms")
    }
    val gEff = r.g
    val snappedFrom = gEff.snap(r.fromMs)
    val toMs = r.toMs
    val tailStart = if (toMs % gEff.millis == 0) toMs else gEff.snap(toMs)
    val rangeDays: Seq[Long] =
      (snappedFrom - math.floorMod(snappedFrom, DayMs)) to (toMs - 1) by DayMs
    val nameKeys = r.names.select("tenant_id", "metric_name")

    val tierPath = s"$storeDir/preagg_${kind}_${gEff.name}"
    // snapshot-resolved read — the getRollupsStored reader-isolation,
    // range-pruning and memoization notes all apply
    val (coveredDays, stored) =
      graft.core.SnapshotStore.read(spark, tierPath,
          days = Some(rangeDays.filterNot(dirtyDays)), useCache = true) match {
        case None => (Set.empty[Long], None)
        case Some(tier0) =>
        // dirty (pending re-roll) days recompute from preagg_raw — see
        // the getRollupsStored deferred-rollup note
        val tier = tier0
          .filter(col("ts_day").isin(rangeDays.filterNot(dirtyDays): _*))
        val covered = tier.select("ts_day").distinct()
          .collect().map(_.getLong(0)).toSet
        val slice = tier
          .filter(col("bucket_ms") >= snappedFrom &&
            col("bucket_ms") < tailStart &&
            col("tenant_id") === p.tenantId)
          .join(broadcast(nameKeys), Seq("tenant_id", "metric_name"), "left_semi")
          .drop("ts_day")
        (covered, Some(slice))
      }

    val missingDays = rangeDays.filterNot(coveredDays)
    val gapFilled =
      if (missingDays.isEmpty && tailStart >= toMs) None
      else {
        val dayCond =
          if (missingDays.isEmpty) lit(false)
          else col("ts_day").isin(missingDays: _*)
        // tail read pruned to its own day partitions (see getRollupsStored)
        val tailCond =
          if (tailStart >= toMs) lit(false)
          else col("ts_ms") >= tailStart &&
            col("ts_day").between(tailStart - math.floorMod(tailStart, DayMs),
              (toMs - 1) - math.floorMod(toMs - 1, DayMs))
        val parsed = preaggRawOrEmpty(spark, storeDir)
          .filter(col("ts_ms") >= snappedFrom && col("ts_ms") < toMs &&
            (dayCond || tailCond) &&
            col("tenant_id") === p.tenantId && col("kind") === kind)
          .join(broadcast(nameKeys), Seq("tenant_id", "metric_name"), "left_semi")
        Some(preaggLadder(parsed, kind, gEff))
      }

    val combined = (stored.toSeq ++ gapFilled.toSeq).reduce(_ unionByName _)
    val agged = preaggToStats(combined, kind)
      .join(broadcast(r.names), Seq("tenant_id", "metric_name"))
    projectStats(agged, r.select, r.perMetricDefaults)
      .orderBy("metric_name", "bucket_ms")
  }

  /** The reference's JSON response shape (S13,
    * JSONBasicRollupsOutputSerializer.java:55-151 /
    * BatchedMetricsJSONOutputSerializer: per metric
    * `{unit, values: [{timestamp, <stats>}...], metadata: {count, limit,
    * marker, next_href}}`). Driver-side by design — this is the API
    * serialization step, bounded by MaxMetricsPerBatchQuery. */
  def toJsonResponse(rollups: DataFrame): String = {
    val statFields = rollups.columns
      .filterNot(Set("tenant_id", "metric_name", "unit", "bucket_ms",
        "stat_set", "is_bool"))
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
    def jStr(s: String): String = jsonStr(s)
    val metrics = byMetric.map { case ((name, unit), rows) =>
      val values = rows.sortBy(_.getAs[Long]("bucket_ms")).map { r =>
        // per-metric default stat sets: emit only this metric's own stats
        val fields =
          if (hasStatSet) {
            val own = r.getSeq[String](r.fieldIndex("stat_set"))
            statFields.filter(own.contains)
          } else statFields
        val stats = fields.map {
          // string/boolean points (metrics_string): the reference emits the
          // raw value under "value" — strings quoted, booleans bare
          // (getFilteredStatsForString/Boolean). is_bool carries the
          // ORIGINAL JSON type: a string metric whose text is "true" stays
          // a quoted string
          case "value_str" =>
            val isBool = rollups.columns.contains("is_bool") &&
              r.getAs[Boolean]("is_bool")
            val s = r.getAs[String]("value_str")
            s""""value": ${if (isBool) s else jStr(s)}"""
          case f => s""""$f": ${jNum(r.getAs[Any](f))}"""
        }
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
