package graft.streaming

import graft.core.{Granularity, Instrumentation, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingest: the Spark-native replacement for the
  * reference's ingest service + shard/slot rollup scheduling
  * (HttpMetricsIngestionServer → BatchWriter → ScheduleContext →
  * RollupService; SURVEY §3.2-§3.3).
  *
  * Design:
  *  - JSON batches stream in, are validated (the P3 predicate set:
  *    non-empty name, epoch bounds, TTL range — reference
  *    JSONMetric.java:28-39), split valid/invalid;
  *  - valid points append to the full-resolution store, partitioned by day;
  *  - each micro-batch recomputes the 5m rollup for exactly the day
  *    partitions the batch touched, overwriting them (dynamic partition
  *    overwrite). Recompute-from-source is the reference's own idempotent
  *    re-roll discipline (rollups never read-modify-write — SURVEY §7.4#3),
  *    and it makes late data a non-event: a late point simply makes its day
  *    dirty again. This replaces the entire delayed-locator/re-roll state
  *    machine (ShardStateManager, ScheduleContext) with checkpointed
  *    streaming offsets + partition overwrite.
  *  - coarser tiers (20m…1440m) roll from the 5m table in the same
  *    incremental-batch fashion via [[rollupCascadeFor]].
  */
object IngestStream {

  /** Marker conf naming a session as a DEDICATED request-sized ingest
    * session: its planning confs are pinned for life, so the fused paths
    * never mutate it (and never mutate anything shared). */
  private val IngestSessionMarker = "spark.graft.ingest.session"

  /** A dedicated session for REQUEST-SIZED fused ingest writes — same
    * SparkContext/catalog as `parent`, its OWN SQLConf, with the
    * request-sized planning confs pinned for life: AQE off (each query-
    * stage materialization is a full extra scheduling round, ~100-300 ms
    * on request-scale data) and ONE shuffle partition. The facade binds
    * one of these at construction and parses every ingest body into it,
    * so concurrent readers and the deferred drain — which share the
    * PARENT session — always plan with the session defaults (the r12
    * set/restore dance made read plans a function of ingest duty cycle).
    *
    * `newSession()` starts from builder-time options only, dropping
    * post-hoc `conf.set` values, so the parent's MODIFIABLE runtime confs
    * (parquet reader flags, session timezone) are copied over first;
    * static confs throw on set and are skipped. */
  def newIngestSession(parent: SparkSession): SparkSession = {
    val s = parent.newSession()
    parent.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => }
    }
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    // partition discovery past 32 paths launches a whole Spark JOB per
    // read — the r13 steady-arm timeline showed it as a third hidden
    // action (one scheduling round + ~40 ms) on every dirty-day re-roll's
    // raw-store read. Request-scale stores list faster on the driver.
    s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold",
      "4096")
    s.conf.set(IngestSessionMarker, "true")
    s
  }

  /** Whether `spark` is a [[newIngestSession]] product (pinned for life —
    * the fused paths skip their set/restore fallback on it). */
  private def isPinnedIngestSession(spark: SparkSession): Boolean =
    spark.conf.get(IngestSessionMarker, "false") == "true"

  val inputSchema: StructType = StructType(Seq(
    StructField("tenant_id", StringType),
    StructField("metric_name", StringType),
    StructField("ts_ms", LongType),
    StructField("value", DoubleType),
    StructField("ttl_seconds", IntegerType),
    StructField("unit", StringType)))

  /** Ingest validation (reference: JSONMetric.java:28-39,
    * EpochRangeValidator; epoch window of ±3h around processing time by
    * default in the reference — here parameterized). */
  /** The validity predicate over an explicit value column — shared by
    * [[withValidity]] and the facade's fused accounting aggregate, so the
    * engine's valid/errors split and a caller-computed stats hint can
    * never disagree. */
  private[graft] def validExpr(value: org.apache.spark.sql.Column,
      minTs: Long, maxTs: Long): org.apache.spark.sql.Column =
    // coalesce: a NULL field (e.g. missing ts_ms) must yield valid=false,
    // not NULL — under three-valued logic a NULL flag would drop the
    // record from BOTH the valid store and the errors sink
    coalesce(
      col("metric_name").isNotNull && length(col("metric_name")) > 0 &&
        value.isNotNull &&
        col("ts_ms").between(minTs, maxTs) &&
        (col("ttl_seconds").isNull || col("ttl_seconds") > 0),
      lit(false))

  def withValidity(points: DataFrame, minTs: Long, maxTs: Long): DataFrame =
    points.withColumn("valid", validExpr(col("value"), minTs, maxTs))

  /** Parse a stream/batch of JSON lines into typed points. */
  def parseJson(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value").cast("string"), inputSchema).as("m"))
      .select("m.*")

  /** `inputSchema` with an untyped value: the reference accepts numeric,
    * string, AND boolean metric values in one ingest batch
    * (Metric.java:38-61 takes Object; the serializer renders String/Boolean
    * points at JSONBasicRollupsOutputSerializer.java:107-112). `from_json`
    * coerces JSON numbers/booleans to their literal text, so one parse
    * serves all three; [[processTypedBatch]] routes on the original JSON
    * type recovered by [[parseJsonTyped]]'s variant reading. */
  val typedInputSchema: StructType = StructType(Seq(
    StructField("tenant_id", StringType),
    StructField("metric_name", StringType),
    StructField("ts_ms", LongType),
    StructField("value", StringType),
    StructField("ttl_seconds", IntegerType),
    StructField("unit", StringType)))

  /** Parse mixed-type JSON lines. Routing must follow the JSON TYPE, not
    * castability — the reference keeps a string metric whose text happens
    * to be numeric ("123", "007") a string (Metric.java routes on the
    * parsed Object's class), and `from_json` into StringType erases that
    * distinction. The VARIANT reading recovers it:
    * `schema_of_variant(variant_get(parse_json(line), '$.value'))` is
    * 'STRING' / 'BOOLEAN' / a numeric type per the original JSON token.
    * `value_num` is the ANSI-safe numeric reading (try_cast, never a
    * throw); `is_bool` survives into the string store so the serializer
    * can render booleans bare and strings quoted. */
  def parseJsonTyped(lines: DataFrame): DataFrame =
    lines
      .select(
        from_json(col("value").cast("string"), typedInputSchema).as("m"),
        expr("schema_of_variant(variant_get(try_parse_json(cast(value AS STRING)), '$.value'))")
          .as("vtype"))
      .select(col("m.*"), col("vtype"))
      .withColumn("value_num", expr("try_cast(value AS DOUBLE)"))
      .withColumn("is_string_typed",
        coalesce(col("vtype") === "STRING", lit(false)))
      .withColumn("is_bool", coalesce(col("vtype") === "BOOLEAN", lit(false)))
      .drop("vtype")

  /** One mixed-type micro-batch, routed by value type exactly as the
    * reference splits the basic CFs from metrics_string
    * (ABasicMetricsRW.java:19 — "metrics_{granularity} & metrics_string
    * column families"): numeric values take the FULL rollup pipeline
    * ([[processBatch]]: raw write + dirty-day re-roll + errors sink);
    * string/boolean values append to the day-partitioned `metrics_string`
    * store — never rolled (the reference computes no rollups for strings;
    * they serve at full resolution only, see
    * [[graft.query.MetricsQueryApi.getStringPoints]]). Invalid string
    * records (empty name, out-of-window ts) land in the shared errors
    * sink like their numeric siblings. */
  def processTypedBatch(batch: DataFrame, storeDir: String, batchId: Long = 0L,
      minTs: Long = 0L, maxTs: Long = Long.MaxValue,
      rollup: Boolean = true,
      virginHint: Option[Boolean] = None,
      accounting: Option[TypedAccounting] = None): Seq[Long] = {
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a caller-supplied accounting (the facade's fused aggregate, which
      // already materialized the cache) answers emptiness without a job
      if (accounting.fold(cached.isEmpty)(a =>
          a.numericStats.isEmpty && a.stringStats.isEmpty)) return Nil
      // probed BEFORE any of this batch's writes: a first batch on an
      // empty store makes the catalog complete-from-birth. The hint lets
      // a caller that KNOWS the store state (the facade after its first
      // persisted batch) skip the ~30-table glob probe per request.
      val virgin = virginHint.getOrElse(!storeHasData(cached.sparkSession, storeDir))
      // metered here, not in the numeric arm: a string-only batch would
      // otherwise vanish from the batch counter (processBatch returns
      // before its meter on an empty numeric split)
      Instrumentation.global.inc("ingest.batches")
      val isStringKind = col("is_string_typed") || col("is_bool")
      // numeric arm: everything NOT string/boolean-typed — a numeric-typed
      // but uncastable value arrives with value null and fails validity
      // into the errors sink rather than vanishing
      val numeric = cached.filter(!isStringKind)
        .select(col("tenant_id"), col("metric_name"), col("ts_ms"),
          col("value_num").as("value"), col("ttl_seconds"), col("unit"))
      val dirtyDays = processBatch(
        withValidity(numeric, minTs, maxTs), storeDir, batchId,
        meterBatch = false, virginHint = Some(virgin), rollup = rollup,
        statsHint = accounting.map(_.numericStats),
        locatorsHint = accounting.flatMap(_.numericLocators)
          .map(dedupLocators("basic", _)))
      // a fused accounting also covers the string arm: an all-numeric
      // batch skips the string accounting job entirely
      if (accounting.exists(_.stringStats.values.sum == 0L)) return dirtyDays
      val strings = withValidity(
        cached.filter(isStringKind)
          .select(col("tenant_id"), col("metric_name"), col("ts_ms"),
            col("value"), col("ttl_seconds"), col("unit"), col("is_bool")),
        minTs, maxTs)
        .withColumnRenamed("value", "value_str")
      // one accounting aggregate for the string arm too (see processBatch)
      val sstats = accounting.map(_.stringStats).getOrElse(
        strings.groupBy(col("valid")).count().collect()
          .map(r => (r.getBoolean(0), r.getLong(1))).toMap)
      if (sstats.isEmpty) return dirtyDays
      val nBadStrings = sstats.getOrElse(false, 0L)
      if (nBadStrings > 0) {
        Instrumentation.global.inc("ingest.rows.errors.string", nBadStrings)
        strings.filter(!col("valid")).drop("valid")
          .write.mode("overwrite")
          .parquet(s"$storeDir/metrics_string_errors/batch_id=$batchId")
      }
      val goodStrings = strings.filter(col("valid")).drop("valid")
      val nGoodStrings = sstats.getOrElse(true, 0L)
      if (nGoodStrings == 0) return dirtyDays
      Instrumentation.global.inc("ingest.rows.metrics_string", nGoodStrings)
      // catalog before data (see processBatch's crash-ordering note)
      writeCatalog(goodStrings, storeDir, batchId, src = "string",
        familyCol = lit("string"), markComplete = virgin,
        rowCountHint = Some(nGoodStrings),
        locatorsHint = accounting.flatMap(_.stringLocators)
          .map(dedupLocators("string", _)))
      goodStrings.withColumn("ts_day", dayOf(col("ts_ms")))
        .write.mode("overwrite").partitionBy("ts_day")
        .parquet(s"$storeDir/metrics_string/batch_id=$batchId")
      dirtyDays
    } finally cached.unpersist()
  }

  private def dayOf(c: org.apache.spark.sql.Column) = c - pmod(c, lit(86400000L))

  /** Everything a synchronous ingest request needs back from
    * [[processTypedBatchFused]]: the dirty days, the per-record error
    * rows (tenant, name, failing source field, ts — the reference's
    * bean-validation array, ErrorResponse.java), and the batch total. */
  final case class FusedIngestResult(
      dirtyDays: Seq[Long],
      errors: Array[(String, String, String, Option[Long])],
      nTotal: Long)

  /** ONE-JOB typed ingest — the request-sized HTTP POST path taken to its
    * floor: the WHOLE per-request accounting (batch total, per-arm
    * valid/invalid splits, dirty-day set, catalog locator sets, AND the
    * per-record error rows) rides the staged numeric raw write as
    * `Dataset.observe` metrics, so a clean numeric POST costs exactly one
    * Spark action in deferred mode (plus the dirty-day re-roll in
    * synchronous mode). Additional actions run only when their data
    * exists: an errors-sink write per arm with rejects, the
    * `metrics_string` writes when the POST carries string/bool values, a
    * tiny catalog write when the memo sees new locators.
    *
    * Ordering (the crash contract, strictly stronger than the classic
    * path's): staged write (hidden) → `onDirtyDays` callback (the
    * facade's durable marker write) → catalog commit → ONE atomic rename
    * unhides the batch → re-roll. A crash anywhere leaves either nothing
    * visible, or markers/catalog that over-approximate — never visible
    * data without its marker or catalog.
    *
    * The error rows here and the errors sinks are derived from the SAME
    * validity predicates, so the response and the audit trail cannot
    * disagree (the documented facade contract). */
  def processTypedBatchFused(batch: DataFrame, storeDir: String,
      batchId: Long, minTs: Long, maxTs: Long,
      rollup: Boolean = true,
      virginHint: Option[Boolean] = None,
      onDirtyDays: Seq[Long] => Unit = _ => ()): FusedIngestResult = {
    val spark = batch.sparkSession
    val virgin = virginHint.getOrElse(!storeHasData(spark, storeDir))
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // request-sized planning confs: the facade routes through a dedicated
    // pinned session (newIngestSession) so nothing reader-shared is ever
    // mutated; the set/restore fallback remains ONLY for callers whose
    // batch is bound to a session they own end-to-end (streaming
    // foreachBatch micro-batch frames)
    val pinned = isPinnedIngestSession(spark)
    val aqeBefore =
      if (pinned) null else spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufBefore =
      if (pinned) null else spark.conf.get("spark.sql.shuffle.partitions")
    val discBefore = if (pinned) null else spark.conf.get(
      "spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    if (!pinned) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
    }
    try {
      val isStr = coalesce(col("is_string_typed") || col("is_bool"), lit(false))
      val vn = validExpr(col("value_num"), minTs, maxTs)
      val vs = validExpr(col("value"), minTs, maxTs)
      // first failing constraint per record — the reference's
      // bean-validation order (JSONMetric.java:24-41)
      val src = when(col("metric_name").isNull ||
          length(col("metric_name")) === 0, lit("metricName"))
        .when(col("value").isNull ||
          (!isStr && col("value_num").isNull), lit("metricValue"))
        .when(col("ts_ms").isNull || !col("ts_ms").between(minTs, maxTs),
          lit("collectionTime"))
        .when(col("ttl_seconds").isNotNull && col("ttl_seconds") <= 0,
          lit("ttlInSeconds"))
      val unitCol = if (cached.columns.contains("unit")) col("unit")
                    else lit(null).cast("string")
      val obs = org.apache.spark.sql.Observation(
        s"typed_${batchId}_${java.util.UUID.randomUUID()}")
      val stage = new org.apache.hadoop.fs.Path(
        s"$storeDir/metrics_full/.staging-$batchId")
      val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val targetPath = new org.apache.hadoop.fs.Path(
        s"$storeDir/metrics_full/batch_id=$batchId")
      val isReplay = fs.exists(targetPath)
      cached.observe(obs,
          count(lit(1)).as("n_total"),
          count(when(!isStr && vn, lit(1))).as("n_valid_num"),
          count(when(!isStr && !vn, lit(1))).as("n_invalid_num"),
          count(when(isStr && vs, lit(1))).as("n_valid_str"),
          count(when(isStr && !vs, lit(1))).as("n_invalid_str"),
          collect_set(when(!isStr && vn, dayOf(col("ts_ms")))).as("days"),
          collect_set(when(!isStr && vn, struct(col("tenant_id"),
            col("metric_name"), unitCol.as("unit")))).as("num_locs"),
          collect_set(when(isStr && vs, struct(col("tenant_id"),
            col("metric_name"), unitCol.as("unit")))).as("str_locs"),
          collect_list(when(src.isNotNull, struct(col("tenant_id"),
            col("metric_name"), src.as("src"), col("ts_ms")))).as("errs"))
        .filter(!isStr && vn)
        .select(col("tenant_id"), col("metric_name"), col("ts_ms"),
          col("value_num").as("value"), col("ttl_seconds"), col("unit"))
        .coalesce(1)
        .withColumn("ts_day", dayOf(col("ts_ms")))
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .partitionBy("ts_day").parquet(stage.toString)
      val m = obs.get
      def n(k: String) = m(k).asInstanceOf[Long]
      def locsOf(k: String) = m(k).asInstanceOf[scala.collection.Seq[Any]]
        .map { a =>
          val r = a.asInstanceOf[org.apache.spark.sql.Row]
          (r.getString(0), r.getString(1),
            if (r.isNullAt(2)) null else r.getString(2))
        }
      val nTotal = n("n_total")
      def discardStage(): Unit = {
        fs.delete(stage, true)
        val parent = stage.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
          fs.delete(parent, false)
        ()
      }
      if (nTotal == 0) { discardStage(); return FusedIngestResult(Nil, Array.empty, 0L) }
      Instrumentation.global.inc("ingest.batches")
      val errors = m("errs").asInstanceOf[scala.collection.Seq[Any]].map { a =>
        val r = a.asInstanceOf[org.apache.spark.sql.Row]
        (Option(r.getString(0)).getOrElse(""),
          Option(r.getString(1)).getOrElse(""), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toArray
      // errors sinks per arm, written only when rejects exist (empty
      // parquet dirs would break the sinks' schema inference)
      if (n("n_invalid_num") > 0) {
        Instrumentation.global.inc("ingest.rows.errors", n("n_invalid_num"))
        cached.filter(!isStr && !vn)
          .select(col("tenant_id"), col("metric_name"), col("ts_ms"),
            col("value_num").as("value"), col("ttl_seconds"), col("unit"))
          .write.mode("overwrite")
          .parquet(s"$storeDir/metrics_errors/batch_id=$batchId")
      }
      if (n("n_invalid_str") > 0) {
        Instrumentation.global.inc("ingest.rows.errors.string",
          n("n_invalid_str"))
        cached.filter(isStr && !vs)
          .select(col("tenant_id"), col("metric_name"), col("ts_ms"),
            col("value").as("value_str"), col("ttl_seconds"), col("unit"),
            col("is_bool"))
          .write.mode("overwrite")
          .parquet(s"$storeDir/metrics_string_errors/batch_id=$batchId")
      }
      // string arm (rare on metric POSTs): catalog-before-data, same as
      // the classic path
      if (n("n_valid_str") > 0) {
        Instrumentation.global.inc("ingest.rows.metrics_string",
          n("n_valid_str"))
        writeCatalogLocators(spark, storeDir, batchId, "string",
          dedupLocators("string", locsOf("str_locs")), markComplete = virgin)
        cached.filter(isStr && vs)
          .select(col("tenant_id"), col("metric_name"), col("ts_ms"),
            col("value").as("value_str"), col("ttl_seconds"), col("unit"),
            col("is_bool"))
          .coalesce(1)
          .withColumn("ts_day", dayOf(col("ts_ms")))
          .write.mode("overwrite").partitionBy("ts_day")
          .parquet(s"$storeDir/metrics_string/batch_id=$batchId")
      }
      val days = m("days").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Long]).toSeq
      if (n("n_valid_num") == 0) {
        discardStage()
        return FusedIngestResult(Nil, errors, nTotal)
      }
      // durable dirty-day markers BEFORE anything becomes visible
      onDirtyDays(days)
      // catalog BEFORE the data unhides; the string arm (when present)
      // already wrote the coverage marker for a virgin store
      writeCatalogLocators(spark, storeDir, batchId, "numeric",
        dedupLocators("basic", locsOf("num_locs")),
        markComplete = virgin && n("n_valid_str") == 0)
      if (isReplay) fs.delete(targetPath, true)
      require(fs.rename(stage, targetPath),
        s"raw batch commit rename failed for $targetPath")
      Instrumentation.global.inc("ingest.rows.metrics_full", n("n_valid_num"))
      if (rollup) rollDirtyDays(spark, storeDir, days.toArray)
      FusedIngestResult(days, errors, nTotal)
    } finally {
      if (!pinned) {
        spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
        spark.conf.set("spark.sql.shuffle.partitions", shufBefore)
        spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", discBefore)
      }
      cached.unpersist()
      ()
    }
  }

  /** Maintain the persisted locator catalog — the reference's
    * `metrics_metadata` CF + ES discovery index, written by the ingest
    * path's metadata analyzer (IncomingMetricMetadataAnalyzer.java:36-121)
    * rather than derived by scanning the data tables: one tiny parquet dir
    * per (source, batch) holding the batch's DISTINCT
    * (tenant_id, metric_name, family, unit) rows. At 100 TB this is what
    * makes "which family/unit is this locator" a metadata read instead of
    * three raw-table scans; per batch it costs one map-side-combined
    * aggregate over rows already cached in memory. The `src=` level keeps
    * concurrently running typed/preagg streams' batch ids from colliding.
    * Like the reference's locator index, entries outlive retention-pruned
    * data (a name stays discoverable until the catalog is rebuilt). */
  /** Process-wide seen-locator memo per store — the reference's
    * MetadataCache shape (IncomingMetricMetadataAnalyzer checks its cache
    * BEFORE writing metrics_metadata): a request-sized batch whose every
    * (tenant, name, family, unit) was already committed to the catalog by
    * this process skips the per-batch catalog write entirely; only NEW
    * locators are written (the catalog is a union of batch dirs, readers
    * dedup). Entries are recorded AFTER their write commits, so a crash
    * can only under-record (extra writes, never a missing locator).
    * Bounded: past [[CatalogMemoCap]] entries the memo stops admitting
    * (all-new batches keep writing normally); batches larger than
    * [[CatalogMemoBatchCap]] rows (bulk streaming, e.g. the 10⁶-locator
    * stress shape) bypass the collect and take the plain write path. A
    * catalog REBUILD drops what retention aged out — it must
    * [[invalidateCatalogMemo]] so a re-ingested locator is re-written. */
  private val catalogSeen = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Set[(String, String, String, String)]]()
  private val CatalogMemoCap = 500000
  private val CatalogMemoBatchCap = 100000L

  private[graft] def invalidateCatalogMemo(storeDir: String): Unit = {
    catalogSeen.remove(storeDir)
    ()
  }

  /** Cross-process catalog-memo fence — the snapshot `_version` discipline
    * applied to the catalog root: [[rebuildCatalog]] rewrites
    * `metric_catalog/_version`; [[writeCatalogLocators]] stats it before
    * trusting [[catalogSeen]], so a rebuild from a separate ops JVM
    * invalidates THIS process's memo at its next ingest rather than at
    * restart. Fence mtime the memo was built against, per store root;
    * 0 = no fence file yet (pre-fence store — in-process
    * [[invalidateCatalogMemo]] still covers the common case). */
  private val catalogSeenFence =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def catalogFencePath(storeDir: String) =
    new org.apache.hadoop.fs.Path(s"$storeDir/metric_catalog/_version")

  private def catalogFenceMtime(spark: SparkSession, storeDir: String): Long = {
    val p = catalogFencePath(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => 0L }
  }

  private def bumpCatalogFence(spark: SparkSession, storeDir: String): Unit =
    try {
      val p = catalogFencePath(storeDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      out.write(java.util.UUID.randomUUID().toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    } catch { case _: java.io.IOException => }

  private def writeCatalog(rows: DataFrame, storeDir: String, batchId: Long,
      src: String, familyCol: org.apache.spark.sql.Column,
      markComplete: Boolean = false,
      rowCountHint: Option[Long] = None,
      locatorsHint: Option[Array[(String, String, String, String)]] = None)
      : Unit = {
    val spark = rows.sparkSession
    // a caller that already holds the batch's distinct locators (the
    // facade's fused accounting / the observe-on-write path) skips the
    // per-batch catalog aggregate entirely — zero Spark jobs unless fresh
    // locators actually need writing
    locatorsHint match {
      case Some(locs) =>
        writeCatalogLocators(spark, storeDir, batchId, src, locs, markComplete)
        return
      case None =>
    }
    val unitCol = if (rows.columns.contains("unit")) col("unit")
                  else lit(null).cast("string")
    val distinctLoc = rows.select(col("tenant_id"), col("metric_name"),
        familyCol.as("family"), unitCol.as("unit"))
      .groupBy("tenant_id", "metric_name", "family")
      .agg(max("unit").as("unit"))
    val memoPath = rowCountHint.exists(_ <= CatalogMemoBatchCap)
    if (memoPath) {
      // batch-bounded collect (the same aggregate the plain path writes)
      val locs = distinctLoc.collect().map(r => (r.getString(0),
        r.getString(1), r.getString(2), Option(r.getString(3)).orNull))
      writeCatalogLocators(spark, storeDir, batchId, src, locs,
        markComplete = false)
    } else {
      distinctLoc
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(s"$storeDir/metric_catalog/src=$src/batch_id=$batchId")
    }
    if (markComplete) markCatalogComplete(spark, storeDir)
  }

  /** Memo-filtered catalog upsert from driver-held locator rows
    * (tenant, name, family, unit) — the tail of [[writeCatalog]]'s memo
    * path, callable directly when the batch's distinct locators were
    * already collected by a fused aggregate. */
  private def writeCatalogLocators(spark: SparkSession, storeDir: String,
      batchId: Long, src: String,
      locs: Array[(String, String, String, String)],
      markComplete: Boolean): Unit = {
    // cross-process fence check BEFORE trusting the memo (one metadata
    // stat per batch — the SnapshotStore `_version` discipline): a
    // rebuildCatalog in a SEPARATE ops JVM may have dropped aged-out
    // locators this memo still believes written; trusting it would skip
    // the catalog row of a re-ingested locator until facade restart
    val fence = catalogFenceMtime(spark, storeDir)
    val prevFence = catalogSeenFence.put(storeDir, fence)
    if (prevFence != null && prevFence.longValue() != fence)
      catalogSeen.remove(storeDir)
    val seen = catalogSeen.computeIfAbsent(storeDir,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet())
    val fresh = locs.filterNot(seen.contains)
    if (fresh.nonEmpty) {
      import spark.implicits._
      fresh.toSeq.toDF("tenant_id", "metric_name", "family", "unit")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(s"$storeDir/metric_catalog/src=$src/batch_id=$batchId")
      // record ONLY after the commit; stop admitting past the cap
      if (seen.size() < CatalogMemoCap) fresh.foreach(seen.add)
    }
    if (markComplete) markCatalogComplete(spark, storeDir)
  }

  /** Replicates [[writeCatalog]]'s distinct-locator aggregate
    * (groupBy(tenant, name, family).agg(max(unit))) over driver-held
    * (tenant, name, unit) triples — catalog content is bit-identical to
    * the relational path for ANY unit string: Spark's string max orders
    * by unsigned UTF-8 bytes (code-point order), while Java's String
    * ordering compares UTF-16 code units (surrogates sort BELOW
    * U+E000..U+FFFF), so the winner is picked by explicit UTF-8 byte
    * comparison, never String.max. */
  private def utf8Max(a: String, b: String): String = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return if (c > 0) a else b
      i += 1
    }
    if (x.length >= y.length) a else b
  }

  private def dedupLocators(family: String,
      locs: Iterable[(String, String, String)])
      : Array[(String, String, String, String)] =
    locs.groupBy(l => (l._1, l._2)).map { case ((t, n), vs) =>
      val units = vs.map(_._3).filter(_ != null)
      (t, n, family, if (units.isEmpty) null else units.reduce(utf8Max))
    }.toArray

  /** COVERAGE marker for the catalog: present only when every locator the
    * data tables hold is also cataloged — written when the catalog is born
    * WITH the store (the first batch found no pre-existing data) or by
    * [[rebuildCatalog]] (complete by construction). [[metricCatalog]]
    * refuses to serve an unmarked catalog: a pre-catalog store that gains
    * a partial catalog from its first post-upgrade batch would otherwise
    * silently hide every older locator from discovery and misroute their
    * views reads — mere existence is not coverage. */
  private def markCatalogComplete(spark: SparkSession, storeDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(
      s"$storeDir/metric_catalog/_complete")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.create(p, true).close()
  }

  private val preaggKinds = Seq("counter", "gauge", "timer", "set")

  /** Every table whose rows name a servable locator: the raw stores PLUS
    * the rollup tiers — retention prunes raw days long before the coarser
    * tiers' TTLs expire, so a store can hold tier-only locators with no
    * raw trace (the exact state after [[graft.operators.Retention
    * .enforce]] on an idle metric). Raw tables lead so the common
    * non-empty probe short-circuits on the first glob. */
  private def locatorTables: Seq[String] =
    Seq("metrics_full", "metrics_string", "preagg_raw") ++
      Granularity.rollupTiers.map(g => s"metrics_${g.name}") ++
      (for (k <- preaggKinds; g <- Granularity.rollupTiers)
        yield s"preagg_${k}_${g.name}")

  /** Whether any locator-bearing table already holds data — probed at
    * batch START (before this batch's writes) to decide if a first
    * catalog write covers the whole store. Memoized process-wide once
    * TRUE (the facade's storeKnownNonVirgin cache, generalized): "has
    * data" is monotone while serving — retention drops aged days, never
    * the day just written — so every steady batch after the first skips
    * the ~30-table glob probe. */
  private val storeNonVirgin =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def storeHasData(spark: SparkSession, storeDir: String): Boolean =
    storeNonVirgin.contains(storeDir) || {
      val r = locatorTables.exists(t => hasParquetData(spark, s"$storeDir/$t"))
      if (r) storeNonVirgin.add(storeDir)
      r
    }

  /** The persisted locator catalog, deduplicated across batches: one row
    * per (tenant_id, metric_name, family) with the max ingested unit —
    * None when the store predates the catalog OR the catalog lacks its
    * `_complete` coverage marker (a catalog born mid-life covers only the
    * batches since the upgrade; serving it would hide every older locator,
    * so callers fall back to deriving locators from the raw tables until
    * [[rebuildCatalog]] closes the gap and writes the marker). Size is
    * O(distinct locators), broadcastable. */
  def metricCatalog(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val marker = new org.apache.hadoop.fs.Path(
      s"$storeDir/metric_catalog/_complete")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker) ||
        !hasParquetData(spark, s"$storeDir/metric_catalog")) None
    else Some(spark.read.parquet(s"$storeDir/metric_catalog")
      .groupBy("tenant_id", "metric_name", "family")
      .agg(max("unit").as("unit")))
  }

  /** Fold the catalog's per-micro-batch dirs — a 5-second-trigger stream
    * writes one tiny dir per batch (~17k/day), the same small-file growth
    * [[graft.operators.Retention.compactRaw]] exists for, but worse per
    * byte because every dir is a few rows. Each `src=` subtree folds
    * independently into ONE distinct-row dir (id ≥
    * [[graft.operators.Retention.CompactIdBase]]); the fold is the same
    * aggregation [[metricCatalog]] applies on read, so the reader's view
    * is unchanged. Crash safety reuses the raw-compaction discipline
    * verbatim (per-src `_compact_manifest` +
    * [[graft.operators.Retention.recoverCompaction]], which is layout-
    * agnostic below the batch_id level). Non-quiesced mode spares each
    * src's newest small dir — its stream may still be committing. Returns
    * the new id per folded src. */
  def compactCatalog(spark: SparkSession, storeDir: String,
      minBatchDirs: Int = 2, assumeQuiesced: Boolean = false): Map[String, Long] = {
    import org.apache.hadoop.fs.Path
    import graft.operators.Retention
    require(minBatchDirs >= 2, s"minBatchDirs must be >= 2, got $minBatchDirs")
    val root = new Path(s"$storeDir/metric_catalog")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    fs.globStatus(new Path(root, "src=*")).toSeq.flatMap { srcSt =>
      val srcPath = srcSt.getPath
      val srcTable = s"metric_catalog/${srcPath.getName}"
      Retention.recoverCompaction(spark, storeDir, srcTable)
      val all = fs.globStatus(new Path(srcPath, "batch_id=*")).toSeq
        .flatMap(st => st.getPath.getName.stripPrefix("batch_id=")
          .toLongOption.map(id => (id, st.getPath, st.getModificationTime)))
        .sortBy(_._1)
      val small = all.filter(_._1 < Retention.CompactIdBase)
      // newest = most recently MODIFIED (facade ids are hashes, unordered;
      // see Retention.compactRaw) — that dir's stream may still be writing
      val batches =
        (if (assumeQuiesced || small.isEmpty) small
         else {
           val spare = small.filter(_._3 == small.map(_._3).max).maxBy(_._1)
           small.filterNot(_._1 == spare._1)
         }).map(t => (t._1, t._2))
      if (batches.size < minBatchDirs) None
      else {
        val newId = math.max(Retention.CompactIdBase, all.map(_._1).max + 1)
        val manifest = new Path(srcPath, "_compact_manifest")
        val out = fs.create(manifest, true)
        out.write((newId +: batches.map(_._2.getName))
          .mkString("\n").getBytes("UTF-8"))
        out.close()
        val tmp = new Path(srcPath, s".compact_tmp_$newId")
        spark.read.option("basePath", srcPath.toString)
          .parquet(batches.map(_._2.toString): _*)
          .groupBy("tenant_id", "metric_name", "family")
          .agg(max("unit").as("unit"))
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        require(fs.rename(tmp, new Path(srcPath, s"batch_id=$newId")),
          s"catalog compaction rename failed: $tmp")
        batches.foreach { case (_, p) => fs.delete(p, true) }
        fs.delete(manifest, false)
        Some(srcPath.getName.stripPrefix("src=") -> newId)
      }
    }.toMap
  }

  /** Re-derive the catalog from the data tables themselves — the remedy
    * for the catalog's two designed-in staleness modes: entries outliving
    * retention-pruned data (the reference's locator index has the same
    * property, aged by its own TTL), and stores written before the catalog
    * existed (or via raw [[writeRaw]]) that have no catalog at all. One
    * scan of the name/unit/kind columns of `metrics_full` /
    * `metrics_string` / `preagg_raw` — the O(table) cost the per-batch
    * catalog exists to amortize away, paid deliberately here in an
    * offline maintenance window (schedule with [[graft.operators
    * .Retention.enforce]], whose partition drops create the staleness).
    *
    * Crash contract: the rebuilt rows land under `src=rebuild` with an id
    * above every existing dir BEFORE any old dir is deleted, so every
    * intermediate state serves a SUPERSET of the live locators (readers
    * dedup); a crash mid-delete leaves stale-but-safe entries and a
    * re-run converges. No manifest needed — unlike a fold, nothing here
    * destroys information the data tables don't still hold. */
  def rebuildCatalog(spark: SparkSession, storeDir: String): Unit =
    rebuildCatalog(spark, storeDir, () => ())

  /** [[rebuildCatalog]] with a test seam fired between the coverage marker
    * and the retire loop — the window where a concurrent ingest's catalog
    * dir must SURVIVE retirement (it is not in the snapshot). */
  private[graft] def rebuildCatalog(spark: SparkSession, storeDir: String,
      beforeRetire: () => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$storeDir/metric_catalog")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def derived(table: String, famCol: org.apache.spark.sql.Column) =
      // SnapshotStore.read resolves gen'd tiers to their current snapshot
      // and falls back to plain discovery for the batch-dir tables
      graft.core.SnapshotStore.read(spark, s"$storeDir/$table").map { t =>
        val unitCol = if (t.columns.contains("unit")) col("unit")
                      else lit(null).cast("string")
        t.select(col("tenant_id"), col("metric_name"),
          famCol.as("family"), unitCol.as("unit"))
      }
    // every locator-bearing table, tiers included: retention prunes raw
    // days before the coarser tiers' TTLs, so a tier-only locator is still
    // SERVABLE (the kind-routed stored reads hit the tier directly) and
    // must stay discoverable/routable after a rebuild
    val parts =
      derived("metrics_full", lit("basic")) ++
        derived("metrics_string", lit("string")) ++
        derived("preagg_raw", col("kind")) ++
        Granularity.rollupTiers.flatMap(g =>
          derived(s"metrics_${g.name}", lit("basic"))) ++
        (for (k <- preaggKinds; g <- Granularity.rollupTiers)
          yield derived(s"preagg_${k}_${g.name}", lit(k))).flatten
    if (parts.isEmpty) { fs.delete(root, true); return }
    val rows = parts.reduce(_ unionByName _)
      .groupBy("tenant_id", "metric_name", "family")
      .agg(max("unit").as("unit"))
    // SNAPSHOT the retireable dirs BEFORE the derive scan materializes
    // (the write below runs it): a concurrent ingest that lands its
    // catalog dir after this point — possibly between the derive scan and
    // the retire loop — is NOT retired. Its entries survive as a superset
    // duplicate readers dedup, instead of being deleted while its data
    // rows land, which would leave a marked-complete catalog missing a
    // live locator (the exact misrouting the _complete marker prevents).
    val retireable: Seq[Path] =
      if (!fs.exists(root)) Seq.empty
      else fs.globStatus(new Path(root, "src=*/batch_id=*")).toSeq.map(_.getPath)
    val newId = math.max(graft.operators.Retention.CompactIdBase,
      retireable
        .flatMap(_.getName.stripPrefix("batch_id=").toLongOption)
        .foldLeft(0L)(math.max) + 1)
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/metric_catalog/src=rebuild/batch_id=$newId")
    // the rebuild dir alone covers every live locator — mark coverage NOW
    // so a crash mid-retire still leaves a servable (superset) catalog
    markCatalogComplete(spark, storeDir)
    beforeRetire()
    // retire ONLY the snapshotted dirs the rebuild supersedes (older
    // rebuilds included); compare by path NAME — globStatus returns
    // scheme-qualified paths, so a string compare against a locally built
    // Path never matches
    for (b <- retireable
         if !(b.getParent.getName == "src=rebuild" &&
           b.getName == s"batch_id=$newId")) {
      fs.delete(b, true)
      if (fs.globStatus(new Path(b.getParent, "batch_id=*")).isEmpty &&
          b.getParent.getName != "src=rebuild")
        fs.delete(b.getParent, true)
    }
    // the rebuild derives from LIVE data, so locators whose every row
    // aged out just left the catalog — the seen-locator memo must forget
    // them or a later re-ingest would skip re-writing a live locator.
    // In-process: direct invalidation; OTHER processes' memos: the fence
    // file bump below, statted by their next writeCatalogLocators
    invalidateCatalogMemo(storeDir)
    bumpCatalogFence(spark, storeDir)
  }

  /** One micro-batch: append raw, then recompute 5m rollups for the days
    * this batch touched. Pure DataFrame ops; executors do all data work
    * (the only driver-side collect is the small dirty-day list).
    *
    * Idempotent under foreachBatch's at-least-once retries: the raw write
    * goes to a batch-id partition with overwrite, so a replayed batch
    * replaces rather than duplicates its own rows, and the re-roll (which
    * always recomputes from the store) converges to the same state.
    *
    * `rollup = false` DEFERS the dirty-day re-roll (the reference's
    * ROLLUP_DELAY shape, CoreConfig.java:222: ingest writes raw fast,
    * rollups run on a background cadence): only raw + catalog + errors
    * are written. Returns the valid dirty-day list either way — a
    * deferring caller owns running [[rollDirtyDaysNow]] for them later
    * and serving those days via the raw-recompute repair meanwhile
    * ([[graft.query.MetricsQueryApi.getRollupsStored]] `dirtyDays`). */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long = 0L,
      meterBatch: Boolean = true, virginHint: Option[Boolean] = None,
      rollup: Boolean = true,
      statsHint: Option[Array[(Boolean, Option[Long], Long)]] = None,
      locatorsHint: Option[Array[(String, String, String, String)]] = None,
      fuseObserve: Boolean = false)
      : Seq[Long] = {
    val spark = batch.sparkSession
    if (fuseObserve && statsHint.isEmpty)
      return processBatchFused(batch, storeDir, batchId, meterBatch,
        virginHint, rollup)
    // probed BEFORE any write (see processTypedBatch): first-batch-on-
    // empty-store means the catalog covers the store from birth. The hint
    // saves re-globbing when processTypedBatch already probed this batch.
    val virgin = virginHint.getOrElse(!storeHasData(spark, storeDir))
    // persist the parsed+validated batch once; both splits derive from it
    // (otherwise the source is re-read and re-parsed per split)
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE accounting aggregate answers emptiness, the invalid total, the
      // valid rows-written meter, AND the dirty-day list — each used to be
      // its own job (isEmpty, count, isEmpty, groupBy), and per-batch job
      // count is the latency floor of a synchronous ingest request. An
      // invalid row can carry a null ts_ms — its day groups as null, read
      // via isNullAt.
      val stats = statsHint.getOrElse(cached
        .groupBy(col("valid"), dayOf(col("ts_ms")).as("ts_day")).count()
        .collect()
        .map(r => (r.getBoolean(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))))
      if (stats.isEmpty) return Nil
      // meterBatch=false when processTypedBatch already counted this batch
      // (a string-only batch never reaches this arm's counter otherwise)
      if (meterBatch) Instrumentation.global.inc("ingest.batches")
      // invalid records go to an errors sink instead of vanishing — the
      // reference returns per-record errors to the client
      // (HttpMetricsIngestionHandler error responses, ErrorResponse.java).
      // Only written when non-empty: an empty parquet dir per healthy batch
      // would break schema inference for readers of the sink.
      val nInvalid = stats.collect { case (false, _, n) => n }.sum
      if (nInvalid > 0) {
        Instrumentation.global.inc("ingest.rows.errors", nInvalid)
        cached.filter(!col("valid")).drop("valid")
          .write.mode("overwrite")
          .parquet(s"$storeDir/metrics_errors/batch_id=$batchId")
      }
      // an all-invalid batch writes nothing: an empty batch_id partition
      // would be dead weight (and an all-empty store breaks schema inference)
      val dayCounts = stats.collect { case (true, Some(day), n) => (day, n) }
      if (dayCounts.isEmpty) return Nil
      val valid = cached.filter(col("valid")).drop("valid")
      // catalog FIRST: a crash between the two writes must leave a
      // stale-but-safe catalog superset, never a _complete-marked catalog
      // missing a live locator (readers dedup; routeKind would misroute)
      writeCatalog(valid, storeDir, batchId, src = "numeric",
        familyCol = lit("basic"), markComplete = virgin,
        rowCountHint = Some(dayCounts.map(_._2).sum),
        locatorsHint = locatorsHint)
      writeRaw(valid, storeDir, batchId)
      Instrumentation.global.inc("ingest.rows.metrics_full",
        dayCounts.map(_._2).sum)
      if (rollup) rollDirtyDays(spark, storeDir, dayCounts.map(_._1))
      dayCounts.map(_._1).toSeq
    } finally cached.unpersist()
  }

  /** Pre-computed per-batch accounting (the facade's fused aggregate):
    * `numericStats` = (valid, day, count) rows over the NUMERIC arm —
    * exactly what [[processBatch]]'s own aggregate would produce (valid
    * per [[validExpr]] over `value_num`; day null for a null ts_ms) —
    * and `stringStats` = valid→count over the string/bool arm. Supplying
    * it removes two accounting jobs from every synchronous ingest
    * request; correctness requires the producer to use [[validExpr]]
    * with the SAME bounds it passes to [[processTypedBatch]].
    *
    * `numericLocators`/`stringLocators`: the VALID rows' distinct
    * (tenant, name, unit) triples per arm, when the producer's aggregate
    * also collected them — supplying these removes the per-arm catalog
    * collect job too (the catalog upsert becomes pure driver-side memo
    * arithmetic plus, rarely, a tiny write of fresh locators). */
  final case class TypedAccounting(
      numericStats: Array[(Boolean, Option[Long], Long)],
      stringStats: Map[Boolean, Long],
      numericLocators: Option[Array[(String, String, String)]] = None,
      stringLocators: Option[Array[(String, String, String)]] = None)

  /** Observe-fused batch processing — the whole per-batch accounting
    * (valid/invalid counts, dirty-day set, distinct catalog locators)
    * piggybacks as `Dataset.observe` metrics ON the raw write itself, so
    * a clean request-sized micro-batch costs exactly TWO Spark jobs:
    * the staged raw write and the dirty-day 5m re-roll. Per-batch job
    * count is the latency floor on the steady-state path (~300 ms fixed
    * per job on local[32], docs/SCALE.md) — the classic path pays 4
    * (stats aggregate, catalog collect, raw write, re-roll).
    *
    * The catalog-before-data crash ordering is preserved by a staging
    * rename: the raw batch lands fully in a hidden
    * `metrics_full/.staging-<id>` dir (invisible to every reader — the
    * dot prefix), the catalog upsert commits, and ONE atomic directory
    * rename unhides the batch. A crash leaves either nothing visible or
    * a catalog superset — never data without catalog. A crashed
    * attempt's leaked staging dir is invisible and is reclaimed by the
    * next retry of the same batch id (the facade's body-hashed ids and
    * streaming's checkpoint ids both replay stably).
    *
    * Callers opt in per batch (`fuseObserve = true`) as a contract that
    * the batch is REQUEST-SIZED: the observed locator set is collected
    * through task-completion metrics, so a bulk backfill batch with
    * millions of distinct locators should keep the classic path (whose
    * memo bypass caps driver collects). */
  private def processBatchFused(batch: DataFrame, storeDir: String,
      batchId: Long, meterBatch: Boolean, virginHint: Option[Boolean],
      rollup: Boolean): Seq[Long] = {
    val spark = batch.sparkSession
    val virgin = virginHint.getOrElse(!storeHasData(spark, storeDir))
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // AQE OFF for this batch's actions (restored in the finally, the
    // BucketedStore.overwriteDays session-conf pattern): on request-sized
    // data every AQE query-stage materialization is a full extra
    // scheduling round (~100-300 ms measured), and the whole point of the
    // fused path is the round count — the tier merge chain ran FIVE
    // sequential rounds under AQE vs two without. Runtime re-planning has
    // nothing to adapt on a few thousand rows.
    // (a 32-way exchange is 32 scheduled tasks per stage for a few
    // thousand rows — one reducer keeps every stage a single task and
    // every staged write a single file; pinned-session guard as in
    // processTypedBatchFused)
    val pinned = isPinnedIngestSession(spark)
    val aqeBefore =
      if (pinned) null else spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufBefore =
      if (pinned) null else spark.conf.get("spark.sql.shuffle.partitions")
    val discBefore = if (pinned) null else spark.conf.get(
      "spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    if (!pinned) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
    }
    try {
      val unitCol = if (cached.columns.contains("unit")) col("unit")
                    else lit(null).cast("string")
      val obs = org.apache.spark.sql.Observation(
        s"ingest_${batchId}_${java.util.UUID.randomUUID()}")
      val stage = new org.apache.hadoop.fs.Path(
        s"$storeDir/metrics_full/.staging-$batchId")
      val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val targetPath = new org.apache.hadoop.fs.Path(
        s"$storeDir/metrics_full/batch_id=$batchId")
      val isReplay = fs.exists(targetPath)
      cached.observe(obs,
          count(when(col("valid"), lit(1))).as("n_valid"),
          count(when(!col("valid"), lit(1))).as("n_invalid"),
          collect_set(when(col("valid"), dayOf(col("ts_ms")))).as("days"),
          collect_set(when(col("valid"), struct(col("tenant_id"),
            col("metric_name"), unitCol.as("unit")))).as("locs"))
        .filter(col("valid")).drop("valid")
        // request-sized contract: one output file per day beats 32 shards
        // of ~100 rows each, for both the commit and every later read
        .coalesce(1)
        .withColumn("ts_day", dayOf(col("ts_ms")))
        // rename-committed staging: committer v2 + no _SUCCESS (see
        // SnapshotStore.stageOnly — same one-rename discipline)
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .partitionBy("ts_day").parquet(stage.toString)
      val m = obs.get
      val nValid = m("n_valid").asInstanceOf[Long]
      val nInvalid = m("n_invalid").asInstanceOf[Long]
      // discarding a dataless stage also removes a metrics_full dir the
      // staging write itself created (classic-path parity: an empty or
      // all-invalid batch leaves NO trace in the data table)
      def discardStage(): Unit = {
        fs.delete(stage, true)
        val parent = stage.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
          fs.delete(parent, false)
        ()
      }
      if (nValid == 0 && nInvalid == 0) { discardStage(); return Nil }
      if (meterBatch) Instrumentation.global.inc("ingest.batches")
      if (nInvalid > 0) {
        Instrumentation.global.inc("ingest.rows.errors", nInvalid)
        cached.filter(!col("valid")).drop("valid")
          .write.mode("overwrite")
          .parquet(s"$storeDir/metrics_errors/batch_id=$batchId")
      }
      // an all-invalid batch writes no data (same contract as the classic
      // path: an empty batch_id partition would be dead weight)
      if (nValid == 0) { discardStage(); return Nil }
      val days = m("days").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Long]).toSeq
      val locs = m("locs").asInstanceOf[scala.collection.Seq[Any]]
        .map { a =>
          val r = a.asInstanceOf[org.apache.spark.sql.Row]
          (r.getString(0), r.getString(1),
            if (r.isNullAt(2)) null else r.getString(2))
        }
      // catalog BEFORE the data becomes visible (staging is hidden)
      writeCatalogLocators(spark, storeDir, batchId, "numeric",
        dedupLocators("basic", locs), markComplete = virgin)
      // COMMIT POINT: one atomic rename unhides the batch (a retried
      // batch id reclaims its previous dir first — replace-not-duplicate)
      if (isReplay) fs.delete(targetPath, true)
      require(fs.rename(stage, targetPath),
        s"raw batch commit rename failed for $targetPath")
      Instrumentation.global.inc("ingest.rows.metrics_full", nValid)
      // dirty-day recompute AFTER the raw batch is visible (replay-safe
      // by construction, and the scoped AQE-off/one-reducer confs above
      // keep it a single two-stage job)
      if (rollup) rollDirtyDays(spark, storeDir, days.toArray)
      days
    } finally {
      if (!pinned) {
        spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
        spark.conf.set("spark.sql.shuffle.partitions", shufBefore)
        spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", discBefore)
      }
      cached.unpersist()
      ()
    }
  }

  /** The raw-store write: day-partitioned parquet under an overwrite
    * batch-id partition (shared by processBatch and IngestBench so the
    * benchmark measures the production write path). */
  def writeRaw(validPoints: DataFrame, storeDir: String, batchId: Long): Unit =
    validPoints.withColumn("ts_day", dayOf(col("ts_ms")))
      .write.mode("overwrite").partitionBy("ts_day")
      .parquet(s"$storeDir/metrics_full/batch_id=$batchId")

  /** Re-roll the 5m tier for `days` from the raw store — the background
    * arm of the deferred-rollup mode ([[processBatch]] `rollup = false`):
    * same recompute-from-source + snapshot-publish as the synchronous
    * path, so draining a pending set converges to exactly the state the
    * synchronous mode would have produced. */
  def rollDirtyDaysNow(spark: SparkSession, storeDir: String,
      days: Seq[Long]): Unit =
    if (days.nonEmpty) rollDirtyDays(spark, storeDir, days.toArray)

  /** `metrics_full`'s on-disk schema, stated explicitly where the re-roll
    * hot path reads it: an unschema'd parquet read runs a whole Spark JOB
    * just to sample footers — the r13 steady-arm timeline's third action
    * (one scheduling round per re-roll) — and this store's layout is
    * fixed by [[writeRaw]]/[[processTypedBatchFused]] (the two path
    * levels `batch_id`/`ts_day` included; parquet files missing `unit`
    * read as null, which the re-roll never touches). */
  private val rawStoreSchema = StructType(Seq(
    StructField("tenant_id", StringType),
    StructField("metric_name", StringType),
    StructField("ts_ms", LongType),
    StructField("value", DoubleType),
    StructField("ttl_seconds", IntegerType),
    StructField("unit", StringType),
    StructField("batch_id", LongType),
    StructField("ts_day", LongType)))

  private def rollDirtyDays(spark: SparkSession, storeDir: String,
      dirtyDays: Array[Long]): Unit = {
    val full = spark.read.schema(rawStoreSchema)
      .parquet(s"$storeDir/metrics_full")
      .filter(col("ts_day").isin(dirtyDays.toSeq: _*))
    val rolled = graft.operators.Rollups.basicFromRaw(
        full.select("tenant_id", "metric_name", "ts_ms", "value"), Granularity.MIN_5)
      .withColumn("ts_day", dayOf(col("bucket_ms")))
    // snapshot-committed day swap (NOT dynamic partition overwrite, whose
    // delete-then-rename commit lets a racing read see a missing/partial
    // day) — graft.core.SnapshotStore's reader-isolation contract
    graft.core.SnapshotStore.publish(rolled, s"$storeDir/metrics_5m")
    Instrumentation.global.emitRollup(Instrumentation.RollupEvent(
      storeDir, "basic", Granularity.MIN_5, dirtyDays.toSeq))
  }

  /** Effective epoch window for one micro-batch: the static `[minTs,
    * maxTs]` bounds tightened by the RELATIVE window when one is
    * configured. Relative bounds re-evaluate against `now` at EVERY batch —
    * the reference checks each payload against its own processing time
    * (JSONMetric.java:28-39 BEFORE/AFTER_CURRENT_COLLECTIONTIME), and a
    * static lower bound captured at stream start silently ages out: once
    * the stream outlives `retention - (now₀ - minTs)`, a stale flush can
    * pass the frozen check yet land on a retention-pruned day. */
  private[graft] def batchBounds(minTs: Long, maxTs: Long,
      maxAgeMs: Option[Long], maxFutureMs: Option[Long], now: Long): (Long, Long) =
    (maxAgeMs.fold(minTs)(a => math.max(minTs, now - a)),
      maxFutureMs.fold(maxTs)(f => math.min(maxTs, now + f)))

  /** Start the ingest stream over a source of JSON lines (file/socket/Kafka
    * — anything exposing a `value` column). `maxAgeMs`/`maxFutureMs` bound
    * record timestamps RELATIVE to each batch's processing time (see
    * [[batchBounds]]); `nowMs` is injectable for tests. */
  def start(lines: DataFrame, storeDir: String, checkpointDir: String,
      minTs: Long = 0L, maxTs: Long = Long.MaxValue,
      maxAgeMs: Option[Long] = None, maxFutureMs: Option[Long] = None,
      nowMs: () => Long = () => System.currentTimeMillis(),
      fuseObserve: Boolean = false): StreamingQuery =
    parseJson(lines)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (lo, hi) = batchBounds(minTs, maxTs, maxAgeMs, maxFutureMs, nowMs())
        // fuseObserve (steady-state deployments whose micro-batches are
        // request-sized): per-batch accounting+catalog ride the raw write
        // — 2 jobs/batch instead of 4 (see processBatchFused); bulk
        // backfill streams should keep the classic path
        processBatch(withValidity(batch, lo, hi), storeDir, id,
          fuseObserve = fuseObserve)
        ()
      }
      .start()

  /** Watermarked streaming 5m aggregation — the pure-streaming shape
    * (append mode emits a window once the watermark passes; the reference's
    * ROLLUP_DELAY quiet period ≡ the watermark delay, SURVEY §2.9). Used
    * where a push-based rollup feed is wanted instead of the store-and-
    * recompute path above. */
  def streaming5m(points: DataFrame, watermarkDelay: String = "5 minutes"): DataFrame =
    points
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("tenant_id"), col("metric_name"), window(col("ts"), "5 minutes"))
      .agg(
        count(col("value")).as("num_points"),
        sum(col("value")).as("sum_v"),
        avg(col("value")).as("avg_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        var_pop(col("value")).as("var_v"))
      .select(col("tenant_id"), col("metric_name"),
        unix_millis(col("window.start")).as("bucket_ms"),
        col("num_points"), col("sum_v"), col("avg_v"),
        col("min_v"), col("max_v"), col("var_v"))

  /** Event/annotation ingest schema (reference: the events ingest surface
    * HttpEventsIngestionHandler.java → Event.java what/when/tags/data,
    * persisted by EventElasticSearchIO.java:46-58): the engine's event row
    * is (tenant_id, event_id, ts_ms, event_type, value, props) — the same
    * shape [[graft.operators.Discovery.eventSearch]] queries. */
  val eventSchema: StructType = StructType(Seq(
    StructField("tenant_id", StringType),
    StructField("event_id", LongType),
    StructField("ts_ms", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Parse a stream/batch of event JSON lines into typed event rows. */
  def parseEventsJson(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value").cast("string"), eventSchema).as("e"))
      .select("e.*")

  /** Event validity: an id, a type, and an in-window timestamp (same
    * null-safe 3VL discipline as [[withValidity]]). */
  def withEventValidity(events: DataFrame, minTs: Long, maxTs: Long): DataFrame =
    events.withColumn("valid",
      coalesce(
        col("event_id").isNotNull &&
          col("event_type").isNotNull && length(col("event_type")) > 0 &&
          col("ts_ms").between(minTs, maxTs),
        lit(false)))

  /** One events micro-batch — the same idempotence discipline as
    * [[processBatch]]: day-partitioned parquet under an overwrite batch-id
    * partition, so a replayed batch replaces rather than duplicates its own
    * rows; invalid records go to an errors sink instead of vanishing.
    * Events are immutable annotations with no rollup ladder, so ingest is
    * append-only — no re-roll step, which is what makes this path trivial
    * by design next to the metrics one. */
  /** ONE-JOB events ingest for the facade's all-or-nothing contract
    * (HttpEventsIngestionHandler rejects the whole POST on any invalid
    * event): the validity counts ride the staged events write as
    * observed metrics; any invalid row (or an empty parse) discards the
    * hidden staging and nothing becomes visible — exactly the classic
    * pre-check-then-write behavior, minus its two extra jobs. Returns
    * (total, invalid) for the response decision. */
  def processEventsBatchFused(batch: DataFrame, storeDir: String,
      batchId: Long): (Long, Long) = {
    val spark = batch.sparkSession
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // request-sized planning confs: the facade routes through a dedicated
    // pinned session (newIngestSession) so nothing reader-shared is ever
    // mutated; the set/restore fallback remains ONLY for callers whose
    // batch is bound to a session they own end-to-end (streaming
    // foreachBatch micro-batch frames)
    val pinned = isPinnedIngestSession(spark)
    val aqeBefore =
      if (pinned) null else spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufBefore =
      if (pinned) null else spark.conf.get("spark.sql.shuffle.partitions")
    val discBefore = if (pinned) null else spark.conf.get(
      "spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    if (!pinned) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
    }
    try {
      val obs = org.apache.spark.sql.Observation(
        s"events_${batchId}_${java.util.UUID.randomUUID()}")
      val stage = new org.apache.hadoop.fs.Path(
        s"$storeDir/events/.staging-$batchId")
      val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val targetPath = new org.apache.hadoop.fs.Path(
        s"$storeDir/events/batch_id=$batchId")
      cached.observe(obs,
          count(lit(1)).as("n_total"),
          count(when(!col("valid"), lit(1))).as("n_invalid"))
        .filter(col("valid")).drop("valid")
        .coalesce(1)
        .withColumn("ts_day", dayOf(col("ts_ms")))
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .partitionBy("ts_day").parquet(stage.toString)
      val m = obs.get
      val nTotal = m("n_total").asInstanceOf[Long]
      val nInvalid = m("n_invalid").asInstanceOf[Long]
      if (nTotal == 0 || nInvalid > 0) {
        fs.delete(stage, true)
        val parent = stage.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
          fs.delete(parent, false)
        return (nTotal, nInvalid)
      }
      if (fs.exists(targetPath)) fs.delete(targetPath, true)
      require(fs.rename(stage, targetPath),
        s"events batch commit rename failed for $targetPath")
      Instrumentation.global.inc("ingest.rows.events", nTotal)
      (nTotal, 0L)
    } finally {
      if (!pinned) {
        spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
        spark.conf.set("spark.sql.shuffle.partitions", shufBefore)
        spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", discBefore)
      }
      cached.unpersist()
      ()
    }
  }

  def processEventsBatch(batch: DataFrame, storeDir: String, batchId: Long = 0L): Unit = {
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one accounting aggregate, emptiness included (see processBatch)
      val estats = cached.groupBy(col("valid")).count().collect()
        .map(r => (r.getBoolean(0), r.getLong(1))).toMap
      if (estats.isEmpty) return
      val nInvalid = estats.getOrElse(false, 0L)
      if (nInvalid > 0) {
        Instrumentation.global.inc("ingest.rows.errors.events", nInvalid)
        cached.filter(!col("valid")).drop("valid")
          .write.mode("overwrite")
          .parquet(s"$storeDir/events_errors/batch_id=$batchId")
      }
      val valid = cached.filter(col("valid")).drop("valid")
      val nValid = estats.getOrElse(true, 0L)
      if (nValid == 0) return
      Instrumentation.global.inc("ingest.rows.events", nValid)
      valid.withColumn("ts_day", dayOf(col("ts_ms")))
        .write.mode("overwrite").partitionBy("ts_day")
        .parquet(s"$storeDir/events/batch_id=$batchId")
    } finally cached.unpersist()
  }

  /** Start the events ingest stream over a source of JSON lines. Epoch
    * bounds as in [[start]] (static and/or per-batch relative). */
  def startEvents(lines: DataFrame, storeDir: String, checkpointDir: String,
      minTs: Long = 0L, maxTs: Long = Long.MaxValue,
      maxAgeMs: Option[Long] = None, maxFutureMs: Option[Long] = None,
      nowMs: () => Long = () => System.currentTimeMillis()): StreamingQuery =
    parseEventsJson(lines)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (lo, hi) = batchBounds(minTs, maxTs, maxAgeMs, maxFutureMs, nowMs())
        processEventsBatch(withEventValidity(batch, lo, hi), storeDir, id)
      }
      .start()

  /** The ingested events store as the query surface for
    * [[graft.operators.Discovery.eventSearch]] — day partitions push the
    * search's time-range filter into partition pruning. */
  def eventsStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/events").drop("batch_id", "ts_day")

  private val cascadeTiers = Seq(
    Granularity.MIN_20, Granularity.MIN_60, Granularity.MIN_240, Granularity.MIN_1440)

  /** True when `path` exists and holds at least one parquet data file
    * (directly or up to two partition levels down). A tier directory with no
    * data files — a batch that carried no metrics of some kind, or retention
    * having dropped every remaining day — must read as "absent", not crash
    * `spark.read.parquet`'s schema inference. */
  private[graft] def hasParquetData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pStr = p.toString
    // Hadoop globs MATCH dot-dirs while Spark's discovery ignores them: a
    // file under a hidden component (a crashed POST's leaked `.staging-*`)
    // must not make an otherwise-empty table read as "has data" — the
    // guarded read would fail schema inference on zero visible files, and
    // the virgin probe would skip the catalog coverage marker (the
    // SnapshotStore.resolve husk-guard rule, applied here too)
    fs.exists(p) && Seq("*.parquet", "*/*.parquet", "*/*/*.parquet").exists(g =>
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(p, g)))
        .exists(_.exists { st =>
          !st.getPath.toString.stripPrefix(pStr).split("/").exists(c =>
            c.startsWith(".") || c.startsWith("_"))
        }))
  }

  /** Kinds actually present in a parsed statsd frame — real statsd traffic
    * routinely omits whole sections (a flush with no sets, say), and writing
    * an empty per-kind tier would poison later reads. Tiny collect (≤4 rows). */
  private def presentKinds(parsed: DataFrame): Set[String] =
    parsed.select("kind").distinct().collect().map(_.getString(0)).toSet

  /** Incremental cascade tiers: each coarser tier recomputes from the tier
    * below (reference §3.3: 5m slots roll from FULL, 20m from 5m, ...).
    *
    * With `dirtyDays` given, only those `ts_day` partitions are read from
    * the finer tier and only they are overwritten in the coarser one
    * (dynamic partition overwrite) — the same discipline as
    * [[rollDirtyDays]], and the per-slot (not whole-table) re-roll of the
    * reference's LocatorFetchRunnable.java:92-129. Every tier here is
    * day-contained (20m…1440m all divide a day, epoch-aligned), so a dirty
    * finer day maps to exactly the same dirty day at every coarser tier.
    * With `dirtyDays = None` the whole ladder rebuilds (static overwrite, so
    * days deleted from the finer tier also vanish from the coarser ones).
    *
    * Merges use [[graft.operators.Rollups.basicMergeStable]]: the expanded
    * variance form cancels catastrophically when |mean| ≫ stddev, which a
    * stored production tier must not risk. */
  def rollupCascadeFor(spark: SparkSession, storeDir: String,
      dirtyDays: Option[Seq[Long]] = None): Unit = {
    // nothing at 5m (never rolled, or retention dropped every day) → no-op
    if (!hasParquetData(spark, s"$storeDir/metrics_5m")) return
    var finerName = "metrics_5m"
    for (g <- cascadeTiers) {
      val finerAll = graft.core.SnapshotStore
        .read(spark, s"$storeDir/$finerName").getOrElse(return)
      val finer = dirtyDays.fold(finerAll)(d => finerAll.filter(col("ts_day").isin(d: _*)))
      // empty dirty-day slice → every coarser slice is empty too; writing it
      // anyway would create a parquet-less dir (when the coarser tier doesn't
      // exist yet) that the next hop's schema inference chokes on — the same
      // husk class hasParquetData guards against. Break the whole ladder.
      if (dirtyDays.isDefined && finer.isEmpty) return
      val merged = graft.operators.Rollups.basicMergeStable(finer.drop("ts_day"), g)
        .select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
          col("num_points"), col("sum_v"), col("avg_v"),
          col("min_v"), col("max_v"), col("var_v"))
        .withColumn("ts_day", dayOf(col("bucket_ms")))
      // dirty-day mode swaps only the touched days; full rebuild also
      // drops days absent from the new data (the old static-overwrite
      // semantics) — both through the snapshot commit protocol
      graft.core.SnapshotStore.publish(merged,
        s"$storeDir/metrics_${g.name}", replaceAll = dirtyDays.isEmpty)
      Instrumentation.global.emitRollup(Instrumentation.RollupEvent(
        storeDir, "basic", g, dirtyDays.getOrElse(Nil),
        fullRebuild = dirtyDays.isEmpty))
      finerName = s"metrics_${g.name}"
    }
  }

  /** OPTIONAL bucketed arm of the cascade for the 5m tier — the
    * dashboard-facing hot read path (the reference's most-read table,
    * CassandraModel.java metrics_5m): mirror the freshly rolled 5m days
    * into a day-partitioned, hash-clustered catalog table
    * ([[graft.core.BucketedStore.registerPartitioned]]), so every
    * per-series aggregation / window / self-join a fleet of dashboards
    * runs against the tier plans with ZERO shuffle Exchange — the series
    * co-location is paid once here, at write time, instead of per query.
    *
    * Same dirty-day discipline as the plain tier: with `dirtyDays` given
    * only those partitions rewrite (dynamic overwrite THROUGH the bucket
    * spec); None mirrors the whole tier. Call after [[rollDirtyDays]] /
    * [[rollupCascadeFor]] with the same day list. The plain parquet tier
    * remains the source of truth (and the cascade's input); this is a
    * serving layout, rebuildable from it at any time. */
  def mirrorBucketed5m(spark: SparkSession, storeDir: String,
      tableName: String, path: String, nBuckets: Int = 64,
      dirtyDays: Option[Seq[Long]] = None): Unit = {
    val tier = graft.core.SnapshotStore
      .read(spark, s"$storeDir/metrics_5m").getOrElse(return)
    graft.core.BucketedStore.registerPartitioned(
      spark, tableName, path, tier.schema, nBuckets)
    val slice = dirtyDays.fold(tier)(d => tier.filter(col("ts_day").isin(d: _*)))
    graft.core.BucketedStore.overwriteDays(spark, slice, tableName)
  }

  /** Persist the per-kind tier-1 (5m) pre-aggregated state tables from
    * parsed statsd payload rows ([[graft.operators.Preaggregated
    * .fromAggregatedJson]]), day-partitioned like the basic tiers.
    * ONE-SHOT/batch form: a day partition is overwritten with THIS input's
    * aggregation — for continuous ingest, where several batches touch the
    * same day, use [[processAggregatedBatch]], which appends the parsed
    * rows and recomputes dirty days from the full store. */
  def writePreaggTier1(parsed: DataFrame, storeDir: String): Unit = {
    val present = presentKinds(parsed)
    graft.operators.Preaggregated.tier1FromParsed(parsed, Granularity.MIN_5)
      .foreach { case (kind, df) =>
        if (present(kind))
          graft.core.SnapshotStore.publish(
            df.withColumn("ts_day", dayOf(col("bucket_ms"))),
            s"$storeDir/preagg_${kind}_5m")
      }
  }

  /** One statsd micro-batch, same discipline as [[processBatch]]:
    * (1) append the PARSED payload rows to `preagg_raw` under an
    * overwrite batch-id partition (idempotent under foreachBatch replays);
    * (2) recompute the per-kind 5m tier for exactly the touched days from
    * the FULL parsed store — recompute-from-source, never
    * read-modify-write, so a late flush simply re-dirties its day;
    * (3) optionally roll the coarser kind ladders for the same dirty days.
    * This is the stored-cascade analog of the reference's
    * /ingest/aggregated → preaggregated CF → per-slot rollup pipeline.
    *
    * `[minTs, maxTs]` bounds the accepted flush timestamps — the epoch
    * validation the basic path gets from [[withValidity]] (reference:
    * JSONMetric.java:28-39 bean validation applies to the aggregated
    * handler's payloads too). Without it a flush carrying a stale ts_ms
    * older than the preagg_raw TTL horizon re-dirties a retention-pruned
    * day: the recompute rebuilds that day's 5m tier from ONLY the late
    * flush and the cascade dynamic-overwrites the day in the 20m-1440m
    * tiers, silently destroying history their longer TTLs were meant to
    * keep. Streaming callers get this bound from [[startAggregated]]'s
    * `maxAgeMs` (re-evaluated per batch); direct batch callers pass
    * `minTs = now - Granularity.MIN_5.retentionMillis` (the preagg_raw TTL
    * horizon) computed at call time. Rejects land in `preagg_errors`, like
    * the basic path's invalid sink. */
  def processAggregatedBatch(parsed: DataFrame, storeDir: String,
      batchId: Long = 0L, cascade: Boolean = true,
      minTs: Long = 0L, maxTs: Long = Long.MaxValue,
      rollup: Boolean = true,
      virginHint: Option[Boolean] = None,
      statsHint: Option[Array[(Boolean, Option[Long], Long)]] = None)
      : Seq[Long] = {
    val spark = parsed.sparkSession
    // probed BEFORE any write (see processTypedBatch's catalog marker)
    val virgin = virginHint.getOrElse(!storeHasData(spark, storeDir))
    val cached0 = parsed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 3VL-safe: a null ts_ms must read as out-of-window, not NULL (which
      // would vanish from both the store and the errors sink). ONE
      // accounting aggregate for emptiness + reject total + dirty days +
      // rows-written meter — the same per-batch job-count discipline as
      // processBatch (a null ts_ms groups under a null day in the
      // rejected arm).
      val inWindow = coalesce(col("ts_ms").between(minTs, maxTs), lit(false))
      val stats = statsHint.getOrElse(cached0
        .groupBy(inWindow.as("ok"), dayOf(col("ts_ms")).as("ts_day")).count()
        .collect()
        .map(r => (r.getBoolean(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))))
      if (stats.isEmpty) return Nil
      Instrumentation.global.inc("ingest.batches.preagg")
      val nRejected = stats.collect { case (false, _, n) => n }.sum
      if (nRejected > 0) {
        Instrumentation.global.inc("ingest.rows.errors.preagg", nRejected)
        cached0.filter(!inWindow).write.mode("overwrite")
          .parquet(s"$storeDir/preagg_errors/batch_id=$batchId")
      }
      val cached = cached0.filter(inWindow)
      val dayCounts = stats.collect { case (true, Some(day), n) => (day, n) }
      if (dayCounts.isEmpty) return Nil
      // catalog before data (see processBatch's crash-ordering note)
      writeCatalog(cached, storeDir, batchId, src = "preagg",
        familyCol = col("kind"), markComplete = virgin,
        rowCountHint = Some(dayCounts.map(_._2).sum))
      cached.withColumn("ts_day", dayOf(col("ts_ms")))
        .write.mode("overwrite").partitionBy("ts_day")
        .parquet(s"$storeDir/preagg_raw/batch_id=$batchId")
      Instrumentation.global.inc("ingest.rows.preagg_raw",
        dayCounts.map(_._2).sum)
      val dirtyDays = dayCounts.map(_._1).toSeq
      if (rollup)
        rollPreaggDirtyDaysNow(spark, storeDir, dirtyDays, cascade)
      dirtyDays
    } finally cached0.unpersist()
  }

  /** Re-roll the per-kind 5m preagg tiers (and optionally the coarser
    * ladders) for `days` from the parsed-flush store — the preagg twin of
    * [[rollDirtyDaysNow]], both the synchronous tail of
    * [[processAggregatedBatch]] and the background arm of its deferred
    * mode (`rollup = false`). */
  /** [[FusedIngestResult]]'s preagg twin: dirty days, the rejected
    * records (tenant, name, ts — the aggregated route's only constraint
    * is the collection-time window), and the batch total. */
  final case class FusedPreaggResult(
      dirtyDays: Seq[Long],
      rejects: Array[(String, String, Option[Long])],
      nTotal: Long)

  /** ONE-JOB aggregated (statsd) ingest — [[processTypedBatchFused]]'s
    * discipline on the preagg route: the accounting (total, reject rows,
    * dirty days, per-kind catalog locators) rides the staged `preagg_raw`
    * write as observed metrics; the rejects sink runs only when rejects
    * exist; the durable dirty-day marker lands between the hidden staged
    * write and the commit rename; tiers roll after the rename
    * (synchronous mode) or on the caller's drain (deferred). */
  def processAggregatedBatchFused(parsed: DataFrame, storeDir: String,
      batchId: Long, cascade: Boolean = true,
      minTs: Long = 0L, maxTs: Long = Long.MaxValue,
      rollup: Boolean = true,
      virginHint: Option[Boolean] = None,
      onDirtyDays: Seq[Long] => Unit = _ => ()): FusedPreaggResult = {
    val spark = parsed.sparkSession
    val virgin = virginHint.getOrElse(!storeHasData(spark, storeDir))
    val cached = parsed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // request-sized planning confs: the facade routes through a dedicated
    // pinned session (newIngestSession) so nothing reader-shared is ever
    // mutated; the set/restore fallback remains ONLY for callers whose
    // batch is bound to a session they own end-to-end (streaming
    // foreachBatch micro-batch frames)
    val pinned = isPinnedIngestSession(spark)
    val aqeBefore =
      if (pinned) null else spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufBefore =
      if (pinned) null else spark.conf.get("spark.sql.shuffle.partitions")
    val discBefore = if (pinned) null else spark.conf.get(
      "spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    if (!pinned) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
    }
    try {
      // 3VL-safe: a null ts_ms reads as out-of-window, never NULL
      val inWindow = coalesce(col("ts_ms").between(minTs, maxTs), lit(false))
      val obs = org.apache.spark.sql.Observation(
        s"preagg_${batchId}_${java.util.UUID.randomUUID()}")
      val stage = new org.apache.hadoop.fs.Path(
        s"$storeDir/preagg_raw/.staging-$batchId")
      val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val targetPath = new org.apache.hadoop.fs.Path(
        s"$storeDir/preagg_raw/batch_id=$batchId")
      val isReplay = fs.exists(targetPath)
      cached.observe(obs,
          count(lit(1)).as("n_total"),
          count(when(inWindow, lit(1))).as("n_ok"),
          collect_set(when(inWindow, dayOf(col("ts_ms")))).as("days"),
          collect_set(when(inWindow, struct(col("tenant_id"),
            col("metric_name"), col("kind")))).as("locs"),
          collect_list(when(!inWindow, struct(col("tenant_id"),
            col("metric_name"), col("ts_ms")))).as("rejects"))
        .filter(inWindow)
        .coalesce(1)
        .withColumn("ts_day", dayOf(col("ts_ms")))
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .partitionBy("ts_day").parquet(stage.toString)
      val m = obs.get
      val nTotal = m("n_total").asInstanceOf[Long]
      val nOk = m("n_ok").asInstanceOf[Long]
      def discardStage(): Unit = {
        fs.delete(stage, true)
        val parent = stage.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
          fs.delete(parent, false)
        ()
      }
      if (nTotal == 0) {
        discardStage(); return FusedPreaggResult(Nil, Array.empty, 0L)
      }
      Instrumentation.global.inc("ingest.batches.preagg")
      val rejects = m("rejects").asInstanceOf[scala.collection.Seq[Any]]
        .map { a =>
          val r = a.asInstanceOf[org.apache.spark.sql.Row]
          (Option(r.getString(0)).getOrElse(""),
            Option(r.getString(1)).getOrElse(""),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))
        }.toArray
      if (rejects.nonEmpty) {
        Instrumentation.global.inc("ingest.rows.errors.preagg",
          rejects.length.toLong)
        cached.filter(!inWindow).write.mode("overwrite")
          .parquet(s"$storeDir/preagg_errors/batch_id=$batchId")
      }
      if (nOk == 0) {
        discardStage(); return FusedPreaggResult(Nil, rejects, nTotal)
      }
      val days = m("days").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Long]).toSeq
      onDirtyDays(days)
      // catalog BEFORE the data unhides; per-row kind IS the family, and
      // the aggregated wire shape carries no unit (the classic path's
      // max(unit) over all-null is null — identical content)
      val locs = m("locs").asInstanceOf[scala.collection.Seq[Any]]
        .map { a =>
          val r = a.asInstanceOf[org.apache.spark.sql.Row]
          (r.getString(0), r.getString(1), r.getString(2),
            null: String)
        }.distinct.toArray
      writeCatalogLocators(spark, storeDir, batchId, "preagg", locs,
        markComplete = virgin)
      if (isReplay) fs.delete(targetPath, true)
      require(fs.rename(stage, targetPath),
        s"preagg batch commit rename failed for $targetPath")
      Instrumentation.global.inc("ingest.rows.preagg_raw", nOk)
      if (rollup) rollPreaggDirtyDaysNow(spark, storeDir, days, cascade)
      FusedPreaggResult(days, rejects, nTotal)
    } finally {
      if (!pinned) {
        spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
        spark.conf.set("spark.sql.shuffle.partitions", shufBefore)
        spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", discBefore)
      }
      cached.unpersist()
      ()
    }
  }

  /** `preagg_raw`'s on-disk schema, explicit for the same reason as
    * [[rawStoreSchema]]: the drain's read must not pay a footer-sampling
    * job per re-roll. Fixed by [[graft.operators.Preaggregated]]'s parsed
    * shape. */
  private val preaggRawSchema = StructType(Seq(
    StructField("tenant_id", StringType),
    StructField("metric_name", StringType),
    StructField("ts_ms", LongType),
    StructField("kind", StringType),
    StructField("counter", StructType(Seq(
      StructField("count", DoubleType), StructField("rate", DoubleType),
      StructField("sample_count", LongType)))),
    StructField("gauge", StructType(Seq(
      StructField("latest_ts", LongType), StructField("latest", DoubleType)))),
    StructField("timer", StructType(Seq(
      StructField("count", LongType), StructField("sum", DoubleType),
      StructField("min", DoubleType), StructField("max", DoubleType),
      StructField("rate", DoubleType),
      StructField("percentiles", MapType(StringType, DoubleType))))),
    StructField("set", ArrayType(IntegerType)),
    StructField("batch_id", LongType),
    StructField("ts_day", LongType)))

  def rollPreaggDirtyDaysNow(spark: SparkSession, storeDir: String,
      days: Seq[Long], cascade: Boolean = true): Unit = {
    if (days.isEmpty) return
    val raw = spark.read.schema(preaggRawSchema)
      .parquet(s"$storeDir/preagg_raw")
      .filter(col("ts_day").isin(days: _*))
    // presence is judged on the dirty-day slice of the FULL store, not on
    // this batch: a day whose sets arrived in an earlier flush must still
    // re-roll its set tier when a later counters-only flush re-dirties it
    val present = presentKinds(raw)
    graft.operators.Preaggregated.tier1FromParsed(raw, Granularity.MIN_5)
      .foreach { case (kind, df) =>
        if (present(kind)) {
          graft.core.SnapshotStore.publish(
            df.withColumn("ts_day", dayOf(col("bucket_ms"))),
            s"$storeDir/preagg_${kind}_5m")
          Instrumentation.global.emitRollup(Instrumentation.RollupEvent(
            storeDir, kind, Granularity.MIN_5, days))
        }
      }
    if (cascade) preaggCascadeFor(spark, storeDir, dirtyDays = Some(days))
  }

  /** Start the statsd aggregated-payload ingest stream over JSON lines —
    * the streaming S3 surface (reference: POST /v2.0/:t/ingest/aggregated,
    * HttpAggregatedIngestionHandler → PreaggregateConversions →
    * preaggregated CFs → RollupService cascade).
    *
    * Production callers should pass
    * `maxAgeMs = Some(Granularity.MIN_5.retentionMillis)` (the preagg_raw
    * TTL horizon) rather than a static `minTs`: the relative bound
    * re-evaluates at every batch ([[batchBounds]]), so the stale-flush
    * guard keeps tracking retention however long the stream runs. */
  def startAggregated(lines: DataFrame, storeDir: String, checkpointDir: String,
      cascade: Boolean = true,
      minTs: Long = 0L, maxTs: Long = Long.MaxValue,
      maxAgeMs: Option[Long] = None, maxFutureMs: Option[Long] = None,
      nowMs: () => Long = () => System.currentTimeMillis()): StreamingQuery =
    graft.operators.Preaggregated.fromAggregatedJson(lines)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (lo, hi) = batchBounds(minTs, maxTs, maxAgeMs, maxFutureMs, nowMs())
        processAggregatedBatch(batch, storeDir, id, cascade, lo, hi)
        ()
      }
      .start()

  /** Kind-routed stored cascade for the pre-aggregated families — the
    * dispatch the reference does per locator in
    * RollupRunnable.getRollupComputer (service/RollupRunnable.java:162-178):
    * each kind's tier-1 table rolls 20m → … → 1440m with its OWN merge
    * algebra (counter total-time rate, gauge latest-by-ts, timer
    * scalar+percentile-map, set hash-union), under the same dirty-day
    * dynamic-overwrite discipline as the basic cascade. */
  def preaggCascadeFor(spark: SparkSession, storeDir: String,
      kinds: Seq[String] = Seq("counter", "gauge", "timer", "set"),
      dirtyDays: Option[Seq[Long]] = None): Unit = {
    import graft.operators.Preaggregated
    val merges = Preaggregated.merges
    // a kind with no tier-1 data (statsd traffic without that section, or a
    // fully-aged-out ladder) is a no-op, not a schema-inference crash
    for (kind <- kinds if hasParquetData(spark, s"$storeDir/preagg_${kind}_5m")) {
      val merge = merges(kind)
      var finerName = s"preagg_${kind}_5m"
      var ladderLive = true
      for (g <- cascadeTiers if ladderLive) {
        // a vanished finer tier (retention dropped every day mid-ladder)
        // ends this kind's ladder the same way an empty slice does
        val finer = graft.core.SnapshotStore
          .read(spark, s"$storeDir/$finerName")
          .map(all => dirtyDays.fold(all)(d =>
            all.filter(col("ts_day").isin(d: _*))))
        // a kind's dirty-day slice can be empty even when its 5m tier has
        // data (the dirty days came from a flush missing this kind); an
        // empty write would husk a not-yet-existing coarser dir — skip and
        // break this kind's ladder (coarser slices are empty a fortiori)
        if (finer.isEmpty || (dirtyDays.isDefined && finer.get.isEmpty))
          ladderLive = false
        else {
          val merged = merge(finer.get.drop("ts_day", "distinct_count"), g)
            .withColumn("ts_day", dayOf(col("bucket_ms")))
          graft.core.SnapshotStore.publish(merged,
            s"$storeDir/preagg_${kind}_${g.name}",
            replaceAll = dirtyDays.isEmpty)
          Instrumentation.global.emitRollup(Instrumentation.RollupEvent(
            storeDir, kind, g, dirtyDays.getOrElse(Nil),
            fullRebuild = dirtyDays.isEmpty))
          finerName = s"preagg_${kind}_${g.name}"
        }
      }
    }
  }
}
