package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) storage layout for the metric-point tables —
  * the co-located-join arm of the store design.
  *
  * The day-partitioned parquet store optimizes ingest and time-range
  * pruning; every per-series operation over it (rollup aggregation,
  * window scoring, repair anti-joins, self-joins) still pays one shuffle
  * to co-locate each locator's points. Writing the same data BUCKETED by
  * (tenant_id, metric_name) and sorted by ts_ms pre-pays that shuffle
  * once at write time: Spark records the hash-clustering in the catalog,
  * and any aggregation/window/sort-merge join keyed on the bucket columns
  * then satisfies its required distribution straight off the scan — no
  * Exchange in the plan at ANY data size, the same contract Hive/Iceberg
  * bucketing provides at 100 TB. On a recurring analytics store (the 5m
  * tier a fleet of dashboards re-aggregates all day), eliminating the
  * per-query series shuffle dwarfs the one-time write cost.
  *
  * Mechanics: `bucketBy` requires a catalog table (the bucket spec lives
  * in table metadata, not in the files), so this writes an EXTERNAL
  * parquet table at `path` registered under `tableName`. Bucket count is
  * fixed at write time — size it so a bucket's hottest day fits an
  * executor (SURVEY §4's partition-sizing rule); callers on a bare
  * in-memory catalog re-register after restart via [[register]]. */
object BucketedStore {

  val bucketCols: Seq[String] = Seq("tenant_id", "metric_name")

  /** Write `points` (tenant_id, metric_name, ts_ms, value, …) as an
    * external bucketed+sorted parquet table. Overwrites. */
  def write(points: DataFrame, tableName: String, path: String,
      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    points.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy("tenant_id", "metric_name", "ts_ms")
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Re-register an existing bucketed table after a catalog restart (the
    * files carry no bucket spec; the catalog entry does). `nBuckets` MUST
    * equal the count the table was written with — the files are hashed
    * into that many buckets, and advertising a different clustering would
    * let joins elide exchanges against a layout that doesn't match,
    * silently dropping rows. An already-registered table is validated
    * against the requested spec (mismatch throws) rather than silently
    * kept. */
  def register(spark: SparkSession, tableName: String, path: String,
      nBuckets: Int = 64): Unit = {
    if (spark.catalog.tableExists(tableName)) {
      val meta = spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName))
      val spec = meta.bucketSpec
      require(spec.exists(s => s.numBuckets == nBuckets &&
          s.bucketColumnNames == bucketCols),
        s"table $tableName already registered with bucket spec $spec, " +
          s"requested $nBuckets buckets on $bucketCols")
      // the flat layout's mirror of registerPartitioned's check: a
      // DAY-PARTITIONED table under this name is a different physical
      // contract and must not be claimed by the flat register
      require(meta.partitionColumnNames.isEmpty,
        s"table $tableName exists but is partitioned on " +
          s"${meta.partitionColumnNames}; use registerPartitioned")
    } else {
      val df = spark.read.parquet(path)
      val schemaDdl = df.schema.toDDL
      spark.sql(
        s"""CREATE TABLE $tableName ($schemaDdl)
           |USING parquet
           |CLUSTERED BY (${bucketCols.mkString(", ")})
           |SORTED BY (tenant_id, metric_name, ts_ms)
           |INTO $nBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
  }

  /** The bucketed table as a DataFrame; plans keyed on [[bucketCols]]
    * read the clustering from the catalog and skip their Exchange. */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Ensure a DAY-PARTITIONED, hash-clustered external table exists for
    * `schema` (which must carry a `ts_day` column — it becomes the
    * partition spec; everything else stays a data column). This is the
    * incremental-maintenance variant of [[write]]: partitioning by day
    * gives the same dirty-day dynamic-overwrite discipline as the plain
    * 5m tier, while the CLUSTERED BY spec makes every per-series
    * aggregation/join off the table Exchange-free — bucket files are
    * per-partition-dir, but the bucket→hash-space mapping is global, so
    * the clustering holds across any set of day partitions a query reads.
    * An existing table is validated against the requested spec (mismatch
    * throws), the [[register]] rule. */
  def registerPartitioned(spark: SparkSession, tableName: String,
      path: String, schema: org.apache.spark.sql.types.StructType,
      nBuckets: Int = 64): Unit = {
    require(schema.fieldNames.contains("ts_day"),
      s"schema must carry the ts_day partition column, got ${schema.toDDL}")
    if (spark.catalog.tableExists(tableName)) {
      val meta = spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName))
      val spec = meta.bucketSpec
      require(spec.exists(s => s.numBuckets == nBuckets &&
          s.bucketColumnNames == bucketCols),
        s"table $tableName already registered with bucket spec $spec, " +
          s"requested $nBuckets buckets on $bucketCols")
      // partitioning must match too: a FLAT table under this name would
      // pass the bucket check, and the next overwriteDays would then
      // TRUNCATE it (dynamic partition-overwrite is a no-op without
      // partitions — the whole table is one overwrite target)
      require(meta.partitionColumnNames == Seq("ts_day"),
        s"table $tableName exists but is partitioned on " +
          s"${meta.partitionColumnNames} (need Seq(ts_day)); a flat table " +
          "here would be truncated by the next dirty-day overwrite")
    } else {
      val dataCols = schema.fields.filter(_.name != "ts_day")
      val ts = schema(schema.fieldIndex("ts_day"))
      val ddl = org.apache.spark.sql.types.StructType(dataCols :+ ts).toDDL
      spark.sql(
        s"""CREATE TABLE $tableName ($ddl)
           |USING parquet
           |PARTITIONED BY (ts_day)
           |CLUSTERED BY (${bucketCols.mkString(", ")})
           |SORTED BY (tenant_id, metric_name, bucket_ms)
           |INTO $nBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
  }

  /** Overwrite exactly the day partitions present in `slice` (which must
    * carry ts_day) — the cascade's dynamic-overwrite discipline routed
    * through the bucketed layout: `insertInto` writes THROUGH the
    * catalog's bucket spec, so each rewritten day lands hash-clustered and
    * per-file sorted without the caller repeating the spec. Column order
    * is realigned to the table positionally (insertInto's contract), with
    * the partition column last. Dynamic mode must be set via the SESSION
    * conf for the duration of the insert — `insertInto` ignores the
    * per-write option, and static mode would silently truncate every
    * partition NOT in the slice; the prior conf value is restored.
    *
    * File-count discipline (why the mirror needs NO compaction arm in
    * [[graft.Maintain]]): dynamic overwrite REPLACES each dirty day's
    * files — re-rolls never accumulate — and the slice is first
    * repartitioned by the table's own bucket hash
    * (`HashPartitioning(bucketCols, nBuckets)` — identical to the bucket
    * id expression), so every task holds exactly one bucket and each day
    * lands at ≤ nBuckets files, forever. Without the alignment, a
    * bucketed write emits one file per (task × bucket) — 32 shuffle
    * partitions × 64 buckets = up to 2048 files per day, re-paid on
    * every re-roll. BucketedStoreSpec measures both invariants. */
  def overwriteDays(spark: SparkSession, slice: DataFrame,
      tableName: String): Unit = {
    import org.apache.spark.sql.functions.col
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName))
    val nBuckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalArgumentException(
        s"table $tableName carries no bucket spec"))
    val cols = spark.table(tableName).columns
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try slice.select(cols.map(col): _*)
      .repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode("overwrite")
      .insertInto(tableName)
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
