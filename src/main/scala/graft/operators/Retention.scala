package graft.operators

import graft.core.Granularity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retention enforcement: per-tier TTL as partition drops.
  *
  * The reference ages data out per resolution via Cassandra column-family
  * TTLs (io/CassandraModel.java:47-59: full 5d, 5m 10d, 20m 20d, 60m 155d,
  * 240m 300d, 1440m 1825d — the same ladder carried by
  * [[Granularity.retentionDays]]). On a parquet lake the equivalent is
  * dropping whole `ts_day=` partitions once every record in them has
  * exceeded the tier's TTL — a metadata/file operation, O(number of
  * partition directories), with no data rewrite; exactly how production
  * table formats (Hive/Delta/Iceberg `DROP PARTITION`) implement retention
  * at 100 TB. The query planner's geometric TTL skip
  * ([[Granularity]] geometric selection) already refuses tiers whose
  * retention has expired a range — this job makes the store agree with the
  * plan, so "retention" changes storage, not just plans.
  */
object Retention {

  /** Store-relative table name for a basic tier. */
  def tableFor(g: Granularity): String =
    if (g.isFull) "metrics_full" else s"metrics_${g.name}"

  private val preaggKinds = Seq("counter", "gauge", "timer", "set")

  /** Every tiered table a store may hold, with its governing granularity:
    * the basic ladder plus the per-kind pre-aggregated ladders (the
    * reference applies the same per-gran TTLs to its preaggregated column
    * families, CassandraModel.java:61-72). `preagg_raw` — the parsed-flush
    * store that [[graft.streaming.IngestStream.processAggregatedBatch]]
    * recomputes tier 1 from — ages with the finest stored tier's TTL: once
    * a day can no longer appear in any 5m tier, its raw flushes are dead
    * weight (without this it grows without bound while everything derived
    * from it ages out). */
  def defaultTables: Map[String, Granularity] =
    Granularity.all.map(g => tableFor(g) -> g).toMap ++
      (for (k <- preaggKinds; g <- Granularity.rollupTiers)
        yield s"preagg_${k}_${g.name}" -> g) +
      ("preagg_raw" -> Granularity.rollupTiers.head) +
      // events are annotations on the data, not samples of it: they age
      // with the COARSEST tier (1825d) so an annotation outlives every
      // rollup it annotates (the reference keeps events in a separate
      // long-retention ES index for the same reason). Same two-level
      // batch_id/ts_day layout as metrics_full, handled by enforce as-is.
      ("events" -> Granularity.rollupTiers.last)

  /** A day partition is expired only when its whole day lies beyond the
    * tier's TTL horizon — the conservative reading of the reference's
    * per-record TTL (no surviving record may be dropped early). */
  def isExpired(tsDay: Long, g: Granularity, nowMillis: Long): Boolean =
    tsDay + 86400000L <= nowMillis - g.retentionMillis

  /** String/boolean metrics age on their own clock, not the rollup ladder:
    * the reference's STRING_METRICS_TTL is 365 days (TtlConfig.java:21) —
    * strings have no coarser tier to graduate into. */
  val StringMetricsTtlMillis: Long = 365L * 86400000L

  /** Drop expired `ts_day=` partitions of every present table; returns the
    * dropped day values per table. Handles both flat day partitioning
    * (`table/ts_day=D`) and the raw store's batch-then-day layout
    * (`metrics_full/batch_id=B/ts_day=D`). Driver-side by design: the work
    * is proportional to the number of partition DIRECTORIES (≤ retention
    * window in days × batches), never to data volume. `fixedTtlTables`
    * carries the tables that age on their own clock rather than a
    * granularity's (default: `metrics_string` at 365d) — a caller scoping
    * the sweep can scope or clear it the same way as `tables`. */
  def enforce(spark: SparkSession, storeDir: String, nowMillis: Long,
      tables: Map[String, Granularity] = defaultTables,
      fixedTtlTables: Map[String, Long] =
        Map("metrics_string" -> StringMetricsTtlMillis)): Map[String, Seq[Long]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ladder = tables.toSeq
      .map { case (t, g) => (t, g.retentionMillis) }
    (ladder ++ fixedTtlTables.toSeq).sortBy(_._1).flatMap {
      case (table, retentionMillis) =>
        val root = new Path(s"$storeDir/$table")
        val fs = root.getFileSystem(conf)
        if (!fs.exists(root)) None
        else {
          val parts =
            fs.globStatus(new Path(root, "ts_day=*")) ++
              fs.globStatus(new Path(root, "*/ts_day=*"))
          val dropped = parts.toSeq.flatMap { st =>
            // parse first, skip what doesn't parse: a stray ts_day=tmp dir
            // must not throw mid-sweep with earlier deletions applied
            st.getPath.getName.stripPrefix("ts_day=").toLongOption
              .filter(day => day + 86400000L <= nowMillis - retentionMillis)
              .map { day => fs.delete(st.getPath, true); day }
          }
          // unconditional: a crash between a prior run's partition deletes
          // and its prune leaves a _SUCCESS-only husk that a dropped-gated
          // prune would never revisit (later runs find nothing to drop).
          // O(partition dirs), so running it every enforce costs nothing.
          pruneEmptied(fs, root)
          if (dropped.isEmpty) None else Some(table -> dropped.distinct.sorted)
        }
    }.toMap
  }

  /** The error/reject sinks ([[graft.streaming.IngestStream]] writes
    * `metrics_errors`, `events_errors`, `preagg_errors`): `batch_id=`-only
    * layout — invalid records can carry null or garbage timestamps, so day
    * partitioning is impossible and [[enforce]]'s ts_day drops never visit
    * them. */
  val errorTables: Seq[String] =
    Seq("metrics_errors", "events_errors", "preagg_errors",
      "metrics_string_errors")

  /** Age out error-sink batch directories by WRITE time (directory
    * modification time — the only timestamp an invalid record reliably
    * has). Default TTL = the finest tier's (diagnostics age with the
    * rawest data they explain). Without this a deployment with persistent
    * bad traffic grows one small batch dir per unhealthy micro-batch
    * forever — the same unbounded-growth class the preagg_raw TTL exists
    * to prevent. Driver-side, O(batch dirs); schedule it alongside
    * [[enforce]] (separate entry point because its clock is wall time,
    * while enforce's `nowMillis` is compared against partition-name days —
    * specs drive the latter with synthetic epochs that must not touch
    * freshly written error dirs). Returns dropped batch ids per table. */
  def enforceErrorSinks(spark: SparkSession, storeDir: String,
      nowMillis: Long = System.currentTimeMillis(),
      ttlMillis: Long = Granularity.rollupTiers.head.retentionMillis,
      tables: Seq[String] = errorTables): Map[String, Seq[Long]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    tables.sorted.flatMap { table =>
      val root = new Path(s"$storeDir/$table")
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) None
      else {
        val dropped = fs.globStatus(new Path(root, "batch_id=*")).toSeq.flatMap { st =>
          // parse BEFORE deleting: a stray non-numeric dir (batch_id=tmp)
          // must be skipped, not throw mid-sweep with the run half-applied
          val id = st.getPath.getName.stripPrefix("batch_id=").toLongOption
          id.filter(_ => st.getModificationTime <= nowMillis - ttlMillis)
            .map { batchId => fs.delete(st.getPath, true); batchId }
        }
        if (fs.globStatus(new Path(root, "batch_id=*")).isEmpty)
          fs.delete(root, true) // no parquet-less husk for readers to trip on
        if (dropped.isEmpty) None else Some(table -> dropped.sorted)
      }
    }.toMap
  }

  /** After partition drops, remove dirs that no longer hold any partition:
    * first emptied `batch_id=` subdirs (the raw stores' two-level layout),
    * then the table root itself if every partition is gone. A directory of
    * nothing but `_SUCCESS` markers would fail `spark.read.parquet` schema
    * inference; absence is the state readers (and [[graft.streaming
    * .IngestStream.hasParquetData]] guards) handle cleanly. */
  private def pruneEmptied(fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    def partitionDirs(p: Path) =
      fs.globStatus(new Path(p, "ts_day=*")) ++ fs.globStatus(new Path(p, "*/ts_day=*"))
    for (batch <- fs.globStatus(new Path(root, "batch_id=*"))
         if fs.globStatus(new Path(batch.getPath, "ts_day=*")).isEmpty)
      fs.delete(batch.getPath, true)
    if (partitionDirs(root).isEmpty) fs.delete(root, true)
  }
}
