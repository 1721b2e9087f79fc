package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader-vs-rewrite atomicity for day-partitioned serving tables — the
  * generation/manifest gate the compaction subsystem's discipline
  * ([[graft.operators.Retention.compactRaw]]'s crash-safe manifest)
  * applied to the rollup tiers that dirty-day re-rolls rewrite IN PLACE.
  *
  * Why: Spark's dynamic partition overwrite commits by DELETING each
  * touched `ts_day=` directory and renaming the staged one in. A
  * concurrent read (a `/render` panel racing the ingest cascade) that
  * lists the table in that window sees a missing or partial day — silently
  * — and one that listed before the delete fails on vanished files. The
  * reference never had this failure mode: its Cassandra writes are
  * row-atomic (io/datastax/DMetricsCFPreparedStatements.java:39 in
  * rax-maas/blueflood), so a slot re-roll replaced values cell by cell
  * under reader isolation. A plain-parquet store needs an explicit commit
  * protocol instead. (Production deployments on object stores typically
  * reach for a table format — Delta/Iceberg — whose manifests give the
  * same guarantee; this is the same idea reduced to the two properties the
  * ladder needs: per-day atomic swap, bounded reader grace.)
  *
  * Layout: `<root>/ts_day=<D>/gen=<N>/part-*.parquet`. Both levels are
  * ordinary `key=value` partition directories, so `ts_day` stays a
  * partition column with full pruning; `gen` is resolved AT PLANNING TIME
  * and never reaches query schemas.
  *
  * Write protocol ([[publish]]): the new slice lands fully in a hidden
  * `.staging-<uuid>` dir (invisible to discovery), then each day COMMITS
  * by ONE atomic directory rename to `ts_day=D/gen=<max+1>` — no live file
  * is ever deleted or replaced by the commit itself. The previous
  * generation is retained (older ones are GC'd), so a reader that resolved
  * its snapshot just before the swap keeps reading intact files.
  *
  * Read protocol ([[read]]): list each day's max-generation directory
  * (driver-side metadata, one listing per day) and plan over exactly those
  * leaf directories (`basePath` keeps `ts_day` a partition column). The
  * resolved file set is immutable for the lifetime of the plan.
  *
  * Guarantees (stated precisely; AtomicServeSpec races them):
  *  - a read NEVER sees a torn day: every day it serves is one complete
  *    generation — the unit of consistency is the day, matching the
  *    reference's per-row (per-slot) atomicity;
  *  - a multi-day read may span generations across DAYS (day A new, day B
  *    old) while a publish is in flight — each day still self-consistent,
  *    exactly the guarantee concurrent Cassandra slot rewrites gave;
  *  - an in-flight read survives ONE subsequent publish of the days it
  *    touches (previous-generation retention); a SECOND publish of the
  *    same day during a single read can fail it LOUDLY (FileNotFound on
  *    the GC'd generation) — never silently;
  *  - single writer per table (the ingest stream's sequential
  *    foreachBatch / the facade's write lock); generation numbering is not
  *    CAS-protected against concurrent publishers;
  *  - a crash mid-publish leaves committed days at the new generation and
  *    the rest at the old (each self-consistent) plus a leaked staging dir
  *    that the next publish clears before writing.
  *
  * Tables never published through here (a fresh store, or the raw
  * batch-dir tables, which only ever gain whole new `batch_id=` dirs and
  * need no swap) read through the plain-layout fallback unchanged. A
  * pre-existing PLAIN table is migrated by the first publish
  * ([[ensureGenLayout]] wraps loose day files into `gen=0` — metadata-only
  * renames, to be run with serving paused, once). */
object SnapshotStore {

  private val GenRe = "^gen=(\\d+)$".r

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dayDirs(fs: FileSystem, root: Path) =
    if (!fs.exists(root)) Array.empty[Path]
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("ts_day="))
      .map(_.getPath)

  /** (generation number, dir) pairs under one day dir, unsorted. */
  private def gens(fs: FileSystem, dayDir: Path): Array[(Long, Path)] =
    fs.listStatus(dayDir).flatMap { s =>
      s.getPath.getName match {
        case GenRe(n) if s.isDirectory => Some((n.toLong, s.getPath))
        case _ => None
      }
    }

  private def hasParquetFile(fs: FileSystem, dir: Path): Boolean =
    fs.listStatus(dir).exists(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))

  /** Wrap any plain (pre-generation) day dirs into `gen=0` so the table
    * never mixes layouts (partition discovery cannot span depths). Loose
    * files are MOVED (metadata-only renames); this is the one non-atomic
    * step in the protocol and only ever runs on a table written before the
    * snapshot discipline existed — run the first publish against such a
    * table with serving paused. */
  private def ensureGenLayout(fs: FileSystem, root: Path): Unit =
    for (day <- dayDirs(fs, root) if gens(fs, day).isEmpty) {
      val loose = fs.listStatus(day).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
      if (loose.nonEmpty) {
        val g0 = new Path(day, "gen=0")
        fs.mkdirs(g0)
        loose.foreach(f => fs.rename(f.getPath, new Path(g0, f.getPath.getName)))
      }
    }

  /** Publish `df` (which must carry a `ts_day` column) into `root`: stage
    * fully, then commit each day by one atomic rename to its next
    * generation, retaining the previous generation for in-flight readers.
    * Only days PRESENT in `df` are touched (dynamic-overwrite semantics);
    * `replaceAll = true` additionally deletes live days absent from `df`
    * (static full-rebuild semantics). Returns the committed day values. */
  def publish(df: DataFrame, root: String, replaceAll: Boolean = false)
      : Seq[Long] = {
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    fs.mkdirs(rootPath)
    // a crashed prior publish can only have leaked staging (commits are
    // per-day renames that either happened or didn't) — clear it first;
    // single-writer, so nothing live is ever named .staging-*
    Option(fs.globStatus(new Path(rootPath, ".staging-*")))
      .getOrElse(Array.empty).foreach(s => fs.delete(s.getPath, true))
    val staging =
      new Path(rootPath, s".staging-${java.util.UUID.randomUUID().toString}")
    df.write.mode("overwrite").partitionBy("ts_day").parquet(staging.toString)
    val staged = dayDirs(fs, staging)
    ensureGenLayout(fs, rootPath)
    val committed = staged.map { sd =>
      val dayName = sd.getName
      val dayDir = new Path(rootPath, dayName)
      fs.mkdirs(dayDir)
      val existing = gens(fs, dayDir)
      val g = if (existing.isEmpty) 0L else existing.map(_._1).max + 1L
      // COMMIT POINT for this day: one atomic directory rename — no live
      // file is deleted or replaced
      require(fs.rename(sd, new Path(dayDir, s"gen=$g")),
        s"snapshot commit rename failed for $dayDir gen=$g")
      // retain exactly the previous generation; GC everything older
      existing.filter(_._1 <= g - 2).foreach(p => fs.delete(p._2, true))
      dayName.stripPrefix("ts_day=").toLong
    }.toSeq
    if (replaceAll) {
      val keep = staged.map(_.getName).toSet
      dayDirs(fs, rootPath).filterNot(d => keep.contains(d.getName))
        .foreach(d => fs.delete(d, true))
    }
    fs.delete(staging, true)
    Instrumentation.global.inc("store.snapshot.publishes")
    Instrumentation.global.inc("store.snapshot.days", committed.size.toLong)
    committed
  }

  /** Resolve the table's current snapshot and return a DataFrame over
    * exactly the winning generation directories (schema identical to the
    * pre-snapshot layout: data columns + `ts_day` partition column; `gen`
    * never escapes). None when the table is absent or holds no data files
    * — the callers' `hasParquetData` guard discipline, folded in. Plain
    * (never-published) tables fall back to ordinary discovery. */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    if (!fs.exists(rootPath)) return None
    val withGens = dayDirs(fs, rootPath).map(d => d -> gens(fs, d))
    val genned = withGens.filter(_._2.nonEmpty)
    // a day dir with neither generations nor loose files (a crash between
    // publish's mkdirs and its commit rename) holds no data: ignore it —
    // it must neither trip the mixed-layout guard nor hide the table
    val plainDays = withGens.filter { case (d, gs) =>
      gs.isEmpty && fs.listStatus(d).exists(f => f.isFile &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    }
    if (genned.isEmpty) {
      // plain layout (or a day-partitioned table with no days): one
      // ordinary discovery read, guarded against parquet-less husks
      val anyFile = Seq("*.parquet", "*/*.parquet", "*/*/*.parquet").exists(g =>
        Option(fs.globStatus(new Path(rootPath, g))).exists(_.nonEmpty))
      return if (anyFile) Some(spark.read.parquet(root)) else None
    }
    require(plainDays.isEmpty,
      s"mixed plain/generation day layout under $root — the first " +
        "snapshot publish migrates a plain table; rerun it with serving " +
        "paused")
    val winners = genned
      .map { case (_, gs) => gs.maxBy(_._1)._2 }
      .filter(w => hasParquetFile(fs, w))
    if (winners.isEmpty) None
    else Some(spark.read.option("basePath", root)
      .parquet(winners.map(_.toString).toIndexedSeq: _*)
      .drop("gen"))
  }
}
