package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Durable dirty-day markers for the deferred-rollup facade — the
  * reference's persisted late-work bookkeeping re-expressed as marker
  * files (rax-maas/blueflood persists delayed locators in the
  * `metrics_delayed_locator` CF, io/datastax/DDelayedLocatorIO.java, and
  * per-slot dirty stamps in `metrics_state`, io/datastax/DShardStateIO
  * .java, precisely so a restarted RollupService knows what still needs
  * rolling).
  *
  * One empty file per pending (kind, day) under `<storeDir>/_dirty_days/`
  * (`basic_<dayMs>` / `preagg_<dayMs>`). The underscore prefix keeps the
  * directory invisible to every Spark path scan. Lifecycle (all driver-side
  * metadata ops, serialized by the facade's write lock):
  *
  *  - [[mark]] BEFORE the batch's raw write: a crash anywhere after the
  *    marker leaves the dirty fact durable — the worst a premature marker
  *    costs is one spurious (idempotent) re-roll at the next drain;
  *  - [[unmark]] only AFTER the day's fresh tier generation is published
  *    AND the in-memory pending entry was cleared un-raced (see
  *    [[graft.http.MetricsHttpServer.rollNow]]'s seq-stamped remove), so a
  *    day re-dirtied mid-roll keeps its marker;
  *  - [[list]] at facade construction reconciles survivors into the
  *    pending sets (deferred mode) or drains them immediately (synchronous
  *    mode) — the reference's ScheduleContext re-reads persisted shard
  *    state on boot the same way.
  *
  * Scale: the marker set is bounded by the ingest window's day span (a
  * handful of files), never by data volume. */
object DirtyDayLog {

  private def dir(storeDir: String) = new Path(s"$storeDir/_dirty_days")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Persist markers for `days` (idempotent — an existing marker stands). */
  def mark(spark: SparkSession, storeDir: String, kind: String,
      days: Iterable[Long]): Unit = if (days.nonEmpty) {
    val d = dir(storeDir)
    val fs = fsOf(spark, d)
    fs.mkdirs(d)
    days.foreach { day =>
      val f = new Path(d, s"${kind}_$day")
      if (!fs.exists(f)) fs.create(f, true).close()
    }
  }

  /** Remove markers for `days` (missing markers are a no-op). */
  def unmark(spark: SparkSession, storeDir: String, kind: String,
      days: Iterable[Long]): Unit = if (days.nonEmpty) {
    val d = dir(storeDir)
    val fs = fsOf(spark, d)
    days.foreach(day => fs.delete(new Path(d, s"${kind}_$day"), false))
  }

  /** All persisted markers, kind → day set. Unparseable names are
    * ignored (never data-bearing — this directory holds only markers). */
  def list(spark: SparkSession, storeDir: String): Map[String, Set[Long]] = {
    val d = dir(storeDir)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) return Map.empty
    fs.listStatus(d).toSeq.flatMap { s =>
      val n = s.getPath.getName
      val cut = n.lastIndexOf('_')
      if (cut <= 0) None
      else n.drop(cut + 1).toLongOption.map(day => n.take(cut) -> day)
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
  }
}
