package graft.operators

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** [[Retention.compactRaw]] / [[Retention.recoverCompaction]] — the
  * small-file maintenance pass must preserve content exactly, bound file
  * sizes, survive crashes in either half, and ignore strays. */
class CompactionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `rows` as `batch_id=<id>/ts_day=<d>` under the table root. */
  private def writeBatch(root: String, id: Long,
      rows: Seq[(String, Long, Long, Double)]): Unit =
    rows.toDF("metric_name", "ts_day", "ts_ms", "value")
      .repartition(3)
      .write.mode("overwrite").partitionBy("ts_day")
      .parquet(s"$root/batch_id=$id")

  private def tableRows(root: String) =
    spark.read.parquet(root).drop("batch_id")
      .select("metric_name", "ts_day", "ts_ms", "value")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)

  test("compact folds batch dirs into one, preserving rows and ts_day layout") {
    val store = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val root = s"$store/metrics_full"
    val b0 = (0 until 40).map(i => (s"m${i % 5}", (i % 3).toLong, i.toLong, i * 1.5))
    val b1 = (40 until 90).map(i => (s"m${i % 5}", (i % 3).toLong, i.toLong, i * 1.5))
    writeBatch(root, 0, b0)
    writeBatch(root, 1, b1)
    val before = tableRows(root)
    val got = Retention.compactRaw(spark, store, "metrics_full",
      maxRecordsPerFile = 10, assumeQuiesced = true)
    assert(got === Some(Retention.CompactIdBase))
    // one batch dir remains, day partitions preserved inside it
    val dirs = fs.globStatus(new Path(root, "batch_id=*")).map(_.getPath.getName)
    assert(dirs.toSeq === Seq(s"batch_id=${Retention.CompactIdBase}"))
    assert(fs.globStatus(
      new Path(root, s"batch_id=${Retention.CompactIdBase}/ts_day=*")).length === 3)
    assert(tableRows(root) === before)
    // file sizes bounded: ≤ 10 records each → ≥ 9 files for 90 rows
    val files = fs.globStatus(
      new Path(root, s"batch_id=${Retention.CompactIdBase}/ts_day=*/*.parquet"))
    assert(files.length >= 9)
    // no manifest left behind; nothing small left → second compact no-ops
    // (and never re-folds the compacted mega-dir: O(new files), not O(table))
    assert(!fs.exists(new Path(root, "_compact_manifest")))
    assert(Retention.compactRaw(spark, store, "metrics_full",
      assumeQuiesced = true) === None)
    // a later round (after more batches land) keeps ids increasing and
    // folds ONLY the new small dirs alongside the standing compacted one
    writeBatch(root, 7, b0.take(5))
    writeBatch(root, 8, b1.take(4))
    val again = Retention.compactRaw(spark, store, "metrics_full",
      assumeQuiesced = true)
    assert(again === Some(Retention.CompactIdBase + 1))
    assert(tableRows(root).size === before.size + 9)
    assert(fs.exists(new Path(root, s"batch_id=${Retention.CompactIdBase}")),
      "prior compaction must not be rewritten")
  }

  test("default (non-quiesced) mode spares the newest small dir — the one " +
    "a live streaming commit may still be filling") {
    val store = java.nio.file.Files.createTempDirectory("graft_compact5").toString
    val root = s"$store/metrics_full"
    writeBatch(root, 0, Seq(("m", 0L, 1L, 1.0)))
    writeBatch(root, 1, Seq(("m", 0L, 2L, 2.0)))
    writeBatch(root, 2, Seq(("m", 0L, 3L, 3.0)))
    val before = tableRows(root)
    assert(Retention.compactRaw(spark, store, "metrics_full").isDefined)
    assert(fs.exists(new Path(root, "batch_id=2")), "newest dir untouched")
    assert(!fs.exists(new Path(root, "batch_id=0")))
    assert(!fs.exists(new Path(root, "batch_id=1")))
    assert(tableRows(root) === before)
    // only two dirs (compacted + newest): nothing foldable now
    assert(Retention.compactRaw(spark, store, "metrics_full") === None)
  }

  test("the live-writer spare keys on MODIFICATION time, not max id — " +
    "facade batch ids are unordered request hashes") {
    val store = java.nio.file.Files.createTempDirectory("graft_compact6").toString
    val root = s"$store/metrics_full"
    // a facade-style hash id numerically ABOVE the streaming ids, but
    // written FIRST; the streaming dir id=7 is the one still being written
    val hashId = (1L << 58) + 12345L
    assert(hashId < Retention.CompactIdBase)
    writeBatch(root, hashId, Seq(("m", 0L, 1L, 1.0)))
    writeBatch(root, 3, Seq(("m", 0L, 2L, 2.0)))
    writeBatch(root, 7, Seq(("m", 0L, 3L, 3.0)))
    // make mtimes deterministic: id=7 is newest by a wide margin
    val t0 = System.currentTimeMillis()
    fs.setTimes(new Path(root, s"batch_id=$hashId"), t0 - 60000L, -1)
    fs.setTimes(new Path(root, "batch_id=3"), t0 - 40000L, -1)
    fs.setTimes(new Path(root, "batch_id=7"), t0, -1)
    val before = tableRows(root)
    assert(Retention.compactRaw(spark, store, "metrics_full").isDefined)
    assert(fs.exists(new Path(root, "batch_id=7")),
      "the most recently MODIFIED dir is the live one — it must survive " +
        "even though the hash id is numerically larger")
    assert(!fs.exists(new Path(root, s"batch_id=$hashId")))
    assert(!fs.exists(new Path(root, "batch_id=3")))
    assert(tableRows(root) === before)
  }

  test("non-numeric stray batch dirs are left untouched and uncounted") {
    val store = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    val root = s"$store/metrics_full"
    writeBatch(root, 0, Seq(("m", 0L, 1L, 1.0)))
    fs.mkdirs(new Path(root, "batch_id=tmp"))
    // only one numeric dir → no compaction
    assert(Retention.compactRaw(spark, store, "metrics_full",
      assumeQuiesced = true) === None)
    writeBatch(root, 1, Seq(("m", 0L, 2L, 2.0)))
    assert(Retention.compactRaw(spark, store, "metrics_full",
      assumeQuiesced = true).isDefined)
    assert(fs.exists(new Path(root, "batch_id=tmp")))
  }

  test("recovery completes a crash AFTER the rename (old dirs deleted)") {
    val store = java.nio.file.Files.createTempDirectory("graft_compact3").toString
    val root = s"$store/metrics_full"
    writeBatch(root, 0, Seq(("m", 0L, 1L, 1.0)))
    writeBatch(root, Retention.CompactIdBase, Seq(("m", 0L, 1L, 1.0)))
    // manifest says: new dir = CompactIdBase, old dir = batch_id=0
    val out = fs.create(new Path(root, "_compact_manifest"), true)
    out.write(s"${Retention.CompactIdBase}\nbatch_id=0".getBytes("UTF-8"))
    out.close()
    Retention.recoverCompaction(spark, store, "metrics_full")
    assert(!fs.exists(new Path(root, "batch_id=0")), "old dir must be deleted")
    assert(fs.exists(new Path(root, s"batch_id=${Retention.CompactIdBase}")))
    assert(!fs.exists(new Path(root, "_compact_manifest")))
    assert(tableRows(root).size === 1)
  }

  test("recovery rolls back a crash BEFORE the rename (originals intact)") {
    val store = java.nio.file.Files.createTempDirectory("graft_compact4").toString
    val root = s"$store/metrics_full"
    writeBatch(root, 0, Seq(("m", 0L, 1L, 1.0)))
    writeBatch(root, 1, Seq(("m", 0L, 2L, 2.0)))
    val newId = Retention.CompactIdBase
    // simulate: manifest + half-written temp, no renamed dir
    val out = fs.create(new Path(root, "_compact_manifest"), true)
    out.write(s"$newId\nbatch_id=0\nbatch_id=1".getBytes("UTF-8"))
    out.close()
    fs.mkdirs(new Path(root, s".compact_tmp_$newId"))
    Retention.recoverCompaction(spark, store, "metrics_full")
    assert(fs.exists(new Path(root, "batch_id=0")))
    assert(fs.exists(new Path(root, "batch_id=1")))
    assert(!fs.exists(new Path(root, s".compact_tmp_$newId")))
    assert(!fs.exists(new Path(root, "_compact_manifest")))
    assert(tableRows(root).size === 2)
    // and a fresh compact now succeeds (recovery is run inside it too)
    assert(Retention.compactRaw(spark, store, "metrics_full",
      assumeQuiesced = true).isDefined)
  }
}
