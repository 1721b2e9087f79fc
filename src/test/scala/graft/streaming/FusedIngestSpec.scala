package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The observe-fused ingest path ([[IngestStream.processBatch]] with
  * `fuseObserve = true`): the per-batch accounting and catalog locators
  * ride the raw write as observed metrics, and the raw batch commits by a
  * staged atomic rename (catalog-before-data preserved). The contract:
  * every store artifact — raw rows, errors sink, catalog content,
  * 5m tier, dirty-day return — is BIT-IDENTICAL to the classic 4-job
  * path's. */
class FusedIngestSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val base = 1704067200000L // 2024-01-01 00:00 UTC

  private def tmp() = Files.createTempDirectory("graft_fused").toString

  private def mkBatch(rows: Seq[(String, String, Long, Double, Integer, String)])
      : DataFrame =
    IngestStream.withValidity(
      rows.toDF("tenant_id", "metric_name", "ts_ms", "value",
        "ttl_seconds", "unit"),
      1L, Long.MaxValue)

  private val mixed = Seq(
    ("t1", "m1", base + 10000L, 1.0, Integer.valueOf(86400), "ms"),
    ("t1", "m1", base + 310000L, 3.0, Integer.valueOf(86400), "ms"),
    ("t1", "m2", base + 86400000L + 20000L, 5.0, Integer.valueOf(86400), "bytes"),
    ("t2", "m3", base + 30000L, 7.0, Integer.valueOf(86400), null),
    ("t1", "", base + 1000L, 9.0, Integer.valueOf(86400), "ms"), // invalid: name
    ("t1", "m1", 0L, 2.0, Integer.valueOf(86400), "ms")) // invalid: ts < lo

  private def dump(store: String, table: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$store/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val df = if (table.startsWith("metrics_5m"))
      graft.core.SnapshotStore.read(spark, s"$store/$table").get
    else spark.read.parquet(s"$store/$table")
    df.collect().map(_.toString).toSeq.sorted
  }

  test("fused path produces a bit-identical store to the classic path: " +
    "raw, errors, catalog, 5m tier, and the dirty-day return") {
    val (s1, s2) = (tmp(), tmp())
    val d1 = IngestStream.processBatch(mkBatch(mixed), s1, batchId = 7L)
    val d2 = IngestStream.processBatch(mkBatch(mixed), s2, batchId = 7L,
      fuseObserve = true)
    assert(d2.sorted === d1.sorted, "dirty-day returns must agree")
    assert(d2.sorted === Seq(base, base + 86400000L))
    for (t <- Seq("metrics_full", "metrics_errors", "metric_catalog",
        "metrics_5m")) {
      val (a, b) = (dump(s1, t), dump(s2, t))
      assert(a.nonEmpty, s"$t empty in classic store")
      assert(b === a, s"$t diverged between classic and fused")
    }
    // catalog coverage marker (virgin first batch) present in both
    for (s <- Seq(s1, s2))
      assert(new java.io.File(s"$s/metric_catalog/_complete").exists())
    // no staging residue after the commit rename
    val leftovers = new java.io.File(s"$s2/metrics_full").listFiles()
      .map(_.getName).filter(_.startsWith("."))
    assert(leftovers.isEmpty, s"staging leaked: ${leftovers.mkString(",")}")
  }

  test("all-invalid fused batch writes NO data or catalog, only errors " +
    "(and an empty batch is a clean no-op)") {
    val store = tmp()
    val bad = Seq(
      ("t1", "", base + 1000L, 9.0, Integer.valueOf(86400), "ms"),
      ("t1", "m1", 0L, 2.0, Integer.valueOf(86400), "ms"))
    assert(IngestStream.processBatch(mkBatch(bad), store, batchId = 1L,
      fuseObserve = true) === Nil)
    assert(!new java.io.File(s"$store/metrics_full/batch_id=1").exists())
    assert(!new java.io.File(s"$store/metric_catalog").exists())
    assert(spark.read.parquet(s"$store/metrics_errors").count() === 2)
    // fully empty batch: nothing at all
    val store2 = tmp()
    assert(IngestStream.processBatch(mkBatch(Nil), store2, batchId = 2L,
      fuseObserve = true) === Nil)
    assert(!new java.io.File(s"$store2/metrics_errors").exists())
    assert(!new java.io.File(s"$store2/metrics_full").exists())
  }

  test("warm-day update over a second batch id ≡ full-day recompute " +
    "from all batches") {
    val store = tmp()
    val a = Seq(
      ("t1", "m1", base + 10000L, 1.0, Integer.valueOf(86400), "ms"),
      ("t1", "m1", base + 20000L, 4.0, Integer.valueOf(86400), "ms"),
      ("t1", "m1", base + 310000L, 2.0, Integer.valueOf(86400), "ms"))
    val b = Seq(
      ("t1", "m1", base + 30000L, 7.0, Integer.valueOf(86400), "ms"),
      ("t1", "m1", base + 320000L, 9.0, Integer.valueOf(86400), "ms"),
      ("t1", "m2", base + 40000L, 5.0, Integer.valueOf(86400), "ms"))
    IngestStream.processBatch(mkBatch(a), store, batchId = 1L,
      fuseObserve = true)
    // NEW batch id on the already-rolled day → the incremental merge path
    IngestStream.processBatch(mkBatch(b), store, batchId = 2L,
      fuseObserve = true)
    val got = graft.core.SnapshotStore.read(spark, s"$store/metrics_5m").get
      .select("tenant_id", "metric_name", "bucket_ms", "num_points",
        "sum_v", "avg_v", "min_v", "max_v", "var_v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7), r.getDouble(8))).toMap
    val want = graft.operators.Rollups.basicFromRaw(
        (a ++ b).map(t => (t._1, t._2, t._3, t._4))
          .toDF("tenant_id", "metric_name", "ts_ms", "value"),
        graft.core.Granularity.MIN_5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7), r.getDouble(8))).toMap
    assert(got.keySet === want.keySet)
    for ((k, (n, s, avg, mn, mx, v)) <- want) {
      val (gn, gs, gavg, gmn, gmx, gv) = got(k)
      assert(gn === n, s"num_points at $k")
      assert(gs === s, s"sum_v at $k") // integer-valued: order-exact
      assert(gmn === mn && gmx === mx, s"min/max at $k")
      assert(gavg === avg, s"avg_v at $k") // same sum/n division
      assert(math.abs(gv - v) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"var_v at $k: merge $gv vs recompute $v")
    }
  }

  test("fused retry of the SAME batch id replaces, never duplicates — " +
    "and reclaims a crashed attempt's leaked staging dir") {
    val store = tmp()
    val rows = mixed.filter(_._2.nonEmpty).filter(_._3 > 0L)
    IngestStream.processBatch(mkBatch(rows), store, batchId = 9L,
      fuseObserve = true)
    // simulate a crashed prior attempt's leak for the retry to reclaim
    val leak = new java.io.File(s"$store/metrics_full/.staging-9/junk")
    leak.getParentFile.mkdirs()
    java.nio.file.Files.write(leak.toPath, "x".getBytes)
    IngestStream.processBatch(mkBatch(rows), store, batchId = 9L,
      fuseObserve = true)
    assert(spark.read.parquet(s"$store/metrics_full").count() === rows.size)
    assert(!new java.io.File(s"$store/metrics_full/.staging-9").exists())
  }
}
