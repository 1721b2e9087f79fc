package graft

import graft.operators.{Retention, Similarity, TextScoring}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Maintain.run]] — one scheduled pass must drive a dirty
  * multi-artifact store (expired days, stale error sinks, small-file
  * batch dirs across the raw table, the catalog, a text index and both
  * ANN artifacts) to a clean, probe-green state in a single call, and
  * report everything it did. */
class MaintainSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val DayMs = 86400000L

  test("one Maintain.run pass: retention + all compactions + recall probes") {
    val store = java.nio.file.Files.createTempDirectory("graft_maint").toString
    val now = System.currentTimeMillis()
    val freshDay = now - math.floorMod(now, DayMs)
    val deadDay = 0L // epoch day: expired under every tier TTL

    // raw table: two small batch dirs, each holding a dead and a fresh day
    for (b <- 0L to 1L)
      Seq(("acme", "m.a", deadDay, 1000L + b, 1.0 + b),
          ("acme", "m.a", freshDay, freshDay + b, 2.0 + b))
        .toDF("tenant_id", "metric_name", "ts_day", "ts_ms", "value")
        .write.mode("overwrite").partitionBy("ts_day")
        .parquet(s"$store/metrics_full/batch_id=$b")

    // events table: same two-level layout, two foldable dirs (fresh days
    // only — annotations age at the coarsest tier)
    for (b <- 0L to 1L)
      Seq(("acme", 100L + b, freshDay + b, "deploy", s"build $b"))
        .toDF("tenant_id", "event_id", "ts_ms", "event_type", "props")
        .withColumn("ts_day", lit(freshDay))
        .write.mode("overwrite").partitionBy("ts_day")
        .parquet(s"$store/events/batch_id=$b")

    // error sink: one stale dir (old mtime), one fresh
    for (b <- 0L to 1L)
      Seq(("acme", "bad", 1L)).toDF("tenant_id", "metric_name", "ts_ms")
        .write.mode("overwrite").parquet(s"$store/metrics_errors/batch_id=$b")
    fs.setTimes(new Path(s"$store/metrics_errors/batch_id=0"), 1000L, 1000L)

    // catalog: three per-batch dirs under one src
    for (b <- 0L to 2L)
      Seq(("acme", s"m.$b", "basic", "req"))
        .toDF("tenant_id", "metric_name", "family", "unit")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$store/metric_catalog/src=test/batch_id=$b")

    // text index: three appended batches
    val docs = (1L to 60L).map(i =>
      (i, s"alpha beta gamma doc$i token${i % 7} corpus text"))
      .toDF("doc_id", "text")
    val textIdx = java.nio.file.Files.createTempDirectory("graft_maint_t").toString
    for (b <- 0L until 3L)
      TextScoring.appendTextIndex(docs.filter(col("doc_id") % 3 === b),
        textIdx, b)

    // ANN artifacts: IVF + PQ, each with an appended batch on top
    val rnd = new scala.util.Random(3)
    val emb = (0L until 120L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val ivfIdx = java.nio.file.Files.createTempDirectory("graft_maint_i").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 100), ivfIdx)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 100), ivfIdx, 1L)
    val pqIdx = java.nio.file.Files.createTempDirectory("graft_maint_p").toString
    Similarity.writePqIndex(emb.filter(col("vec_id") < 100), pqIdx, dim = 16)
    Similarity.appendPqIndex(emb.filter(col("vec_id") >= 100), pqIdx, 1L)

    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    val report = Maintain.run(spark, store,
      nowMillis = now, assumeQuiesced = true,
      textIndexPath = Some(textIdx), ivfIndexPath = Some(ivfIdx),
      pqProbe = Some((pqIdx, emb)), recallQueries = Some(queries))

    // retention: the epoch day died everywhere it appeared, fresh day kept
    assert(report.droppedDays("metrics_full").contains(deadDay))
    assert(fs.globStatus(
      new Path(s"$store/metrics_full", s"batch_id=*/ts_day=$deadDay")).isEmpty)
    // error sink: stale dir dropped by mtime, fresh one kept
    assert(report.droppedErrorBatches("metrics_errors") === Seq(0L))
    assert(fs.exists(new Path(s"$store/metrics_errors/batch_id=1")))

    // raw compaction folded the two batch dirs into one compacted dir
    assert(report.compactedRaw("metrics_full") === Retention.CompactIdBase)
    assert(fs.globStatus(new Path(s"$store/metrics_full", "batch_id=*"))
      .map(_.getPath.getName).toSeq ===
      Seq(s"batch_id=${Retention.CompactIdBase}"))
    // and the surviving rows are exactly the fresh-day rows of both batches
    assert(spark.read.parquet(s"$store/metrics_full").count() === 2)

    // events folded too (same discipline, its own batch-id namespace)
    assert(report.compactedRaw("events") === Retention.CompactIdBase)
    assert(spark.read.parquet(s"$store/events").count() === 2)

    // catalog folded; entries all survive
    assert(report.compactedCatalog.nonEmpty)
    assert(spark.read.parquet(s"$store/metric_catalog")
      .select("metric_name").distinct().count() === 3)

    // text index folded to one batch dir and still serves
    assert(report.compactedTextIndex === Some(Retention.CompactIdBase))
    assert(TextScoring.bm25TopKFromIndex(spark, textIdx,
      Seq("alpha"), k = 5).count() === 5)

    // both ANN artifacts folded; serving intact over the full 120 vectors
    assert(report.compactedAnn.keySet ===
      Set(s"$ivfIdx/assignments", s"$pqIdx/codes"))
    assert(Similarity.ivfTopKFromIndex(spark, ivfIdx, queries, 5)
      .count() === queries.count() * 5)

    // probes ran and the fresh indexes are healthy
    assert(report.ivfRecall.exists(_ >= 0.5), report.ivfRecall)
    assert(report.pqRecall.exists(_ >= 0.5), report.pqRecall)
    assert(report.probesHealthy(0.5))

    // the summary names every sub-pass
    for (k <- Seq("retention.days_dropped", "compact.raw", "compact.catalog",
        "compact.text_index", "compact.ann", "probe.ivf_recall",
        "probe.pq_recall"))
      assert(report.summary.contains(k), report.summary)

    // a second pass on the clean store is a no-op (idempotent maintenance)
    val again = Maintain.run(spark, store, nowMillis = now,
      assumeQuiesced = true, textIndexPath = Some(textIdx),
      ivfIndexPath = Some(ivfIdx))
    assert(again.compactedRaw.isEmpty && again.compactedCatalog.isEmpty &&
      again.compactedTextIndex.isEmpty && again.compactedAnn.isEmpty)
    assert(again.droppedDays.values.forall(_.isEmpty))
  }
}
