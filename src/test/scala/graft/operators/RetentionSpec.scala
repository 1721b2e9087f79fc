package graft.operators

import graft.SparkSuite
import graft.core.Granularity
import graft.streaming.IngestStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Retention enforcement (reference CassandraModel.java:47-59 TTL ladder):
  * expired day partitions are dropped per tier, and the store then agrees
  * with the planner's geometric TTL skip. */
class RetentionSpec extends AnyFunSuite with SparkSuite {

  private val day0 = 1704067200000L // 2024-01-01 00:00 UTC
  private def day(n: Int) = day0 + n * 86400000L
  private val now = day(30) // pinned retention clock

  /** Days with ages (from day END to now) of 2, 7, 14 and 24 days: each
    * crosses a different rung of the TTL ladder (full 5d, 5m 10d, 20m 20d). */
  private val presentDays = Seq(day(27), day(22), day(15), day(5))

  private def buildStore(): String = {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_retention").toString
    val pts = presentDays.map(d => ("t1", "m1", d + 1000, 1.0))
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
    IngestStream.writeRaw(pts, store, batchId = 0L) // batch_id=0/ts_day=D layout
    for (g <- Seq(Granularity.MIN_5, Granularity.MIN_20, Granularity.MIN_60))
      Rollups.basicFromRaw(pts, g)
        .withColumn("ts_day", col("bucket_ms") - pmod(col("bucket_ms"), lit(86400000L)))
        .write.partitionBy("ts_day").parquet(s"$store/${Retention.tableFor(g)}")
    store
  }

  private def daysIn(store: String, table: String): Set[Long] = {
    val root = Paths.get(s"$store/$table")
    if (!java.nio.file.Files.exists(root)) Set.empty
    else spark.read.parquet(root.toString)
      .select("ts_day").distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("expired ts_day partitions drop per the tier TTL ladder") {
    val store = buildStore()
    val dropped = Retention.enforce(spark, store, now)

    // full (5d): only the 2-day-old day survives
    assert(daysIn(store, "metrics_full") === Set(day(27)))
    // 5m (10d): 2- and 7-day-old survive
    assert(daysIn(store, "metrics_5m") === Set(day(27), day(22)))
    // 20m (20d): everything but the 24-day-old
    assert(daysIn(store, "metrics_20m") === Set(day(27), day(22), day(15)))
    // 60m (155d): nothing expires
    assert(daysIn(store, "metrics_60m") === presentDays.toSet)

    assert(dropped("metrics_full") === Seq(day(5), day(15), day(22)))
    assert(dropped("metrics_5m") === Seq(day(5), day(15)))
    assert(dropped("metrics_20m") === Seq(day(5)))
    assert(!dropped.contains("metrics_60m"))

    // idempotent: a second run finds nothing to drop
    assert(Retention.enforce(spark, store, now) === Map.empty)
  }

  test("the TTL sweep never reaches inside a hidden staging dir: an " +
    "expired day being STAGED by a live publish survives until its " +
    "commit rename") {
    val store = buildStore()
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a live publish staging a LATE slice of a long-expired day
    val staged = new org.apache.hadoop.fs.Path(
      s"$store/metrics_full/.staging-live/ts_day=${day(0)}")
    fs.mkdirs(staged)
    fs.create(new org.apache.hadoop.fs.Path(staged, "part-0.parquet"),
      true).close()
    Retention.enforce(spark, store, now)
    assert(fs.exists(staged),
      "expired day inside a live .staging dir must survive the sweep")
  }

  test("fully-expired tables prune away cleanly; preagg_raw ages with the 5m tier") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_retention_prune").toString
    val old = day(5) // 24 days old: past the full (5d), 5m (10d) TTLs
    val dayCol = col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))
    val pts = Seq(("t1", "m1", old + 1000, 1.0))
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
    IngestStream.writeRaw(pts, store, batchId = 0L)
    Rollups.basicFromRaw(pts, Granularity.MIN_5)
      .withColumn("ts_day", col("bucket_ms") - pmod(col("bucket_ms"), lit(86400000L)))
      .write.partitionBy("ts_day").parquet(s"$store/metrics_5m")
    // preagg_raw uses the same batch/day layout processAggregatedBatch writes
    pts.withColumn("kind", lit("counter")).withColumn("ts_day", dayCol)
      .write.partitionBy("ts_day").parquet(s"$store/preagg_raw/batch_id=0")

    val dropped = Retention.enforce(spark, store, now)
    // the recompute-from-source store is TTL'd too — it must not grow
    // unboundedly while everything derived from it ages out
    assert(dropped("preagg_raw") === Seq(old))
    // emptied tables vanish entirely: no husk of _SUCCESS markers that a
    // later spark.read.parquet would fail schema inference on
    for (t <- Seq("metrics_full", "metrics_5m", "preagg_raw"))
      assert(!Files.exists(Paths.get(s"$store/$t")), s"$t should be pruned away")
    // and the cascades treat the emptied store as a no-op, not a crash
    IngestStream.rollupCascadeFor(spark, store)
    IngestStream.preaggCascadeFor(spark, store)
  }

  test("events age with the coarsest tier TTL — annotations outlive the rollups") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_ret_events").toString
    val oldDay = day0 - 1830L * 86400000L // > 1825d before the clock
    val newDay = day(5) // 24d old: dead in full/5m/20m, alive for events
    Seq(("t1", 1L, oldDay + 1000, "deploy", 1.0, "{}", oldDay),
        ("t1", 2L, newDay + 1000, "deploy", 2.0, "{}", newDay))
      .toDF("tenant_id", "event_id", "ts_ms", "event_type", "value", "props", "ts_day")
      .write.partitionBy("ts_day").parquet(s"$store/events/batch_id=0")
    val dropped = Retention.enforce(spark, store, now)
    assert(dropped("events") === Seq(oldDay))
    assert(daysIn(store, "events") === Set(newDay))
  }

  test("husk left by a crash between delete and prune is cleaned by the next run") {
    val store = Files.createTempDirectory("graft_retention_husk").toString
    // simulate: a prior enforce deleted every partition of metrics_5m, then
    // crashed before pruning — leaving a _SUCCESS-only husk dir
    val husk = Paths.get(s"$store/metrics_5m")
    Files.createDirectories(husk)
    Files.createFile(husk.resolve("_SUCCESS"))
    // the next run has NOTHING to drop — the prune must still happen
    assert(Retention.enforce(spark, store, now) === Map.empty)
    assert(!Files.exists(husk), "crash-orphaned husk must be pruned unconditionally")
  }

  test("planner TTL-skip agrees with the store's actual contents") {
    val store = buildStore()
    Retention.enforce(spark, store, now)
    // a range starting at the 15-day-old day: geometric selection skips
    // full (5d) and 5m (10d) — both TTL-expired — and lands on 20m for a
    // point budget that 20m provides best
    val from = day(15)
    val g = Granularity.granularityFromPointsInInterval(
      from, now, points = 1080, nowMillis = now)
    assert(g === Granularity.MIN_20)
    // the selected tier still holds that day; every skipped finer tier lost it
    assert(daysIn(store, Retention.tableFor(g)).contains(from))
    assert(!daysIn(store, "metrics_full").contains(from))
    assert(!daysIn(store, "metrics_5m").contains(from))
    // and the skip/drop predicates agree tier-by-tier for every present day:
    // a tier the planner would refuse (range start TTL-expired) is exactly a
    // tier whose partition the store no longer has
    for (g <- Seq(Granularity.FULL, Granularity.MIN_5, Granularity.MIN_20, Granularity.MIN_60);
         d <- presentDays) {
      val plannerSkips = d < now - g.retentionMillis
      val stored = daysIn(store, Retention.tableFor(g)).contains(d)
      assert(plannerSkips === !stored,
        s"tier ${g.name} day ${(now - d) / 86400000L}d: plannerSkips=$plannerSkips stored=$stored")
    }
  }

  test("metrics_string ages on its own 365d clock, not the rollup ladder") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_ret_str").toString
    val oldDay = now - Retention.StringMetricsTtlMillis - 2 * 86400000L
    val freshDay = day(5) // 24 days old: expired for full(5d), fresh for strings
    Seq(("t1", "m1", oldDay + 10, "lvl_1", "label"),
      ("t1", "m1", freshDay + 10, "true", "label"))
      .toDF("tenant_id", "metric_name", "ts_ms", "value_str", "unit")
      .withColumn("ts_day", col("ts_ms") - pmod(col("ts_ms"), lit(86400000L)))
      .write.partitionBy("ts_day").parquet(s"$store/metrics_string")
    val dropped = Retention.enforce(spark, store, now)
    assert(dropped("metrics_string") === Seq(oldDay))
    assert(daysIn(store, "metrics_string") === Set(freshDay),
      "a day expired on the FULL ladder must survive the string TTL")
  }

  test("error sinks age by write time: old batch dirs dropped, fresh kept, emptied root pruned") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_retention_err").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    // two error batches per sink; make batch 0 look 20 days old
    for (table <- Retention.errorTables; b <- Seq(0L, 1L)) {
      Seq(("t1", b)).toDF("tenant_id", "batch")
        .write.parquet(s"$store/$table/batch_id=$b")
      if (b == 0L)
        fs.setTimes(new org.apache.hadoop.fs.Path(s"$store/$table/batch_id=0"),
          System.currentTimeMillis() - 20L * 86400000L, -1)
    }
    val dropped = Retention.enforceErrorSinks(spark, store,
      ttlMillis = 10L * 86400000L)
    assert(dropped === Retention.errorTables.map(_ -> Seq(0L)).toMap)
    for (table <- Retention.errorTables) {
      val rows = spark.read.parquet(s"$store/$table").collect()
      assert(rows.map(_.getLong(1)).toSeq === Seq(1L), s"$table keeps only batch 1")
    }
    // a second pass with everything expired removes the sink roots entirely
    // (no parquet-less husk for readers to trip on)
    val all = Retention.enforceErrorSinks(spark, store, ttlMillis = -1L)
    assert(all.values.forall(_ === Seq(1L)))
    for (table <- Retention.errorTables)
      assert(!Files.exists(Paths.get(s"$store/$table")), s"$table root pruned")
    // idempotent on an empty store
    assert(Retention.enforceErrorSinks(spark, store).isEmpty)
  }

  test("stale fused-ingest staging leaks are swept; a live writer's " +
    "fresh staging survives the grace") {
    val store = Files.createTempDirectory("graft_retention_stg").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    val now = System.currentTimeMillis()
    for ((name, ageMs) <- Seq(".staging-7" -> 2L * 86400000L,
        ".staging-9" -> 0L)) {
      val d = new org.apache.hadoop.fs.Path(s"$store/metrics_full/$name")
      fs.mkdirs(d)
      fs.create(new org.apache.hadoop.fs.Path(d, "part-junk"), true).close()
      fs.setTimes(d, now - ageMs, -1)
    }
    assert(Retention.sweepStaleStaging(spark, store, "metrics_full",
      now) === 1)
    assert(!Files.exists(Paths.get(s"$store/metrics_full/.staging-7")))
    assert(Files.exists(Paths.get(s"$store/metrics_full/.staging-9")),
      "in-grace staging must survive (a live writer may be filling it)")
    // absent table: clean no-op
    assert(Retention.sweepStaleStaging(spark, store, "preagg_raw", now) === 0)
  }
}
