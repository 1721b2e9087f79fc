package graft.streaming

import graft.SparkSuite
import graft.core.Granularity
import graft.operators.{Preaggregated, Rollups}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The stored rollup cascade: dirty-day incremental re-roll (the per-slot,
  * not whole-table, discipline of the reference's LocatorFetchRunnable
  * .java:92-129), numerically stable variance up the ladder, and the
  * kind-routed pre-aggregated ladder (RollupRunnable.java:162-178). */
class CascadeSpec extends AnyFunSuite with SparkSuite {

  private val day0 = 1704067200000L // 2024-01-01 00:00 UTC
  private def day(n: Int) = day0 + n * 86400000L

  /** (file name, last-modified) set for one ts_day partition directory. */
  private def partitionState(store: String, table: String, d: Long): Set[(String, Long)] = {
    // recursive: snapshot-published tiers nest files under ts_day=D/gen=N
    val dir = Paths.get(s"$store/$table/ts_day=$d")
    val st = Files.walk(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => (dir.relativize(p).toString, Files.getLastModifiedTime(p).toMillis))
      .toSet
    assert(st.nonEmpty, s"no part files under $dir — vacuous comparison")
    st
  }

  test("incremental cascade re-rolls only dirty days; other partitions untouched") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_casc_inc").toString
    def write5m(points: Seq[(String, String, Long, Double)]): Unit =
      Rollups.basicFromRaw(
          points.toDF("tenant_id", "metric_name", "ts_ms", "value"), Granularity.MIN_5)
        .withColumn("ts_day", col("bucket_ms") - pmod(col("bucket_ms"), lit(86400000L)))
        .write.mode("overwrite").partitionBy("ts_day")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$store/metrics_5m")

    val base = Seq(
      ("t1", "m1", day(0) + 10000, 1.0), ("t1", "m1", day(0) + 20000, 3.0),
      ("t1", "m1", day(1) + 10000, 5.0), ("t1", "m1", day(1) + 400000, 7.0),
      ("t1", "m1", day(2) + 10000, 9.0))
    write5m(base)
    IngestStream.rollupCascadeFor(spark, store) // full build

    val before1 = partitionState(store, "metrics_1440m", day(1))
    val before2 = partitionState(store, "metrics_1440m", day(2))

    // a late point lands in day 0 → only day 0 is dirty
    val late = ("t1", "m1", day(0) + 30000, 11.0)
    write5m(base :+ late) // day-partitioned dynamic overwrite rewrites day 0 only
    IngestStream.rollupCascadeFor(spark, store, dirtyDays = Some(Seq(day(0))))

    // untouched days: the exact same parquet files, byte-for-byte untouched
    assert(partitionState(store, "metrics_1440m", day(1)) === before1)
    assert(partitionState(store, "metrics_1440m", day(2)) === before2)

    // the dirty day converged to the direct aggregation of ALL points
    val t1440 = graft.core.SnapshotStore.read(spark, s"$store/metrics_1440m")
      .get
      .select("tenant_id", "metric_name", "bucket_ms", "num_points", "sum_v")
      .orderBy("bucket_ms").collect()
    val direct = Rollups.basicFromRaw(
        (base :+ late).toDF("tenant_id", "metric_name", "ts_ms", "value"),
        Granularity.MIN_1440)
      .select("tenant_id", "metric_name", "bucket_ms", "num_points", "sum_v")
      .orderBy("bucket_ms").collect()
    assert(t1440.toSeq === direct.toSeq)
  }

  test("bucketed 5m mirror: dirty-day maintenance writes THROUGH the bucket " +
    "spec; per-series reads plan with zero Exchange and match the plain tier") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_casc_bkt").toString
    val tdir = Files.createTempDirectory("graft_casc_bkt_t").toString
    def write5m(points: Seq[(String, String, Long, Double)]): Unit =
      Rollups.basicFromRaw(
          points.toDF("tenant_id", "metric_name", "ts_ms", "value"), Granularity.MIN_5)
        .withColumn("ts_day", col("bucket_ms") - pmod(col("bucket_ms"), lit(86400000L)))
        .write.mode("overwrite").partitionBy("ts_day")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$store/metrics_5m")
    val base = Seq(
      ("t1", "m1", day(0) + 10000, 1.0), ("t1", "m1", day(0) + 20000, 3.0),
      ("t2", "m2", day(0) + 40000, 2.0), ("t1", "m1", day(1) + 10000, 5.0),
      ("t2", "m2", day(1) + 70000, 4.0), ("t1", "m1", day(2) + 10000, 9.0))
    write5m(base)
    IngestStream.mirrorBucketed5m(spark, store, "bucketed_5m_spec",
      s"$tdir/t", nBuckets = 8)
    val t = graft.core.BucketedStore.table(spark, "bucketed_5m_spec")
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange (hash|range)partitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    // the whole point: a per-series stored-read aggregation over the hot
    // tier plans WITHOUT any shuffle Exchange
    val agg = t.groupBy("tenant_id", "metric_name")
      .agg(count(lit(1)).as("n"),
        sum(col("sum_v").cast("decimal(38,8)")).as("s"),
        max("max_v").as("mx"))
    assert(shuffles(agg) === 0, agg.queryExecution.executedPlan.toString)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("tenant_id", "metric_name", "bucket_ms", "num_points",
        "sum_v", "avg_v", "min_v", "max_v", "var_v", "ts_day")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val plain = spark.read.parquet(s"$store/metrics_5m")
    assert(rows(t) === rows(plain), "mirror must hold the exact tier rows")
    // ... while the same aggregation over the plain tier pays a shuffle
    assert(shuffles(plain.groupBy("tenant_id", "metric_name")
      .agg(count(lit(1)).as("n"))) >= 1)

    // incremental maintenance: a late point dirties day 0 only; the mirror
    // rewrites exactly that partition (still bucketed), other days' files
    // are byte-for-byte untouched
    val before1 = partitionState(tdir, "t", day(1))
    val before2 = partitionState(tdir, "t", day(2))
    val late = ("t1", "m1", day(0) + 30000, 11.0)
    write5m(base :+ late)
    IngestStream.mirrorBucketed5m(spark, store, "bucketed_5m_spec",
      s"$tdir/t", nBuckets = 8, dirtyDays = Some(Seq(day(0))))
    assert(partitionState(tdir, "t", day(1)) === before1)
    assert(partitionState(tdir, "t", day(2)) === before2)
    assert(rows(graft.core.BucketedStore.table(spark, "bucketed_5m_spec"))
      === rows(spark.read.parquet(s"$store/metrics_5m")))
    // the refreshed table still plans shuffle-free
    val agg2 = graft.core.BucketedStore.table(spark, "bucketed_5m_spec")
      .groupBy("tenant_id", "metric_name").agg(count(lit(1)).as("n"))
    assert(shuffles(agg2) === 0, agg2.queryExecution.executedPlan.toString)
    // a mismatched re-register fails loudly (the BucketedStore.register rule)
    intercept[IllegalArgumentException] {
      IngestStream.mirrorBucketed5m(spark, store, "bucketed_5m_spec",
        s"$tdir/t", nBuckets = 64)
    }
  }

  test("cascade variance is numerically stable at huge means (never negative)") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_casc_stable").toString
    // |mean| >> stddev: the expanded-form combine loses all significant
    // digits here and can go negative; the grand-mean form must not.
    val pts = (0 until 48).map { i =>
      ("t1", "m1", day(0) + i * 1800000L, 1.0e8 + (i % 3) * 0.01)
    }
    Rollups.basicFromRaw(
        pts.toDF("tenant_id", "metric_name", "ts_ms", "value"), Granularity.MIN_5)
      .withColumn("ts_day", col("bucket_ms") - pmod(col("bucket_ms"), lit(86400000L)))
      .write.partitionBy("ts_day").parquet(s"$store/metrics_5m")
    IngestStream.rollupCascadeFor(spark, store)
    for (tier <- Seq("20m", "60m", "240m", "1440m")) {
      val vars = spark.read.parquet(s"$store/metrics_$tier")
        .select("var_v").as[Double].collect()
      assert(vars.forall(_ >= 0.0), s"negative variance in $tier tier")
    }
    // and the 1440m variance is actually right (true pop-var of the cycle of
    // offsets {0, .01, .02} repeated 16x)
    val v = spark.read.parquet(s"$store/metrics_1440m").select("var_v").as[Double].head()
    val offs = (0 until 48).map(i => (i % 3) * 0.01)
    val mu = offs.sum / offs.size
    val trueVar = offs.map(o => (o - mu) * (o - mu)).sum / offs.size
    assert(math.abs(v - trueVar) < 1e-7, s"var_v=$v truth=$trueVar")
  }

  test("kind-routed preagg cascade materializes each kind's ladder with its own algebra") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_casc_preagg").toString
    def payload(ts: Long, flushMs: Long, ctr: (Double, Double), timer: String,
        gauge: Double, set: String): String =
      s"""{"tenant_id":"t1","timestamp":$ts,"flushInterval":$flushMs,
         |"counters":[{"name":"c1","value":${ctr._1},"rate":${ctr._2}}],
         |"timers":[{"name":"tm1",$timer}],
         |"gauges":[{"name":"g1","latest":$gauge}],
         |"sets":[{"name":"s1","values":$set}]}""".stripMargin.replaceAll("\n", "")
    val lines = Seq(
      payload(day(0) + 10000, 10000L, (100.0, 10.0),
        """"count":4,"sum":40.0,"min":5.0,"max":15.0,"rate":2.0,"percentiles":{"50":9.0,"95":14.0}""",
        42.0, "[1,2,3]"),
      payload(day(0) + 200000, 10000L, (300.0, 15.0),
        """"count":6,"sum":90.0,"min":3.0,"max":30.0,"rate":3.0,"percentiles":{"50":12.0,"95":28.0}""",
        43.5, "[3,4]"),
      payload(day(0) + 1300000, 0L, (50.0, 5.0),
        """"count":2,"sum":10.0,"min":4.0,"max":6.0,"rate":1.0,"percentiles":{"50":5.0,"95":6.0}""",
        41.0, "[9]"))
      .toDF("value")
    val parsed = Preaggregated.fromAggregatedJson(lines)

    // counter sampleCount = trunc(rate × flushInterval/1000); 1 when flushInterval absent/0
    val sc = parsed.filter(col("kind") === "counter")
      .select(col("ts_ms"), col("counter.sample_count")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sc === Map((day(0) + 10000) -> 100L, (day(0) + 200000) -> 150L, (day(0) + 1300000) -> 1L))

    IngestStream.writePreaggTier1(parsed, store)
    IngestStream.preaggCascadeFor(spark, store)

    // counter 20m: flushes at +10s and +200s share a 20m bucket; total-time
    // rate = (100+300)/(100/10 + 300/15) = 400/30; +1300s in the next bucket
    val c20 = spark.read.parquet(s"$store/preagg_counter_20m")
      .orderBy("bucket_ms").collect()
    assert(c20.length === 2)
    assert(c20(0).getAs[Double]("count") === 400.0)
    assert(math.abs(c20(0).getAs[Double]("rate") - 400.0 / 30.0) < 1e-9)
    assert(c20(0).getAs[Long]("sample_count") === 250L)
    assert(c20(1).getAs[Double]("count") === 50.0)
    assert(c20(1).getAs[Long]("sample_count") === 1L)

    // counter 1440m folds both buckets; sample counts keep adding up the ladder
    val c1440 = spark.read.parquet(s"$store/preagg_counter_1440m").collect()
    assert(c1440.length === 1)
    assert(c1440(0).getAs[Double]("count") === 450.0)
    assert(c1440(0).getAs[Long]("sample_count") === 251L)

    // timer 20m: observed-time rate (4/2 + 6/3 = 4s observed → 10/4), NOT
    // count over the 1200s span; percentile means merge unweighted
    val t20 = spark.read.parquet(s"$store/preagg_timer_20m")
      .orderBy("bucket_ms").collect()
    assert(t20(0).getAs[Long]("count") === 10L)
    assert(math.abs(t20(0).getAs[Double]("rate") - 10.0 / 4.0) < 1e-9)
    assert(t20(0).getAs[Double]("min") === 3.0)
    assert(t20(0).getAs[Double]("max") === 30.0)
    val pmap = t20(0).getAs[Map[String, Double]]("percentiles")
    assert(math.abs(pmap("50") - 10.5) < 1e-9) // avg(9, 12)
    assert(math.abs(pmap("95") - 21.0) < 1e-9) // avg(14, 28)

    // gauge 1440m: latest value by max ts; min/max across all flushes
    val g1440 = spark.read.parquet(s"$store/preagg_gauge_1440m").collect()
    assert(g1440.length === 1)
    assert(g1440(0).getAs[Double]("latest_v") === 41.0)
    assert(g1440(0).getAs[Long]("latest_ts") === day(0) + 1300000)
    assert(g1440(0).getAs[Double]("min_v") === 41.0)
    assert(g1440(0).getAs[Double]("max_v") === 43.5)
    assert(g1440(0).getAs[Long]("num_points") === 3L)

    // set 1440m: union of {1,2,3}, {3,4}, {9} = {1,2,3,4,9} → 5 distinct
    val s1440 = spark.read.parquet(s"$store/preagg_set_1440m").collect()
    assert(s1440.length === 1)
    assert(s1440(0).getAs[Int]("distinct_count") === 5)
  }

  test("statsd batch missing kinds: absent kinds are a no-op, not a cascade crash") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_casc_partial").toString
    // counters-only flush — real statsd traffic routinely omits sections
    val countersOnly = Seq(
      s"""{"tenant_id":"t1","timestamp":${day(0) + 10000},"flushInterval":10000,""" +
        """"counters":[{"name":"c1","value":100.0,"rate":10.0}]}""").toDF("value")
    IngestStream.processAggregatedBatch(
      Preaggregated.fromAggregatedJson(countersOnly), store, batchId = 0L, cascade = true)
    assert(spark.read.parquet(s"$store/preagg_counter_1440m").count() === 1)
    for (k <- Seq("gauge", "timer", "set"))
      assert(!Files.exists(Paths.get(s"$store/preagg_${k}_5m")),
        s"$k tier should be absent, not an empty unreadable dir")

    // a later sets-only flush re-dirtying the same day re-rolls BOTH the set
    // ladder (new) and the counter ladder (whose data lives in earlier
    // batches of preagg_raw, not in this flush)
    val setsOnly = Seq(
      s"""{"tenant_id":"t1","timestamp":${day(0) + 20000},""" +
        """"sets":[{"name":"s1","values":[1,2,3]}]}""").toDF("value")
    IngestStream.processAggregatedBatch(
      Preaggregated.fromAggregatedJson(setsOnly), store, batchId = 1L, cascade = true)
    assert(spark.read.parquet(s"$store/preagg_set_1440m")
      .head().getAs[Int]("distinct_count") === 3)
    assert(spark.read.parquet(s"$store/preagg_counter_1440m")
      .head().getAs[Double]("count") === 100.0)
    assert(!Files.exists(Paths.get(s"$store/preagg_timer_5m")))
  }

  test("relative epoch window tracks the clock across a long-lived stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = Files.createTempDirectory("graft_casc_relwin").toString
    val ckpt = Files.createTempDirectory("graft_casc_relwin_ck").toString
    def flush(ts: Long) =
      s"""{"tenant_id":"t1","timestamp":$ts,"flushInterval":10000,""" +
        """"counters":[{"name":"c1","value":100.0,"rate":10.0}]}"""
    var now = day(20)
    val mem = MemoryStream[String]
    val q = IngestStream.startAggregated(mem.toDF(), store, ckpt,
      cascade = false, maxAgeMs = Some(10L * 86400000L), nowMs = () => now)
    // 8 days old at the current clock: inside the 10-day window
    mem.addData(flush(day(12)))
    q.processAllAvailable()
    // the clock advances 15 days; a flush of the SAME age-at-write is now
    // 23 days old. A static minTs captured at stream start would accept
    // it; the per-batch relative bound must reject it.
    now = day(35)
    mem.addData(flush(day(12) + 1000))
    q.processAllAvailable()
    q.stop()
    val rawRows = spark.read.parquet(s"$store/preagg_raw")
      .select("ts_ms").collect().map(_.getLong(0)).toSet
    assert(rawRows === Set(day(12)), "only the in-window flush lands in raw")
    val errs = spark.read.parquet(s"$store/preagg_errors")
      .select("ts_ms").collect().map(_.getLong(0)).toSet
    assert(errs === Set(day(12) + 1000), "the aged-out flush is rejected, not dropped")
  }

  test("stale flush outside the epoch window is rejected, not re-dirtying pruned days") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_casc_stale").toString
    // day(20) is "current"; day(0) is past the preagg_raw TTL horizon
    val minTs = day(15)
    val fresh =
      s"""{"tenant_id":"t1","timestamp":${day(20) + 10000},"flushInterval":10000,""" +
        """"counters":[{"name":"c1","value":100.0,"rate":10.0}]}"""
    val stale =
      s"""{"tenant_id":"t1","timestamp":${day(0) + 10000},"flushInterval":10000,""" +
        """"counters":[{"name":"c1","value":999.0,"rate":10.0}]}"""
    IngestStream.processAggregatedBatch(
      Preaggregated.fromAggregatedJson(Seq(fresh, stale).toDF("value")),
      store, batchId = 0L, cascade = true, minTs = minTs)
    // only the fresh day materialized anywhere in the ladder
    for (tier <- Seq("5m", "1440m")) {
      val days = spark.read.parquet(s"$store/preagg_counter_$tier")
        .select("ts_day").distinct().collect().map(_.getLong(0)).toSet
      assert(days === Set(day(20)), s"tier $tier has $days")
    }
    // the stale flush is visible in the errors sink, not silently dropped
    val errs = spark.read.parquet(s"$store/preagg_errors").collect()
    assert(errs.length === 1 && errs(0).getAs[Long]("ts_ms") === day(0) + 10000)
    // and preagg_raw holds only in-window rows → no pruned-day re-dirty ever
    val rawDays = spark.read.parquet(s"$store/preagg_raw")
      .select("ts_day").distinct().collect().map(_.getLong(0)).toSet
    assert(rawDays === Set(day(20)))

    // an all-stale batch is a clean no-op on the tiers
    IngestStream.processAggregatedBatch(
      Preaggregated.fromAggregatedJson(Seq(stale).toDF("value")),
      store, batchId = 1L, cascade = true, minTs = minTs)
    assert(spark.read.parquet(s"$store/preagg_counter_1440m").count() === 1)
  }

  test("dirty-day slice empty for a kind: ladder breaks instead of writing a husk tier") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_casc_husk").toString
    // counters flushed on day 0, cascade OFF → only preagg_counter_5m exists
    val countersDay0 =
      s"""{"tenant_id":"t1","timestamp":${day(0) + 10000},"flushInterval":10000,""" +
        """"counters":[{"name":"c1","value":100.0,"rate":10.0}]}"""
    IngestStream.processAggregatedBatch(
      Preaggregated.fromAggregatedJson(Seq(countersDay0).toDF("value")),
      store, batchId = 0L, cascade = false)
    assert(!Files.exists(Paths.get(s"$store/preagg_counter_20m")))

    // a sets-only flush for a NEW day: counter's dirty-day slice is empty
    // and its 20m dir doesn't exist yet — must not create a parquet-less dir
    // (which the next hop's schema inference would crash on)
    val setsDay1 =
      s"""{"tenant_id":"t1","timestamp":${day(1) + 10000},""" +
        """"sets":[{"name":"s1","values":[1,2,3]}]}"""
    IngestStream.processAggregatedBatch(
      Preaggregated.fromAggregatedJson(Seq(setsDay1).toDF("value")),
      store, batchId = 1L, cascade = true)
    assert(!Files.exists(Paths.get(s"$store/preagg_counter_20m")),
      "empty dirty slice must skip the tier write entirely")
    // the set ladder for the dirty day still built normally
    assert(spark.read.parquet(s"$store/preagg_set_1440m")
      .head().getAs[Int]("distinct_count") === 3)
  }
}
