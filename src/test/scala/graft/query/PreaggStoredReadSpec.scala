package graft.query

import graft.SparkSuite
import graft.core.Granularity
import graft.operators.Preaggregated
import graft.streaming.IngestStream
import org.scalatest.funsuite.AnyFunSuite

/** Kind-dispatched store-backed reads (reference: RollupHandler routes a
  * locator's read to its rollup_type's column family,
  * MetricsRWDelegator.java:79-113): [[MetricsQueryApi.getPreaggStored]] over
  * a statsd-ingest-built store serves each family from its own tier, repairs
  * missing days through the SAME ladder algebra the cascade used, and
  * recomputes the tail partial bucket instead of serving it stale.
  *
  * Values are small integers (and rates exactly 2.0), so every double sum
  * is exact in any partition order and comparisons can be string-exact. */
class PreaggStoredReadSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val day0 = 1704240000000L // 2024-01-03 00:00 UTC
  private val dayMs = 86400000L
  private val now = 1704931200000L // 2024-01-11

  /** One statsd flush per 15 minutes (96/day, misaligned with the 20m tier
    * so bucket populations vary), every kind in every flush. */
  private def flushJson(ts: Long, i: Int): String =
    s"""{"tenant_id":"t1","timestamp":$ts,"flushInterval":30000,""" +
      s""""gauges":[{"name":"g.one","latest":${(i % 7) + 1}}],""" +
      s""""counters":[{"name":"c.one","value":${(i % 5) + 1},"rate":2.0}],""" +
      s""""timers":[{"name":"tm.one","count":${(i % 3) + 1},"sum":${(i % 9) + 2},""" +
      s""""min":1,"max":${(i % 4) + 2},"rate":2.0,""" +
      s""""percentiles":{"p50":${(i % 6) + 1},"p95":${(i % 8) + 1}}}],""" +
      s""""sets":[{"name":"s.one","values":[${i % 4},${(i * 3) % 7}]}]}"""

  private lazy val store: String = {
    val s = java.nio.file.Files.createTempDirectory("graft_psr_").toString
    val lines = (for { d <- 0 until 2; i <- 0 until 96 }
      yield flushJson(day0 + d * dayMs + i * 900000L, i)).toDF("value")
    IngestStream.processAggregatedBatch(
      Preaggregated.fromAggregatedJson(lines), s) // cascade builds the ladders
    s
  }

  private val globs = Map("counter" -> "c.*", "gauge" -> "g.*",
    "timer" -> "tm.*", "set" -> "s.*")

  private def run(kind: String, to: String = "20240105",
      select: Seq[String] = Nil): Array[String] =
    MetricsQueryApi.getPreaggStored(spark, store,
      MetricsQueryApi.Params("t1", globs(kind), from = "20240103", to = to,
        points = None, resolution = Some(Granularity.MIN_20), select = select),
      kind, nowMillis = now)
      .collect().map(_.toString).sorted

  private def deleteDir(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  test("every family: stored ≡ missing-day repair ≡ full-ladder recompute") {
    for (kind <- Seq("counter", "gauge", "timer", "set")) {
      val full = run(kind)
      assert(full.nonEmpty, s"$kind returned nothing")
      // drop day 2 from the kind's 20m tier: that day must repair from
      // preagg_raw through the ladder, identically
      deleteDir(s"$store/preagg_${kind}_20m/ts_day=${day0 + dayMs}")
      assert(run(kind) === full, s"$kind: missing-day repair diverged")
      // drop the whole 20m tier: everything recomputes; still identical
      deleteDir(s"$store/preagg_${kind}_20m")
      assert(run(kind) === full, s"$kind: tier-less recompute diverged")
      // rebuild the tier for the next kinds' isolation (cheap at this size)
      IngestStream.preaggCascadeFor(spark, store, kinds = Seq(kind))
    }
  }

  test("FULL resolution serves each ingested flush as its own point") {
    // reference: RollupType.classOf returns the preagg rollup class itself
    // at FULL — statsd rollups are stored full-resolution, served as
    // ingested. Day 1 has 96 counter flushes at 15-min spacing; each must
    // come back under its own flush timestamp with its own value.
    val rows = MetricsQueryApi.getPreaggStored(spark, store,
      MetricsQueryApi.Params("t1", "c.*", from = "20240103", to = "20240104",
        points = None, resolution = Some(Granularity.FULL),
        select = Seq("sum")),
      "counter", nowMillis = now)
      .collect()
    assert(rows.length === 96)
    val got = rows.map(r =>
      (r.getAs[Long]("bucket_ms"), r.getAs[Double]("sum_v"))).sorted
    val want = (0 until 96)
      .map(i => (day0 + i * 900000L, ((i % 5) + 1).toDouble)).sorted
    assert(got === want)
  }

  test("counter values anchor to hand-computed sums; tail partial bucket is cut, not stale") {
    // bucket [Jan4 00:00, 00:20): flushes i=0 (00:00, value 1) and i=1
    // (00:15, value 2) → stored sum_v = 3
    val full = MetricsQueryApi.getPreaggStored(spark, store,
      MetricsQueryApi.Params("t1", "c.*", "20240103", "20240105",
        points = None, resolution = Some(Granularity.MIN_20),
        select = Seq("sum", "numPoints")),
      "counter", nowMillis = now).collect()
    val bucket = day0 + dayMs
    val storedRow = full.find(_.getAs[Long]("bucket_ms") == bucket).get
    assert(storedRow.getAs[Double]("sum_v") === 3.0)
    // truncating at 00:10 keeps only the 00:00 flush: the tail bucket is
    // recomputed from preagg_raw (sum 1), never served as the stored 3
    val cut = MetricsQueryApi.getPreaggStored(spark, store,
      MetricsQueryApi.Params("t1", "c.*", "20240103", "00:10_20240104",
        points = None, resolution = Some(Granularity.MIN_20),
        select = Seq("sum", "numPoints")),
      "counter", nowMillis = now).collect()
    val cutRow = cut.find(_.getAs[Long]("bucket_ms") == bucket).get
    assert(cutRow.getAs[Double]("sum_v") === 1.0)
    // counter numPoints = sample_count = floor(rate × flush/1000) = 60/flush
    assert(cutRow.getAs[Long]("num_points") === 60L)
  }

  test("tier-only preagg store (preagg_raw aged out at the finest-tier " +
    "TTL) still serves every family from its tiers") {
    // clone the store so the shared fixture survives for other tests
    val clone = java.nio.file.Files.createTempDirectory("graft_psr_t_").toString
    val src = new org.apache.hadoop.fs.Path(store)
    val dst = new org.apache.hadoop.fs.Path(clone)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, true,
      spark.sparkContext.hadoopConfiguration)
    val cstore = s"$clone/${src.getName}"
    val baseline = MetricsQueryApi.getPreaggStored(spark, cstore,
      MetricsQueryApi.Params("t1", "c.*", "20240103", "20240104",
        points = None, resolution = Some(Granularity.MIN_20),
        select = Seq("sum")), "counter", nowMillis = now)
      .collect().map(_.toString).sorted
    deleteDir(s"$cstore/preagg_raw")
    val got = MetricsQueryApi.getPreaggStored(spark, cstore,
      MetricsQueryApi.Params("t1", "c.*", "20240103", "20240104",
        points = None, resolution = Some(Granularity.MIN_20),
        select = Seq("sum")), "counter", nowMillis = now)
      .collect().map(_.toString).sorted
    assert(got === baseline,
      "a day-aligned tier-covered read must not need preagg_raw")
  }

  test("gauge family serves latest — the stat the basic store refuses") {
    val rows = MetricsQueryApi.getPreaggStored(spark, store,
      MetricsQueryApi.Params("t1", "g.*", "20240103", "20240104",
        points = None, resolution = Some(Granularity.MIN_20),
        select = Seq("latest", "numPoints")),
      "gauge", nowMillis = now).collect()
    assert(rows.nonEmpty)
    // bucket [00:00, 00:20) of Jan 3: flushes i=0 (latest 1) and i=1
    // (latest 2); the later flush wins
    val r0 = rows.find(_.getAs[Long]("bucket_ms") == day0).get
    assert(r0.getAs[Double]("latest_v") === 2.0)
    assert(r0.getAs[Long]("num_points") === 2L)
    // per-metric defaults (no select=) carry the gauge stat_set
    val dflt = MetricsQueryApi.getPreaggStored(spark, store,
      MetricsQueryApi.Params("t1", "g.*", "20240103", "20240104",
        points = None, resolution = Some(Granularity.MIN_20)),
      "gauge", nowMillis = now)
    assert(dflt.columns.contains("stat_set"))
    assert(dflt.select("stat_set").distinct().collect()(0).getSeq[String](0)
      === Seq("num_points", "latest_v"))
  }
}
