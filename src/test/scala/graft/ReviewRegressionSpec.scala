package graft

import graft.core.{Granularity, Tables}
import graft.functions.VectorFunctions
import graft.operators.{Discovery, Rollups}
import graft.query.MetricsQueryApi
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Regressions for defects found in the round-1 review pass. */
class ReviewRegressionSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"
  private val now = 1706659200000L

  test("FULL-resolution points query serves raw samples, not buckets") {
    // 1h window, enough points that GEOMETRIC picks FULL; from NOT 5m-aligned.
    // Reference parity (RollupType.classOf → SimpleNumber at FULL): every
    // row is a raw sample — its own timestamp, numPoints 1, stats = value.
    val fromMs = 1704880920000L // 2024-01-10 10:02
    val toMs = 1704884520000L   // 2024-01-10 11:02
    val df = MetricsQueryApi.getRollups(spark, dir,
      MetricsQueryApi.Params("click", "app.click.*", "10:02 20240110", "11:02 20240110",
        points = Some(120), select = Seq("average", "numPoints", "sum")),
      nowMillis = toMs)
    val raw = Tables.metricsRange(spark, dir, Some((fromMs, toMs)))
      .filter(col("tenant_id") === "click")
      .select("ts_ms").collect().map(_.getLong(0)).sorted
    assert(raw.nonEmpty) // the window must actually exercise the raw branch
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("bucket_ms")).sorted === raw)
    rows.foreach { r =>
      assert(r.getAs[Long]("num_points") === 1L)
      assert(r.getAs[Double]("sum_v") === r.getAs[Double]("average"))
    }
  }

  test("DotProduct matches the HOF idiom on unequal lengths and null elements") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)), // unequal length
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))       // normal
      .toDF("a", "b")
    val rows = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect()
    assert(rows(0).isNullAt(0))       // unequal length -> NULL (like zip_with pad)
    assert(rows(1).getDouble(0) === 11.0)
  }

  test("metricNameBrowse glob is end-anchored per token prefix") {
    import spark.implicits._
    val cat = Seq(
      ("t", "foo.a.baz", "u", "basic"),
      ("t", "foo.a.bazX", "u", "basic"),
      ("t", "foo.a.baz.deep", "u", "basic"))
      .toDF("tenant_id", "metric_name", "unit", "rollup_type")
    val out = Discovery.metricNameBrowse(cat, "t", "foo.*.baz").collect()
    assert(out.map(_.getString(0)).toSet === Set("foo.a.baz"))
    // the 3-token prefix of foo.a.baz.deep is foo.a.baz (a prefix, not complete)
    assert(out.exists(r => r.getString(0) == "foo.a.baz"))
  }

  test("bucketMs(FULL) passes timestamps through") {
    val pts = Tables.metrics(spark, dir).limit(10)
    val out = pts.select(col("ts_ms"),
      Tables.bucketMs(col("ts_ms"), Granularity.FULL).as("b")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("replayed ingest micro-batch does not duplicate points") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_retry").toString
    val base = 1704067200000L
    val batch = graft.streaming.IngestStream.withValidity(
      Seq(("t1", "m1", base + 1000, 2.0, 300, "ms"))
        .toDF("tenant_id", "metric_name", "ts_ms", "value", "ttl_seconds", "unit"),
      0L, Long.MaxValue)
    graft.streaming.IngestStream.processBatch(batch, store, batchId = 7L)
    graft.streaming.IngestStream.processBatch(batch, store, batchId = 7L) // retry
    val rolled = graft.core.SnapshotStore.read(spark, s"$store/metrics_5m")
      .get.collect()
    assert(rolled.length === 1)
    assert(rolled(0).getAs[Long]("num_points") === 1L) // not double-counted
  }

  test("JSON response escapes quotes and backslashes in names") {
    import spark.implicits._
    val df = Seq(("t", "a\"b\\c", "u\"nit", 0L, 1L))
      .toDF("tenant_id", "metric_name", "unit", "bucket_ms", "num_points")
    val json = MetricsQueryApi.toJsonResponse(df)
    val parsed = spark.read.json(
      spark.createDataset(Seq(json))(org.apache.spark.sql.Encoders.STRING))
    assert(!parsed.columns.contains("_corrupt_record"), s"unparseable: $json")
  }

  test("HyperplaneBands ignores leftover planes when bandBits does not divide nBits") {
    import spark.implicits._
    // nBits = 5, bandBits = 2 → 2 bands from planes 0..3; plane 4 unused.
    // Planes chosen so signs are unambiguous: plane j = (+1,+1) for even j,
    // (-1,+0.5) for odd j. v = (1, 0.5): dots +1.5, -0.75, +1.5, -0.75,
    // +1.5 → bits 1,0,1,0 → bands [0b01, 0b01] = [1, 1].
    val planes = Array(1.0, 1.0, -1.0, 0.5, 1.0, 1.0, -1.0, 0.5, 1.0, 1.0)
    def bandsOf(vec: Seq[Double], bandBits: Int): Seq[Long] = {
      val df = Seq(Tuple1(vec)).toDF("v")
      val c = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.HyperplaneBands(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("v")),
          planes, 2, bandBits))
      df.select(c.as("b")).collect()(0).getSeq[Long](0)
    }
    // formerly ArrayIndexOutOfBoundsException (loop ran to nBits writing
    // keys(nBands)); composed-form semantics drop the leftover plane
    assert(bandsOf(Seq(1.0, 0.5), 2) === Seq(1L, 1L))
    // divisible case unchanged: 5 bands of 1 bit each
    assert(bandsOf(Seq(1.0, 0.5), 1) === Seq(1L, 0L, 1L, 0L, 1L))
  }

  test("selectByTokenBudget drops zero-token docs past exact budget exhaustion; null-safe") {
    import spark.implicits._
    import graft.operators.Sampling
    // one bucket, tokens 50+50 exhaust budget=100 exactly; doc 3 has zero
    // tokens and sorts after them — its strictly-better prefix equals the
    // budget, so the greedy rule drops it (formerly whole-bucket-kept)
    val df = Seq((1L, 0.5, 50L), (2L, 0.5, 50L), (3L, 0.5, 0L))
      .toDF("doc_id", "q", "t")
    val got = Sampling.selectByTokenBudget(df, col("q"), col("t"), 100L,
      nBuckets = 8).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
    // null quality/tokens: worst bucket + zero tokens, not an NPE
    val withNulls = Seq((1L, Some(0.9), Some(60L)), (2L, None, None),
        (3L, Some(0.1), Some(60L)))
      .toDF("doc_id", "q", "t")
    val sel = Sampling.selectByTokenBudget(withNulls, col("q"), col("t"), 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel === Set(1L, 3L)) // null-q doc is worst; budget exhausts before it
  }

  test("DocumentStream.pairsStore serves empty before the first batch commits") {
    val store = Files.createTempDirectory("graft_empty_pairs").toString
    val df = graft.streaming.DocumentStream.pairsStore(spark, store)
    assert(df.columns.toSeq ===
      Seq("doc_id_1", "doc_id_2", "jaccard", "batch_id"))
    assert(df.count() === 0L)
  }
}
