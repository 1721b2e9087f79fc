package graft.query

import graft.SparkSuite
import graft.core.Granularity
import org.scalatest.funsuite.AnyFunSuite

class MetricsQueryApiSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"
  private val now = 1706659200000L // 2024-01-31, pins datetime + retention

  test("points-mode query end to end: glob resolve, auto resolution, stats") {
    val df = MetricsQueryApi.getRollups(spark, dir,
      MetricsQueryApi.Params(
        tenantId = "purchase",
        metricGlob = "app.purchase.*",
        from = "20240103", to = "20240123",
        points = Some(200)),
      nowMillis = now)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // defaults absent → the union of needed stats + per-metric stat_set
    assert(df.columns.toSeq ===
      Seq("tenant_id", "metric_name", "unit", "bucket_ms", "average", "num_points", "sum_v", "stat_set"))
    // buckets are 240m-aligned (GEOMETRIC pick for 200 pts over 20 days)
    rows.foreach(r => assert(r.getAs[Long]("bucket_ms") % Granularity.MIN_240.millis === 0))
    assert(rows.forall(r => r.getAs[String]("unit") == "dollars"))
  }

  test("explicit resolution + graphite datetime with offsets") {
    val df = MetricsQueryApi.getRollups(spark, dir,
      MetricsQueryApi.Params(
        tenantId = "click",
        metricGlob = "app.click.*",
        from = "00:00 20240110-5d", to = "00:00 20240110+10d",
        points = None, resolution = Some(Granularity.MIN_1440),
        select = Seq("numPoints", "min", "max")),
      nowMillis = now)
    assert(df.columns.toSeq ===
      Seq("tenant_id", "metric_name", "unit", "bucket_ms", "num_points", "min_v", "max_v"))
    assert(df.count() > 0)
  }

  test("batch width guard rejects too-wide globs") {
    val wide = intercept[IllegalArgumentException] {
      MetricsQueryApi.getRollups(spark, dir,
        MetricsQueryApi.Params("click", "app.click.*", "20240101", "20240130",
          points = Some(10)), nowMillis = now, maxBatch = 5)
    }
    assert(wide.getMessage.contains("batch query resolves"))
  }

  test("JSON response has the reference output shape") {
    val df = MetricsQueryApi.getRollups(spark, dir,
      MetricsQueryApi.Params("purchase", "app.purchase.user_1?", "20240103", "20240123",
        points = Some(50)), nowMillis = now)
    val json = MetricsQueryApi.toJsonResponse(df)
    assert(json.contains("\"values\""))
    assert(json.contains("\"timestamp\""))
    assert(json.contains("\"unit\": \"dollars\""))
    assert(json.contains("\"metadata\""))
    // must be parseable
    val parsed = spark.read.json(
      spark.createDataset(Seq(json))(org.apache.spark.sql.Encoders.STRING))
    assert(parsed.columns.contains("metrics"))
  }

  test("per-type default stats: counter tenants default to numPoints+sum") {
    val df = MetricsQueryApi.getRollups(spark, dir,
      MetricsQueryApi.Params("click", "app.click.user_1*", "20240110", "20240112",
        points = None, resolution = Some(graft.core.Granularity.MIN_1440)),
      nowMillis = now)
    assert(df.columns.toSeq ===
      Seq("tenant_id", "metric_name", "unit", "bucket_ms", "num_points", "sum_v", "stat_set"))
  }

  test("mixed-type glob: each metric gets ITS OWN default stat set") {
    import spark.implicits._
    // one tenant, two metrics of different catalog types — the reference
    // routes defaults per metric (PlotRequestParser + per-type serializer),
    // not per batch
    val cat = Seq(
      ("click", "app.click.user_1", "count", "counter"),
      ("click", "app.click.user_2", "count", "basic"))
      .toDF("tenant_id", "metric_name", "unit", "rollup_type")
    val df = MetricsQueryApi.getRollups(spark, dir,
      MetricsQueryApi.Params("click", "app.click.user_[12]", "20240103", "20240129",
        points = None, resolution = Some(graft.core.Granularity.MIN_1440)),
      nowMillis = now, catalogOverride = Some(cat))
    // union of counter {numPoints,sum} and basic {average,numPoints,sum}
    assert(df.columns.toSet ===
      Set("tenant_id", "metric_name", "unit", "bucket_ms",
        "average", "num_points", "sum_v", "stat_set"))
    val sets = df.collect()
      .map(r => r.getAs[String]("metric_name") ->
        r.getSeq[String](r.fieldIndex("stat_set")).toSet).toMap
    assert(sets("app.click.user_1") === Set("num_points", "sum_v"))
    assert(sets("app.click.user_2") === Set("average", "num_points", "sum_v"))
    // and the JSON emits only each metric's own fields
    val json = MetricsQueryApi.toJsonResponse(df)
    val perMetric = json.split("\\{\"metric\": ").drop(1)
    val m1 = perMetric.find(_.startsWith("\"app.click.user_1\"")).get
    val m2 = perMetric.find(_.startsWith("\"app.click.user_2\"")).get
    assert(!m1.contains("\"average\"") && m1.contains("\"num_points\""))
    assert(m2.contains("\"average\"") && m2.contains("\"num_points\""))
  }

  test("golden JSON: response is byte-stable for a fixed query") {
    val df = MetricsQueryApi.getRollups(spark, dir,
      MetricsQueryApi.Params("purchase", "app.purchase.user_3", "20240103", "20240105",
        points = None, resolution = Some(graft.core.Granularity.MIN_1440),
        select = Seq("numPoints", "sum")), nowMillis = now)
    val json = MetricsQueryApi.toJsonResponse(df)
    val again = MetricsQueryApi.toJsonResponse(df)
    assert(json === again) // deterministic serialization
    assert(json.startsWith("""{"metrics": ["""))
    // shape: one metric, day-aligned timestamps
    assert("\"timestamp\": (\\d+)".r.findAllMatchIn(json)
      .forall(_.group(1).toLong % 86400000L == 0))
  }

  test("string/boolean points render as {\"value\": ...}: strings quoted, booleans bare") {
    import spark.implicits._
    val rollups = Seq(
      ("t1", "m.str", "label", 1000L, "lvl_2", false),
      ("t1", "m.str", "label", 2000L, "true", true),
      // a STRING metric whose text happens to be "true": stays quoted —
      // is_bool carries the original JSON type through the store
      ("t1", "m.str", "label", 3000L, "true", false))
      .toDF("tenant_id", "metric_name", "unit", "bucket_ms", "value_str", "is_bool")
    val json = MetricsQueryApi.toJsonResponse(rollups)
    assert(json.contains(""""value": "lvl_2""""), json)
    assert(json.contains(""""value": true"""), json)
    assert(json.contains(""""value": "true""""),
      "a string-typed \"true\" must stay quoted")
  }

  test("one of points/resolution is mandatory, exclusive") {
    intercept[IllegalArgumentException] {
      MetricsQueryApi.getRollups(spark, dir,
        MetricsQueryApi.Params("click", "app.click.*", "20240101", "20240102"),
        nowMillis = now)
    }
  }
}
