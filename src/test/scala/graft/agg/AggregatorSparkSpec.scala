package graft.agg

import graft.SparkSuite
import graft.core.{Granularity, Tables}
import graft.operators.Rollups
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom Aggregators executed by Spark itself (functions.udaf), not
  * just unit-called — proves the Encoders and partial-merge path work under
  * real partitioned execution, and that the typed path agrees with the
  * declarative DataFrame merge. */
class AggregatorSparkSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("TimerMergeAggregator as a UDAF matches the declarative timer merge") {
    import spark.implicits._
    val t5 = Rollups.timerFromRaw(Tables.metrics(spark, dir), Granularity.MIN_5)
    val partials = t5.select(
      col("tenant_id"), col("metric_name"),
      Tables.bucketMs(col("bucket_ms"), Granularity.MIN_60).as("bucket_ms"),
      col("num_points"), col("sum_v"), col("min_v"), col("max_v"),
      col("p50"), col("p95"))
    // udaf() flattens the case-class input: one arg per TimerPartial field
    val viaUdaf = partials
      .groupBy("tenant_id", "metric_name", "bucket_ms")
      .agg(udaf(TimerMergeAggregator).apply(col("num_points"), col("sum_v"),
        col("min_v"), col("max_v"), col("p50"), col("p95")).as("t"))
      .select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
        col("t.count").as("num_points"), col("t.p50"), col("t.p95"))
      .orderBy("tenant_id", "metric_name", "bucket_ms")
      .collect()
    val declarative = Rollups.timerMerge(t5, Granularity.MIN_60)
      .select("tenant_id", "metric_name", "bucket_ms", "num_points", "p50", "p95")
      .orderBy("tenant_id", "metric_name", "bucket_ms")
      .collect()
    assert(viaUdaf.length === declarative.length)
    viaUdaf.zip(declarative).foreach { case (a, b) =>
      assert(a.getLong(3) === b.getLong(3))
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-9)
      assert(math.abs(a.getDouble(5) - b.getDouble(5)) < 1e-9)
    }
  }

  test("SetRollupAggregator as a UDAF matches countDistinct") {
    import spark.implicits._
    val pts = Tables.metrics(spark, dir)
      .select(col("tenant_id"),
        Tables.bucketMs(col("ts_ms"), Granularity.MIN_1440).as("bucket_ms"),
        hash(col("value")).as("h"))
    val viaUdaf = pts
      .groupBy("tenant_id", "bucket_ms")
      .agg(udaf(SetRollupAggregator).apply(col("h")).as("n"))
      .orderBy("tenant_id", "bucket_ms").collect()
    val direct = pts
      .groupBy("tenant_id", "bucket_ms")
      .agg(countDistinct(col("h")).as("n"))
      .orderBy("tenant_id", "bucket_ms").collect()
    assert(viaUdaf.length === direct.length)
    viaUdaf.zip(direct).foreach { case (a, b) =>
      assert(a.getLong(2) === b.getLong(2))
    }
  }

  test("counterFromRaw and statProjection library ops") {
    val c = Rollups.counterFromRaw(Tables.metrics(spark, dir), Granularity.MIN_20)
    assert(c.columns.toSeq ===
      Seq("tenant_id", "metric_name", "bucket_ms", "sample_count", "count_sum", "rate"))
    assert(c.count() > 0)
    val basic = Rollups.basicFromRaw(Tables.metrics(spark, dir), Granularity.MIN_60)
    val proj = Rollups.statProjection(basic, Seq("avg_v", "num_points"))
    assert(proj.columns.toSeq ===
      Seq("tenant_id", "metric_name", "bucket_ms", "avg_v", "num_points"))
  }
}
