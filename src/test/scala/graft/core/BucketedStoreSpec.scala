package graft.core

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[BucketedStore]] — the write-once co-location contract: per-series
  * aggregation and same-bucketing joins must plan WITHOUT a shuffle
  * Exchange, and results must equal the unbucketed path exactly. */
class BucketedStoreSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Count shuffle exchanges in the (possibly adaptive) physical plan —
    * toString renders the full tree including AQE's inner plan, where
    * child traversal of AdaptiveSparkPlanExec would see nothing. */
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  private lazy val pts = Tables.metrics(spark, "/root/testdata/sf0.001")

  test("per-series aggregation off the bucketed table plans with zero shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    BucketedStore.write(pts, "bucketed_metrics_spec", s"$dir/t", nBuckets = 8)
    val t = BucketedStore.table(spark, "bucketed_metrics_spec")
    // exact-DECIMAL value sums: double sums would differ by partition
    // order between the two layouts, masking (or faking) a routing bug
    def perSeries(df: DataFrame) = df.groupBy("tenant_id", "metric_name")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).as("s"))
    val agg = perSeries(t)
    assert(shuffles(agg) === 0, agg.queryExecution.executedPlan.toString)
    // ... and both count AND content match the plain path
    def toMap(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDecimal(3))).toMap
    assert(toMap(agg) === toMap(perSeries(pts)))
    // the unbucketed plan DOES shuffle — the contrast that proves the point
    assert(shuffles(plain0) >= 1)
  }

  private lazy val plain0 = pts.groupBy("tenant_id", "metric_name")
    .agg(count(lit(1)).as("n"))

  test("same-bucketing self-join plans with zero shuffles; " +
    "re-register restores the clustering after a catalog drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed2").toString
    BucketedStore.write(pts, "bucketed_join_spec", s"$dir/t", nBuckets = 8)
    val a = BucketedStore.table(spark, "bucketed_join_spec")
      .groupBy("tenant_id", "metric_name").agg(max("value").as("mx"))
    val b = BucketedStore.table(spark, "bucketed_join_spec")
      .groupBy("tenant_id", "metric_name").agg(min("value").as("mn"))
    val joined = a.join(b, Seq("tenant_id", "metric_name"))
    assert(shuffles(joined) === 0, joined.queryExecution.executedPlan.toString)
    assert(joined.count() === pts.select("tenant_id", "metric_name").distinct().count())

    // simulate catalog loss: drop the table entry, re-register, re-check
    spark.sql("DROP TABLE bucketed_join_spec")
    BucketedStore.register(spark, "bucketed_join_spec", s"$dir/t", nBuckets = 8)
    val re = BucketedStore.table(spark, "bucketed_join_spec")
      .groupBy("tenant_id", "metric_name").agg(count(lit(1)).as("n"))
    assert(shuffles(re) === 0, re.queryExecution.executedPlan.toString)
    assert(re.agg(sum("n")).head().getLong(0) === pts.count())
    // a mismatched re-register must FAIL LOUDLY: advertising the wrong
    // bucket count would elide exchanges against a non-matching layout
    intercept[IllegalArgumentException](
      BucketedStore.register(spark, "bucketed_join_spec", s"$dir/t",
        nBuckets = 64))
    // matching spec is idempotent
    BucketedStore.register(spark, "bucketed_join_spec", s"$dir/t", nBuckets = 8)
    // a FLAT table must not be claimed by registerPartitioned: its bucket
    // spec matches, but overwriteDays against a non-partitioned table
    // would truncate everything outside the dirty-day slice
    val e = intercept[IllegalArgumentException](
      BucketedStore.registerPartitioned(spark, "bucketed_join_spec",
        s"$dir/t", org.apache.spark.sql.types.StructType.fromDDL(
          "tenant_id STRING, metric_name STRING, bucket_ms BIGINT, ts_day BIGINT"),
        nBuckets = 8))
    assert(e.getMessage.contains("partitioned"))
  }

  test("dirty-day overwrites never fragment the mirror: per-day file count " +
    "is <= nBuckets and CONSTANT across re-rolls (no compaction arm needed)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed3").toString
    val nBuckets = 8
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "tenant_id STRING, metric_name STRING, bucket_ms BIGINT, " +
        "avg_v DOUBLE, ts_day BIGINT")
    BucketedStore.registerPartitioned(spark, "bucketed_mirror_spec",
      s"$dir/t", schema, nBuckets)
    val day = 19700L
    def slice(stamp: Double) = (0 until 500).map(i =>
        ("t", s"m_${i % 50}", day * 86400000L + i * 60000L, stamp + i, day))
      .toDF("tenant_id", "metric_name", "bucket_ms", "avg_v", "ts_day")
      .repartition(7) // deliberately task-misaligned input layout
    def dayFiles(): Int = {
      val d = new java.io.File(s"$dir/t/ts_day=$day")
      Option(d.listFiles()).map(_.count(_.getName.endsWith(".parquet")))
        .getOrElse(0)
    }
    BucketedStore.overwriteDays(spark, slice(0.0), "bucketed_mirror_spec")
    val first = dayFiles()
    assert(first > 0 && first <= nBuckets,
      s"bucket-hash alignment must bound the day at <= $nBuckets files, got $first")
    // three re-rolls of the SAME day: replaced, never accumulated
    for (i <- 1 to 3) {
      BucketedStore.overwriteDays(spark, slice(i * 1000.0), "bucketed_mirror_spec")
      assert(dayFiles() === first, s"re-roll $i changed the day's file count")
    }
    // the last re-roll's content won (dynamic overwrite replaced the day)
    val served = BucketedStore.table(spark, "bucketed_mirror_spec")
    assert(served.agg(min("avg_v")).head().getDouble(0) === 3000.0)
    assert(served.count() === 500)
    // and the mirror still serves its zero-shuffle contract after re-rolls
    val agg = served.groupBy("tenant_id", "metric_name")
      .agg(count(lit(1)).as("n"))
    assert(shuffles(agg) === 0, agg.queryExecution.executedPlan.toString)
  }
}
