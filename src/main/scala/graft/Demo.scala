package graft

import graft.core.Granularity
import graft.query.MetricsQueryApi
import org.apache.spark.sql.SparkSession

/** End-to-end product demo: drives the whole engine the way a user would —
  * ingest a batch, run the rollup cascade, query through the API, print the
  * reference-shaped JSON. `runMain graft.Demo [sfDir]`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("== 1. ingest: batch of raw points -> day-partitioned store + 5m tier ==")
    val store = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val pts = graft.core.Tables.metrics(spark, sfDir)
    val batch = graft.streaming.IngestStream.withValidity(
      pts.withColumn("ttl_seconds", org.apache.spark.sql.functions.lit(86400))
        .withColumn("unit", org.apache.spark.sql.functions.lit("unknown")),
      minTs = 0L, maxTs = Long.MaxValue)
    graft.streaming.IngestStream.processBatch(batch, store)
    println(s"   5m windows: ${spark.read.parquet(s"$store/metrics_5m").count()}")

    println("== 2. cascade: 5m -> 20m -> 60m -> 240m -> 1440m ==")
    graft.streaming.IngestStream.rollupCascadeFor(spark, store)
    for (g <- Seq(Granularity.MIN_20, Granularity.MIN_60, Granularity.MIN_240, Granularity.MIN_1440))
      println(s"   ${g.name}: ${spark.read.parquet(s"$store/metrics_${g.name}").count()} windows")

    println("== 3. query API: points-mode, glob, units, default stats ==")
    val result = MetricsQueryApi.getRollups(spark, sfDir,
      MetricsQueryApi.Params("purchase", "app.purchase.user_1?", "20240103", "20240123",
        points = Some(50)),
      nowMillis = 1706659200000L)
    result.show(5, truncate = false)

    println("== 4. reference-shaped JSON response ==")
    val json = MetricsQueryApi.toJsonResponse(result)
    println(json.take(400) + (if (json.length > 400) " ..." else ""))

    println("== 5. SQL surface: custom expressions ==")
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb")
    spark.sql(
      """SELECT a.vec_id, b.vec_id AS other,
        |       dot_product(a.embedding, b.embedding) /
        |         (vec_norm(a.embedding) * vec_norm(b.embedding)) AS cos
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id IN (1, 2, 3)""".stripMargin)
      .show()
    spark.stop()
  }
}
