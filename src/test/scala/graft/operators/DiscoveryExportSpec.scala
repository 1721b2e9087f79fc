package graft.operators

import graft.SparkSuite
import graft.core.{Granularity, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class DiscoveryExportSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("glob search matches only the globbed names with units") {
    val out = Discovery.globSearch(Tables.catalog(spark, dir), "click", "app.click.user_1*")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0).startsWith("app.click.user_1"))
      assert(r.getString(1) === "count")
    }
  }

  test("token hierarchy has 3 levels with correct leaf flags") {
    val toks = Discovery.tokens(Tables.catalog(spark, dir)).collect()
    val parents = toks.map(_.getString(0)).toSet
    assert(parents.contains("")) // root level
    assert(toks.filter(_.getString(0) == "").forall(!_.getBoolean(2))) // root isn't leaf
    assert(toks.filter(_.getBoolean(2)).forall(_.getString(1).startsWith("user_")))
  }

  test("metric name browse returns next level with completeness flag") {
    val out = Discovery.metricNameBrowse(Tables.catalog(spark, dir), "click", "app.*")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) === "app.click") // only this tenant's subtree
      assert(!r.getBoolean(1)) // app.click is a prefix, not a complete name
    }
  }

  test("eventSearch matches events with NULL props (rlike on NULL would " +
    "silently drop them even under an empty tags query)") {
    import spark.implicits._
    val events = Seq(
      ("t1", 1L, 1000L, "deploy", "release build"),
      ("t1", 2L, 2000L, "restart", null))
      .toDF("tenant_id", "event_id", "ts_ms", "event_type", "props")
    val all = Discovery.eventSearch(events, 0L, 10000L, "")
      .select("event_id").as[Long].collect().toSeq
    assert(all === Seq(1L, 2L),
      "a null-props event must match the empty tags filter")
    // a concrete tag still prunes to the matching event only
    val tagged = Discovery.eventSearch(events, 0L, 10000L, "release")
      .select("event_id").as[Long].collect().toSeq
    assert(tagged === Seq(1L))
  }

  test("export then backfill reproduces the 5m rollup") {
    val tmp = Files.createTempDirectory("graft_export").toString
    val pts = Tables.metrics(spark, dir).withColumn("bucket_ms", col("ts_ms"))
    Export.exportJson(pts.select("tenant_id", "metric_name", "ts_ms", "value", "bucket_ms"), tmp)
    val rebuilt = Export.backfillFromExport(spark, tmp, Granularity.MIN_5)
      .select("tenant_id", "metric_name", "bucket_ms", "num_points")
      .orderBy("tenant_id", "metric_name", "bucket_ms").collect()
    val direct = Rollups.basicFromRaw(Tables.metrics(spark, dir), Granularity.MIN_5)
      .select("tenant_id", "metric_name", "bucket_ms", "num_points")
      .orderBy("tenant_id", "metric_name", "bucket_ms").collect()
    assert(rebuilt.length === direct.length)
    rebuilt.zip(direct).foreach { case (a, b) => assert(a === b) }
  }

  test("writeShards materializes the token-balanced layout, one dir per shard") {
    val tmp = Files.createTempDirectory("graft_shards").toString
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val nShards = Export.writeShards(docs, tmp, tokensPerShard = 2000L)
    assert(nShards >= 2, s"expected multiple shards, got $nShards")
    // physical layout: one shard_id=N directory per shard
    val dirs = new java.io.File(tmp).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(dirs.length.toLong === nShards)
    val back = spark.read.parquet(tmp)
    // every doc exactly once, assignments identical to the operator's
    assert(back.count() === docs.count())
    val expect = graft.operators.Sampling.shardByTokens(docs,
        org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextFunctions.tokenCountBpe(
          org.apache.spark.sql.functions.col("text")), 2000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // partition-column inference narrows shard_id to int on read-back
    val got = back.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("shard_id").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("incremental cascade tiers equal direct aggregation") {
    val store = Files.createTempDirectory("graft_cascade").toString
    val pts = Tables.metrics(spark, dir)
    Rollups.basicFromRaw(pts, Granularity.MIN_5)
      .withColumn("ts_day", col("bucket_ms") - pmod(col("bucket_ms"), lit(86400000L)))
      .write.partitionBy("ts_day").parquet(s"$store/metrics_5m")
    graft.streaming.IngestStream.rollupCascadeFor(spark, store)
    val t1440 = spark.read.parquet(s"$store/metrics_1440m")
      .select("tenant_id", "metric_name", "bucket_ms", "num_points")
      .orderBy("tenant_id", "metric_name", "bucket_ms").collect()
    val direct = Rollups.basicFromRaw(pts, Granularity.MIN_1440)
      .select("tenant_id", "metric_name", "bucket_ms", "num_points")
      .orderBy("tenant_id", "metric_name", "bucket_ms").collect()
    assert(t1440.length === direct.length)
    t1440.zip(direct).foreach { case (a, b) => assert(a === b) }
  }
}
