package graft.streaming

import graft.SparkSuite
import graft.core.Granularity
import graft.operators.Preaggregated
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S3 end-to-end as a stream: statsd aggregated payloads arrive as JSON
  * lines, parse into kind rows, and the counter kind merges up a tier with
  * the total-time rate formula — the streaming analog of the reference's
  * POST /ingest/aggregated path feeding its rollup cascade. */
class PreaggStreamSpec extends AnyFunSuite with SparkSuite {

  test("streamed statsd payloads merge to a 60m counter rollup") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    val parsed = Preaggregated.fromAggregatedJson(mem.toDF().select(col("value")))
    val q = parsed.writeStream.outputMode("append")
      .format("memory").queryName("preagg_rows").start()
    def payload(ts: Long, count: Double, rate: Double): String =
      s"""{"tenant_id":"t1","timestamp":$ts,"counters":[{"name":"c1","value":$count,"rate":$rate}]}"""
    mem.addData(payload(0L, 100.0, 10.0))        // 10s of counting
    mem.addData(payload(1200000L, 300.0, 15.0))  // 20s of counting
    q.processAllAvailable()
    q.stop()

    val counters = spark.table("preagg_rows")
      .filter(col("kind") === "counter")
      .select(col("tenant_id"), col("metric_name"), col("ts_ms").as("bucket_ms"),
        col("counter.count").as("count"), col("counter.rate").as("rate"))
    val merged = Preaggregated.counterMerge(counters, Granularity.MIN_60).collect()
    assert(merged.length === 1)
    assert(merged(0).getAs[Double]("count") === 400.0)
    assert(math.abs(merged(0).getAs[Double]("rate") - 400.0 / 30.0) < 1e-9)
  }
}
