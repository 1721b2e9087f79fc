package graft.operators

import graft.SparkSuite
import graft.core.Granularity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §2 representative fixtures: timer mean-of-means merge,
  * counter rate merge with r1≠r2 — mirror of the reference's
  * Blueflood*RollupTest cases. */
class PreaggregatedSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("statsd payload parses into kind-discriminated typed rows") {
    val payload =
      """{"tenant_id":"t1","timestamp":1704067200000,
        |"gauges":[{"name":"g1","latest":7.5}],
        |"counters":[{"name":"c1","value":100.0,"rate":10.0}],
        |"timers":[{"name":"tm1","count":4,"sum":40.0,"min":5.0,"max":15.0,
        |           "percentiles":{"50":10.0,"95":100.0}}],
        |"sets":[{"name":"s1","values":[1,2,3]}]}""".stripMargin.replaceAll("\n", "")
    val rows = Preaggregated.fromAggregatedJson(Seq(payload).toDF("value"))
    assert(rows.count() === 4)
    val byKind = rows.collect().map(r => r.getAs[String]("kind") -> r).toMap
    assert(byKind.keySet === Set("counter", "gauge", "timer", "set"))
    assert(byKind("timer").getAs[org.apache.spark.sql.Row]("timer")
      .getAs[Map[String, Double]]("percentiles") === Map("50" -> 10.0, "95" -> 100.0))
    assert(byKind("set").getAs[Seq[Int]]("set") === Seq(1, 2, 3))
  }

  test("counter merge: rate = sum(count) / sum(count_i/rate_i) with r1 != r2") {
    // FIXTURES: counts 100@rate 10 (10s) and 300@rate 15 (20s) in the same
    // hour -> merged rate must be 400/30, not avg(10,15)
    val finer = Seq(
      ("t1", "m1", 0L, 100.0, 10.0),
      ("t1", "m1", 1200000L, 300.0, 15.0))
      .toDF("tenant_id", "metric_name", "bucket_ms", "count", "rate")
    val out = Preaggregated.counterMerge(finer, Granularity.MIN_60).collect()(0)
    assert(out.getAs[Double]("count") === 400.0)
    assert(math.abs(out.getAs[Double]("rate") - 400.0 / 30.0) < 1e-9)
  }

  test("timer percentile map merge is the unweighted mean of means") {
    val finer = Seq(
      ("t1", "tm", 0L, Map("50" -> 10.0, "95" -> 100.0)),
      ("t1", "tm", 1200000L, Map("50" -> 20.0, "95" -> 200.0)))
      .toDF("tenant_id", "metric_name", "bucket_ms", "percentiles")
    val out = Preaggregated.timerPercentileMerge(finer, Granularity.MIN_60).collect()(0)
    val m = out.getAs[Map[String, Double]]("percentiles")
    assert(m === Map("50" -> 15.0, "95" -> 150.0))
  }

  test("gauge merge keeps max-ts latest across inputs") {
    val finer = Seq(
      ("t1", "g", 0L, 3L, 100L, 1.0, 1.0, 5.0),
      ("t1", "g", 1200000L, 2L, 2000000L, 9.9, 0.5, 9.9))
      .toDF("tenant_id", "metric_name", "bucket_ms", "num_points",
        "latest_ts", "latest_v", "min_v", "max_v")
    val out = Preaggregated.gaugeMerge(finer, Granularity.MIN_60).collect()(0)
    assert(out.getAs[Double]("latest_v") === 9.9)
    assert(out.getAs[Long]("num_points") === 5L)
    assert(out.getAs[Double]("min_v") === 0.5)
  }

  test("set state merge is exact union cardinality") {
    val finer = Seq(
      ("t1", "s", 0L, Seq(1, 2, 3)),
      ("t1", "s", 1200000L, Seq(3, 4)))
      .toDF("tenant_id", "metric_name", "bucket_ms", "set_state")
    val out = Preaggregated.setStateMerge(finer, Granularity.MIN_60).collect()(0)
    assert(out.getAs[Int]("distinct_count") === 4)
  }
}
