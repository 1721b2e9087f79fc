package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeriesSpec extends AnyFunSuite with SparkSuite {

  private def pts(rows: Seq[(String, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("tenant_id", "metric_name", "ts_ms", "value")
  }

  test("derivatives: deltas, reset detection, perSecond math") {
    val rows = Seq(
      ("t", "m", 0L, 100.0),      // first point: all null
      ("t", "m", 2000L, 150.0),   // +50 over 2s -> 25/s
      ("t", "m", 3000L, 30.0),    // reset (delta -120)
      ("t", "m", 5000L, 40.0))    // +10 over 2s -> 5/s
    val got = Series.derivatives(pts(rows)).collect()
      .map(r => r.getLong(2) -> ((
        if (r.isNullAt(4)) null else r.getDouble(4),
        r.getBoolean(5),
        if (r.isNullAt(6)) null else r.getDouble(6),
        if (r.isNullAt(7)) null else r.getDouble(7))))
      .toMap
    assert(got(0L) === ((null, false, null, null)))
    assert(got(2000L) === ((50.0, false, 50.0, 25.0)))
    assert(got(3000L) === ((-120.0, true, null, null)))
    assert(got(5000L) === ((10.0, false, 10.0, 5.0)))
  }

  test("series are independent; duplicate timestamps rate-guard; zero delta kept") {
    val rows = Seq(
      ("t", "a", 0L, 1.0), ("t", "a", 1000L, 1.0),   // zero delta -> rate 0
      ("t", "b", 1000L, 5.0), ("t", "b", 1000L, 7.0)) // dup ts: dt=0 -> null rate
    val got = Series.derivatives(pts(rows)).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)) -> ((
        if (r.isNullAt(6)) null else r.getDouble(6),
        if (r.isNullAt(7)) null else r.getDouble(7))))
      .toMap
    assert(got(("a", 1000L, 1.0)) === ((0.0, 0.0)))
    // dup-ts pair orders by value: second point has dt=0 -> rate null,
    // but the delta itself is still reported
    assert(got(("b", 1000L, 7.0)) === ((2.0, null)))
    // series a's points never see series b's values
    assert(got(("a", 0L, 1.0)) === ((null, null)))
  }

  test("composes with rollingZScores: rate anomalies flag") {
    // jittered ramp so the baseline rate has nonzero variance
    val rows = (0L until 20L).map(t => ("t", "m", t * 1000L, t * 10.0 + t % 3)) :+
      (("t", "m", 20000L, 1200.0)) // jump: ~1008/s vs baseline ~10/s
    val rates = Series.derivatives(pts(rows))
      .filter(col("rate_per_s").isNotNull)
      .select(col("tenant_id"), col("metric_name"), col("ts_ms"),
        col("rate_per_s").as("value"))
    val flagged = Anomaly.anomalies(rates, windowMs = 60000L,
        threshold = 3.0, minPoints = 5)
      .select("ts_ms").collect().map(_.getLong(0)).toSet
    assert(flagged === Set(20000L))
  }
}
