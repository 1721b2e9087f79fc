package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Null-bearing series fixtures for every operator with a value-null
  * path. The gate corpus has no null values (COUNT(value) = COUNT(*) at
  * every sf), so engine-vs-oracle divergence on null rows is invisible to
  * the driver's hash gate — the r11 hitcount bug class. Each test here
  * asserts the ENGINE result equals the RESTATED-ORACLE semantics
  * (graphite's safe* rule: a null sample is an ABSENT value — skipped by
  * every statistic, mean denominators count non-null only, interpolation
  * endpoints must come from real samples) hand-computed on a fixture
  * where nulls actually exercise the paths. The render-layer final
  * consolidation shares [[Series.summarize]]'s algebra (its
  * consolidatePoints flatMaps Nones away — same rule). */
class NullSeriesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def pts(rows: (String, Long, Option[Double])*): DataFrame =
    rows.map { case (n, ts, v) =>
      ("t", n, ts, v.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
      .toDF("tenant_id", "metric_name", "ts_ms", "value")

  private val B = 600000L // 10m buckets

  test("summarize: mean/sum/n_points count only non-null values; an " +
    "all-null bucket serves null value with n_points 0") {
    val in = pts(
      ("s1", 0L, Some(10.0)), ("s1", 100000L, None), ("s1", 200000L, Some(20.0)),
      ("s1", 700000L, None), ("s1", 800000L, Some(40.0)),
      ("s2", 0L, None), ("s2", 100000L, None)) // all-null bucket
    val mean = Series.summarize(in, B, "mean")
      .collect().map(r => (r.getString(1), r.getLong(2)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4))).toMap
    assert(mean(("s1", 0L)) === (Some(15.0), 2L)) // (10+20)/2, null skipped
    assert(mean(("s1", B)) === (Some(40.0), 1L))
    assert(mean(("s2", 0L)) === (None, 0L))
    val sum = Series.summarize(in, B, "sum")
      .collect().map(r => (r.getString(1), r.getLong(2)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(sum(("s1", 0L)) === Some(30.0))
    assert(sum(("s2", 0L)) === None)
  }

  test("summarize last = last NON-NULL value: a trailing null sample " +
    "must not blank the bucket") {
    val in = pts(
      ("s1", 0L, Some(5.0)), ("s1", 100000L, Some(7.0)),
      ("s1", 200000L, None))
    val last = Series.summarize(in, B, "last").collect()
    assert(last.length === 1)
    assert(last(0).getDouble(3) === 7.0)
  }

  test("resampleLinear/Hold: null samples are absent — never an " +
    "interpolation endpoint (the mismatched pt/pv hazard)") {
    val step = 200000L
    val in = pts(
      ("s1", 0L, Some(10.0)),
      ("s1", 100000L, None), // inside the first step: must not shift pt
      ("s1", 200000L, Some(20.0)),
      ("s1", 700000L, None), // between samples: must not break the segment
      ("s1", 800000L, Some(40.0)))
    val lin = Series.resampleLinear(in, step)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    def interp(ts: Long, pt: Long, pv: Double, nt: Long, nv: Double) =
      pv + (nv - pv) * ((ts - pt).toDouble / (nt - pt).toDouble)
    assert(lin(0L) === 10.0)
    assert(lin(200000L) === 20.0)
    assert(lin(400000L) === interp(400000L, 200000L, 20.0, 800000L, 40.0))
    assert(lin(600000L) === interp(600000L, 200000L, 20.0, 800000L, 40.0))
    assert(lin(800000L) === 40.0)
    val hold = Series.resampleHold(in, step)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(hold === Map(0L -> 10.0, 200000L -> 20.0, 400000L -> 20.0,
      600000L -> 20.0, 800000L -> 40.0))
  }

  test("hitcount: null samples neither start an interval nor terminate " +
    "a live one early") {
    val bucket = 200000L
    val in = pts(
      ("s1", 0L, Some(10.0)),
      ("s1", 100000L, None), // must NOT cut [0, 200k) short
      ("s1", 200000L, Some(20.0)),
      ("s1", 800000L, Some(40.0)))
    val hits = Series.hitcount(in, bucket)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // [0,200k) at rate 10 → 2000 hits; [200k,800k) at rate 20 → 4000/bucket
    assert(hits === Map(0L -> 2000.0, 200000L -> 4000.0,
      400000L -> 4000.0, 600000L -> 4000.0))
  }

  test("weightedAverage: null-valued avgs/weights drop their host; a " +
    "bucket whose weights sum to zero serves null") {
    val avgs = pts(
      ("cpu.hostA.avg", 0L, Some(10.0)),
      ("cpu.hostB.avg", 0L, None), // null avg: host contributes nothing
      ("cpu.hostC.avg", 0L, Some(7.0)),
      ("cpu.hostC.avg", B, Some(7.0))) // second bucket: zero-weight only
    val weights = pts(
      ("cpu.hostA.n", 0L, Some(2.0)),
      ("cpu.hostB.n", 0L, Some(5.0)),
      ("cpu.hostC.n", 0L, Some(0.0)),
      ("cpu.hostC.n", B, Some(0.0)))
    val out = Series.weightedAverage(avgs, weights, Seq(1), B)
      .collect().map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(0L) === Some(10.0)) // hostA only: (10·2)/(2); B,C contribute 0
    assert(out(B) === None) // zero total weight → graphite safeDiv null
  }

  test("reduceSeriesPairs: a null on either side (and a zero " +
    "denominator) serves null, never NaN/Infinity or a dropped instant") {
    val in = pts(
      ("app.purchase.x", 0L, Some(50.0)), ("app.view.x", 0L, Some(100.0)),
      ("app.purchase.x", 1000L, None), ("app.view.x", 1000L, Some(10.0)),
      ("app.purchase.x", 2000L, Some(30.0)), ("app.view.x", 2000L, Some(0.0)),
      ("app.purchase.x", 3000L, Some(20.0)), ("app.view.x", 3000L, None))
    val out = Series.reduceSeriesPairs(in, 1, "purchase", "view", "asPercent")
      .collect().map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(0L -> Some(50.0), 1000L -> None, 2000L -> None,
      3000L -> None))
  }

  test("alignOuter (graphite None-parity): instants present on only ONE " +
    "side serve a null datapoint instead of vanishing — reduceSeriesPairs " +
    "and divideSeriesLists; default inner still drops them") {
    val sparse = pts(
      ("app.purchase.x", 0L, Some(50.0)), ("app.view.x", 0L, Some(100.0)),
      ("app.purchase.x", 1000L, Some(40.0)), // no view instant at 1000
      ("app.view.x", 2000L, Some(10.0))) // no purchase instant at 2000
    val outer = Series.reduceSeriesPairs(sparse, 1, "purchase", "view",
        "divideSeries", alignOuter = true)
      .collect().map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(outer === Map(0L -> Some(0.5), 1000L -> None, 2000L -> None))
    val inner = Series.reduceSeriesPairs(sparse, 1, "purchase", "view",
      "divideSeries").collect().map(_.getLong(2)).toSet
    assert(inner === Set(0L), "default inner must keep dropping")

    val dividends = pts(("a.x", 0L, Some(10.0)), ("a.x", 1000L, Some(20.0)))
    val divisors = pts(("b.x", 0L, Some(2.0)), ("b.x", 2000L, Some(4.0)))
    val dl = Series.divideSeriesLists(dividends, divisors, alignOuter = true)
      .collect().map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(dl === Map(0L -> Some(5.0), 1000L -> None, 2000L -> None))
  }
}
