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

  private def localPearson(xy: Seq[(Double, Double)]): Double = {
    val n = xy.size.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map { case (a, b) => a * b }.sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("correlatedSeries: matches a local Pearson reference; self and " +
    "zero-variance and short series excluded") {
    import spark.implicits._
    val tgtVals = (0 to 9).map(_.toDouble)
    val noisy = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val rows =
      tgtVals.zipWithIndex.map { case (v, i) => ("t", "tgt", i * 1000L, v) } ++
      // two points per bucket averaging to 2b+1: exercises the bucket mean
      (0 to 9).flatMap(b => Seq(
        ("t", "pos", b * 1000L, 2.0 * b),
        ("t", "pos", b * 1000L + 500L, 2.0 * b + 2.0))) ++
      (0 to 9).map(b => ("t", "neg", b * 1000L, 10.0 - b)) ++
      noisy.zipWithIndex.map { case (v, i) => ("t", "noisy", i * 1000L, v) } ++
      (0 to 9).map(b => ("t", "const", b * 1000L, 5.0)) ++
      (0 to 2).map(b => ("t", "short", b * 1000L, b * 3.0))
    val targets = Seq("tgt").toDF("metric_name")
    val got = Series.correlatedSeries(pts(rows), targets,
        bucketMs = 1000L, minBuckets = 5)
      .collect()
      .map(r => r.getString(2) -> ((r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))))
      .toMap
    assert(got.keySet === Set("pos", "neg", "noisy", "const"))
    assert(got("pos")._1 === 10L)
    assert(math.abs(got("pos")._2.asInstanceOf[Double] - 1.0) < 1e-9)
    assert(math.abs(got("neg")._2.asInstanceOf[Double] + 1.0) < 1e-9)
    val ref = localPearson(noisy.zip(tgtVals))
    assert(math.abs(got("noisy")._2.asInstanceOf[Double] - ref) < 1e-7)
    assert(got("const")._2 === null) // zero variance -> null, not NaN
  }

  test("correlatedSeries is tenant-scoped: a target name shared by two " +
    "tenants never pools their points") {
    import spark.implicits._
    // tenant A: other ≡ tgt (r = 1); tenant B: other ≡ -tgt (r = -1).
    // Pooling tgt across tenants would corrupt BOTH correlations.
    val rows =
      (0 to 9).map(i => ("A", "tgt", i * 1000L, i.toDouble)) ++
      (0 to 9).map(i => ("A", "other", i * 1000L, 2.0 * i)) ++
      (0 to 9).map(i => ("B", "tgt", i * 1000L, 100.0 - 3.0 * i)) ++
      (0 to 9).map(i => ("B", "other", i * 1000L, 5.0 * i))
    val got = Series.correlatedSeries(pts(rows),
        Seq("tgt").toDF("metric_name"), bucketMs = 1000L, minBuckets = 5)
      .collect()
      .map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(math.abs(got("A") - 1.0) < 1e-9, s"tenant A r=${got("A")}")
    assert(math.abs(got("B") + 1.0) < 1e-9, s"tenant B r=${got("B")}")
  }

  test("correlatedSeries: multiple targets keyed by tgt_name; only common " +
    "buckets pair; layout-invariant") {
    import spark.implicits._
    // offset keeps half of b's buckets unshared with a
    val rows = (0 to 9).map(b => ("t", "a", b * 1000L, b * 1.0)) ++
      (5 to 14).map(b => ("t", "b", b * 1000L, 30.0 - 2.0 * b))
    val targets = Seq("a", "b").toDF("metric_name")
    val run = Series.correlatedSeries(pts(rows).repartition(7), targets,
      bucketMs = 1000L, minBuckets = 2)
    val got = run.collect()
      .map(r => (r.getString(0), r.getString(2)) -> ((r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === Set(("a", "b"), ("b", "a")))
    assert(got(("a", "b"))._1 === 5L) // buckets 5..9 only
    assert(math.abs(got(("a", "b"))._2 + 1.0) < 1e-9)
    assert(got(("a", "b")) === got(("b", "a")))
    val again = Series.correlatedSeries(pts(rows).repartition(3), targets,
      bucketMs = 1000L, minBuckets = 2).collect()
      .map(r => (r.getString(0), r.getString(2)) -> ((r.getLong(3), r.getDouble(4))))
      .toMap
    assert(again === got)
    intercept[IllegalArgumentException] {
      Series.correlatedSeries(pts(rows), targets, bucketMs = 0L)
    }
    intercept[IllegalArgumentException] {
      Series.correlatedSeries(pts(rows), targets, 1000L, minBuckets = 1)
    }
  }

  test("topSeries: per-tenant ranks, tie-break by name, stats, ascending") {
    val rows = Seq(
      ("a", "m1", 0L, 10.0), ("a", "m1", 1000L, 20.0),   // mean 15, max 20
      ("a", "m2", 0L, 30.0),                             // mean 30
      ("a", "m3", 0L, 15.0), ("a", "m3", 1000L, 15.0),   // mean 15: ties m1
      ("b", "x", 0L, 1.0))
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(3)) -> r.getString(1)).toMap
    val top = ranks(Series.topSeries(pts(rows), k = 2))
    assert(top === Map(("a", 1) -> "m2", ("a", 2) -> "m1", ("b", 1) -> "x"))
    val bottom = ranks(Series.topSeries(pts(rows), k = 1, ascending = true))
    assert(bottom === Map(("a", 1) -> "m1", ("b", 1) -> "x")) // 15 tie -> m1
    val byCount = ranks(Series.topSeries(pts(rows), k = 1, stat = "count"))
    assert(byCount(("a", 1)) === "m1") // 2 points, ties m3 -> name order
    val byMax = Series.topSeries(pts(rows), k = 1, stat = "max")
      .filter(col("tenant_id") === "a").collect().head
    assert(byMax.getString(1) === "m2" && byMax.getDouble(2) === 30.0)
    intercept[IllegalArgumentException] { Series.topSeries(pts(rows), 0) }
    intercept[IllegalArgumentException] {
      Series.topSeries(pts(rows), 1, stat = "median")
    }
  }

  test("completenessReport: gap accounting at bucket granularity") {
    val day = 86400000L
    val rows = Seq(
      // present days 0,1,4 of a 5-day span; two points on day 0 collapse
      ("t", "gappy", 100L, 1.0), ("t", "gappy", 200L, 2.0),
      ("t", "gappy", day + 1L, 3.0), ("t", "gappy", 4 * day + 5L, 4.0),
      ("t", "solid", 0L, 1.0), ("t", "solid", day, 1.0),
      ("t", "single", 7 * day + 3L, 9.0))
    val got = Series.completenessReport(pts(rows), day).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7))))
      .toMap
    assert(got("gappy") === ((0L, 4 * day, 5L, 3L, 2L, 0.6)))
    assert(got("solid") === ((0L, day, 2L, 2L, 0L, 1.0)))
    assert(got("single") === ((7 * day, 7 * day, 1L, 1L, 0L, 1.0)))
    intercept[IllegalArgumentException] {
      Series.completenessReport(pts(rows), 0L)
    }
  }

  test("timeShiftCompare: point lookup at the shift offset; missing and " +
    "zero bases null; arg guards") {
    val b = 1000L
    val rows = Seq(
      // buckets 0,1,3 present; bucket 3 compares to bucket 1 (shift 2)
      ("t", "m", 0L, 4.0), ("t", "m", 10L, 6.0), // bucket 0 mean 5
      ("t", "m", b + 1L, 10.0),                  // bucket 1
      ("t", "m", 3 * b + 2L, 25.0),              // bucket 3
      ("t", "z", 0L, 0.0), ("t", "z", 2 * b, 7.0)) // zero base -> null ratio
    val got = Series.timeShiftCompare(pts(rows), b, 2 * b).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> ((
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5),
        if (r.isNullAt(6)) null else r.getDouble(6))))
      .toMap
    assert(got(("m", 0L)) === ((null, null, null)))      // nothing 2 back
    assert(got(("m", b)) === ((null, null, null)))
    assert(got(("m", 3 * b)) === ((10.0, 15.0, 2.5)))    // vs bucket 1
    assert(got(("z", 2 * b)) === ((0.0, 7.0, null)))     // base 0: no ratio
    intercept[IllegalArgumentException] {
      Series.timeShiftCompare(pts(rows), b, b + 1) // not a multiple
    }
    intercept[IllegalArgumentException] {
      Series.timeShiftCompare(pts(rows), b, 2 * b, stat = "median")
    }
  }

  test("integral: per-series exact running sum, ties commute, " +
    "series independent") {
    val rows = Seq(
      ("t", "a", 0L, 1.5), ("t", "a", 1000L, 2.5), ("t", "a", 2000L, -1.0),
      ("t", "a", 3000L, 3.0), ("t", "a", 3000L, 3.0), // duplicate row
      ("t", "b", 0L, 100.0))
    val got = Series.integral(pts(rows)).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(4)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sorted.toSeq }
    assert(got("a") === Seq(1.5, 4.0, 3.0, 6.0, 9.0).sorted)
    assert(got("b") === Seq(100.0))
  }

  test("quantileOfSeries: interpolated percentile across per-series bucket " +
    "means; glob prunes; n_series counts") {
    val b = 1000L
    val rows = Seq(
      // four matching series in bucket 0 with means 1,2,3,4 -> p50 = 2.5
      ("t", "app.x.1", 0L, 1.0),
      ("t", "app.x.2", 0L, 2.0),
      ("t", "app.x.3", 100L, 2.0), ("t", "app.x.3", 200L, 4.0), // mean 3
      ("t", "app.x.4", 0L, 4.0),
      ("t", "other.y", 0L, 1000.0)) // pruned by the glob
    val got = Series.quantileOfSeries(pts(rows), "app.*", 0.5, b).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getString(1) === "quantile.0.5.app.*")
    assert(r.getDouble(3) === 2.5)
    assert(r.getLong(4) === 4L)
    intercept[IllegalArgumentException] {
      Series.quantileOfSeries(pts(rows), "app.*", 1.5, b)
    }
  }

  test("linearTrend: exact fit on a noiseless line; forecast and " +
    "time-to-reach extrapolate it; degenerate series null out") {
    val minMs = 1000000L
    // value = 10 + 2 * (minutes since first point): slope 2/min, r2 = 1
    val line = (0 to 9).map(i =>
      ("t", "line", minMs + i * 60000L, 10.0 + 2.0 * i))
    val single = Seq(("t", "single", 5000L, 42.0))
    val got = Series.linearTrend(pts(line ++ single),
        horizonS = 600.0, threshold = 100.0).collect()
      .map(r => r.getString(1) -> r).toMap
    val l = got("line")
    assert(l.getLong(2) === 10L)                  // n
    assert(l.getLong(3) === 9L)                   // t_max_min
    assert(l.getDouble(4) === 2.0 / 60.0)         // slope_per_s
    assert(l.getDouble(5) === 2.0 * 1440.0)       // slope_per_d
    assert(l.getDouble(6) === 10.0)               // intercept
    assert(l.getDouble(7) === 1.0)                // r2
    // forecast at t_max + 10 min: 10 + 2*19 = 48
    assert(l.getDouble(8) === 48.0)
    // value 100 reached at t = 45 min after the first point
    assert(l.getDouble(9) === minMs + 45 * 60000.0)
    val s = got("single")                         // varT = 0: no fit
    assert(s.isNullAt(4) && s.isNullAt(6) && s.isNullAt(7) && s.isNullAt(9))
    intercept[IllegalArgumentException] {
      Series.linearTrend(pts(line), horizonS = -1.0, threshold = 0.0)
    }
  }

  test("clampOutliers: per-series percentile clamp; other series " +
    "unaffected") {
    val rows = (1 to 10).map(i => ("t", "a", i * 1000L, i.toDouble)) ++
      Seq(("t", "b", 0L, 1000.0))
    // p50 over 1..10 interpolates to 5.5
    val got = Series.clampOutliers(pts(rows), 0.5).collect()
      .map(r => (r.getString(1), r.getDouble(3)) ->
        ((r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    assert(got(("a", 10.0)) === ((5.5, 5.5, true)))
    assert(got(("a", 5.0)) === ((5.5, 5.0, false)))
    assert(got(("b", 1000.0)) === ((1000.0, 1000.0, false)))
    intercept[IllegalArgumentException] {
      Series.clampOutliers(pts(rows), -0.1)
    }
  }

  test("downsampleTriangle: endpoints kept, ≤ buckets points, spike " +
    "survives, layout-invariant, tiny-series edges") {
    val rnd = new scala.util.Random(17)
    // dense sawtooth + one huge spike mid-series
    val dense = (0 until 500).map { i =>
      val v = if (i == 237) 900.0 else 10.0 + (i % 7) + rnd.nextDouble()
      ("t", "dense", i * 1000L, v)
    }
    val tiny = Seq(("t", "one", 0L, 1.0), ("t", "two", 0L, 1.0),
      ("t", "two", 1000L, 2.0))
    val got = Series.downsampleTriangle(pts(dense ++ tiny), 20)
    val byS = got.collect().groupBy(_.getString(1))
    // dense: exactly 20 points (500 points, all 18 middle buckets populated)
    assert(byS("dense").length === 20)
    val ts = byS("dense").map(_.getLong(3)).sorted
    assert(ts.head === 0L && ts.last === 499000L) // endpoints
    assert(byS("dense").exists(_.getDouble(4) === 900.0), "spike must survive")
    // n=1 → single point in bucket 0; n=2 → both endpoints
    assert(byS("one").map(r => (r.getInt(2), r.getLong(3))).toSeq === Seq((0, 0L)))
    assert(byS("two").map(_.getInt(2)).sorted.toSeq === Seq(0, 19))
    // one point per (series, bucket)
    val dup = got.collect().groupBy(r => (r.getString(1), r.getInt(2)))
      .filter(_._2.length > 1)
    assert(dup.isEmpty, s"duplicate buckets: ${dup.keys}")
    // layout invariance
    val again = Series.downsampleTriangle(pts(dense ++ tiny).repartition(13), 20)
    assert(got.collect().map(_.toSeq).toSet === again.collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException](
      Series.downsampleTriangle(pts(tiny), 2))
  }

  test("lttbExact ≡ local canonical LTTB; spike survives; n ≤ B keeps all; " +
    "layout-invariant") {
    // local reference: Steinarsson 2013 §4.2, the strict selected-point chain
    def reference(p: Seq[(Long, Double)], b: Int): Seq[Int] = {
      val n = p.length
      if (n <= b) return p.indices.toSeq
      val m = b - 2
      def lo(k: Int) = 1 + (k.toLong * (n - 2) / m).toInt
      var a = 0
      val out = scala.collection.mutable.ArrayBuffer(0)
      for (k <- 0 until m) {
        val (cx, cy) =
          if (k + 1 < m) {
            val s = (lo(k + 1) until lo(k + 2)).map(p)
            (s.map(_._1.toDouble).sum / s.size, s.map(_._2).sum / s.size)
          } else (p(n - 1)._1.toDouble, p(n - 1)._2)
        val best = (lo(k) until lo(k + 1)).maxBy { j =>
          (math.abs((p(a)._1 - p(j)._1) * (cy - p(j)._2) -
            (cx - p(j)._1) * (p(a)._2 - p(j)._2)), -j)
        }
        out += best
        a = best
      }
      out += (n - 1)
      out.toSeq
    }
    val rnd = new scala.util.Random(23)
    val series = (0 until 300).map(i =>
      (i * 1000L, if (i == 111) 500.0 else 5.0 + rnd.nextDouble() * 3))
    val df = pts(series.map { case (t, v) => ("t", "m", t, v) })
    val got = Series.lttbExact(df, 20).collect()
      .map(r => (r.getLong(3), r.getDouble(4))).sortBy(_._1)
    val want = reference(series, 20).map(series).sortBy(_._1)
    assert(got.toSeq === want)
    assert(got.exists(_._2 === 500.0), "spike must survive")
    // n ≤ B: everything kept
    val tiny = pts(Seq(("t", "s", 0L, 1.0), ("t", "s", 1000L, 2.0)))
    assert(Series.lttbExact(tiny, 20).count() === 2)
    // layout invariance
    val again = Series.lttbExact(df.repartition(7), 20).collect()
      .map(r => (r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(again.toSeq === want)
    intercept[IllegalArgumentException](Series.lttbExact(df, 2))
    // render-sized contract enforced: an over-long series fails with
    // intent instead of collecting an unbounded array into one task
    val e = intercept[Exception] {
      Series.lttbExact(df, 20, maxPointsPerSeries = 100).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("maxPointsPerSeries")), msgs)
    assert(Series.lttbExact(df, 20, maxPointsPerSeries = 300).count() === 20L)
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

  test("seriesRatio: aligned division; one-sided buckets and zero denominators are NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bucket 0: 6/3; bucket 100: num only; bucket 200: den only;
    // bucket 300: denominator sums to zero
    val pts = Seq(
      ("a", "m", 10L, 2.0), ("a", "m", 20L, 4.0), ("b", "m", 30L, 3.0),
      ("a", "m", 110L, 5.0),
      ("b", "m", 210L, 7.0),
      ("a", "m", 310L, 9.0), ("b", "m", 320L, 1.5), ("b", "m", 330L, -1.5))
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
    val out = Series.seriesRatio(pts,
        num = col("tenant_id") === "a", den = col("tenant_id") === "b",
        bucketMs = 100L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(0L) === (Some(6.0), Some(3.0), Some(2.0)))
    assert(out(100L) === (Some(5.0), None, None), "missing denominator -> NULL ratio")
    assert(out(200L) === (None, Some(7.0), None), "missing numerator -> NULL ratio")
    assert(out(300L) === (Some(9.0), Some(0.0), None), "zero denominator -> NULL, not Inf")
    assert(out.keySet === Set(0L, 100L, 200L, 300L), "full outer keeps one-sided buckets")
  }

  test("m4Downsample: per-bin first/last/vmin/vmax, role overlap dedups, " +
    "single-point series lands in bin 0") {
    // span [0, 90], 2 bins => bin = ts*2 div 91: bin 0 is ts<=45, bin 1 ts>=46
    val rows = Seq(
      ("t", "m", 0L, 5.0),   // bin 0 first AND vmin-tie winner (smallest ts)
      ("t", "m", 10L, 9.0),  // bin 0 vmax
      ("t", "m", 20L, 5.0),  // bin 0 vmin tie, larger ts -> not selected
      ("t", "m", 40L, 7.0),  // bin 0 last
      ("t", "m", 50L, 3.0),  // bin 1 first AND vmin
      ("t", "m", 90L, 8.0),  // bin 1 last AND vmax
      ("u", "m", 77L, 1.0))  // single-point series
    val got = Series.m4Downsample(pts(rows), buckets = 2).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === Set(
      ("t", 0, 0L, 5.0), ("t", 0, 10L, 9.0), ("t", 0, 40L, 7.0),
      ("t", 1, 50L, 3.0), ("t", 1, 90L, 8.0),
      ("u", 0, 77L, 1.0)))
  }

  test("madOutliers: lower medians by rank, spike flagged, constant series " +
    "never flags") {
    val rows = Seq(
      ("t", "odd", 0L, 1.0), ("t", "odd", 1L, 2.0), ("t", "odd", 2L, 3.0),
      ("t", "odd", 3L, 4.0), ("t", "odd", 4L, 100.0),
      // even count: lower median of (1,2,3,10) is 2; adevs (1,0,1,8) -> mad 1
      ("t", "even", 0L, 1.0), ("t", "even", 1L, 2.0), ("t", "even", 2L, 3.0),
      ("t", "even", 3L, 10.0),
      ("t", "const", 0L, 7.0), ("t", "const", 1L, 7.0), ("t", "const", 2L, 7.0))
    val got = Series.madOutliers(pts(rows), k = 3.0).collect()
      .map(r => (r.getString(1), r.getLong(2)) ->
        ((r.getDouble(4), r.getDouble(5), r.getBoolean(7)))).toMap
    // odd: med 3, adevs (2,1,0,1,97) sorted (0,1,1,2,97), lower median 1
    assert(got(("odd", 4L)) === ((3.0, 1.0, true)), "spike is > 3*mad")
    assert(got(("odd", 0L)) === ((3.0, 1.0, false)), "adev 2 <= 3*1 not flagged")
    assert(got(("even", 3L)) === ((2.0, 1.0, true)))
    assert(got(("even", 0L)) === ((2.0, 1.0, false)))
    assert(Seq(0L, 1L, 2L).forall(t => got(("const", t)) === ((7.0, 0.0, false))),
      "all-constant series: mad 0 flags nothing")
  }

  test("resampleLinear: exact hits, interpolation, duplicate-ts collapse, " +
    "sub-step series yields no grid") {
    val rows = Seq(
      ("t", "m", 0L, 10.0), ("t", "m", 1000L, 20.0),
      // duplicate ts collapses to mean 15 before interpolation
      ("t", "d", 0L, 10.0), ("t", "d", 0L, 20.0), ("t", "d", 500L, 25.0),
      // spans [300, 400]: no multiple of 500 inside -> series absent
      ("t", "s", 300L, 1.0), ("t", "s", 400L, 2.0))
    val got = Series.resampleLinear(pts(rows), stepMs = 500L).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got(("m", 0L)) === 10.0, "exact hit returns the sample")
    assert(got(("m", 500L)) === 15.0, "midpoint interpolates")
    assert(got(("m", 1000L)) === 20.0)
    assert(got(("d", 0L)) === 15.0, "duplicate timestamps average first")
    assert(got(("d", 500L)) === 25.0)
    assert(!got.keySet.exists(_._1 == "s"), "no aligned tick inside the span")
  }

  test("resampleHold: forward fill serves the ASOF-previous sample " +
    "verbatim — never a blend; same grid/collapse/bound as linear") {
    val rows = Seq(
      ("t", "m", 0L, 10.0), ("t", "m", 1200L, 20.0), ("t", "m", 2000L, 7.0),
      ("t", "d", 0L, 10.0), ("t", "d", 0L, 20.0), ("t", "d", 500L, 25.0))
    val got = Series.resampleHold(pts(rows), stepMs = 500L).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got(("m", 0L)) === 10.0, "exact hit is its own previous sample")
    assert(got(("m", 500L)) === 10.0, "held, not interpolated")
    assert(got(("m", 1000L)) === 10.0)
    assert(got(("m", 1500L)) === 20.0, "fill switches AT the newer sample")
    assert(got(("m", 2000L)) === 7.0)
    assert(got(("d", 0L)) === 15.0, "duplicate timestamps average first")
    assert(got(("d", 500L)) === 25.0)
    // bounded-grid contract shared with the linear form, named correctly
    val wide = pts(Seq(("t", "w", 0L, 1.0), ("t", "w", 10000L, 2.0)))
    val e = intercept[Exception](
      Series.resampleHold(wide, stepMs = 1L,
        maxGridPointsPerSeries = 100).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("resampleHold")), msgs)
    assert(msgs.exists(_.contains("10001")), msgs)
  }

  test("movingAvgPrefix ≡ movingStats.mavg bit-for-bit: gate corpus + " +
    "duplicate timestamps, boundary-exact windows, null values") {
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("tenant_id", "metric_name", "ts_ms", "value", "n_window", "mavg")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -2L else bits(r.getDouble(3)), r.getLong(4),
        if (r.isNullAt(5)) -1L else bits(r.getDouble(5))))
      .toSet
    val corpus = graft.core.Tables.metrics(spark, "/root/testdata/sf0.001")
    for (w <- Seq(600000L, 3600000L))
      assert(canon(Series.movingAvgPrefix(corpus, w)) ===
        canon(Series.movingStats(corpus, w)), s"windowMs=$w")
    // adversarial: duplicate timestamps (RANGE peers share one cum), a
    // row EXACTLY windowMs after another (inclusive lower bound), one
    // exactly windowMs+1 after (exclusive), and null values (counted in
    // the denominator, absent from the sum; an all-null prefix stays
    // NULL not 0)
    import org.apache.spark.sql.functions.{col, lit, when}
    val adv = pts(Seq(
      ("t", "dup", 0L, 1.0), ("t", "dup", 0L, 3.0), ("t", "dup", 5L, 6.0),
      ("t", "edge", 0L, 2.0), ("t", "edge", 10L, 4.0), ("t", "edge", 11L, 8.0),
      ("t", "n", 0L, -1.0), ("t", "n", 3L, -1.0), ("t", "n", 6L, 5.0)))
      .withColumn("value",
        when(col("value") === -1.0, lit(null).cast("double"))
          .otherwise(col("value")))
      .repartition(5)
    assert(canon(Series.movingAvgPrefix(adv, 10L)) ===
      canon(Series.movingStats(adv, 10L)))
  }

  test("madOutliersSharded ≡ madOutliers: gate corpus + adversarial shapes " +
    "(duplicates, negatives, constants, single points, even/odd counts)") {
    // doubles compared by BIT PATTERN: plain == would mask a -0.0 vs 0.0
    // representation divergence, which is exactly what the ±0.0
    // canonicalization + ts tie-break exist to prevent
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        bits(r.getDouble(3)), bits(r.getDouble(4)), bits(r.getDouble(5)),
        bits(r.getDouble(6)), r.getBoolean(7)))
      .toSet
    // real corpus: every series of the sf0.001 gate data, bit-identical
    val corpus = graft.core.Tables.metrics(spark, "/root/testdata/sf0.001")
    assert(canon(Series.madOutliersSharded(corpus)) ===
      canon(Series.madOutliers(corpus)))
    // adversarial: heavy duplicates (one bucket holds the median mass),
    // negatives (bit-image order must hold below zero), constants,
    // single-point and even-count series, values straddling exponents
    val adv = pts(Seq(
      ("t", "dup", 0L, 5.0), ("t", "dup", 1L, 5.0), ("t", "dup", 2L, 5.0),
      ("t", "dup", 3L, 5.0), ("t", "dup", 4L, 900.0),
      ("t", "neg", 0L, -8.5), ("t", "neg", 1L, -2.25), ("t", "neg", 2L, -0.5),
      ("t", "neg", 3L, 4.0), ("t", "neg", 4L, -100.0),
      ("t", "const", 0L, 7.0), ("t", "const", 1L, 7.0), ("t", "const", 2L, 7.0),
      ("t", "one", 0L, 3.25),
      ("t", "even", 0L, 1.0), ("t", "even", 1L, 2.0), ("t", "even", 2L, 3.0),
      ("t", "even", 3L, 10.0),
      ("t", "exp", 0L, 0.001), ("t", "exp", 1L, 1.0), ("t", "exp", 2L, 1024.0),
      ("t", "exp", 3L, 1.0e300), ("t", "exp", 4L, -1.0e-300),
      // signed zeros: Spark sorts them EQUAL, so both forms must select
      // the same ROW (ts tie-break) from the same bucket (canonicalized
      // image) — med here is the rank-2 zero, whichever sign it carries
      ("t", "zed", 0L, 0.0), ("t", "zed", 1L, -0.0), ("t", "zed", 2L, 5.0)))
      .repartition(7) // adversarial layout: membership must not care
    for (bits <- Seq(1, 4, 20, 63)) // membership never depends on width
      assert(canon(Series.madOutliersSharded(adv, bucketBits = bits)) ===
        canon(Series.madOutliers(adv)), s"bucketBits=$bits")
    intercept[IllegalArgumentException](Series.madOutliersSharded(adv, bucketBits = 0))
  }

  test("resampleLinear: bounded-grid contract fails loud, per series") {
    // two points a "year" apart at step=1: the amplification the contract
    // exists to stop — the guard fires BEFORE the sequence materializes
    val wide = pts(Seq(("t", "m", 0L, 1.0), ("t", "m", 10000000L, 2.0)))
    val e = intercept[Exception] {
      Series.resampleLinear(wide, stepMs = 1L,
        maxGridPointsPerSeries = 1000).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("maxGridPointsPerSeries")), msgs)
    // the same series inside budget (coarser step) passes the guard
    assert(Series.resampleLinear(wide, stepMs = 1000L,
      maxGridPointsPerSeries = 20000).count() === 10001L)
    intercept[IllegalArgumentException](
      Series.resampleLinear(wide, 500L, maxGridPointsPerSeries = 0))
  }

  test("movingWindowPrefix ≡ frame stats bit-for-bit: gate corpus + " +
    "duplicate timestamps, boundary-exact windows, null values") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("tenant_id", "metric_name", "ts_ms", "value", "n_window",
        "msum", "mavg", "mstd")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -2L else bits(r.getDouble(3)), r.getLong(4),
        (5 to 7).map(i => if (r.isNullAt(i)) -1L else bits(r.getDouble(i)))))
      .toSet
    // the RANGE-frame restatement of the whole family — what the prefix
    // form claims bit-identity with (the q_series_moving_window oracle
    // shape, including the stddev clamp branch)
    def frameForm(df: org.apache.spark.sql.DataFrame, wMs: Long) = {
      val w = Window.partitionBy("tenant_id", "metric_name")
        .orderBy(col("ts_ms")).rangeBetween(-wMs, 0)
      val n = count(lit(1)).over(w)
      val s = sum(col("value").cast(DecimalType(28, 2))).over(w)
        .cast("double")
      val sq = sum((col("value") * col("value")).cast(DecimalType(38, 8)))
        .over(w).cast("double")
      val variance = (sq - s * s / n) / n
      val hasVals = count(col("value")).over(w) > 0
      df.select(col("tenant_id"), col("metric_name"), col("ts_ms"),
        col("value"), n.as("n_window"),
        when(hasVals, s).as("msum"),
        when(hasVals, s / n).as("mavg"),
        when(hasVals,
          when(variance > 0.0, sqrt(variance)).otherwise(lit(0.0)))
          .as("mstd"))
    }
    val corpus = graft.core.Tables.metrics(spark, "/root/testdata/sf0.001")
    for (w <- Seq(600000L, 3600000L))
      assert(canon(Series.movingWindowPrefix(corpus, w)) ===
        canon(frameForm(corpus, w)), s"windowMs=$w")
    // adversarial: RANGE peers on duplicate ts, inclusive/exclusive
    // window edges, nulls in the denominator, a constant series whose
    // expanded-form variance cancels to ±0
    val adv = pts(Seq(
      ("t", "dup", 0L, 1.0), ("t", "dup", 0L, 3.0), ("t", "dup", 5L, 6.0),
      ("t", "edge", 0L, 2.0), ("t", "edge", 10L, 4.0), ("t", "edge", 11L, 8.0),
      ("t", "n", 0L, -1.0), ("t", "n", 3L, -1.0), ("t", "n", 6L, 5.0),
      ("t", "const", 0L, 7.5), ("t", "const", 4L, 7.5), ("t", "const", 9L, 7.5)))
      .withColumn("value",
        when(col("value") === -1.0, lit(null).cast("double"))
          .otherwise(col("value")))
      .repartition(5)
    assert(canon(Series.movingWindowPrefix(adv, 10L)) ===
      canon(frameForm(adv, 10L)))
    // spot semantics: window [0,5] of "dup" holds 1,3,6 -> sum 10,
    // mean 10/3, popvar ((1+9+36) - 100/3)/3
    val d5 = Series.movingWindowPrefix(pts(Seq(
        ("t", "dup", 0L, 1.0), ("t", "dup", 0L, 3.0), ("t", "dup", 5L, 6.0))),
        10L)
      .filter(col("ts_ms") === 5L).collect().head
    assert(d5.getAs[Long]("n_window") === 3L)
    assert(d5.getAs[Double]("msum") === 10.0)
    assert(math.abs(d5.getAs[Double]("mstd") -
      math.sqrt((46.0 - 100.0 / 3) / 3)) < 1e-12)
    intercept[IllegalArgumentException](Series.movingWindowPrefix(adv, 0L))
  }

  test("groupByNode: token grouping, stats, negative index, node guard") {
    val rows = Seq(
      ("t", "app.web.req", 0L, 1.0), ("t", "app.web.err", 0L, 3.0),
      ("t", "app.db.req", 0L, 10.0), ("t", "app.db.req", 500L, 20.0),
      ("u", "app.web.req", 0L, 7.0)) // other tenant: grouped apart
    val got = Series.groupByNode(pts(rows), 1, "sum", 1000L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got(("t", "web", 0L)) === ((4.0, 2L)))   // two series summed
    assert(got(("t", "db", 0L)) === ((30.0, 1L)))   // both points in bucket
    assert(got(("u", "web", 0L)) === ((7.0, 1L)))
    // negative index counts from the end; mean stat
    val last = Series.groupByNode(pts(rows), -1, "mean", 1000L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(last(("t", "req")) === 31.0 / 3)
    assert(last(("t", "err")) === 3.0)
    // a series lacking the node fails loud with its name
    val short = pts(Seq(("t", "lonely", 0L, 1.0)))
    val e = intercept[Exception](
      Series.groupByNode(short, 3, "sum", 1000L).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(m => m.contains("lonely") && m.contains("node 3")), msgs)
    intercept[IllegalArgumentException](
      Series.groupByNode(pts(rows), 1, "sum", 0L))
    intercept[IllegalArgumentException](
      Series.groupByNode(pts(rows), 1, "median", 1000L))
  }

  test("aggregateSeries: count/range/stddev stats; stddev clamp at 0") {
    val rows = Seq(
      ("t", "app.a", 0L, 1.0), ("t", "app.b", 10L, 3.0),
      ("t", "app.c", 20L, 8.0),
      ("t", "app.a", 1000L, 5.0), ("t", "app.b", 1000L, 5.0)) // constant bucket
    def one(stat: String) = Series
      .aggregateSeries(pts(rows), "app.*", stat, 1000L).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(one("count") === Map(0L -> 3.0, 1000L -> 2.0))
    assert(one("range") === Map(0L -> 7.0, 1000L -> 0.0))
    val std = one("stddev")
    // popvar of {1,3,8} = (74 - 144/3)/3
    assert(math.abs(std(0L) - math.sqrt((74.0 - 144.0 / 3) / 3)) < 1e-12)
    // constant bucket: expanded form may cancel below 0 -> clamped to 0
    assert(std(1000L) === 0.0)
  }

  test("groupByNodes: multi-token keys join with dots, caller order kept") {
    val rows = Seq(
      ("t", "app.web.us.req", 0L, 1.0), ("t", "app.web.eu.req", 0L, 3.0),
      ("t", "app.db.us.req", 0L, 10.0))
    val got = Series.groupByNodes(pts(rows), Seq(1, 3), "sum", 1000L)
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(got === Map("web.req" -> 4.0, "db.req" -> 10.0))
    // caller order is the name order, not positional order
    val rev = Series.groupByNodes(pts(rows), Seq(3, 1), "sum", 1000L)
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(rev === Map("req.web" -> 4.0, "req.db" -> 10.0))
    intercept[IllegalArgumentException](
      Series.groupByNodes(pts(rows), Nil, "sum", 1000L))
  }

  test("movingWindowPrefix plan: both frames ride ONE WindowExec and one " +
    "sort — the frame-grouped projection keeps CollapseWindow effective") {
    // count in the plan STRING — AQE wraps the tree in
    // AdaptiveSparkPlanExec, which collect() does not descend into
    val plan = Series.movingWindowPrefix(
      pts(Seq(("t", "m", 0L, 1.0), ("t", "m", 5L, 2.0))), 10L)
      .queryExecution.executedPlan.toString
    def nodes(name: String) =
      s"(?m)^\\s*(?:\\+- )?$name ".r.findAllIn(plan).size
    assert(nodes("Window") === 1, plan)
    assert(nodes("Sort") === 1, plan)
  }

  test("movingAvgPrefix plan: delegates to the frame-grouped projection — " +
    "ONE WindowExec, one sort, and no msum/mstd columns") {
    val df = Series.movingAvgPrefix(
      pts(Seq(("t", "m", 0L, 1.0), ("t", "m", 5L, 2.0))), 10L)
    assert(df.columns.toSeq ===
      Seq("tenant_id", "metric_name", "ts_ms", "value", "n_window", "mavg"))
    val plan = df.queryExecution.executedPlan.toString
    def nodes(name: String) =
      s"(?m)^\\s*(?:\\+- )?$name ".r.findAllIn(plan).size
    assert(nodes("Window") === 1, plan)
    assert(nodes("Sort") === 1, plan)
  }

  test("aggregateWithWildcards: series collapse on the name minus the " +
    "wildcard nodes; positions past a short name pass it through") {
    val rows = pts(Seq(
      ("t", "app.h1.req", 0L, 2.0), ("t", "app.h2.req", 0L, 3.0),
      ("t", "app.h1.req", 5L, 1.0),
      ("t", "short", 0L, 7.0))) // no node 1: name passes through unshortened
    val out = Series.aggregateWithWildcards(rows, Seq(1), "sum", bucketMs = 1L)
      .collect().map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(out(("app.req", 0L)) === 5.0)
    assert(out(("app.req", 5L)) === 1.0)
    assert(out(("short", 0L)) === 7.0)
    val avg = Series.aggregateWithWildcards(rows, Seq(1), "mean", bucketMs = 1L)
      .collect().map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(avg(("app.req", 0L)) === 2.5)
    intercept[IllegalArgumentException](
      Series.aggregateWithWildcards(rows, Seq(-1), "sum", 1L))
    intercept[IllegalArgumentException](
      Series.aggregateWithWildcards(rows, Nil, "sum", 1L))
  }

  test("hitcount: exact proration across bucket boundaries, gap cap, " +
    "last point contributes nothing") {
    // bucket 10s; rate 2/s over [5s, 15s) → 10 hits split 10/10s grid:
    // [5,10)=10 hits? no: 2/s x 5s = 10 in bucket 0, 2/s x 5s = 10 in
    // bucket 1; then rate 4/s over [15s, 20s) → 20 hits all in bucket 1
    val rows = pts(Seq(
      ("t", "m", 5000L, 2.0), ("t", "m", 15000L, 4.0),
      ("t", "m", 20000L, 9.0))) // last point: no next → contributes 0
    val out = Series.hitcount(rows, bucketMs = 10000L)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(out === Map(0L -> 10.0, 10000L -> 30.0))
    // gap cap: a 2 h hole caps the first interval at maxGapMs (10s here)
    val gap = pts(Seq(
      ("t", "g", 0L, 1.0), ("t", "g", 7200000L, 1.0),
      ("t", "g", 7210000L, 1.0)))
    val g = Series.hitcount(gap, bucketMs = 10000L, maxGapMs = 10000L)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(g === Map(0L -> 10.0, 7200000L -> 10.0))
    intercept[IllegalArgumentException](
      Series.hitcount(rows, bucketMs = 10L, maxGapMs = 3600000L))
    // NULL-bearing fixture (ADVICE r10): a null sample between two real
    // ones neither contributes hits nor TERMINATES the previous interval
    // — the null filter runs before the lead on both engine and oracle
    // (q_series_hitcount n0 CTE), so the 2.0-rate interval extends
    // through the null's timestamp to the next real sample
    val withNull = pts(Seq(
        ("t", "n", 0L, 2.0), ("t", "n", 20000L, 9.0)))
      .unionByName(pts(Seq(("t", "n", 5000L, 1.0)))
        .withColumn("value", org.apache.spark.sql.functions.lit(null)
          .cast("double")))
    val nn = Series.hitcount(withNull, bucketMs = 10000L)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(nn === Map(0L -> 20.0, 10000L -> 20.0),
      "a null sample must not end the running interval early")
  }

  test("weightedAverage: node-paired sum(a*w)/sum(w) in floor-1e10 long " +
    "units; unmatched keys drop; topSeries ranks by stddev for mostDeviant") {
    val avgs = pts(Seq(
      ("t", "a.h1.v", 0L, 2.0), ("t", "a.h2.v", 0L, 4.0),
      ("t", "a.h3.v", 0L, 9.0))) // h3 has no weight → drops
    val wts = pts(Seq(
      ("t", "w.h1.x", 0L, 10.0), ("t", "w.h2.x", 0L, 30.0)))
    val out = Series.weightedAverage(avgs, wts, Seq(1), bucketMs = 1L)
      .collect()
    assert(out.length === 1)
    // (2*10 + 4*30) / (10 + 30) = 140/40 = 3.5 — exact in long units
    assert(out(0).getAs[Double]("value") === 3.5)
    assert(out(0).getAs[Long]("n_keys") === 2L)
    assert(out(0).getAs[String]("metric_name") === "weightedAverage")

    // zero weight sum (ADVICE r10): graphite's safeDiv serves None, not
    // 0/0's NaN — the bucket's value must be NULL
    val zw = Series.weightedAverage(avgs,
        pts(Seq(("t", "w.h1.x", 0L, 0.0), ("t", "w.h2.x", 0L, 0.0))),
        Seq(1), bucketMs = 1L).collect()
    assert(zw.length === 1 && zw(0).isNullAt(zw(0).fieldIndex("value")),
      "a zero-weight bucket must serve null, never NaN/Infinity")

    // stddev stat: sigma([0,10]) = 5, sigma([5,5]) = 0 — the spread
    // series wins the mostDeviant ranking
    val rows = pts(Seq(
      ("t", "flat", 0L, 5.0), ("t", "flat", 10L, 5.0),
      ("t", "spread", 0L, 0.0), ("t", "spread", 10L, 10.0)))
    val top = Series.topSeries(rows, k = 1, stat = "stddev",
      ascending = false).collect()
    assert(top.map(_.getString(1)).toSeq === Seq("spread"))
    assert(top(0).getAs[Double]("stat_value") === 5.0)
  }

  test("topSeries: an all-null series never consumes a top-k slot in " +
    "either direction (nulls last)") {
    val rows = pts(Seq(
      ("a", "dead", 0L, -1.0), ("a", "dead", 500L, -1.0),
      ("a", "lo", 0L, 1.0), ("a", "hi", 0L, 9.0)))
      .withColumn("value",
        when(col("value") === -1.0, lit(null).cast("double"))
          .otherwise(col("value")))
    for (asc <- Seq(true, false)) {
      val top1 = Series.topSeries(rows, k = 1, stat = "mean",
        ascending = asc).collect().map(_.getString(1)).toSeq
      assert(top1 === Seq(if (asc) "lo" else "hi"), s"ascending=$asc")
    }
    // the dataless series still appears — ranked LAST, not dropped
    val all = Series.topSeries(rows, k = 3, stat = "last", ascending = true)
      .collect().map(r => r.getString(1) -> r.getInt(3)).toMap
    assert(all("dead") === 3)
  }

  test("topSeries stat=last: most recent sample ranks; ts tie breaks by value") {
    val rows = Seq(
      ("a", "rising", 0L, 100.0), ("a", "rising", 500L, 2.0),
      ("a", "faded", 0L, 1.0), ("a", "faded", 500L, 9.0),
      ("a", "tied", 500L, 9.0), ("a", "tied", 500L, 3.0)) // dup ts: larger wins
    val got = Series.topSeries(pts(rows), k = 3, stat = "last").collect()
      .map(r => r.getString(1) -> ((r.getDouble(2), r.getInt(3)))).toMap
    assert(got("faded") === ((9.0, 1)))  // 9 ties "tied" -> name order
    assert(got("tied") === ((9.0, 2)))
    assert(got("rising") === ((2.0, 3))) // last sample, not max
  }

  test("topSeries null semantics: last skips scrubbed trailing points " +
    "(safeLast), mean divides by non-null count (safeAvg)") {
    val rows = pts(Seq(
      ("a", "scrubbed", 0L, 7.0), ("a", "scrubbed", 500L, -1.0),
      ("a", "clean", 0L, 5.0), ("a", "clean", 500L, 5.0)))
      .withColumn("value",
        when(col("value") === -1.0, lit(null).cast("double"))
          .otherwise(col("value")))
    // last: the scrubbed series ranks by its last NON-NULL sample (7),
    // never a NULL that would asc-sort first / exit every threshold
    val last = Series.topSeries(rows, k = 2, stat = "last").collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(last === Map("scrubbed" -> 7.0, "clean" -> 5.0))
    // mean: denominator counts the one real sample, not the null row
    val mean = Series.topSeries(rows, k = 2, stat = "mean").collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(mean("scrubbed") === 7.0)
  }

  test("movingWindowPrefix withStd=false: no squared-sum prefixes (and no " +
    "mstd column); msum/mavg identical to the withStd form") {
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    val corpus = graft.core.Tables.metrics(spark, "/root/testdata/sf0.001")
    val lean = Series.movingWindowPrefix(corpus, 600000L, withStd = false)
    assert(!lean.columns.contains("mstd"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("tenant_id", "metric_name", "ts_ms", "n_window", "msum", "mavg")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        (4 to 5).map(i => if (r.isNullAt(i)) -1L else bits(r.getDouble(i)))))
      .toSet
    assert(canon(lean) ===
      canon(Series.movingWindowPrefix(corpus, 600000L)))
    // the lean form survives magnitudes whose SQUARES overflow the
    // DECIMAL(38,8) cumulative headroom — the reason it exists
    val big = pts((0 until 50).map(i => ("t", "m", i.toLong, 1e18)))
    assert(Series.movingWindowPrefix(big, 10L, withStd = false)
      .count() === 50L)
  }

  test("aggregateSeries stddev is null-transparent: an all-null bucket " +
    "reports NULL, not a 0 spread it never measured") {
    val rows = pts(Seq(
      ("t", "app.a", 0L, -1.0), ("t", "app.b", 10L, -1.0),
      ("t", "app.a", 1000L, 2.0), ("t", "app.b", 1000L, 6.0)))
      .withColumn("value",
        when(col("value") === -1.0, lit(null).cast("double"))
          .otherwise(col("value")))
    val got = Series.aggregateSeries(rows, "app.*", "stddev", 1000L)
      .collect()
      .map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got(0L) === null)
    assert(got(1000L) === 2.0) // popstd of {2,6}
  }

  test("movingMedianRows: trailing lower median — odd windows select the " +
    "middle, even the lower-middle; nulls occupy slots but join no " +
    "population; an all-null window serves null; the bounded contract " +
    "raises in-plan") {
    import spark.implicits._
    val in = Seq[(String, String, Long, java.lang.Double)](
      ("t", "m", 0L, 5.0),     // {5} -> 5
      ("t", "m", 1000L, 1.0),  // {5,1} even -> lower of (1,5) = 1
      ("t", "m", 2000L, 9.0),  // {5,1,9} odd -> 5
      ("t", "m", 3000L, null), // {1,9,null}: pop {1,9} even -> 1
      ("t", "m", 4000L, 2.0),  // {9,null,2}: pop {2,9} -> 2
      ("t", "n", 0L, null),    // all-null window -> null
      ("t", "n", 1000L, null))
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
    val out = Series.movingMedianRows(in, 3)
      .collect().map(r => (r.getString(1), r.getLong(2)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(("m", 0L)) === Some(5.0))
    assert(out(("m", 1000L)) === Some(1.0))
    assert(out(("m", 2000L)) === Some(5.0))
    assert(out(("m", 3000L)) === Some(1.0))
    assert(out(("m", 4000L)) === Some(2.0))
    assert(out(("n", 0L)) === None)
    assert(out(("n", 1000L)) === None)
    // window wider than the series: every prefix median
    val wide = Series.movingMedianRows(
        in.filter(col("metric_name") === "m"), 100)
      .collect().map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(wide(4000L) === Some(2.0)) // pop {5,1,9,2} even -> lower mid 2
    // render-sized bounded contract: the in-plan guard raises
    val e = intercept[Exception] {
      Series.movingMedianRows(in, 3, maxPointsPerSeries = 2).collect()
    }
    assert(e.getMessage.contains("maxPointsPerSeries"), e.getMessage)
  }

  test("movingMedianTime: RANGE-frame semantics — peers at the same ts " +
    "share each other's frames, the lower bound is inclusive, evicted " +
    "samples leave the population") {
    import spark.implicits._
    val in = Seq[(String, String, Long, java.lang.Double)](
      ("t", "m", 0L, 10.0),
      ("t", "m", 1000L, 2.0),  // peer A at 1000
      ("t", "m", 1000L, 8.0),  // peer B at 1000 — in A's frame too
      ("t", "m", 2000L, 4.0),  // frame [0,2000]: {10,2,8,4} -> lower mid 4
      ("t", "m", 3500L, 6.0))  // w=2000: [1500,3500] -> {4,6} -> 4
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
    val out = Series.movingMedianTime(in, 2000L)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq.sorted
    // ts 0: {10}=10; ts 1000 (both peers): frame [-2000,1000] = {10,2,8}
    // -> 8? sorted {2,8,10} lower-mid(3)= idx1 = 8... rank (3+1)/2=2 -> 8
    assert(out === Seq((0L, 10.0), (1000L, 8.0), (1000L, 8.0),
      (2000L, 4.0), (3500L, 4.0)))
  }
}
