package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnomalySpec extends AnyFunSuite with SparkSuite {

  private def points(rows: Seq[(String, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("tenant_id", "metric_name", "ts_ms", "value")
  }

  test("planted spike is flagged; steady neighbors are not") {
    val base = (0L until 20L).map(t => ("t", "m", t * 1000L, 10.0 + (t % 3)))
    val spike = ("t", "m", 20000L, 500.0)
    val got = Anomaly.rollingZScores(points(base :+ spike),
        windowMs = 60000L, threshold = 3.0, minPoints = 5)
      .select("ts_ms", "is_anomaly").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(20000L))
    assert(base.drop(5).forall { case (_, _, ts, _) => !got(ts) })
  }

  test("baseline excludes the current point: spike does not mask itself") {
    // If the spike entered its own window, it would inflate std enough to
    // drop its own z below threshold on this short series.
    val rows = (0L until 6L).map(t => ("t", "m", t * 1000L, 10.0)) :+
      (("t", "m", 6000L, 1000.0))
    val r = Anomaly.rollingZScores(points(rows), 60000L, 3.0, minPoints = 5)
      .filter(col("ts_ms") === 6000L).collect().head
    // trailing window holds the 6 constant points: mean 10, std 0 -> z null
    // BUT std=0 means no anomaly verdict by the std>0 guard
    assert(r.getAs[Long]("n_win") === 6L)
    assert(r.getAs[Double]("mean_win") === 10.0)
    assert(r.getAs[Double]("std_win") === 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(!r.getAs[Boolean]("is_anomaly"))
  }

  test("minPoints gates scoring; window range is honored") {
    val rows = Seq(
      ("t", "m", 0L, 10.0), ("t", "m", 1000L, 11.0), ("t", "m", 2000L, 9.0),
      ("t", "m", 3000L, 10.5), ("t", "m", 4000L, 10.0),
      // 5th prior point exists but falls OUT of the 3s window for ts=5000
      ("t", "m", 5000L, 30.0))
    val w3 = Anomaly.rollingZScores(points(rows), 3000L, 2.0, minPoints = 5)
      .filter(col("ts_ms") === 5000L).collect().head
    assert(w3.getAs[Long]("n_win") === 3L) // ts 2000,3000,4000 only
    assert(w3.isNullAt(w3.fieldIndex("z")))
    assert(!w3.getAs[Boolean]("is_anomaly"))
    val w10 = Anomaly.rollingZScores(points(rows), 10000L, 2.0, minPoints = 5)
      .filter(col("ts_ms") === 5000L).collect().head
    assert(w10.getAs[Long]("n_win") === 5L)
    assert(!w10.isNullAt(w10.fieldIndex("z")))
    assert(w10.getAs[Boolean]("is_anomaly"))
  }

  test("seasonalZScores: phases isolate (a square wave never alerts); " +
    "spike flagged against its own phase only") {
    val hour = 3600000L
    val day = 86400000L
    // 20 days, two active hours per day: hour 3 ~ 100, hour 15 ~ 10, both
    // jittered so baselines have variance. A trailing-window scorer would
    // flag every swing; the seasonal scorer must flag none of them.
    val square = (0 until 20).flatMap { d =>
      Seq(("t", "m", d * day + 3 * hour, 100.0 + d % 3),
        ("t", "m", d * day + 15 * hour, 10.0 + d % 3))
    }
    val calm = Anomaly.seasonalZScores(points(square),
      periodMs = day, phaseMs = hour, threshold = 2.5, minPoints = 5)
    assert(calm.filter(col("is_anomaly")).count() === 0L)
    val phases = calm.select("phase").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(phases === Set(3L, 15L))
    // plant a spike at hour 15 of day 20: judged vs hour-15's ~10s, not
    // hour-3's 100s (against the pooled baseline it would sit INSIDE the
    // spread and never flag)
    val spiked = square :+ (("t", "m", 20 * day + 15 * hour, 60.0))
    val flagged = Anomaly.seasonalZScores(points(spiked),
        periodMs = day, phaseMs = hour, threshold = 2.5, minPoints = 5)
      .filter(col("is_anomaly")).collect()
    assert(flagged.map(_.getAs[Long]("ts_ms")).toSeq ===
      Seq(20 * day + 15 * hour))
    val f = flagged.head
    assert(f.getAs[Long]("n_base") === 20L)        // its phase only
    // hour-15 mean, self excluded: (20*10 + sum(d%3 for d<20)) / 20
    assert(f.getAs[Double]("mean_base") === 10.95)
  }

  test("seasonalZScores: leave-one-out baseline and guards") {
    val hour = 3600000L
    val day = 86400000L
    // one phase, constant 10s plus one 1000: the outlier's OWN baseline is
    // the constants (std 0 -> guarded null z); each constant's baseline
    // includes the outlier and scores non-null
    val rows = (0 until 6).map(d => ("t", "m", d * day, 10.0)) :+
      (("t", "m", 6 * day, 1000.0))
    val got = Anomaly.seasonalZScores(points(rows),
      periodMs = day, phaseMs = hour, threshold = 3.0, minPoints = 5)
    val out = got.filter(col("ts_ms") === 6 * day).collect().head
    assert(out.getAs[Long]("n_base") === 6L)
    assert(out.getAs[Double]("mean_base") === 10.0)
    assert(out.getAs[Double]("std_base") === 0.0)
    assert(out.isNullAt(out.fieldIndex("z")))
    assert(!out.getAs[Boolean]("is_anomaly"))
    val c = got.filter(col("ts_ms") === 0L).collect().head
    assert(c.getAs[Long]("n_base") === 6L)
    assert(c.getAs[Double]("mean_base") === (5 * 10.0 + 1000.0) / 6)
    assert(!c.isNullAt(c.fieldIndex("z")))
    // below minPoints: n_base = 2 < 5 -> null z, never anomalous
    val short = (0 until 3).map(d => ("t", "s", d * day, d * 100.0))
    val sgot = Anomaly.seasonalZScores(points(short),
      periodMs = day, phaseMs = hour, threshold = 3.0, minPoints = 5)
    assert(sgot.filter(col("z").isNotNull).count() === 0L)
    assert(sgot.filter(col("is_anomaly")).count() === 0L)
    intercept[IllegalArgumentException] {
      Anomaly.seasonalZScores(points(rows), periodMs = day, phaseMs = 7000L)
    }
  }

  test("streaming scorer equals the batch operator on an in-order feed") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    val rng = new scala.util.Random(13)
    val rows = (0 until 60).map { i =>
      ("t", if (i % 2 == 0) "a" else "b", base + i * 1000L,
        math.floor(rng.nextDouble() * 1000) / 4.0) // .25 steps: exact cents
    }
    val mem = MemoryStream[(String, String, Long, Double)]
    val q = Anomaly.streamingZScores(
        mem.toDF().toDF("tenant_id", "metric_name", "ts_ms", "value"),
        windowMs = 10000L, threshold = 2.0, minPoints = 4)
      .writeStream.format("memory").queryName("zs_out")
      .outputMode("append").start()
    rows.grouped(17).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(1), r.getLong(2)) ->
        ((r.getLong(4),
          if (r.isNullAt(5)) null else r.getDouble(5),
          if (r.isNullAt(6)) null else r.getDouble(6),
          if (r.isNullAt(7)) null else r.getDouble(7),
          r.getBoolean(8)))
    val streamed = spark.table("zs_out").collect().map(key).toMap
    val batch = Anomaly.rollingZScores(
        rows.toDF("tenant_id", "metric_name", "ts_ms", "value"),
        windowMs = 10000L, threshold = 2.0, minPoints = 4)
      .select("tenant_id", "metric_name", "ts_ms", "value", "n_win",
        "mean_win", "std_win", "z", "is_anomaly")
      .collect().map(key).toMap
    assert(streamed.size === 60 && streamed === batch)
  }

  test("streaming scorer: window continues across batches, spike flagged on arrival") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    val mem = MemoryStream[(String, String, Long, Double)]
    val q = Anomaly.streamingZScores(
        mem.toDF().toDF("tenant_id", "metric_name", "ts_ms", "value"),
        windowMs = 60000L, threshold = 3.0, minPoints = 5)
      .writeStream.format("memory").queryName("zs_spike")
      .outputMode("append").start()
    mem.addData((0 until 10).map(i => ("t", "m", base + i * 1000L, 10.0 + i % 3)): _*)
    q.processAllAvailable()
    // the spike arrives in a LATER batch: its baseline lives in state
    mem.addData(("t", "m", base + 10000L, 500.0))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("zs_spike").filter(col("is_anomaly"))
      .collect().map(_.getLong(2)).toSet
    assert(flagged === Set(base + 10000L))
  }

  test("series score independently and match a local reference") {
    val rng = new scala.util.Random(7)
    val rows = for {
      m <- Seq("a", "b", "c")
      t <- 0L until 40L
    } yield ("t", m, t * 1000L, math.floor(rng.nextDouble() * 100) / 1.0)
    val winMs = 9500L
    val got = Anomaly.rollingZScores(points(rows), winMs, 2.0, minPoints = 4)
      .select("metric_name", "ts_ms", "n_win", "mean_win", "std_win")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4))))
      .toMap
    for ((_, m, ts, _) <- rows) {
      val win = rows.filter { case (_, mm, tt, _) =>
        mm == m && tt >= ts - winMs && tt < ts
      }.map(_._4)
      val n = win.size.toLong
      val (em, es) =
        if (n == 0) (null, null)
        else {
          val mean = win.sum / n
          (mean, math.sqrt(math.max(win.map(v => v * v).sum / n - mean * mean, 0.0)))
        }
      assert(got((m, ts)) === ((n, em, es)), s"$m@$ts")
    }
  }

  test("streaming EWMA equals the batch operator across micro-batches; " +
    "cross-batch spike flagged on arrival; late point skipped") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    val rng = new scala.util.Random(29)
    val rows = (0 until 50).map { i =>
      ("t", if (i % 2 == 0) "a" else "b", base + i * 1000L,
        math.floor(rng.nextDouble() * 1000) / 4.0)
    } :+ (("t", "a", base + 60000L, 5000.0)) // spike in the last batch
    val mem = MemoryStream[(String, String, Long, Double)]
    val q = Anomaly.streamingEwmaBands(
        mem.toDF().toDF("tenant_id", "metric_name", "ts_ms", "value"),
        alpha = 0.3, k = 3.0, minPoints = 5)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    rows.grouped(13).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    // a point older than the folded frontier: skipped, no output row
    mem.addData(("t", "a", base - 5000L, 999.0))
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(1), r.getLong(2)) ->
        ((r.getInt(4), r.getDouble(5), r.getDouble(6),
          if (r.isNullAt(7)) null else r.getDouble(7),
          if (r.isNullAt(8)) null else r.getDouble(8),
          if (r.isNullAt(9)) null else r.getDouble(9),
          if (r.isNullAt(10)) null else r.getDouble(10),
          r.getBoolean(11)))
    val streamed = spark.table("ewma_out").collect().map(key).toMap
    val batch = Anomaly.ewmaBands(
        rows.toDF("tenant_id", "metric_name", "ts_ms", "value"),
        alpha = 0.3, k = 3.0, minPoints = 5)
      .select("tenant_id", "metric_name", "ts_ms", "value", "rn", "ewma",
        "dev", "s_prev", "d_prev", "upper", "lower", "is_aberrant")
      .collect().map(key).toMap
    assert(streamed.size === 51) // late point produced nothing
    assert(streamed === batch)
    // the cross-batch spike was flagged on arrival
    assert(streamed(("a", base + 60000L))._8)
  }

  test("streaming Holt-Winters equals the batch operator across " +
    "micro-batches; off-phase spike flagged on arrival; late point skipped") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    val season = 6
    val rows = (0 until 60).flatMap { i =>
      Seq("a", "b").map { m =>
        val amp = if (m == "a") 50.0 else 20.0
        val v = 100.0 + amp * math.sin(2 * math.Pi * (i % season) / season) +
          ((i * 2654435761L) % 89).toDouble / 89.0
        ("t", m, base + i * 60000L, v)
      }
    } :+ (("t", "a", base + 60 * 60000L, 700.0)) // off-phase spike, last batch
    val mem = MemoryStream[(String, String, Long, Double)]
    // two series share each timestamp: a batch boundary between the pair
    // would watermark the sibling row out at delay 0 — one bucket of
    // allowed lateness keeps it admissible (normal multi-series practice)
    val q = Anomaly.streamingHoltWintersBands(
        mem.toDF().toDF("tenant_id", "metric_name", "ts_ms", "value"),
        season, gamma = 0.5, minPoints = season,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("hw_out")
      .outputMode("append").start()
    rows.grouped(17).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    // a point older than the folded frontier: skipped, no output row
    mem.addData(("t", "a", base - 5000L, 999.0))
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(1), r.getLong(2)) ->
        ((r.getInt(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8),
          if (r.isNullAt(9)) null else r.getDouble(9),
          if (r.isNullAt(10)) null else r.getDouble(10),
          if (r.isNullAt(11)) null else r.getDouble(11),
          if (r.isNullAt(12)) null else r.getDouble(12),
          r.getBoolean(13)))
    val streamed = spark.table("hw_out").collect().map(key).toMap
    val batch = Anomaly.holtWintersBands(
        rows.toDF("tenant_id", "metric_name", "ts_ms", "value"),
        season, gamma = 0.5, minPoints = season)
      .select("tenant_id", "metric_name", "ts_ms", "value", "rn", "level",
        "trend", "seasonal", "dev", "forecast", "dev_used", "upper", "lower",
        "is_aberrant")
      .collect().map(key).toMap
    assert(streamed.size === 121) // late point produced nothing
    assert(streamed === batch)
    // the cross-batch off-phase spike was flagged on arrival
    assert(streamed(("a", base + 60 * 60000L))._10)
  }

  /** Local reference for [[Anomaly.ewmaBands]]'s recurrence. */
  private def localEwma(xs: Seq[Double], alpha: Double)
      : Seq[(Double, Double, Option[Double], Option[Double])] = {
    val beta = 1.0 - alpha
    xs.zipWithIndex.foldLeft(
      (List.empty[(Double, Double, Option[Double], Option[Double])],
        0.0, 0.0)) {
      case ((acc, s, d), (x, i)) =>
        if (i == 0) (acc :+ ((x, 0.0, None, None)), x, 0.0)
        else {
          val ns = alpha * x + beta * s
          val nd = alpha * math.abs(x - s) + beta * d
          (acc :+ ((ns, nd, Some(s), Some(d))), ns, nd)
        }
    }._1
  }

  test("ewmaBands: matches the local fold bit-for-bit, in time order") {
    val alpha = 0.25
    val xs = Seq(10.0, 12.5, 9.0, 11.0, 30.0, 10.5, 10.0, 9.5)
    val rows = xs.zipWithIndex.map { case (v, i) => ("t", "m", i * 1000L, v) }
    val got = Anomaly.ewmaBands(points(rows), alpha, k = 3.0, minPoints = 2)
      .orderBy("ts_ms").collect()
    val want = localEwma(xs, alpha)
    got.zip(want).foreach { case (r, (s, d, sp, dp)) =>
      assert(r.getDouble(5) === s, s"ewma@rn=${r.getInt(2)}")
      assert(r.getDouble(6) === d, s"dev@rn=${r.getInt(2)}")
      assert((if (r.isNullAt(7)) None else Some(r.getDouble(7))) === sp)
      assert((if (r.isNullAt(8)) None else Some(r.getDouble(8))) === dp)
    }
  }

  test("ewmaBands: planted spike flagged against the PRE-spike band; " +
    "constant series never flags; minPoints gates") {
    val base = (0 until 30).map(i => ("t", "m", i * 1000L, 10.0 + (i % 2)))
    val spike = ("t", "m", 30000L, 500.0)
    val flat = (0 until 30).map(i => ("t", "flat", i * 1000L, 7.0))
    val got = Anomaly.ewmaBands(points(base ++ Seq(spike) ++ flat),
        alpha = 0.3, k = 3.0, minPoints = 5)
      .select("metric_name", "ts_ms", "is_aberrant").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    assert(got(("m", 30000L)))
    // alternating 10/11 settles: late steady points unflagged
    assert((20 to 29).forall(i => !got(("m", i * 1000L))))
    // flat series: dev 0 forever -> d_prev > 0 never holds
    assert(flat.forall { case (_, _, ts, _) => !got(("flat", ts)) })
    // early points inside the burn-in window can't flag
    assert((0 to 5).forall(i => !got(("m", i * 1000L))))
  }

  test("ewmaBands: layout-invariant and series-independent") {
    val rows = (0 until 40).map(i =>
      ("t", s"m${i % 3}", (i / 3) * 1000L, (i * 37 % 11).toDouble))
    val a = Anomaly.ewmaBands(points(rows), 0.3, 3.0, 3)
      .orderBy("metric_name", "ts_ms").collect().toSeq
    val b = Anomaly.ewmaBands(points(rows).repartition(7), 0.3, 3.0, 3)
      .orderBy("metric_name", "ts_ms").collect().toSeq
    assert(a === b)
  }

  /** Local reference for [[Anomaly.holtWintersBands]]'s triple recurrence. */
  private def localHw(xs: Seq[Double], season: Int, alpha: Double,
      bt: Double, g: Double): Seq[(Double, Double, Double, Double,
      Option[Double], Option[Double])] = {
    val (ia, ib, ig) = (1.0 - alpha, 1.0 - bt, 1.0 - g)
    val seas = Array.fill(season)(0.0)
    val dev = Array.fill(season)(0.0)
    var l = 0.0
    var b = 0.0
    xs.zipWithIndex.map { case (x, i) =>
      val ph = i % season
      val spre = seas(ph)
      val dpre = dev(ph)
      if (i == 0) {
        l = x; b = 0.0
        val sN = g * (x - l) + ig * spre
        seas(ph) = sN; dev(ph) = 0.0
        (l, b, sN, 0.0, None, None)
      } else {
        val f = l + b + spre
        val lN = alpha * (x - spre) + ia * (l + b)
        val bN = bt * (lN - l) + ib * b
        val sN = g * (x - lN) + ig * spre
        val dN = g * math.abs(x - f) + ig * dpre
        l = lN; b = bN; seas(ph) = sN; dev(ph) = dN
        (lN, bN, sN, dN, Some(f), Some(dpre))
      }
    }
  }

  test("holtWintersBands: matches the local triple-smoothing fold " +
    "bit-for-bit; seasonal forecast learns the cycle") {
    val season = 12
    val rng = new scala.util.Random(4242L)
    val xs = (0 until 8 * season).map(i =>
      100.0 + 40.0 * math.sin(2 * math.Pi * (i % season) / season) +
        rng.nextDouble())
    val rows = xs.zipWithIndex.map { case (v, i) => ("t", "m", i * 1000L, v) }
    val got = Anomaly.holtWintersBands(points(rows), season).orderBy("ts_ms")
      .select("rn", "level", "trend", "seasonal", "dev", "forecast",
        "dev_used")
      .collect()
    val want = localHw(xs, season, 0.1, 0.0035, 0.1)
    got.zip(want).foreach { case (r, (l, b, s, d, f, dp)) =>
      assert(r.getDouble(1) === l, s"level@rn=${r.getInt(0)}")
      assert(r.getDouble(2) === b, s"trend@rn=${r.getInt(0)}")
      assert(r.getDouble(3) === s, s"seasonal@rn=${r.getInt(0)}")
      assert(r.getDouble(4) === d, s"dev@rn=${r.getInt(0)}")
      assert((if (r.isNullAt(5)) None else Some(r.getDouble(5))) === f)
      assert((if (r.isNullAt(6)) None else Some(r.getDouble(6))) === dp)
    }
    // learning: with Graphite's slow γ=0.1 the forecast error shrinks
    // season over season; with a fast γ it collapses to the noise floor
    def mae(rs: Array[org.apache.spark.sql.Row], from: Int, to: Int) = {
      val sl = rs.filter(r => r.getInt(0) > from && r.getInt(0) <= to)
      sl.map(r => math.abs(xs(r.getInt(0) - 1) - r.getDouble(5))).sum / sl.length
    }
    assert(mae(got, 6 * season, 8 * season) < mae(got, season, 3 * season),
      "forecast error must shrink as seasons accumulate")
    val fast = Anomaly.holtWintersBands(points(rows), season, gamma = 0.5)
      .orderBy("ts_ms")
      .select("rn", "level", "trend", "seasonal", "dev", "forecast",
        "dev_used").collect()
    assert(mae(fast, 6 * season, 8 * season) < 2.0,
      "fast-gamma forecast should reach the noise floor")
  }

  test("holtWintersBands: off-phase spike flags, the periodic peak does " +
    "not (what rollingZScores cannot separate); first season cannot flag") {
    val season = 24
    val n = 6 * season
    val spikeAt = 5 * season + 3
    val xs = (0 until n).map { i =>
      val base = 100.0 + 50.0 * math.sin(2 * math.Pi * (i % season) / season)
      // mild phase-stable noise so deviations are nonzero but tight
      val noise = ((i * 2654435761L) % 97).toDouble / 97.0 - 0.5
      if (i == spikeAt) base + 400.0 else base + noise
    }
    val rows = xs.zipWithIndex.map { case (v, i) => ("t", "m", i * 3600000L, v) }
    val got = Anomaly.holtWintersBands(points(rows), season, gamma = 0.5,
        minPoints = season)
      .select("rn", "is_aberrant").collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(got(spikeAt + 1), "planted off-phase spike must flag")
    // the recurring daily peak (phase season/4) is forecast, not flagged
    val peaks = (2 until 5).map(c => c * season + season / 4 + 1)
    peaks.foreach(rn => assert(!got(rn), s"periodic peak at rn=$rn flagged"))
    // first season: dev_used = 0 -> structurally cannot flag
    (1 to season).foreach(rn => assert(!got(rn), s"cold-start flag at $rn"))
  }

  test("ewmaBandsSegmented == ewmaBands bit-for-bit on random multi-series " +
    "input (every double, null, and flag)") {
    val rng = new scala.util.Random(20260814L)
    // 7 series, irregular timestamps, awkward doubles, one-point and
    // two-point series among them
    val rows = (0 until 7).flatMap { si =>
      val n = Seq(1, 2, 13, 40, 97, 200, 64)(si)
      var ts = rng.nextInt(1000).toLong
      (0 until n).map { _ =>
        ts += 1 + rng.nextInt(90000)
        (s"t${si % 3}", s"m$si", ts, rng.nextDouble() * 1e3 - 500.0)
      }
    }
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("tenant_id", "metric_name", "ts_ms")
      .select("tenant_id", "metric_name", "rn", "ts_ms", "value", "ewma",
        "dev", "s_prev", "d_prev", "upper", "lower", "is_aberrant")
      .collect().map(_.toSeq).toSeq
    for (alpha <- Seq(0.3, 0.05, 1.0)) {
      val a = dump(Anomaly.ewmaBands(points(rows), alpha, 3.0, 5))
      val b = dump(Anomaly.ewmaBandsSegmented(points(rows), alpha, 3.0, 5))
      assert(a === b, s"alpha=$alpha")
    }
    // layout-invariance of the segmented fold (repartition upstream)
    val c = dump(Anomaly.ewmaBandsSegmented(points(rows).repartition(11),
      0.3, 3.0, 5))
    assert(c === dump(Anomaly.ewmaBands(points(rows), 0.3, 3.0, 5)))
  }

  test("bounded-series contract enforced: over-long series fails ewmaBands " +
    "with intent; segmented fold rejects null values descriptively") {
    val rows = (0 until 20).map(i => ("t", "m", i * 1000L, i.toDouble))
    val e = intercept[Exception] {
      Anomaly.ewmaBands(points(rows), 0.3, 3.0, 5, maxPointsPerSeries = 10)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("maxPointsPerSeries")), chain(e))
    // within the bound: unchanged
    assert(Anomaly.ewmaBands(points(rows), 0.3, 3.0, 5,
      maxPointsPerSeries = 20).count() === 20L)
    // segmented: a null value cannot retroactively unemit — must fail loud
    import spark.implicits._
    val withNull = Seq(("t", "m", 0L, Some(1.0)), ("t", "m", 1000L, None))
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
    val e2 = intercept[Exception] {
      Anomaly.ewmaBandsSegmented(withNull).collect()
    }
    assert(chain(e2).exists(_.contains("null value")), chain(e2))
  }

  test("ewmaBands: arg guards; alpha=1 degenerates to last-value forecast") {
    intercept[IllegalArgumentException] {
      Anomaly.ewmaBands(points(Seq(("t", "m", 0L, 1.0))), alpha = 0.3, k = 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.EwmaScan(
        org.apache.spark.sql.catalyst.expressions.Literal(null), 0.0)
    }
    // alpha=1: s_t = x_t exactly, so s_prev is the previous raw value
    val xs = Seq(5.0, 8.0, 2.0)
    val got = Anomaly.ewmaBands(
        points(xs.zipWithIndex.map { case (v, i) => ("t", "m", i * 1000L, v) }),
        alpha = 1.0, k = 2.0, minPoints = 1)
      .orderBy("ts_ms").collect()
    assert(got.map(_.getDouble(5)).toSeq === xs)
    assert(got.drop(1).map(_.getDouble(7)).toSeq === xs.dropRight(1))
  }

  test("alertIntervals: gap-inclusive episode merge, minPoints suppression, " +
    "peak |z|, series independence") {
    import spark.implicits._
    val scored = Seq(
      // series a: points at 0,10 (gap 10 merges at gapMs=10), 21 splits
      ("t", "a", 0L, true, 2.6), ("t", "a", 10L, true, -3.5),
      ("t", "a", 21L, true, 2.7),
      ("t", "a", 15L, false, 0.1), // non-anomalous: never joins an episode
      // series b: single anomaly — suppressed at minPoints=2
      ("t", "b", 5L, true, 4.0))
      .toDF("tenant_id", "metric_name", "ts_ms", "is_anomaly", "z")
    val all = Anomaly.alertIntervals(scored, gapMs = 10L)
      .orderBy("metric_name", "start_ms").collect()
    assert(all.map(r => (r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(5), r.getDouble(6))).toSeq === Seq(
      ("a", 0L, 10L, 2L, 3.5),   // |z| peak from the -3.5 point
      ("a", 21L, 21L, 1L, 2.7),
      ("b", 5L, 5L, 1L, 4.0)))
    val strict = Anomaly.alertIntervals(scored, gapMs = 10L, minPoints = 2)
      .collect()
    assert(strict.length === 1 && strict(0).getLong(5) === 2L,
      "single-point episodes suppressed by minPoints")
    // a scorer without a z column still produces episodes (null peak)
    val noZ = Anomaly.alertIntervals(
      scored.drop("z"), gapMs = 10L).orderBy("metric_name", "start_ms")
      .collect()
    assert(noZ.length === 3 && noZ.forall(_.isNullAt(6)))
  }

  test("streamingAlertIntervals: HEALTHY points advance the watermark and " +
    "page resolved incidents; episodes span batches; minPoints at close") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = 1704067200000L
    val gap = 10000L
    val mem = MemoryStream[(String, String, Long, Boolean, Double)]
    val out = Anomaly.streamingAlertIntervals(
      mem.toDF().toDF("tenant_id", "metric_name", "ts_ms", "is_anomaly", "z"),
      gapMs = gap, watermarkDelay = "0 seconds", minPoints = 2)
    val q = out.writeStream.format("memory")
      .queryName("alerts_out").outputMode("append").start()
    try {
      // batch 1: series a opens an episode; series b a single anomaly;
      // a non-anomalous point never enters any episode
      mem.addData(("t", "a", base, true, 3.0), ("t", "a", base + 2000, false, 0.0),
        ("t", "b", base + 1000, true, 9.9))
      q.processAllAvailable()
      assert(spark.table("alerts_out").count() === 0, "nothing closed yet")
      // batch 2: series a grows across the batch boundary (gap not crossed)
      mem.addData(("t", "a", base + 9000, true, -4.5))
      q.processAllAvailable()
      // batches 3-4: ONLY HEALTHY traffic — the incident is over, and the
      // recovered series itself must carry the watermark past the gap
      // deadlines (a post-filter watermark would starve here and the
      // resolved incident would never page)
      mem.addData(("t", "a", base + 100000, false, 0.0))
      q.processAllAvailable()
      mem.addData(("t", "a", base + 200000, false, 0.0))
      q.processAllAvailable()
      val closed = spark.table("alerts_out").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5),
          r.getDouble(6))).toSet
      assert(closed.contains(("a", base, base + 9000, 2L, 4.5)),
        s"series a's episode spans batches 1-2 with |z| peak 4.5; got $closed")
      assert(!closed.exists(_._1 == "b"),
        s"series b's single-point episode is suppressed at minPoints=2; got $closed")
    } finally q.stop()
  }

  test("streamingAlertIntervals: a late admissible point BRIDGES two runs " +
    "instead of splitting the incident (matches the batch answer)") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = 1704067200000L
    val mem = MemoryStream[(String, String, Long, Boolean, Double)]
    // generous watermark so the late bridging point is admissible
    val out = Anomaly.streamingAlertIntervals(
      mem.toDF().toDF("tenant_id", "metric_name", "ts_ms", "is_anomaly", "z"),
      gapMs = 15000L, watermarkDelay = "10 minutes", minPoints = 2)
    val q = out.writeStream.format("memory")
      .queryName("alerts_bridge").outputMode("append").start()
    try {
      // batch 1: two runs 25s apart (> gap) — an eager close would emit
      // [0,0] now and, at minPoints=2, silently suppress it forever
      mem.addData(("t", "a", base, true, 1.0), ("t", "a", base + 25000, true, 2.0))
      q.processAllAvailable()
      // batch 2: the late point at +12s bridges the runs into one episode
      mem.addData(("t", "a", base + 12000, true, 3.0))
      q.processAllAvailable()
      // far-future healthy point closes it via the watermark
      mem.addData(("t", "a", base + 3600000L, false, 0.0))
      q.processAllAvailable()
      mem.addData(("t", "a", base + 7200000L, false, 0.0))
      q.processAllAvailable()
      val closed = spark.table("alerts_bridge").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(5), r.getDouble(6)))
        .toSeq
      assert(closed === Seq((base, base + 25000, 3L, 3.0)),
        s"one bridged episode [0s, 25s] with all 3 points; got $closed")
    } finally q.stop()
  }
}
