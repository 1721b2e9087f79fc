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
}
