package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The alert-daemon lifecycle end to end: a parquet file stream of scored
  * points driven through [[AlertStream]] in `--once` (AvailableNow)
  * catch-up runs — each run a fresh query over the SAME checkpoint, i.e. a
  * daemon restart — closing episodes only when the recovered watermark
  * proves their gaps elapsed, folding them into the `alert_episodes` sink,
  * and finally served over HTTP by the facade route. */
class AlertStreamSpec extends AnyFunSuite with SparkSuite {

  private val base = 1704067200000L // 2024-01-01 00:00 UTC
  private val schema = StructType.fromDDL(
    "tenant_id string, metric_name string, ts_ms long, " +
      "is_anomaly boolean, z double")

  test("file-stream catch-up runs close episodes across daemon restarts; " +
    "the facade serves the sink table") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_alertd").toString
    val in = s"$root/in"; val store = s"$root/store"; val ckpt = s"$root/ckpt"

    def drop(name: String,
        rows: Seq[(String, String, Long, Boolean, Double)]): Unit =
      rows.toDF("tenant_id", "metric_name", "ts_ms", "is_anomaly", "z")
        .coalesce(1).write.parquet(s"$in/$name")
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*")
      val q = AlertStream.start(stream, store, ckpt, gapMs = 10000L,
        watermarkDelay = "0 seconds", minPoints = 2, availableNow = true)
      q.awaitTermination()
    }

    // before anything closed: empty frame with the store schema, not a
    // crash; the facade serves []
    assert(AlertStream.episodesStore(spark, store).count() === 0)

    // run 1: an incident (two anomalies 9s apart, inside gap) + a healthy
    // point — nothing can close yet (watermark hasn't passed the gap)
    drop("b1", Seq(
      ("t", "a", base, true, 3.0),
      ("t", "a", base + 2000, false, 0.0),
      ("t", "a", base + 9000, true, -4.5),
      ("t", "b", base + 1000, true, 9.9))) // single point: minPoints victim
    runOnce()
    assert(AlertStream.episodesStore(spark, store).count() === 0,
      "gap not provably elapsed after run 1")

    // run 2 (daemon RESTART, same checkpoint): only healthy recovered
    // traffic — it must advance the recovered watermark past the deadlines
    drop("b2", Seq(("t", "a", base + 100000, false, 0.0)))
    runOnce()
    // run 3: one more healthy batch lets the event-time timeout fire on
    // the now-ripe segments
    drop("b3", Seq(("t", "a", base + 200000, false, 0.0)))
    runOnce()

    val eps = AlertStream.episodesStore(spark, store)
      .select("tenant_id", "metric_name", "start_ms", "end_ms", "n_points",
        "peak_abs_z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(eps === Set(("t", "a", base, base + 9000, 2L, 4.5)),
      s"one episode spanning restarts, |z| peak 4.5, b suppressed; got $eps")

    // the facade serves the sink — range-filtered, glob-filtered
    val srv = new graft.http.MetricsHttpServer(spark, store,
      nowMs = () => base + 300000L)
    srv.start()
    try {
      val client = HttpClient.newHttpClient()
      def get(url: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      val b = s"http://127.0.0.1:${srv.boundPort}"
      val ok = get(s"$b/v2.0/t/alerts/episodes")
      assert(ok.statusCode() === 200, ok.body())
      assert(ok.body().contains(s""""start_ms": $base"""), ok.body())
      assert(ok.body().contains(""""n_points": 2"""), ok.body())
      assert(ok.body().contains(""""peak_abs_z": 4.5"""), ok.body())
      // wrong tenant / out-of-range / non-matching glob all serve []
      assert(get(s"$b/v2.0/other/alerts/episodes").body() === "[]")
      assert(get(s"$b/v2.0/t/alerts/episodes?from=${(base + 60000) / 1000}")
        .body() === "[]")
      assert(get(s"$b/v2.0/t/alerts/episodes?metric=nope.*").body() === "[]")
      assert(get(s"$b/v2.0/t/alerts/episodes?metric=a")
        .body().contains(""""n_points": 2"""))
    } finally srv.stop()
  }
}
