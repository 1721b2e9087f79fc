package graft

import graft.operators.Dedup
import graft.streaming.IngestStream
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** Regressions for the round-7 advice findings fixed in round 8 (the BPE
  * code-point finding has its own fixture in BpeSpec). */
class AdviceRegressionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("rebuildCatalog spares a catalog dir landed after its snapshot — " +
    "a concurrent ingest's entry survives retirement") {
    val store = java.nio.file.Files.createTempDirectory("graft_rbc").toString
    val day = 19700L * 86400000L
    Seq(("acme", "m.old", day, day + 1L, 1.0, "req"))
      .toDF("tenant_id", "metric_name", "ts_day", "ts_ms", "value", "unit")
      .write.mode("overwrite").partitionBy("ts_day")
      .parquet(s"$store/metrics_full/batch_id=0")
    // the stale catalog dir the rebuild is expected to retire
    Seq(("acme", "m.old", "basic", "req"))
      .toDF("tenant_id", "metric_name", "family", "unit")
      .coalesce(1).write.parquet(s"$store/metric_catalog/src=http/batch_id=5")
    // fire a "concurrent ingest" between the snapshot and the retire loop:
    // its catalog dir (for a locator whose data is still landing) must NOT
    // be deleted — before the fix the retire glob swept it away, leaving a
    // marked-complete catalog missing a live locator
    IngestStream.rebuildCatalog(spark, store, () => {
      Seq(("acme", "m.new", "basic", "req"))
        .toDF("tenant_id", "metric_name", "family", "unit")
        .coalesce(1).write
        .parquet(s"$store/metric_catalog/src=http/batch_id=77")
    })
    assert(fs.exists(new Path(s"$store/metric_catalog/src=http/batch_id=77")),
      "post-snapshot catalog dir must survive the retire loop")
    assert(!fs.exists(new Path(s"$store/metric_catalog/src=http/batch_id=5")),
      "pre-snapshot dirs are still retired")
    val names = IngestStream.metricCatalog(spark, store).get
      .select("metric_name").distinct().collect().map(_.getString(0)).toSet
    assert(names === Set("m.old", "m.new"))
  }

  test("incrementalNearDups releases its checkpoint blocks per batch — " +
    "a long-lived stream cannot accumulate executor storage") {
    val docs = (1L to 80L).map(i =>
      (i, s"token stream number $i with shared words alpha beta gamma " +
        s"delta epsilon zeta")).toDF("doc_id", "text")
    val oldSig = Dedup.minhashSignatures(docs.filter(col("doc_id") <= 60))
      .localCheckpoint()
    val before = spark.sparkContext.getPersistentRDDs.size
    // three "daily" increments, each materialized like a micro-batch sink
    for (lo <- Seq(61L, 68L, 75L)) {
      Dedup.incrementalNearDups(
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 7),
        oldSig, docs).collect()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    // each batch leaves AT MOST its tiny verified-result checkpoint (freed
    // on GC); before the fix each batch ALSO leaked its candidate and
    // band-key blocks — 2 extra RDDs per batch, unbounded over a stream
    assert(after - before <= 3,
      s"checkpoint blocks leaked: $before -> $after persistent RDDs")
  }

  test("repeated identical event POSTs store two annotations (reference " +
    "ES-auto-id parity); identical metric POSTs still collapse") {
    val client = HttpClient.newHttpClient()
    val now = 1704067200000L
    val store = java.nio.file.Files.createTempDirectory("graft_evn").toString
    val srv = new graft.http.MetricsHttpServer(spark, store, nowMs = () => now)
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      def post(url: String, body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(url))
          .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
          .build(), HttpResponse.BodyHandlers.ofString())
      val t0 = now - 600000L
      val evBody = s"""{"what": "deploy", "when": $t0, "data": "b42",
                      | "tags": "rel"}""".stripMargin
      assert(post(s"$base/v2.0/acme/events", evBody).statusCode() === 200)
      assert(post(s"$base/v2.0/acme/events", evBody).statusCode() === 200)
      assert(spark.read.parquet(s"$store/events").count() === 2,
        "two intentional identical event POSTs must both store")
      // metrics stay value-idempotent: identical re-POST replaces its batch
      val mBody = s"""[{"metricName": "m.a", "metricValue": 1.0,
                     |  "collectionTime": $t0}]""".stripMargin
      assert(post(s"$base/v2.0/acme/ingest", mBody).statusCode() === 200)
      assert(post(s"$base/v2.0/acme/ingest", mBody).statusCode() === 200)
      assert(spark.read.parquet(s"$store/metrics_full").count() === 1)
    } finally srv.stop()
  }
}
