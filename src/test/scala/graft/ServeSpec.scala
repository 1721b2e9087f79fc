package graft

import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The daemon entry point end to end: boot [[Serve.start]] on a temp
  * store, ingest through the wire, query back, run a maintenance pass
  * inline, and shut down cleanly (non-daemon pools released — the Demo
  * hang class from round 6). */
class ServeSpec extends AnyFunSuite with SparkSuite {

  test("Serve boots the facade + maintenance loop: wire ingest → render " +
    "→ maintenance report → clean stop") {
    val store = java.nio.file.Files.createTempDirectory("graft_serve").toString
    val h = Serve.start(spark, store, port = 0, maintainEverySec = 3600L,
      maxAgeMs = Long.MaxValue / 4)
    try {
      val base = s"http://127.0.0.1:${h.port}"
      val client = HttpClient.newHttpClient()
      def get(url: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      // root ping
      assert(get(s"$base/v2.0").statusCode() === 200)
      // wire ingest
      val now = System.currentTimeMillis()
      val body = s"""[{"metricName": "srv.up", "metricValue": 1.5,
                    | "collectionTime": $now, "ttlInSeconds": 172800,
                    | "unit": "count"}]""".stripMargin
      val post = client.send(HttpRequest.newBuilder(
          URI.create(s"$base/v2.0/acme/ingest"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() === 200, post.body())
      // render it back
      val r = get(s"$base/render?target=srv.up&tenant=acme" +
        s"&from=${now / 1000 - 60}&until=${now / 1000 + 60}")
      assert(r.statusCode() === 200, r.body())
      assert(r.body().contains("[1.5, "), r.body())
      // one maintenance pass inline: runs every sub-pass without error
      // on a live store and reports
      val report = h.maintainNow()
      assert(report.probesHealthy(0.0)) // no probes configured → vacuous
    } finally h.stop()
    // stopped: the port no longer accepts (connection refused)
    intercept[Exception] {
      HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${h.port}/v2.0"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
    }
  }
}
