package graft.core

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** Multi-writer safety for the store (the r12 verdict's missing #1): one
  * `_writer_lock` lease per store root with TTL + fencing token, acquired
  * by the facade at boot, verified by every SnapshotStore commit. The
  * contract: a second FOREIGN live writer refuses at boot; an expired or
  * same-process lease hands over with a fresh token that fences the old
  * holder's commits; a forged/stale token is rejected at the commit
  * point, before any rename. */
class WriterLeaseSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val day0 = 1704067200000L

  private def slice(store: String) =
    Seq(("t1", "m.a", day0 + 1000L, 1.5))
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
      .withColumn("ts_day", org.apache.spark.sql.functions.lit(day0))

  private def forgeLock(store: String, token: String, owner: String,
      expiresAt: Long): Unit = {
    val out = fs.create(WriterLease.lockPath(store), true)
    out.write(s"$token\n$owner\n$expiresAt\n".getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  test("a live FOREIGN lease refuses a second writer at boot; an expired " +
    "one hands over; release frees the store") {
    val store = java.nio.file.Files.createTempDirectory("graft_wl1").toString
    forgeLock(store, "tok-foreign", "999999@otherhost",
      System.currentTimeMillis() + 3600000L)
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(spark, store)
    }
    assert(e.getMessage.contains("held by 999999@otherhost"))
    // expired foreign lease: takeover succeeds with a FRESH token
    forgeLock(store, "tok-foreign", "999999@otherhost",
      System.currentTimeMillis() - 1000L)
    val lease = WriterLease.acquire(spark, store)
    assert(lease.token != "tok-foreign")
    WriterLease.release(spark, lease)
    assert(!fs.exists(WriterLease.lockPath(store)))
    // handoff after release: a fresh acquire succeeds
    val lease2 = WriterLease.acquire(spark, store)
    WriterLease.release(spark, lease2)
  }

  test("renewal extends the expiry stamp; an un-renewed lease expires and " +
    "hands over; renewal after takeover fails") {
    val store = java.nio.file.Files.createTempDirectory("graft_wl4").toString
    val T = 1704067200000L
    val lease = WriterLease.acquire(spark, store, ttlMs = 1000L,
      nowMs = () => T)
    def expiresAt: Long = {
      val in = fs.open(WriterLease.lockPath(store))
      val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
                finally in.close()
      txt.split("\n")(2).trim.toLong
    }
    assert(expiresAt == T + 1000L)
    WriterLease.renew(spark, lease, nowMs = () => T + 500L)
    assert(expiresAt == T + 1500L)
    // a foreign writer CANNOT take over while the renewed stamp is live
    // (re-owner the file as a stranger so the same-owner takeover rule
    // does not apply; token and stamp stay ours)
    forgeLock(store, lease.token, "9@h", T + 1500L)
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(spark, store, nowMs = () => T + 1400L)
    }
    assert(e.getMessage.contains("held by"), e.getMessage)
    // …but once the stamp passes un-renewed, takeover succeeds and the
    // old handle can no longer renew
    val lease2 = WriterLease.acquire(spark, store, nowMs = () => T + 1600L)
    intercept[IllegalStateException] { WriterLease.renew(spark, lease) }
    WriterLease.release(spark, lease2)
  }

  test("a forged/stale token is rejected at the COMMIT point: a writer " +
    "superseded after acquiring cannot publish") {
    val store = java.nio.file.Files.createTempDirectory("graft_wl2").toString
    val lease = WriterLease.acquire(spark, store)
    // publish under the live lease: passes
    SnapshotStore.publish(slice(store), s"$store/metrics_5m")
    // a NEW writer takes over (crash-restart shape: same process, fresh
    // token) — the old handle is fenced
    val lease2 = WriterLease.acquire(spark, store)
    assert(lease.isLost, "superseded handle must be marked lost")
    // forge the file to a stranger's token too (the strongest stale case:
    // neither the old nor the new in-process token matches)
    forgeLock(store, "tok-stolen", "999999@otherhost",
      System.currentTimeMillis() + 3600000L)
    val e = intercept[IllegalStateException] {
      SnapshotStore.publish(slice(store), s"$store/metrics_5m")
    }
    assert(e.getMessage.contains("fencing"), e.getMessage)
    // no torn state: the staged-but-rejected publish left gen=0 alone
    val served = SnapshotStore.read(spark, s"$store/metrics_5m")
    assert(served.exists(_.count() == 1))
    // the zombie's renewal fails loudly instead of resurrecting it
    val e2 = intercept[IllegalStateException] {
      WriterLease.renew(spark, lease)
    }
    assert(e2.getMessage.contains("lost") || e2.getMessage.contains("fenced"))
    WriterLease.release(spark, lease2) // lost file token: no-op delete path
  }

  test("two facade instances on ONE store: the second (crash-restart " +
    "takeover) fences the first — the zombie's drain commits are " +
    "rejected, the new facade's pass; stop/boot handoff works") {
    val store = java.nio.file.Files.createTempDirectory("graft_wl3").toString
    val now = day0 + 5L * 86400000L
    val srv1 = new graft.http.MetricsHttpServer(spark, store,
      nowMs = () => now, maxAgeMs = 10L * 86400000L,
      deferRollups = true, rollupDelayMs = Long.MaxValue / 4)
    srv1.start()
    val client = java.net.http.HttpClient.newHttpClient()
    def post(port: Int, body: String) = client.send(
      java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(
          s"http://127.0.0.1:$port/v2.0/acme/ingest"))
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofString(body, StandardCharsets.UTF_8)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    try {
      val t0 = now - 86400000L
      assert(post(srv1.boundPort,
        s"""[{"metricName":"wl.m","metricValue":2.0,"collectionTime":$t0}]""")
        .statusCode() == 200)
      // second facade on the SAME store, first never stopped (zombie):
      // boot takes the lease over with a fresh token
      val srv2 = new graft.http.MetricsHttpServer(spark, store,
        nowMs = () => now, maxAgeMs = 10L * 86400000L,
        deferRollups = true, rollupDelayMs = Long.MaxValue / 4)
      srv2.start()
      try {
        // the ZOMBIE's drain is fenced at the commit point (its pending
        // day survives in ITS map, but the publish is rejected — no
        // silent generation race); stop() logs and proceeds
        assert(srv1.pendingRollupDays == 1)
        val fenced = intercept[IllegalStateException] { srv1.rollNow() }
        assert(fenced.getMessage.contains("fencing"), fenced.getMessage)
        assert(graft.core.DirtyDayLog.list(spark, store)
          .getOrElse("basic", Set.empty).nonEmpty,
          "fenced zombie must NOT have unmarked the durable dirty marker")
        assert(SnapshotStore.read(spark, s"$store/metrics_5m").isEmpty,
          "fenced zombie must NOT have published a tier")
        // the NEW facade's drain passes (boot reconciliation re-pended)
        assert(srv2.pendingRollupDays == 1)
        srv2.rollNow()
        assert(srv2.pendingRollupDays == 0)
        assert(SnapshotStore.read(spark, s"$store/metrics_5m")
          .exists(_.count() == 1))
      } finally srv2.stop()
      // handoff after a clean stop: a third boot acquires freely
      val srv3 = new graft.http.MetricsHttpServer(spark, store,
        nowMs = () => now, maxAgeMs = 10L * 86400000L)
      srv3.stop()
    } finally srv1.stop()
  }
}
