package graft.streaming

import graft.SparkSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Pins the steady-state micro-batch's Spark JOB COUNT — the measured
  * latency floor on local[32] is ~300 ms fixed per job (docs/SCALE.md), so
  * the fused observe-on-write path's whole point is the count: staged raw
  * write (with the accounting riding as observed metrics) + the dirty-day
  * 5m re-roll publish, and nothing else on a warm store. The classic path
  * pays two more (stats aggregate + catalog collect). */
class SteadyJobCountSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val base = 1704067200000L

  private def mkBatch(n: Int, shift: Long) = IngestStream.withValidity(
    (0 until n).map(i => ("t1", s"m${i % 8}", base + shift + i * 1000L,
      i.toDouble, 86400, "ms"))
      .toDF("tenant_id", "metric_name", "ts_ms", "value",
        "ttl_seconds", "unit"),
    1L, Long.MaxValue)

  /** Job stage-name traces for everything `body` runs (AQE shuffle/
    * broadcast materializations included — each carries its action's
    * call site). */
  private def jobSites(body: => Unit): Seq[String] = {
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        sites.add(js.stageInfos.map(_.name.takeWhile(_ != '\n').take(60))
          .mkString("[", ";", "]"))
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(500) } // listener events drain async
    finally spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    sites.asScala.toSeq
  }

  test("fused steady batch issues NO driver collect job (accounting and " +
    "catalog ride the write); classic pays the collect") {
    val store = Files.createTempDirectory("graft_sjc").toString
    // warm: first batch seeds store + catalog memo (cost not under test)
    IngestStream.processBatch(mkBatch(64, 0L), store, batchId = 0L)
    val fused = jobSites {
      IngestStream.processBatch(mkBatch(64, 600000L), store, batchId = 1L,
        fuseObserve = true)
    }
    val classic = jobSites {
      IngestStream.processBatch(mkBatch(64, 1200000L), store, batchId = 2L)
    }
    info(s"fused jobs: ${fused.mkString(" | ")}")
    info(s"classic jobs: ${classic.mkString(" | ")}")
    // the fusion pin: no stats/catalog collect job anywhere in the fused
    // trace (the only actions are the two staged writes + their AQE
    // materializations); the classic path pays the collect
    assert(!fused.exists(_.contains("collect at")),
      s"fused path ran a driver collect: ${fused.mkString(" | ")}")
    assert(classic.exists(_.contains("collect at")),
      "classic path lost its accounting collect — spec shape outdated")
    assert(fused.size <= classic.size,
      s"fused (${fused.size}) ran more jobs than classic (${classic.size})")
  }
}
