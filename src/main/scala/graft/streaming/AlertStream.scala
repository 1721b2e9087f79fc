package graft.streaming

import graft.operators.Anomaly
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The alert-episode daemon lifecycle — the serving loop around
  * [[Anomaly.streamingAlertIntervals]]: a checkpointed query folds closed
  * (watermark-proven) incident episodes into a standing sink table that the
  * HTTP facade serves (`GET /v2.0/:tenant/alerts/episodes`), so the
  * watermark-correct streaming twin of [[Anomaly.alertIntervals]] is
  * reachable without writing Scala — point a daemon at a scored stream and
  * read incidents over HTTP.
  *
  * Store layout under `storeDir`:
  *  - `alert_episodes/batch_id=N/` — closed episodes, one dir per
  *    micro-batch, OVERWRITE of the batch's own partition: idempotent
  *    under foreachBatch's at-least-once replays (the [[DocumentStream]]
  *    convention). Episodes are append-only facts — an episode closes
  *    exactly once, proven by the event-time watermark, so no
  *    read-modify-write ever happens here.
  *
  * The input is a SCORED stream (`tenant_id, metric_name, ts_ms,
  * is_anomaly[, z]`) — scoring stays a composable upstream concern (the
  * EWMA/HW band scorers run per-batch over rollup tiers; a static
  * threshold scorer can run inline on the stream), while THIS lifecycle
  * owns what streaming alone can prove: that a gap truly elapsed, healthy
  * traffic advancing the watermark (the filter-starvation trap CLAUDE.md
  * records), late points bridging runs instead of splitting incidents.
  *
  * Scale shape: state per series is the pending segment list (steady state
  * one open episode); the sink grows by closed incidents, not points. */
object AlertStream {

  /** Start the checkpointed episode query over a scored streaming frame.
    * `watermarkDelay` is the lateness budget (Spark duration string);
    * `gapMs`/`minPoints` are the page-dedup knobs of the batch twin;
    * `availableNow = true` runs one catch-up over everything currently in
    * the source and stops (the daemon's `--once` mode). */
  def start(scored: DataFrame, storeDir: String, checkpointDir: String,
      gapMs: Long, watermarkDelay: String, minPoints: Int = 1,
      availableNow: Boolean = false): StreamingQuery = {
    val w = Anomaly
      .streamingAlertIntervals(scored, gapMs, watermarkDelay, minPoints)
      .toDF()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // persist: isEmpty would otherwise run the whole
        // flatMapGroupsWithState micro-batch plan a SECOND time for the
        // write (the DocumentStream pattern)
        val cached = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (!cached.isEmpty)
            cached.write.mode("overwrite")
              .parquet(s"$storeDir/alert_episodes/batch_id=$id")
        } finally cached.unpersist()
      }
    (if (availableNow)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
  }

  /** Every closed episode so far — the table the facade serves. Before the
    * first close there is no parquet yet: serve an empty frame with the
    * store's schema, not a crash (the repo-wide store-reader contract). */
  def episodesStore(spark: SparkSession, storeDir: String): DataFrame =
    if (IngestStream.hasParquetData(spark, s"$storeDir/alert_episodes"))
      spark.read.parquet(s"$storeDir/alert_episodes")
    else {
      import spark.implicits._
      // batch_id as INT: partition-value inference types the populated
      // store's batch_id=N dirs as IntegerType — the empty frame must
      // declare the SAME type or the served schema flips with store state
      Seq.empty[(String, String, Long, Long, Long, Long, Option[Double], Int)]
        .toDF("tenant_id", "metric_name", "start_ms", "end_ms",
          "duration_ms", "n_points", "peak_abs_z", "batch_id")
    }
}
