package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event inside the streaming sessionizer (event-time as TIMESTAMP so
  * the watermark can bind to it). */
case class SessEvent(user_id: Long, ets: java.sql.Timestamp, value: Double)

/** The open-session state kept per user between micro-batches. */
case class OpenSession(start: Long, last: Long, n_events: Long, sum_value: Double)

/** A finished session (gap elapsed, proven by the event-time watermark). */
case class ClosedSession(user_id: Long, session_start: Long, session_end: Long,
    n_events: Long, sum_value: Double)

/** Gap-based sessionization of the event stream — the session-window
  * primitive the reference lacks outright (SURVEY §2.9: "Session windows:
  * none"; its tumbling granularities cannot express activity-bounded
  * windows). A session is a maximal run of one user's events in which no
  * two consecutive events are more than `gapMs` apart.
  *
  * Batch form: two per-user windows (a `lag` to mark gap-crossings, a
  * running sum to number sessions) — users sessionize independently and in
  * parallel, no cross-user shuffle, so the shape holds at any user count;
  * one user's own timeline is serial by definition. Tie order inside a
  * user is (ts_ms, event_id), total, so session numbering is deterministic
  * and layout-invariant.
  *
  * Streaming form: `flatMapGroupsWithState` with an EVENT-TIME timeout —
  * the per-user open session lives in the state store; a session is
  * emitted exactly once, when the watermark proves no event can still
  * arrive inside its gap. State is one small struct per ACTIVE user
  * (closed sessions leave the store), the bounded-state discipline of
  * [[Dedup.streamingDedupKeepFirst]] applied to custom state. */
object Sessionize {

  /** Per-event session assignment: adds `session_no` (1-based per user).
    * Requires columns user_id, ts_ms, event_id (tie-break). */
  def assign(events: DataFrame, gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts_ms"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ts", lag(col("ts_ms"), 1).over(order))
      .withColumn("__new_sess",
        (col("__prev_ts").isNull || col("ts_ms") - col("__prev_ts") > gapMs)
          .cast("long"))
      .withColumn("session_no", sum(col("__new_sess")).over(run))
      .drop("__prev_ts", "__new_sess")
  }

  /** Per-session summary: (user_id, session_no, session_start, session_end,
    * n_events, duration_ms, sum_value) — value summed through exact
    * DECIMAL per the oracle-parity discipline. */
  def sessions(events: DataFrame, gapMs: Long): DataFrame =
    assign(events, gapMs)
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts_ms")).as("session_start"),
        max(col("ts_ms")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))

  /** Streaming sessionization: append-mode stream of [[ClosedSession]]s.
    * `events` needs (user_id, ts_ms, value); `watermarkDelay` bounds how
    * late an event may arrive and still join its session. */
  def streamingSessions(events: DataFrame, gapMs: Long,
      watermarkDelay: String): Dataset[ClosedSession] = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        timestamp_millis(col("ts_ms").cast("long")).as("ets"),
        col("value").cast("double").as("value"))
      .withWatermark("ets", watermarkDelay)
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapMs))
  }

  /** Per-user state transition. Batch events fold in event-time order:
    * an event inside `[start - gap, last + gap]` of the open session joins
    * it (start/end widen for out-of-order arrivals the watermark let in);
    * an event past `last + gap` closes the open session and opens a new
    * one; an event OLDER than `start - gap` is a watermark-admitted stray
    * from a prior, already-emitted time range — it closes immediately as
    * its own single-event session rather than corrupting the open one. */
  private def update(gapMs: Long)(user: Long, batch: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(ClosedSession(user, s.start, s.last, s.n_events, s.sum_value))
    } else {
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var open = state.getOption
      for (e <- batch.toSeq.sortBy(_.ets.getTime)) {
        val t = e.ets.getTime
        open match {
          case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
            open = Some(OpenSession(math.min(s.start, t), math.max(s.last, t),
              s.n_events + 1, s.sum_value + e.value))
          case Some(s) if t > s.last + gapMs =>
            closed += ClosedSession(user, s.start, s.last, s.n_events, s.sum_value)
            open = Some(OpenSession(t, t, 1L, e.value))
          case Some(_) => // stray older than start - gap
            closed += ClosedSession(user, t, t, 1L, e.value)
          case None =>
            open = Some(OpenSession(t, t, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // must stay ahead of the watermark or the state API rejects it;
        // an already-expired session then times out on the next batch
        state.setTimeoutTimestamp(
          math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.iterator
    }
  }
}
