package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event inside the streaming sessionizer (event-time as TIMESTAMP so
  * the watermark can bind to it). */
case class SessEvent(user_id: Long, ets: java.sql.Timestamp, value: Double)

/** The open-session state kept per user between micro-batches. Value sums
  * accumulate as CENTS (each value snapped to 2 decimals, HALF_UP — the
  * same rounding as the batch path's DECIMAL(28,2) cast) so the emitted
  * sum is exact and independent of arrival order across micro-batches. */
case class OpenSession(start: Long, last: Long, n_events: Long, sum_cents: Long)

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

  /** [[sessions]] through Spark's NATIVE `session_window` aggregation —
    * same summaries, zero custom session logic: Catalyst's
    * UpdatingSessionsExec merges each user's overlapping event windows in
    * one aggregation pass (no lag window + running sum). The built-in
    * merges two events when the next start falls on or before the
    * previous window's end (ts + gap) — INCLUSIVE at the boundary, so
    * diff ≤ gap merges, exactly the lag-based split's rule (pinned by
    * the diff == gap / diff == gap+1 boundary cases in SessionizeSpec).
    * `session_no` (the lag formulation's output) is recovered by ranking
    * each user's sessions by start — a per-user window over session
    * COUNTS, not events. */
  def sessionsNative(events: DataFrame, gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    events
      .groupBy(col("user_id"),
        session_window(timestamp_millis(col("ts_ms")),
          s"$gapMs milliseconds").as("__sw"))
      .agg(
        min(col("ts_ms")).as("session_start"),
        max(col("ts_ms")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .withColumn("session_no",
        row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("session_start")))
          .cast("long"))
      .select("user_id", "session_no", "session_start", "session_end",
        "n_events", "duration_ms", "sum_value")
  }

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

  /** The batch path's DECIMAL(28,2) rounding (HALF_UP), as integer cents. */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** Per-user state transition: SEGMENT MERGE over the open session plus
    * the batch's events. Each watermark-admitted event is a singleton
    * segment; the open session is one segment; sorted by start time,
    * adjacent segments merge when their gap is within `gapMs` — exactly
    * the batch gap-split over the union, so an out-of-order arrival that
    * BRIDGES two runs merges them instead of being emitted as a stray.
    * Every merged segment except the last closes; the last stays open in
    * the state store. (A stray that bridges into a range whose session
    * was ALREADY emitted cannot retract it — the inherent append-mode
    * limit; the watermark bounds how often that can happen.) */
  private def update(gapMs: Long)(user: Long, batch: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(
        ClosedSession(user, s.start, s.last, s.n_events, s.sum_cents / 100.0))
    } else {
      val segs = (state.getOption.toSeq ++
        batch.map(e => OpenSession(e.ets.getTime, e.ets.getTime, 1L,
          cents(e.value)))).sortBy(s => (s.start, s.last))
      if (segs.isEmpty) return Iterator.empty
      val merged = segs.tail.foldLeft(Vector(segs.head)) { (acc, s) =>
        val cur = acc.last
        if (s.start - cur.last <= gapMs)
          acc.init :+ OpenSession(cur.start, math.max(cur.last, s.last),
            cur.n_events + s.n_events, cur.sum_cents + s.sum_cents)
        else acc :+ s
      }
      val open = merged.last
      state.update(open)
      // must stay ahead of the watermark or the state API rejects it; an
      // already-expired session then times out on the next batch
      state.setTimeoutTimestamp(
        math.max(open.last + gapMs, state.getCurrentWatermarkMs() + 1))
      merged.init.iterator.map(s =>
        ClosedSession(user, s.start, s.last, s.n_events, s.sum_cents / 100.0))
    }
  }
}
