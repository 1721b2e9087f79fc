package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite with SparkSuite {

  private val gap = 10000L

  test("assign: gap crossings split, users are independent, ties deterministic") {
    import spark.implicits._
    val rows = Seq(
      // user 1: two sessions (gap of 10s crossed between 20s and 31s)
      (1L, 0L, 10L, 1.0), (1L, 5000L, 11L, 2.0), (1L, 20000L, 12L, 3.0),
      (1L, 31000L, 13L, 4.0),
      // user 2: one session spanning user 1's gap
      (2L, 25000L, 20L, 5.0), (2L, 30000L, 21L, 6.0),
      // user 3: tie on ts_ms — event_id orders them; both in one session
      (3L, 1000L, 31L, 7.0), (3L, 1000L, 30L, 8.0))
      .toDF("user_id", "ts_ms", "event_id", "value")
    val got = Sessionize.assign(rows, gap)
      .select("user_id", "event_id", "session_no").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // user 1: 0,5000 together; 20000 (15s gap) and 31000 (11s gap) each split
    assert(got((1L, 10L)) === 1L && got((1L, 11L)) === 1L)
    assert(got((1L, 12L)) === 2L && got((1L, 13L)) === 3L)
    // user 2's session is untouched by user 1's splits
    assert(got((2L, 20L)) === 1L && got((2L, 21L)) === 1L)
    // user 3: tie on ts_ms ordered by event_id, single session
    assert(got((3L, 30L)) === 1L && got((3L, 31L)) === 1L)
  }

  test("sessions: summary fields match a local reference on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = for {
      u <- 1L to 5L
      i <- 1 to 40
    } yield (u, rng.nextInt(500000).toLong, u * 1000 + i,
      math.floor(rng.nextDouble() * 50))
    val df = rows.toDF("user_id", "ts_ms", "event_id", "value")
    val got = Sessionize.sessions(df, gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // local reference: sort per user, split on gap
    val expect = rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        case (acc, e) =>
          if (e._2 - acc.last.last._2 > gap) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.zipWithIndex.map { case (ses, i) =>
        val ts = ses.map(_._2)
        (u, (i + 1).toLong) ->
          ((ts.min, ts.max, ses.size.toLong, ts.max - ts.min, ses.map(_._4).sum))
      }
    }
    assert(got === expect)
    // layout invariance
    val again = Sessionize.sessions(df.repartition(17), gap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(again === expect.map { case (k, v) => k -> v._3 })
  }

  test("sessionsNative ≡ sessions, including diff == gap exactly on the " +
    "boundary (the +1ms inclusivity adjustment)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val random = (0 until 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.between(0L, 200000L), i.toLong,
        rnd.nextDouble() * 10))
    // boundary cases: diff == gap (must MERGE, as the lag split does) and
    // diff == gap + 1 (must split)
    val edge = Seq(
      (9L, 0L, 900L, 1.0), (9L, gap, 901L, 1.0),          // merge
      (8L, 0L, 800L, 1.0), (8L, gap + 1, 801L, 1.0))      // split
    val df = (random ++ edge).toDF("user_id", "ts_ms", "event_id", "value")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(Sessionize.sessionsNative(df, gap)) ===
      rows(Sessionize.sessions(df, gap)))
    val nine = Sessionize.sessionsNative(df, gap)
      .filter(col("user_id") === 9L).collect()
    assert(nine.length === 1, "diff == gap must merge")
    val eight = Sessionize.sessionsNative(df, gap)
      .filter(col("user_id") === 8L).collect()
    assert(eight.length === 2, "diff == gap + 1 must split")
  }

  test("streaming: sessions close via event-time timeout, continue across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    val mem = MemoryStream[(Long, Long, Double)]
    val out = Sessionize.streamingSessions(
      mem.toDF().toDF("user_id", "ts_ms", "value"),
      gapMs = gap, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()

    // batch 1: user 1 opens a session; user 2 opens one
    mem.addData((1L, base, 1.0), (1L, base + 2000, 2.0), (2L, base + 1000, 5.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() === 0, "nothing closed yet")

    // batch 2: user 1 event still inside the gap — session continues
    mem.addData((1L, base + 9000, 3.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() === 0)

    // batch 3: far-future event for user 1 — watermark jumps past both
    // open sessions' gap deadlines; both close, the new event opens fresh
    mem.addData((1L, base + 100000, 4.0))
    q.processAllAvailable()
    // extra empty-ish batch lets pending event-time timeouts fire
    mem.addData((9L, base + 200000, 0.0))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sess_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(closed.contains((1L, base, base + 9000, 3L, 6.0)),
      s"user 1's first session spans batches 1-2; got $closed")
    assert(closed.contains((2L, base + 1000, base + 1000, 1L, 5.0)),
      s"user 2's single-event session closes by timeout; got $closed")
    // user 1's second session (base+100000) may still be open — it must
    // NOT have been emitted with the first session's events folded in
    assert(!closed.exists(c => c._1 == 1L && c._2 == base && c._3 > base + 9000))
  }

  test("streaming: out-of-order arrival bridges runs instead of emitting a stray") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    val mem = MemoryStream[(Long, Long, Double)]
    // generous watermark so the late events are admitted
    val out = Sessionize.streamingSessions(
      mem.toDF().toDF("user_id", "ts_ms", "value"), gap, "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("sess_bridge").outputMode("append").start()
    // batch 1: session opens at t=100s
    mem.addData((1L, base + 100000, 1.0))
    q.processAllAvailable()
    // batch 2: t=85s (older than start - gap) PLUS t=92s which bridges it
    // into the open session — one merged session {85s..100s}, no stray
    mem.addData((1L, base + 85000, 2.0), (1L, base + 92000, 3.0))
    q.processAllAvailable()
    // flush far in the future to close everything
    mem.addData((1L, base + 10000000L, 0.0)); q.processAllAvailable()
    mem.addData((1L, base + 20000000L, 0.0)); q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_bridge")
      .filter(col("session_start") < base + 1000000L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(closed ===
      Set((base + 85000L, base + 100000L, 3L, 6.0)),
      "the three events form ONE session spanning 85s-100s")
  }

  test("streaming: batch result equals batch sessionize on the same closed range") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L
    val rng = new scala.util.Random(3)
    val evs = (1 to 60).map { i =>
      (1L + i % 3, base + rng.nextInt(60000).toLong, 1.0 * i)
    }
    val mem = MemoryStream[(Long, Long, Double)]
    val out = Sessionize.streamingSessions(
      mem.toDF().toDF("user_id", "ts_ms", "value"), gap, "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("sess_eq").outputMode("append").start()
    // feed in global event-time order: the 0s watermark then admits every
    // event, so every closed streaming session must equal the batch answer
    evs.sortBy(_._2).grouped(20).foreach { g =>
      mem.addData(g: _*); q.processAllAvailable()
    }
    // flush: an event far past everything closes all open sessions
    mem.addData((99L, base + 10000000L, 0.0)); q.processAllAvailable()
    mem.addData((99L, base + 20000000L, 0.0)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_eq")
      .filter(col("user_id") =!= 99L)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toSet
    val batch = Sessionize.sessions(
        evs.zipWithIndex.map { case ((u, t, v), i) => (u, t, i.toLong, v) }
          .toDF("user_id", "ts_ms", "event_id", "value"), gap)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toSet
    assert(streamed === batch,
      "every closed streaming session matches the batch sessionization, sums included")
  }
}
