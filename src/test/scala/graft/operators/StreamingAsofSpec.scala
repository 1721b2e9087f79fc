package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** [[TimeJoin.streamingAsOf]] — on-arrival latest-baseline enrichment must
  * match the batch bounded as-of on in-order feeds, across micro-batches,
  * with bounded state. */
class StreamingAsofSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val base = 1704067200000L
  private val w = 60000L // 1 min tolerance

  /** (tag, ts_ms, value): tag 0 = right (baseline), 1 = left (point). */
  private def run(batches: Seq[Seq[(Int, Long, Double)]]): Seq[(Long, Option[Long], Option[Double])] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Double, Int)]
    val all = mem.toDF().toDF("tenant_id", "metric_name", "ts_ms", "value", "tag")
    val enriched = TimeJoin.streamingAsOf(
      all.filter($"tag" === 1).drop("tag"),
      all.filter($"tag" === 0).drop("tag"), w)
    val name = s"asof_out_${System.nanoTime()}"
    val q = enriched.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    for (b <- batches) {
      mem.addData(b.map { case (tag, ts, v) => ("t", "m", ts, v, tag) }: _*)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name).collect().map { r =>
      (r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toSeq.sortBy(_._1)
  }

  test("≡ batch bounded asOf on an in-order feed split across batches") {
    val rights = Seq(
      (0, base, 10.0), (0, base + 30000, 20.0), (0, base + 120000, 30.0))
    val lefts = Seq(
      (1, base - 1000, 1.0),      // before any baseline -> nulls
      (1, base, 2.0),             // tie: matches baseline AT base (inclusive)
      (1, base + 40000, 3.0),     // matches base+30000
      (1, base + 100000, 4.0),    // base+30000 is 70s old -> out of window
      (1, base + 130000, 5.0))    // matches base+120000 (cross-batch)
    val all = (rights ++ lefts).sortBy(_._2)
    val (b1, b2) = all.splitAt(all.length / 2)
    val got = run(Seq(b1, b2))

    // batch reference
    val lDf = lefts.map { case (_, ts, v) => ("t", "m", ts, v) }
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
    val rDf = rights.map { case (_, ts, v) => ("t", "m", ts, v) }
      .toDF("tenant_id", "metric_name", "baseline_ms", "baseline")
    val want = TimeJoin.asOf(lDf, "ts_ms", rDf, "baseline_ms",
        Seq("tenant_id", "metric_name"), Some(w))
      .collect().map { r =>
        (r.getLong(2),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))
      }.toSeq.sortBy(_._1)
    assert(got === want)
    // spot checks: the semantics themselves
    assert(got.head._2 === None)
    assert(got(1)._2 === Some(base)) // inclusive tie
    assert(got(3)._2 === None)       // window expired
    assert(got(4)._2 === Some(base + 120000))
  }

  test("cross-batch state: baseline from batch 1 enriches a batch-2 point") {
    val got = run(Seq(
      Seq((0, base, 7.0)),
      Seq((1, base + 10000, 9.0))))
    assert(got === Seq((base + 10000, Some(base), Some(7.0))))
  }

  test("no-baseline series emits nulls and never blocks") {
    val got = run(Seq(Seq((1, base, 1.0), (1, base + 1000, 2.0))))
    assert(got.forall(_._2.isEmpty))
    assert(got.size === 2)
  }

  test("streamingWithin (native interval join) ≡ batch within across batches") {
    implicit val sq = spark.sqlContext
    val lMem = MemoryStream[(String, Long, String)]
    val rMem = MemoryStream[(String, Long, String)]
    val lDf = lMem.toDF().toDF("k", "l_ts", "l_name")
    val rDf = rMem.toDF().toDF("k", "r_ts", "r_name")
    val joined = TimeJoin.streamingWithin(lDf, "l_ts", rDf, "r_ts", 100L,
      keys = Seq("k"))
    val name = s"within_out_${System.nanoTime()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    val lRows = Seq(("a", 1000L, "p1"), ("a", 1099L, "p2"), ("b", 1000L, "p3"),
      ("a", 5000L, "p4"))
    val rRows = Seq(("a", 900L, "x"), ("a", 1100L, "y"), ("b", 1050L, "z"),
      ("a", 5101L, "q"))
    // split across two batches, in event-time order (a 0s watermark
    // rightly drops rows arriving behind a prior batch's maximum)
    lMem.addData(lRows.take(3): _*); rMem.addData(rRows.take(3): _*)
    q.processAllAvailable()
    lMem.addData(lRows.drop(3): _*); rMem.addData(rRows.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).select("l_name", "r_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = (for ((k1, t1, n1) <- lRows; (k2, t2, n2) <- rRows
      if k1 == k2 && math.abs(t1 - t2) <= 100L) yield (n1, n2)).toSet
    assert(got === want)
    assert(want === Set(("p1", "x"), ("p1", "y"), ("p2", "y"), ("p3", "z")))
  }

  test("streamingWithin KEYLESS: the bucket equi-key satisfies Spark's " +
    "equality requirement; pairs ≡ naive predicate, each exactly once") {
    implicit val sq = spark.sqlContext
    val lMem = MemoryStream[(Long, String)]
    val rMem = MemoryStream[(Long, String)]
    val joined = TimeJoin.streamingWithin(
      lMem.toDF().toDF("l_ts", "l_name"), "l_ts",
      rMem.toDF().toDF("r_ts", "r_name"), "r_ts", 100L)
    val name = s"within_keyless_${System.nanoTime()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    // boundary pairs: Δt = 100 in, Δt = 101 out, cross-bucket neighbors
    val lRows = Seq((1000L, "a"), (1099L, "b"), (1200L, "c"))
    val rRows = Seq((900L, "x"), (1100L, "y"), (1301L, "z"))
    lMem.addData(lRows: _*); rMem.addData(rRows: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).select("l_name", "r_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val want = (for ((t1, n1) <- lRows; (t2, n2) <- rRows
      if math.abs(t1 - t2) <= 100L) yield (n1, n2)).sorted
    assert(got === want) // sorted SEQ: duplicates would fail the comparison
  }
}
