package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Render batch 5 operators: minMax scaling, trailing ROWS stdev, and
  * positional divideSeriesLists — hand-computed fixtures including the
  * null/zero-range/length-mismatch edges (the oracle gate proves the
  * corpus-scale hashes; these pin the contracts the corpus can't reach). */
class SeriesBatch5Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def pts(rows: (String, String, Long, Option[Double])*): DataFrame =
    rows.map { case (t, n, ts, v) =>
      (t, n, ts, v.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
      .toDF("tenant_id", "metric_name", "ts_ms", "value")

  test("minMaxNormalize: [0,1] scaling per series; zero-range null; " +
    "null samples pass through") {
    val in = pts(
      ("t", "a", 0L, Some(10.0)), ("t", "a", 1L, Some(30.0)),
      ("t", "a", 2L, Some(20.0)), ("t", "a", 3L, None),
      ("t", "flat", 0L, Some(5.0)), ("t", "flat", 1L, Some(5.0)))
    val out = Series.minMaxNormalize(in).collect()
      .map(r => (r.getString(1), r.getLong(2)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(("a", 0L)) === Some(0.0))
    assert(out(("a", 1L)) === Some(1.0))
    assert(out(("a", 2L)) === Some(0.5))
    assert(out(("a", 3L)) === None)
    assert(out(("flat", 0L)) === None && out(("flat", 1L)) === None)
  }

  test("stdevRows: trailing N-sample population stddev; shorter heads " +
    "use what exists; null samples occupy a slot but are skipped") {
    val in = pts(
      ("t", "a", 0L, Some(2.0)), ("t", "a", 1L, Some(4.0)),
      ("t", "a", 2L, None), ("t", "a", 3L, Some(6.0)))
    val out = Series.stdevRows(in, 2).collect()
      .map(r => r.getLong(2) -> Option(r.get(3))
        .map(_.asInstanceOf[Double])).toMap
    assert(out(0L) === Some(0.0)) // one sample
    assert(out(1L) === Some(1.0)) // {2,4}: var = (4+16-36/2)/2 = 1
    // window rows {4, null}: one value → stddev 0
    assert(out(2L) === Some(0.0))
    // window rows {null, 6}: one value → stddev 0
    assert(out(3L) === Some(0.0))
    // all-null window serves null
    val nul = Series.stdevRows(pts(("t", "b", 0L, None)), 2).collect()
    assert(nul.length === 1 && nul(0).isNullAt(3))
  }

  test("divideSeriesLists: rank pairing follows NAME order on each side " +
    "independently (not name equality); F6 null on zero denominators") {
    // dividends sort a1 < a2; divisors sort z1 < z9 — pairing must be
    // (a1,z1), (a2,z9) by POSITION, names joined into divideSeries(a,b)
    val dividends = pts(
      ("t", "a1", 0L, Some(10.0)), ("t", "a1", 1L, Some(8.0)),
      ("t", "a2", 0L, Some(9.0)))
    val divisors = pts(
      ("t", "z1", 0L, Some(2.0)), ("t", "z1", 1L, Some(0.0)),
      ("t", "z9", 0L, Some(3.0)))
    val out = Series.divideSeriesLists(dividends, divisors).collect()
      .map(r => (r.getString(1), r.getLong(2)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      ("divideSeries(a1,z1)", 0L) -> Some(5.0),
      ("divideSeries(a1,z1)", 1L) -> None, // zero denominator
      ("divideSeries(a2,z9)", 0L) -> Some(3.0)))
  }

  test("divideSeriesLists: unequal list lengths raise in-plan") {
    val dividends = pts(("t", "a1", 0L, Some(1.0)), ("t", "a2", 0L, Some(2.0)))
    val divisors = pts(("t", "z1", 0L, Some(4.0)))
    val e = intercept[Exception] {
      Series.divideSeriesLists(dividends, divisors).collect()
    }
    assert(e.getMessage.contains("differ in length") ||
      Option(e.getCause).exists(_.getMessage.contains("differ in length")))
  }
}
