package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The [[DoubleOrderBits]] transform is the load-bearing primitive of
  * sharded rank selection: its image's UNSIGNED order must equal Spark
  * SQL's double sort order for EVERY pair, or bucket membership silently
  * stops being monotone and selected medians go wrong. Pure-JVM test (the
  * expression's eval and codegen bodies are this same two-op transform):
  * all pairs over a seeded random sample plus every representation edge. */
class OrderBitsSpec extends AnyFunSuite {

  private def img(d: Double): Long = DoubleOrderBits.image(d)

  // Spark SQL total order: NaN > everything, -0.0 ties 0.0
  private def sqlLt(x: Double, y: Double): Boolean =
    if (x.isNaN) false else if (y.isNaN) true else x < y

  test("unsigned image order == SQL double sort order over all sample pairs") {
    val rnd = new scala.util.Random(97)
    val sample: Seq[Double] =
      Seq.fill(300)(java.lang.Double.longBitsToDouble(rnd.nextLong()))
        .filterNot(_.isNaN) ++ // random bit patterns hit every exponent
      Seq.fill(200)((rnd.nextDouble() - 0.5) * 2000.0) ++
      Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
        1e-300, -1e-300, 1e300, -1e300, Double.MaxValue, Double.MinValue,
        Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
    for (a <- sample; b <- sample) {
      if (sqlLt(a, b))
        assert(java.lang.Long.compareUnsigned(img(a), img(b)) < 0,
          s"$a < $b but image order disagrees")
      else if (sqlLt(b, a))
        assert(java.lang.Long.compareUnsigned(img(a), img(b)) > 0,
          s"$b < $a but image order disagrees")
    }
  }

  test("canonical spot checks: -inf < min < subnormals < zeros < max < +inf < NaN") {
    val order = Seq(Double.NegativeInfinity, Double.MinValue, -1.0,
      -Double.MinPositiveValue, 0.0, Double.MinPositiveValue, 1.0,
      Double.MaxValue, Double.PositiveInfinity, Double.NaN)
    order.sliding(2).foreach { w =>
      assert(java.lang.Long.compareUnsigned(img(w(0)), img(w(1))) < 0,
        s"${w(0)} must image-order before ${w(1)}")
    }
    // ±0.0 CANONICALIZE to one image: Spark's sort ranks the two zeros
    // equal, so distinct images would put "equal" doubles in different
    // buckets and break the sharded median's membership invariant
    assert(img(-0.0) === img(0.0))
  }
}
