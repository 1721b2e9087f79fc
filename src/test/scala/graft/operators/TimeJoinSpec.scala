package graft.operators

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

/** [[TimeJoin.within]] — the bucketed rewrite must emit exactly the pairs
  * the naive |Δt| ≤ w predicate does, each exactly once. */
class TimeJoinSpec extends AnyFunSuite with SparkSuite {
  import org.apache.spark.sql.functions._

  private def naive(l: Seq[(Long, String)], r: Seq[(Long, String)], w: Long) =
    (for ((lt, ln) <- l; (rt, rn) <- r if math.abs(lt - rt) <= w)
      yield (ln, rn)).sorted

  private def bucketed(l: Seq[(Long, String)], r: Seq[(Long, String)],
      w: Long) = {
    import spark.implicits._
    TimeJoin.within(
        l.toDF("l_ts", "l_name"), "l_ts",
        r.toDF("r_ts", "r_name"), "r_ts", w)
      .select("l_name", "r_name").collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq.sorted
  }

  test("≡ naive predicate incl. exact-boundary pairs, each emitted once") {
    val w = 100L
    // boundaries: Δt = w exactly (in), Δt = w+1 (out), Δt = 0 (in),
    // cross-bucket neighbors both directions
    val l = Seq((1000L, "a"), (1099L, "b"), (1200L, "c"), (5000L, "d"))
    val r = Seq((900L, "x"), (1100L, "y"), (1199L, "z"), (1301L, "q"),
      (5000L, "s"))
    assert(bucketed(l, r, w) === naive(l, r, w))
  }

  test("consistent flooring across t = 0 (pre-epoch timestamps)") {
    val w = 100L
    val l = Seq((-50L, "a"), (0L, "b"), (49L, "c"), (-250L, "d"))
    val r = Seq((-149L, "x"), (-100L, "y"), (50L, "z"), (-151L, "q"))
    assert(bucketed(l, r, w) === naive(l, r, w))
  }

  test("randomized equivalence") {
    val rnd = new scala.util.Random(7)
    val w = 37L
    val l = Seq.tabulate(80)(i => (rnd.between(-500L, 500L), s"l$i"))
    val r = Seq.tabulate(80)(i => (rnd.between(-500L, 500L), s"r$i"))
    assert(bucketed(l, r, w) === naive(l, r, w))
  }

  test("extra equi-keys partition the join") {
    import spark.implicits._
    val w = 100L
    val l = Seq(("t1", 100L, "a"), ("t2", 100L, "b")).toDF("k", "l_ts", "l_name")
    val r = Seq(("t1", 150L, "x"), ("t2", 150L, "y")).toDF("k", "r_ts", "r_name")
    val got = TimeJoin.within(l, "l_ts", r, "r_ts", w, keys = Seq("k"))
      .select("l_name", "r_name").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got === Set(("a", "x"), ("b", "y")))
  }

  test("argument guards") {
    import spark.implicits._
    val d = Seq((1L, "a")).toDF("ts", "n")
    intercept[IllegalArgumentException](TimeJoin.within(d, "ts", d, "ts", 10L))
    intercept[IllegalArgumentException](
      TimeJoin.within(d, "ts", d.withColumnRenamed("ts", "ts2"), "ts2", 0L))
  }
}
