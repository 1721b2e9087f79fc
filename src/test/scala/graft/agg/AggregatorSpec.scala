package graft.agg

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property checks for the custom Aggregators: merge must be associative,
  * commutative, and zero-neutral (Spark may split partial aggregation
  * arbitrarily across partitions), and merged results must equal one-shot
  * reduction — the reference's own invariant
  * (rollupFromRollups ≡ rollupFromRaw, SURVEY §5). Seeded random cases. */
class AggregatorSpec extends AnyFunSuite {

  private val rnd = new Random(20240812L)

  private def randPartial(): TimerPartial = {
    val mn = rnd.nextDouble() * 100
    TimerPartial(
      count = 1 + rnd.nextInt(1000),
      sum = rnd.nextDouble() * 1e6,
      min = mn,
      max = mn + rnd.nextDouble() * 1e4,
      p50 = rnd.nextDouble() * 1e3,
      p95 = rnd.nextDouble() * 1e4)
  }

  private def randSeq(): Seq[TimerPartial] =
    Seq.fill(rnd.nextInt(20))(randPartial())

  private def reduceAll(ps: Seq[TimerPartial]): TimerBuf =
    ps.foldLeft(TimerMergeAggregator.zero)(TimerMergeAggregator.reduce)

  private def approxEq(a: TimerBuf, b: TimerBuf): Unit = {
    assert(a.count === b.count && a.partials === b.partials)
    assert(math.abs(a.sum - b.sum) <= math.abs(b.sum) * 1e-12 + 1e-9)
    assert(a.min === b.min && a.max === b.max)
    assert(math.abs(a.p50Sum - b.p50Sum) <= math.abs(b.p50Sum) * 1e-12 + 1e-9)
    assert(math.abs(a.p95Sum - b.p95Sum) <= math.abs(b.p95Sum) * 1e-12 + 1e-9)
  }

  test("timer merge is associative (100 random cases)") {
    for (_ <- 1 to 100) {
      val (ba, bb, bc) = (reduceAll(randSeq()), reduceAll(randSeq()), reduceAll(randSeq()))
      approxEq(
        TimerMergeAggregator.merge(TimerMergeAggregator.merge(ba, bb), bc),
        TimerMergeAggregator.merge(ba, TimerMergeAggregator.merge(bb, bc)))
    }
  }

  test("timer merge is commutative and zero-neutral") {
    for (_ <- 1 to 100) {
      val (ba, bb) = (reduceAll(randSeq()), reduceAll(randSeq()))
      approxEq(TimerMergeAggregator.merge(ba, bb), TimerMergeAggregator.merge(bb, ba))
      assert(TimerMergeAggregator.merge(ba, TimerMergeAggregator.zero) === ba)
    }
  }

  test("timer split-merge equals one-shot reduce (merge ≡ raw)") {
    for (_ <- 1 to 100) {
      val xs = randPartial() +: randSeq()
      val i = rnd.nextInt(xs.size)
      val (l, r) = xs.splitAt(i)
      approxEq(TimerMergeAggregator.merge(reduceAll(l), reduceAll(r)), reduceAll(xs))
    }
  }

  test("timer finish: unweighted percentile mean, count-weighted average") {
    val parts = Seq(
      TimerPartial(10, 100.0, 1.0, 9.0, 5.0, 9.0),
      TimerPartial(30, 600.0, 2.0, 30.0, 7.0, 29.0))
    val out = TimerMergeAggregator.finish(reduceAll(parts))
    assert(out.count === 40L)
    assert(out.avg === 700.0 / 40) // count-weighted
    assert(out.p50 === (5.0 + 7.0) / 2) // unweighted mean of means
    assert(out.min === 1.0 && out.max === 30.0)
  }

  test("set rollup: union merge, exact cardinality, commutative, zero-neutral") {
    for (_ <- 1 to 100) {
      val a = Set.fill(rnd.nextInt(50))(rnd.nextInt(100))
      val b = Set.fill(rnd.nextInt(50))(rnd.nextInt(100))
      val m = SetRollupAggregator.merge(a, b)
      assert(SetRollupAggregator.finish(m) === (a union b).size.toLong)
      assert(SetRollupAggregator.merge(a, SetRollupAggregator.zero) === a)
      assert(SetRollupAggregator.merge(a, b) === SetRollupAggregator.merge(b, a))
    }
  }
}
