package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A pre-aggregated timer partial, as produced by a finer rollup tier
  * (reference: types/BluefloodTimerRollup.java state — sum, count, min,
  * max, and the percentile means carried as plain values). */
final case class TimerPartial(
    count: Long, sum: Double, min: Double, max: Double,
    p50: Double, p95: Double)

final case class TimerBuf(
    count: Long, sum: Double, min: Double, max: Double,
    p50Sum: Double, p95Sum: Double, partials: Long)

final case class TimerResult(
    count: Long, sum: Double, avg: Double, min: Double, max: Double,
    p50: Double, p95: Double)

/** Typed `Aggregator` merging timer partials into a coarser tier — the one
  * rollup kind whose merge genuinely needs custom state (SURVEY §2.11):
  * counts/sums added, min/max folded, mean count-weighted, and percentile
  * means merged by UNWEIGHTED average across partials — the reference's
  * deliberate, lossy semantics (BluefloodTimerRollup.java:242-254),
  * replicated rather than improved.
  *
  * `merge` is associative and commutative (property-checked in
  * AggregatorSpec), so Spark's partial aggregation can split work across
  * any partitioning. */
object TimerMergeAggregator extends Aggregator[TimerPartial, TimerBuf, TimerResult] {

  override def zero: TimerBuf =
    TimerBuf(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0.0, 0L)

  override def reduce(b: TimerBuf, in: TimerPartial): TimerBuf =
    TimerBuf(
      b.count + in.count, b.sum + in.sum,
      math.min(b.min, in.min), math.max(b.max, in.max),
      b.p50Sum + in.p50, b.p95Sum + in.p95, b.partials + 1L)

  override def merge(a: TimerBuf, b: TimerBuf): TimerBuf =
    TimerBuf(
      a.count + b.count, a.sum + b.sum,
      math.min(a.min, b.min), math.max(a.max, b.max),
      a.p50Sum + b.p50Sum, a.p95Sum + b.p95Sum, a.partials + b.partials)

  override def finish(r: TimerBuf): TimerResult =
    TimerResult(
      r.count, r.sum,
      if (r.count == 0) 0.0 else r.sum / r.count,
      r.min, r.max,
      if (r.partials == 0) 0.0 else r.p50Sum / r.partials,
      if (r.partials == 0) 0.0 else r.p95Sum / r.partials)

  override def bufferEncoder: Encoder[TimerBuf] = Encoders.product[TimerBuf]
  override def outputEncoder: Encoder[TimerResult] = Encoders.product[TimerResult]
}
