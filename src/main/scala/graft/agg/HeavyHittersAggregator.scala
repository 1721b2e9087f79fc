package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable Misra–Gries state: ≤ m counters plus the TOTAL item count (so
  * the caller sizes its guarantee from the same single pass). */
final class MgState(
    val counters: scala.collection.mutable.HashMap[String, Long],
    var n: Long) extends Serializable

/** Mergeable Misra–Gries heavy-hitter summary (Misra & Gries 1982; the
  * MERGE rule is Agarwal et al. 2012, "Mergeable Summaries" — sum the two
  * counter maps, then cut every counter by the (m+1)-largest count and
  * drop non-positives, which restores the size bound while keeping the
  * deviation guarantee additive).
  *
  * The full-summary eviction step decrements every counter by the
  * CURRENT MINIMUM in one pass (not by 1): at least one counter reaches
  * zero and frees a slot, so the O(m) sweep runs at most once per
  * freed-slot insertion instead of on every tail arrival, and the state
  * is a mutable map mutated in place — no per-row reallocation. The
  * deviation bound survives: each sweep removes ≥ m·min stored mass, so
  * Σ min over all sweeps ≤ N/m, and any key's kept counter undershoots
  * its true frequency by at most N/m. Hence every key with true
  * frequency > N/m is STILL PRESENT in the summary — a candidate
  * SUPERSET of the heavy hitters. The summary CONTENTS are
  * partition-order-dependent (which light keys survive varies); the
  * superset property is not, which is all the two-pass operator
  * ([[graft.operators.TextScoring.heavyHitters]]) relies on.
  *
  * finish returns (sorted candidates, N): O(m) state, map-side
  * combining; the full key space (billions of distinct tokens) never
  * shuffles. */
final class MisraGriesAggregator(m: Int)
    extends Aggregator[String, MgState, (Array[String], Long)] {
  require(m >= 1, s"capacity m must be >= 1, got $m")

  override def zero: MgState =
    new MgState(scala.collection.mutable.HashMap.empty, 0L)

  override def reduce(s: MgState, key: String): MgState = {
    s.n += 1
    val c = s.counters
    c.get(key) match {
      case Some(v) => c.update(key, v + 1)
      case None if c.size < m => c.update(key, 1L)
      case None => // decrement-by-min: frees ≥ 1 slot per O(m) sweep
        val min = c.valuesIterator.min
        c.filterInPlace((_, v) => v > min)
        c.mapValuesInPlace((_, v) => v - min)
    }
    s
  }

  override def merge(a: MgState, b: MgState): MgState = {
    for ((k, v) <- b.counters)
      a.counters.update(k, a.counters.getOrElse(k, 0L) + v)
    a.n += b.n
    if (a.counters.size > m) {
      // cut by the (m+1)-largest count, keep strict positives
      val cut = a.counters.valuesIterator.toSeq
        .sorted(Ordering[Long].reverse)(m)
      a.counters.filterInPlace((_, v) => v > cut)
      a.counters.mapValuesInPlace((_, v) => v - cut)
    }
    a
  }

  override def finish(s: MgState): (Array[String], Long) =
    (s.counters.keys.toArray.sorted, s.n)

  override def bufferEncoder: Encoder[MgState] = Encoders.kryo[MgState]
  override def outputEncoder: Encoder[(Array[String], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[String], Long)]()
}
