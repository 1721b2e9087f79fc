package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitter summary (Misra & Gries 1982; the
  * MERGE rule is Agarwal et al. 2012, "Mergeable Summaries" — sum the two
  * counter maps, then subtract every counter by the (m+1)-largest count
  * and drop non-positives, which restores the size bound while keeping
  * the deviation guarantee additive).
  *
  * Guarantee: after summarizing N items with capacity m, every key's kept
  * counter undershoots its true frequency by at most N/m — so any key
  * with true frequency > N/m is STILL PRESENT in the summary. The finish
  * therefore returns a candidate SUPERSET of the heavy hitters; the
  * caller's exact second pass over the ≤ m candidates (a semi-join +
  * census) turns it into an exact, deterministic answer. The summary
  * CONTENTS are partition-order-dependent (which light keys survive
  * varies); the superset property is not, which is all the two-pass
  * operator relies on.
  *
  * State is a plain Map of ≤ m counters — tiny, mergeable, map-side
  * combining; the whole point is that the full key space (which may be
  * billions of distinct tokens) never shuffles. */
final class MisraGriesAggregator(m: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(m >= 1, s"capacity m must be >= 1, got $m")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(s: Map[String, Long], key: String): Map[String, Long] =
    s.get(key) match {
      case Some(c) => s.updated(key, c + 1)
      case None if s.size < m => s.updated(key, 1L)
      case None => // decrement-all step, dropping zeros
        s.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= m) summed
    else {
      // subtract the (m+1)-largest count from everyone, keep positives
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(m)
      summed.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(s: Map[String, Long]): Array[String] =
    s.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
