package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-over-hashes set rollup state (reference:
  * types/BluefloodSetRollup.java:30-70 — a Set of value hashCodes whose
  * merge is set union and whose count is the set size).
  *
  * Kept for parity with the reference's exact semantics, including
  * cross-granularity re-merge of stored states; the buffer is the full hash
  * set, so state grows with true cardinality — the engine's scalable
  * default is `approx_count_distinct` (HLL, O(1) state), this Aggregator is
  * the opt-in exact path. */
object SetRollupAggregator extends Aggregator[Int, Set[Int], Long] {
  override def zero: Set[Int] = Set.empty[Int]
  override def reduce(s: Set[Int], v: Int): Set[Int] = s + v
  override def merge(a: Set[Int], b: Set[Int]): Set[Int] = a union b
  override def finish(s: Set[Int]): Long = s.size.toLong
  override def bufferEncoder: Encoder[Set[Int]] = Encoders.kryo[Set[Int]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
