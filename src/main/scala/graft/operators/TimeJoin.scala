package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded time-distance join — the "what ELSE happened around then"
  * primitive behind incident annotation (anomaly ↔ deploy/error events),
  * alert correlation, and session stitching. Spark has no native range
  * join: the naive formulation (`ON abs(l.ts − r.ts) <= w`) is a
  * broadcast-nested-loop cartesian, which dies at scale. This is the
  * standard BUCKETED rewrite: both sides key by ⌊ts / w⌋, the left probes
  * its own bucket and both neighbors, and a pair at distance ≤ w is
  * guaranteed to share one of those three keys — so the cartesian becomes
  * one shuffle-hash equi-join plus an exact residual filter, sharded by
  * time bucket. Each qualifying pair emits exactly once (the right row's
  * bucket is unique, the left probes it once). */
object TimeJoin {

  /** All (left × right) pairs with equal `keys` and
    * |leftTs − rightTs| ≤ withinMs. `leftTs`/`rightTs` must be distinct
    * BIGINT epoch-millis column names, and the two frames' other column
    * names must not collide (rename before joining — the relational
    * convention). Output: key columns once, then both sides' columns.
    *
    * Scale shape: shuffle on (keys, bucket) — time-local pairs
    * co-locate, work shards by wall-clock epoch, and skew is bounded by
    * the densest single window, not by series cardinality. The 3×
    * left-side fan-out is the entire overhead. */
  def within(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, withinMs: Long, keys: Seq[String] = Nil): DataFrame = {
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    require(leftTs != rightTs,
      s"leftTs and rightTs must be distinct names, both were '$leftTs'")
    // floor-bucket via pmod (nonnegative remainder) + integer div — the
    // numerator is an exact multiple of withinMs, so `div` is exact at
    // full 64-bit range (a double division would lose bits above 2^53),
    // and pre-epoch timestamps bucket consistently too (bare `div`
    // truncates toward zero and would split the boundary pair at t = 0)
    def bucket(c: String) =
      expr(s"($c - pmod($c, ${withinMs}L)) div ${withinMs}L")
    val lb = left
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__b", bucket(leftTs) + col("__off"))
      .drop("__off")
    val rb = right.withColumn("__b", bucket(rightTs))
    lb.join(rb, (keys :+ "__b").toSeq)
      .filter(abs(col(leftTs) - col(rightTs)) <= withinMs)
      .drop("__b")
  }
}
