package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** As-of join: each left row picks up the single right row with the
    * GREATEST `rightTs` ≤ its `leftTs` (per `keys`; inclusive at equality,
    * matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`). Left-join
    * semantics: unmatched left rows keep null right columns. The classic
    * "latest observation carried forward" enrichment — current point vs
    * last completed baseline, trade vs latest quote, event vs most recent
    * deploy.
    *
    * Spark has no native as-of join, and the naive `rank-over-inequality-
    * join` form fans every left row out across its whole candidate
    * history. This is the UNION rewrite instead: both sides merge into
    * one stream ordered by (ts, side) and a running `last(right_state)`
    * window carries each right row forward to the left rows after it —
    * zero join, one shuffle, each row shipped once.
    *
    * `withinMs = None` partitions the window by `keys` alone (exact
    * unbounded lookback; a key's full history sorts together — right when
    * keys are fine-grained, e.g. per-series). `withinMs = Some(w)` bounds
    * the lookback to `leftTs − rightTs ≤ w` and SHARDS the window by the
    * ⌊ts/w⌋ bucket as well: right rows replicate into their own and the
    * next bucket (2×), so every in-window candidate is present in the
    * left row's bucket partition, and no key ever sorts its history in
    * one task — skew is bounded by the densest single window, the same
    * 100 TB shape as [[within]]. (The overall-greatest candidate ≤ ts in
    * the partition is in-window iff ANY in-window candidate exists, so
    * the post-filter loses nothing.)
    *
    * Right rows are first deduplicated to one per (`keys`, `rightTs`) by
    * greatest payload struct — the as-of contract needs a unique
    * right-side timestamp, and a deterministic total order keeps the
    * result layout-invariant when the input violates that. Column
    * contract mirrors [[within]]: `leftTs`/`rightTs` distinct names,
    * right payload names must not collide with left columns. */
  def asOf(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, keys: Seq[String],
      withinMs: Option[Long] = None): DataFrame = {
    require(leftTs != rightTs,
      s"leftTs and rightTs must be distinct names, both were '$leftTs'")
    withinMs.foreach(w => require(w > 0, s"withinMs must be positive, got $w"))
    val payload = right.columns.filterNot((keys :+ rightTs).contains).toSeq
    val collide = (payload.toSet + rightTs).intersect(left.columns.toSet)
    require(collide.isEmpty,
      s"right-side output columns collide with left: ${collide.mkString(", ")}")
    val k = keys.map(col)
    // One row per (keys, rightTs): greatest payload struct — deterministic
    // under duplicate right timestamps (struct comparison is a total order
    // over the payload fields); map-side combine keeps it one cheap pass.
    val rUniq = right.groupBy(k :+ col(rightTs): _*)
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(k ++ Seq(col(rightTs).as("__ts"),
        struct(col(rightTs).as("__rts"), col("__p")).as("__state")): _*)
    val stateType = rUniq.schema("__state").dataType
    // Bucket key = the bucket-start millis itself (integer math only; the
    // neighbor bucket is `+ w`, so no division ever happens).
    def bucket(c: Column, w: Long) = (c - pmod(c, lit(w))).cast("long")
    // Tag 0 sorts right rows before left rows at equal ts → inclusive match.
    val (lU, rU, partCols) = withinMs match {
      case None =>
        (left.select(k ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag"),
            lit(null).cast(stateType).as("__state"),
            struct(left.columns.map(col): _*).as("__lrow")): _*),
          rUniq.select(k ++ Seq(col("__ts"), lit(0).as("__tag"), col("__state"),
            lit(null).cast(left.schema).as("__lrow")): _*),
          k)
      case Some(w) =>
        (left.select(k ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag"),
            lit(null).cast(stateType).as("__state"),
            struct(left.columns.map(col): _*).as("__lrow"),
            bucket(col(leftTs), w).as("__b")): _*),
          rUniq.withColumn("__off", explode(array(lit(0L), lit(w))))
            .select(k ++ Seq(col("__ts"), lit(0).as("__tag"), col("__state"),
              lit(null).cast(left.schema).as("__lrow"),
              (bucket(col("__ts"), w) + col("__off")).as("__b")): _*),
          k :+ col("__b"))
    }
    val win = Window.partitionBy(partCols: _*).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__state"), ignoreNulls = true).over(win)
    val matched = withinMs match {
      case None => matchedRaw
      case Some(w) =>
        when(col("__ts") - matchedRaw.getField("__rts") <= w, matchedRaw)
    }
    lU.unionByName(rU)
      .withColumn("__m", matched)
      .filter(col("__tag") === 1)
      .select(col("__lrow.*") +:
        col("__m.__rts").as(rightTs) +:
        payload.map(c => col(s"__m.__p.$c").as(c)): _*)
  }

  /** Streaming twin of [[within]] via Spark's NATIVE stream-stream
    * interval join — both sides watermarked, the |Δt| ≤ w predicate
    * expressed as a time-range condition on the event-time columns so
    * the state store evicts rows as the watermarks pass them (the
    * bounded-state property is built into the join operator; no custom
    * state code at all). Spark rejects stream-stream joins without an
    * equality predicate, so the batch rewrite's ⌊ts/w⌋ BUCKET key rides
    * along as the equi-column (left probes its 3 neighbor buckets, right
    * keeps its own — the same 3× fan-out as batch): keyless pairing
    * works, and with `keys` the state additionally shards by them. Emits
    * exactly the batch operator's pairs as both watermarks admit them.
    * Column contract mirrors [[within]]: shared `keys`, distinct
    * `leftTs`/`rightTs` names, no other collisions. */
  def streamingWithin(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, withinMs: Long, keys: Seq[String] = Nil,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    require(leftTs != rightTs,
      s"leftTs and rightTs must be distinct names, both were '$leftTs'")
    def bucket(c: Column) = (c - pmod(c, lit(withinMs))).cast("long")
    val l = left
      .withColumn("__lev", timestamp_millis(col(leftTs).cast("long")))
      .withColumn("__off", explode(array(lit(-withinMs), lit(0L), lit(withinMs))))
      .withColumn("__lb", bucket(col(leftTs)) + col("__off"))
      .drop("__off")
      .withWatermark("__lev", watermarkDelay)
    val r0 = keys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"__r_$k"))
    val r = r0
      .withColumn("__rev", timestamp_millis(col(rightTs).cast("long")))
      .withColumn("__rb", bucket(col(rightTs)))
      .withWatermark("__rev", watermarkDelay)
    val keyCond = keys.map(k => col(k) === col(s"__r_$k")) :+
      (col("__lb") === col("__rb"))
    val rangeCond =
      col("__rev") >= col("__lev") - expr(s"INTERVAL $withinMs MILLISECONDS") &&
        col("__rev") <= col("__lev") + expr(s"INTERVAL $withinMs MILLISECONDS")
    // no residual filter needed: the event-time range condition IS the
    // |Δt| ≤ w predicate, and each pair shares exactly one probe bucket
    l.join(r, (keyCond :+ rangeCond).reduce(_ && _))
      .drop("__lev", "__rev", "__lb", "__rb")
      .drop(keys.map(k => s"__r_$k"): _*)
  }

  final case class AsofEv(tenant_id: String, metric_name: String,
      ets: java.sql.Timestamp, tag: Int, value: Double)
  final case class AsofState(rights: List[(Long, Double)])
  final case class EnrichedPoint(tenant_id: String, metric_name: String,
      ts_ms: Long, value: Double, baseline_ms: Option[Long],
      baseline: Option[Double], delta: Option[Double])

  /** Streaming twin of the bounded [[asOf]] — latest-observation
    * enrichment ON ARRIVAL (the alerting shape: each point is compared
    * against its series' freshest baseline the moment it lands, instead
    * of in the batch recompute). `left` and `right` are two keyed streams
    * with columns (tenant_id, metric_name, ts_ms, value); each left
    * point emits once, enriched with the greatest right `ts_ms` ≤ its
    * own within `withinMs` (inclusive at equality, right-before-left at
    * ties — the batch tag order), or nulls when none qualifies.
    *
    * State per series is only the rights still able to match a future
    * left: rights older than `watermark − withinMs` are EVICTED each
    * batch (a future left has ts ≥ watermark, so those can never be
    * within the window again — the [[Dedup.streamingDedupKeepFirst]]
    * bounded-state discipline), and series quiet past their last right's
    * matchable horizon time out entirely. On an in-order feed the
    * emitted enrichment is bit-identical to the batch operator; late
    * left points enrich against the retained rights (never a FUTURE
    * right), late rights apply to lefts after them — the
    * recompute-from-source batch pass remains the exhaustive answer,
    * like every streaming twin here. */
  def streamingAsOf(left: DataFrame, right: DataFrame, withinMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[EnrichedPoint] = {
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val spark = left.sparkSession
    import spark.implicits._
    def shape(df: DataFrame, tag: Int) = df
      .select(col("tenant_id").cast("string").as("tenant_id"),
        col("metric_name").cast("string").as("metric_name"),
        timestamp_millis(col("ts_ms").cast("long")).as("ets"),
        lit(tag).as("tag"), col("value").cast("double").as("value"))
      .withWatermark("ets", watermarkDelay)
    shape(left, 1).unionByName(shape(right, 0))
      .as[AsofEv]
      .groupByKey(e => (e.tenant_id, e.metric_name))
      .flatMapGroupsWithState[AsofState, EnrichedPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        enrichBatch(withinMs))
  }

  private def enrichBatch(withinMs: Long)(
      key: (String, String), batch: Iterator[AsofEv],
      state: GroupState[AsofState]): Iterator[EnrichedPoint] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var rights = state.getOption.map(_.rights).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[EnrichedPoint]
      // event-time order, rights before lefts at equal ts — the batch
      // operator's (ts, tag) sort
      for (e <- batch.toSeq.sortBy(x => (x.ets.getTime, x.tag))) {
        val t = e.ets.getTime
        if (e.tag == 0) rights = (t -> e.value) :: rights
        else {
          val cand = rights.filter(r => r._1 <= t && t - r._1 <= withinMs)
          // greatest rts; duplicate rts resolve to greatest value, the
          // batch dedup's max-payload-struct policy
          val best =
            if (cand.isEmpty) None else Some(cand.maxBy(identity))
          out += EnrichedPoint(key._1, key._2, t, e.value,
            best.map(_._1), best.map(_._2), best.map(e.value - _._2))
        }
      }
      val evictBelow = state.getCurrentWatermarkMs() - withinMs
      rights = rights.filter(_._1 >= evictBelow)
      if (rights.isEmpty) state.remove()
      else {
        state.update(AsofState(rights))
        state.setTimeoutTimestamp(math.max(
          rights.map(_._1).max + withinMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }
}
