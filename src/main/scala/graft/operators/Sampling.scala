package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic corpus sampling, split assignment, and sequence packing —
  * the selection stages of a training-data pipeline.
  *
  * Everything here keys on a CONTENT hash (md5 of the key rendered as a
  * string), never on `rand()`: the sample/split of a document is a pure
  * function of its key, so reruns, backfills, and incremental appends land
  * every row on the same side — and a DuckDB oracle can state the identical
  * selection. md5 hex is engine-portable (lowercase hex in Spark, DuckDB,
  * and every standard implementation); comparing a hex PREFIX
  * lexicographically is a uniform threshold test with 16^len resolution.
  *
  * Scale shapes:
  *  - [[sampleByHash]] / [[splitAssign]] are pure filters/projections — no
  *    shuffle at all, fully pushdown-friendly, linear at any corpus size;
  *  - [[stratifiedQuota]] sorts within strata (one shuffle on the stratum
  *    key) — exact quotas, for bounded strata counts; at extreme per-stratum
  *    cardinality, pre-filter with [[sampleByHash]] at a rate slightly above
  *    quota/|stratum| first, then take the exact quota from the survivors;
  *  - [[packGreedy]] is a per-shard cumulative sum — one shuffle on the
  *    shard key, parallel across shards, no global sort.
  */
object Sampling {

  /** Engine-portable content hash: lowercase md5 hex of the key rendered
    * as a string (DuckDB: `md5(CAST(key AS VARCHAR))`). */
  def hashHex(key: Column): Column = md5(key.cast("string").cast("binary"))

  /** Deterministic Bernoulli-style sample: keep rows whose hash prefix is
    * lexicographically below `hexUpper` (e.g. "28f6" keeps ≈ 0x28f6/65536 ≈
    * 16% of rows). Samples at lower thresholds are strict SUBSETS of
    * samples at higher ones — growing a sample never churns the rows
    * already in it. */
  def sampleByHash(df: DataFrame, key: Column, hexUpper: String): DataFrame = {
    // md5 hex is lowercase: an uppercase threshold like "C0" would silently
    // compare against the digit range only (62.5% instead of 75%)
    require(hexUpper.matches("[0-9a-f]+"),
      s"hexUpper must be non-empty lowercase hex, got '$hexUpper'")
    df.filter(substring(hashHex(key), 1, hexUpper.length) < lit(hexUpper))
  }

  /** 8-hex-digit exclusive upper bound whose keep probability under a
    * uniform 32-bit hash prefix is (as close as representable to) `rate`.
    * rate ≥ 1 maps to "g" — lexicographically above every hex digit, so
    * the `< bound` filter keeps ALL rows (an "ffffffff" bound would lose
    * the single top hash value). */
  def rateToHexUpper(rate: Double): String = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    if (rate >= 1.0) "g"
    else f"${math.floor(rate * 4294967296.0).toLong}%08x"
  }

  /** Per-stratum deterministic Bernoulli downsampling — source-mixture
    * reweighting: each stratum (source domain, language, quality bucket)
    * keeps rows at its own rate, turning the corpus's NATURAL mix into a
    * designed one (the per-source weighting every published pretraining
    * recipe applies — upweight curated sources by downsampling the rest).
    * Selection is by content hash, so it is reproducible, append-stable,
    * and NESTED across rates like [[sampleByHash]]: lowering a stratum's
    * rate only removes rows, never churns the kept set. A stratum absent
    * from `rates` keeps `defaultRate`. Pure filter — zero shuffle at any
    * scale. */
  def weightedMixture(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val thresh = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(rateToHexUpper(defaultRate)): Column) {
        case (els, (s, r)) => when(stratum === s, lit(rateToHexUpper(r))).otherwise(els)
      }
    df.filter(substring(hashHex(key), 1, 8) < thresh)
  }

  /** Temperature-scaled mixture rates — computes WHAT to feed
    * [[weightedMixture]]: per-stratum keep rates ∝ share^(alpha − 1),
    * normalized so the rarest stratum keeps `maxRate`. alpha = 1 is the
    * natural mix (every rate = maxRate); alpha → 0 flattens toward the
    * uniform-over-strata mix (rates inversely proportional to share) —
    * the standard temperature sampling of multilingual/multi-source
    * pretraining (Conneau & Lample 2019 §3.1, p_i ∝ share_i^alpha).
    * One tiny census aggregation; the math is driver-side doubles and the
    * result is a plain Map, so downstream selection stays a pure filter. */
  def temperatureRates(df: DataFrame, stratum: Column, alpha: Double,
      maxRate: Double = 1.0): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(maxRate > 0.0 && maxRate <= 1.0,
      s"maxRate must be in (0,1], got $maxRate")
    // NULL strata are excluded from the census (and from `total`): they
    // carry no share and fall to weightedMixture's defaultRate downstream;
    // a null map key would NPE weightedMixture's threshold sort.
    val counts = df.select(stratum.cast("string").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy("__s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.nonEmpty, "temperatureRates needs a non-empty frame")
    val total = counts.map(_._2).sum.toDouble
    val raw = counts.map { case (s, n) =>
      s -> math.pow(n / total, alpha - 1.0)
    }
    val top = raw.map(_._2).max
    raw.map { case (s, w) => s -> math.min(w / top * maxRate, 1.0) }.toMap
  }

  /** Train/val/test (or any n-way) split assignment by hash prefix.
    * `bounds` are (name, exclusive upper 2-hex bound) in ascending order;
    * rows above every bound get `last`. Fractions quantize to 1/256 —
    * e.g. Seq("train" -> "cc", "val" -> "e6"), "test" gives
    * 204/26/26 ≈ 80/10/10. */
  def splitAssign(key: Column, bounds: Seq[(String, String)], last: String): Column = {
    require(bounds.nonEmpty, "splitAssign needs at least one bound")
    require(bounds.forall(_._2.matches("[0-9a-f]{2}")),
      s"bounds must be 2-char lowercase hex, got ${bounds.map(_._2)}")
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      s"bounds must ascend (earlier entries shadow later ones): ${bounds.map(_._2)}")
    val h = substring(hashHex(key), 1, 2)
    bounds.foldRight(lit(last): Column) { case ((name, ub), els) =>
      when(h < ub, lit(name)).otherwise(els)
    }
  }

  /** Exact per-stratum quota sample: the `quota` rows of each stratum with
    * the smallest content hashes (hash order = an arbitrary-but-fixed
    * shuffle of the stratum; key breaks the theoretical hash tie). Adds an
    * INTEGER `rn` (1-based rank within stratum). */
  def stratifiedQuota(df: DataFrame, strata: Column, key: Column,
      quota: Int): DataFrame =
    df.withColumn("rn",
        row_number().over(Window.partitionBy(strata).orderBy(hashHex(key), key)))
      .filter(col("rn") <= quota)

  /** Deterministic Gumbel-top-k: sample `k` rows WITHOUT replacement with
    * probability ∝ exp(weightCol) — the resampling step of DSIR
    * importance sampling (Xie et al. 2023; the Gumbel-max trick: adding
    * i.i.d. Gumbel noise to log-weights and taking the top-k draws a
    * weighted sample). "Noise" here is the content-hash uniform
    * u = (h₂₄ + ½) / 2²⁴ from the row's id — the same no-rand() policy
    * as every sampler in this object, so the draw is a pure function of
    * (id, weight): rerun- and append-stable, and a DuckDB oracle can
    * state the identical selection.
    *
    * The sort key is exact decimal arithmetic — the weight re-snapped to
    * DECIMAL(28,9) plus the snapped Gumbel g = −ln(−ln u) — so the
    * ranking is total (ties break by id) and partition-order invariant.
    * Output: input columns + `gumbel_key` (double) + `rk` (1-based
    * BIGINT rank ≤ k).
    *
    * Scale shape: the rank filter compiles to WindowGroupLimit — every
    * partition keeps only its local top-k before the single-task final
    * rank sees anything, so the global window touches O(partitions · k)
    * rows, not the corpus. */
  def gumbelTopK(df: DataFrame, id: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h24 = conv(substring(hashHex(col(id)), 1, 6), 16, 10).cast("long")
    val u = (h24.cast("double") + lit(0.5)) / lit(16777216.0)
    val key = col(weightCol).cast(DecimalType(28, 9)) +
      (-log(-log(u))).cast(DecimalType(18, 9))
    df.withColumn("__gk", key)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("__gk").desc, col(id)))
          .cast("long"))
      .filter(col("rk") <= k)
      .withColumn("gumbel_key", col("__gk").cast("double"))
      .drop("__gk")
  }

  /** Quality-greedy corpus selection under a GLOBAL token budget: the
    * "curate the best N tokens" pretraining step. Semantics are the greedy
    * prefix of the (quality DESC, doc_id) order — a document is kept iff
    * the tokens of all strictly-better documents sum below `budget` (the
    * boundary document may overflow it, as a real packer would finish the
    * doc).
    *
    * A naive implementation is a GLOBAL sort + an unpartitioned cumulative
    * window — one task owns the whole corpus. Instead: quality buckets
    * (monotone floor, clamped ends, so bucket order ⊇ quality order and
    * equal qualities share a bucket), per-bucket token sums to the driver
    * (≤ nBuckets rows), cutoff arithmetic there, then whole buckets keep
    * or drop by a pure filter and ONLY the single boundary bucket pays an
    * exact in-bucket cumulative prefix (~corpus/nBuckets rows). Selection
    * is bit-identical to the global sort for ANY quality distribution;
    * a pathologically skewed one only grows the boundary bucket (remedy:
    * quantile bucket edges — same two-phase shape).
    *
    * NULL quality lands in bucket 0 and orders after every real quality
    * (worst); NULL tokens count as 0. A bucket that exhausts the budget
    * EXACTLY is routed through the boundary prefix, not kept whole — a
    * zero-token document ordered after the exhausting mass has a
    * strictly-better prefix equal to the budget and must drop. */
  def selectByTokenBudget(docs: DataFrame, quality: Column, tokens: Column,
      budget: Long, nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    selectWithBuckets(docs, quality, tokens, budget,
      // NaN sorts FIRST under quality DESC (Spark treats NaN as the
      // largest double), so it must land in the TOP bucket — floor(NaN)
      // fell through the coalesce into bucket 0 and could silently drop a
      // doc the documented global-sort greedy prefix selects first. The
      // quantile arm's `q > edge` chain already puts NaN on top.
      when(isnan(col("quality")), lit(nBuckets - 1))
        .otherwise(coalesce(least(greatest(floor(col("quality") * nBuckets),
          lit(0)), lit(nBuckets - 1)).cast("int"), lit(0))).cast("int"))
  }

  /** [[selectByTokenBudget]] with QUANTILE bucket edges — the documented
    * remedy for pathological quality skew: fixed-width buckets collapse
    * when the corpus's quality mass concentrates in a narrow range (one
    * boundary bucket ≈ the whole corpus pays the exact window), while
    * edges at the observed quality quantiles keep every bucket
    * ≈ corpus/nBuckets REGARDLESS of the distribution. The selection is
    * bit-identical to the fixed-width form and the global sort: exactness
    * needs only a monotone bucketing in which equal qualities share a
    * bucket, which `q > edge` threshold chains guarantee — the edges
    * (from approx_percentile, layout-dependent) steer only WORK
    * placement, never membership. nBuckets is intentionally modest: the
    * edge comparisons compile into a when-chain, and 64 quantile buckets
    * bound the boundary bucket tighter than 1024 uniform ones ever do
    * under skew. */
  def selectByTokenBudgetQuantile(docs: DataFrame, quality: Column,
      tokens: Column, budget: Long, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= 256,
      s"nBuckets must be in [1, 256], got $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    // one materialized pass computes the (regex-heavy) quality/token
    // projection; the quantile probe, the bucket sums, and the final
    // selection all reuse it instead of re-running the scoring
    // expressions — and the 64-way bucket when-chain compares against the
    // stored double, not 64 inlined copies of the scoring expr (Catalyst's
    // CollapseProject would otherwise duplicate it into every branch).
    val base = projectBase(docs, quality, tokens).localCheckpoint()
    val edges: Seq[Double] =
      if (probs.isEmpty) Nil
      else Option(base
          .agg(percentile_approx(col("quality"), lit(probs.toArray), lit(10000)))
          .head().getSeq[Double](0)) // null on an empty/all-null corpus
        .map(_.toSeq.distinct.sorted).getOrElse(Nil)
    selectProjected(base.withColumn("bucket", quantileBucket(edges)), budget)
  }

  /** Descending threshold chain over ascending `edges`: the LARGEST edge
    * must be the OUTERMOST when (foldLeft over ascending order nests each
    * earlier edge inside the next), so the top quality range gets the top
    * bucket — folding the reversed list instead would make the smallest
    * edge outermost and collapse everything above it into bucket 1. Equal
    * qualities take the same branch; nulls fall through to bucket 0
    * (worst); monotone by construction. */
  private[operators] def quantileBucket(edges: Seq[Double]): Column =
    edges.zipWithIndex
      .foldLeft(lit(0): Column) { case (rest, (e, i)) =>
        when(col("quality") > lit(e), lit(i + 1)).otherwise(rest)
      }.cast("int")

  private def projectBase(docs: DataFrame, quality: Column,
      tokens: Column): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
      quality.cast("double").as("quality"),
      coalesce(tokens.cast("long"), lit(0L)).as("tokens"))

  private def selectWithBuckets(docs: DataFrame, quality: Column,
      tokens: Column, budget: Long, bucket: Column): DataFrame =
    // same one-materialized-pass discipline as the quantile arm: the sums
    // pass and the final selection both reuse the stored projection
    selectProjected(projectBase(docs, quality, tokens).localCheckpoint()
      .withColumn("bucket", bucket), budget)

  /** `base` must carry (doc_id, quality, tokens, bucket). */
  private def selectProjected(base: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val sums = base.groupBy("bucket").agg(sum("tokens").as("btok"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    var acc = 0L
    val cumBefore = sums.map { case (bk, t) => val r = (bk, acc); acc += t; r }.toMap
    val wholeBuckets = sums.collect {
      case (bk, t) if cumBefore(bk) + t < budget => bk
    }
    val boundary = sums.collectFirst {
      case (bk, t) if cumBefore(bk) < budget && cumBefore(bk) + t >= budget => bk
    }
    // one scan of the (regex-heavy) projection serves both arms: whole
    // buckets pass the final filter unconditionally, the boundary bucket
    // by its in-bucket prefix. The window shuffles only kept rows and each
    // bucket partition is ~corpus/nBuckets.
    val out = boundary match {
      case None => base.filter(col("bucket").isin(wholeBuckets.toSeq: _*))
      case Some(bk) =>
        val w = Window.partitionBy("bucket")
          .orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base.filter(col("bucket").isin((wholeBuckets.toSeq :+ bk): _*))
          .withColumn("cum", sum("tokens").over(w))
          .filter(col("bucket") =!= bk ||
            lit(cumBefore(bk)) + col("cum") - col("tokens") < budget)
          .drop("cum")
    }
    out.select("doc_id", "quality", "tokens")
  }

  /** Concat-and-slice sequence packing — the LLM-pretraining layout: within
    * each shard, documents are concatenated in `order` and the token stream
    * is sliced into `budget`-token sequences; each document is labeled with
    * the sequence its FIRST token lands in (`seq_id`) and its offset into
    * the shard's token stream (`start_offset`). A document longer than
    * `budget` spans sequences, exactly as a pretraining packer would split
    * it. One cumulative-sum window per shard — shards pack in parallel,
    * no global sort. */
  def packGreedy(df: DataFrame, shard: Column, order: Column, tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // output contract: adds/overwrites shard, n_tokens, start_offset,
    // seq_id. The scratch column gets an improbable name so a caller's
    // own "cum" column survives.
    df.withColumn("shard", shard)
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__pack_cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("shard")).orderBy(order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_offset", col("__pack_cum") - col("n_tokens"))
      // integer `div`, not double division: start_offset is exact LONG
      // arithmetic and must stay exact past 2^53 (the shardByTokens form)
      .withColumn("seq_id", expr(s"start_offset div $budget"))
      .drop("__pack_cum")
  }

  /** Token-balanced EXPORT sharding — the write-layout step between corpus
    * selection and shard files on disk: documents are laid out in a
    * deterministic hash order (a content-hash "shuffle", so adjacent docs
    * are unrelated and every shard is an unbiased slice of the corpus) and
    * the token stream is cut into `tokensPerShard`-token shards at DOCUMENT
    * boundaries — a doc belongs to the shard its first token lands in,
    * mirroring [[packGreedy]]'s seq_id convention one level up.
    *
    * The naive form is a GLOBAL ORDER BY + an unpartitioned cumulative
    * window. Instead, the same two-phase shape as [[selectByTokenBudget]]:
    * the hash-prefix (first `prefixChars` hex chars) splits the order into
    * 16^prefixChars contiguous runs, per-run token sums go to the driver
    * (≤ 16^prefixChars rows), each run's base offset is computed there, and
    * the exact cumulative sum runs as a PER-RUN window — identical output
    * to the global window, no global sort. 100 TB: raise `prefixChars` so
    * each run (~corpus/16^n) fits a task comfortably; assignment stays
    * bit-identical because run order ⊂ hash order by construction.
    * `prefixChars` is capped at 4 (65,536 runs — a run per task far past
    * 100 TB; wider would make the driver census itself the bottleneck).
    * Run bases re-enter the plan as a literal `map()` lookup while the
    * run count stays expression-sized (≤ [[MaxLiteralRuns]]), and as a
    * BROADCAST JOIN against the offsets frame above that — a thousands-
    * entry literal map would crush codegen long before the driver hurt.
    *
    * NULL tokens count 0. A snapshot layout, not append-stable: new docs
    * land anywhere in hash order and shift offsets after them — re-shard
    * per export (cheap: two narrow scans), don't increment.
    *
    * Returns (doc_id, shard_id, start_offset, tokens). */
  def shardByTokens(docs: DataFrame, key: Column, tokens: Column,
      tokensPerShard: Long, prefixChars: Int = 2): DataFrame = {
    require(tokensPerShard > 0,
      s"tokensPerShard must be positive, got $tokensPerShard")
    require(prefixChars >= 1 && prefixChars <= 4,
      s"prefixChars must be in [1, 4], got $prefixChars")
    val spark = docs.sparkSession
    import spark.implicits._
    // a NULL key hashes as "" — export sharding must place EVERY doc
    // deterministically (a null run key would NPE the driver-side census)
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
        hashHex(coalesce(key.cast("string"), lit(""))).as("__shard_h"),
        coalesce(tokens.cast("long"), lit(0L)).as("tokens"))
      .withColumn("__shard_run", substring(col("__shard_h"), 1, prefixChars))
    val sums = base.groupBy("__shard_run").agg(sum("tokens").as("rtok"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val runBase = sums.map { case (g, t) => val r = (g, acc); acc += t; r }
    val withBase =
      if (runBase.length <= MaxLiteralRuns) {
        val baseMap =
          map(runBase.flatMap { case (g, o) => Seq(lit(g), lit(o)) }: _*)
        base.withColumn("__run_base",
          element_at(baseMap, col("__shard_run")))
      } else
        // broadcast-join arm: every run present in `base` is present in
        // `runBase` by construction, so the inner equi-join is lossless;
        // the broadcast preserves base's distribution, so the per-run
        // window below still needs no extra shuffle
        base.join(
          broadcast(runBase.toSeq.toDF("__shard_run", "__run_base")),
          "__shard_run")
    val w = Window.partitionBy("__shard_run")
      .orderBy(col("__shard_h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBase
      .withColumn("start_offset",
        col("__run_base") + sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("shard_id", expr(s"start_offset div $tokensPerShard"))
      .select("doc_id", "shard_id", "start_offset", "tokens")
  }

  /** Run-count ceiling for [[shardByTokens]]'s literal-map arm; more runs
    * than this switch the base-offset lookup to a broadcast join. */
  val MaxLiteralRuns: Int = 4096
}
