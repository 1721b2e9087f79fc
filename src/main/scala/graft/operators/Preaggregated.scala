package graft.operators

import graft.core.{Granularity, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pre-aggregated (statsd) metric support: typed struct state per kind and
  * the cross-window merge algebra (reference: inputs/formats/
  * AggregatedPayload.java:37-176, conversions PreaggregateConversions.java:
  * 48-130, merge semantics in types/Blueflood{Counter,Timer,Gauge,Set}
  * Rollup.java; state shapes per FIXTURES.md §2).
  *
  * All merges are expressed as ordinary grouped aggregations so Catalyst
  * plans partial/final automatically; map-typed percentile state is merged
  * relationally (explode → avg per label → map_from_entries) instead of a
  * driver-side loop. */
object Preaggregated {

  /** Schema of a pre-aggregated point (FIXTURES.md §2). */
  val preaggSchema: StructType = StructType(Seq(
    StructField("tenant_id", StringType),
    StructField("metric_name", StringType),
    StructField("ts_ms", LongType),
    StructField("kind", StringType),
    StructField("counter", StructType(Seq(
      StructField("count", DoubleType),
      StructField("rate", DoubleType),
      StructField("sample_count", LongType)))),
    StructField("gauge", StructType(Seq(
      StructField("latest_ts", LongType),
      StructField("latest", DoubleType)))),
    StructField("timer", StructType(Seq(
      StructField("count", LongType),
      StructField("sum", DoubleType),
      StructField("min", DoubleType),
      StructField("max", DoubleType),
      StructField("rate", DoubleType),
      StructField("percentiles", MapType(StringType, DoubleType))))),
    StructField("set", ArrayType(IntegerType))))

  /** Parse a statsd-style aggregated payload (reference: POST
    * /v2.0/:t/ingest/aggregated — AggregatedPayload.java:37-176, converted
    * by PreaggregateConversions.java:48-130) into typed pre-agg rows. One
    * JSON line per flush: `{tenant_id, timestamp, gauges: [{name, latest}],
    * counters: [{name, value, rate}], timers: [{name, count, sum, min, max,
    * percentiles: {..}}], sets: [{name, values: [..]}]}` → one row per
    * member metric, kind-discriminated, struct state columns. */
  def fromAggregatedJson(lines: org.apache.spark.sql.DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val payloadSchema = StructType(Seq(
      StructField("tenant_id", StringType),
      StructField("timestamp", LongType),
      StructField("flushInterval", LongType),
      StructField("gauges", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("latest", DoubleType))))),
      StructField("counters", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("value", DoubleType),
        StructField("rate", DoubleType))))),
      StructField("timers", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("count", LongType),
        StructField("sum", DoubleType), StructField("min", DoubleType),
        StructField("max", DoubleType), StructField("rate", DoubleType),
        StructField("percentiles", MapType(StringType, DoubleType)))))),
      StructField("sets", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("values", ArrayType(IntegerType))))))))
    // SINGLE-PASS parse: one from_json, one explode. The previous shape (a
    // 4-way union of per-kind branches, each exploding its own section) made
    // Catalyst plan FOUR scans each re-running from_json over every line —
    // the dominant cost of the ingest conversion. Here each kind section is
    // mapped (transform — a single-level lambda over the handful of metrics
    // in one flush, NOT a fan-out HOF re-evaluating a heavy subtree) into a
    // common kind-tagged element shape, concatenated, and exploded once.
    // CollapseProject declines to inline the expensive from_json into its
    // many field references, so the plan keeps exactly one parse.
    val parsed = lines
      .select(from_json(col("value").cast("string"), payloadSchema).as("p"))
    val counterT = preaggSchema("counter").dataType
    val gaugeT = preaggSchema("gauge").dataType
    val timerT = preaggSchema("timer").dataType
    val setT = preaggSchema("set").dataType
    val taggedT = ArrayType(StructType(Seq(
      StructField("metric_name", StringType),
      StructField("kind", StringType),
      StructField("counter", counterT),
      StructField("gauge", gaugeT),
      StructField("timer", timerT),
      StructField("set", setT))))
    def nul(t: DataType): Column = lit(null).cast(t)
    val flushMs = coalesce(col("p.flushInterval"), lit(0L))
    // Counter sampleCount = trunc(rate × flushInterval/1000), or 1 when the
    // statsd config omits flushInterval (PreaggregateConversions.java:58-65).
    // floor ≡ the reference's (long) truncation for the non-negative rates
    // statsd emits, and floor round-trips identically through DuckDB. LONG,
    // not int: the value is only ever summed, and a high-volume counter with
    // a long flush interval would overflow an ANSI int cast and fail the
    // whole ingest batch. A payload omitting rate coalesces to 0 samples
    // rather than a null that counterMerge's sum would silently skip.
    def sampleCount(rate: Column): Column =
      when(flushMs > 0,
        floor(coalesce(rate, lit(0.0)) * flushMs / lit(1000.0)).cast(LongType))
        .otherwise(lit(1L))
    val counterEls = transform(col("p.counters"), m => struct(
      m.getField("name").as("metric_name"), lit("counter").as("kind"),
      struct(m.getField("value").as("count"), m.getField("rate").as("rate"),
        sampleCount(m.getField("rate")).as("sample_count")).as("counter"),
      nul(gaugeT).as("gauge"), nul(timerT).as("timer"), nul(setT).as("set")))
    val gaugeEls = transform(col("p.gauges"), m => struct(
      m.getField("name").as("metric_name"), lit("gauge").as("kind"),
      nul(counterT).as("counter"),
      struct(col("p.timestamp").as("latest_ts"),
        m.getField("latest").as("latest")).as("gauge"),
      nul(timerT).as("timer"), nul(setT).as("set")))
    val timerEls = transform(col("p.timers"), m => struct(
      m.getField("name").as("metric_name"), lit("timer").as("kind"),
      nul(counterT).as("counter"), nul(gaugeT).as("gauge"),
      struct(m.getField("count").as("count"), m.getField("sum").as("sum"),
        m.getField("min").as("min"), m.getField("max").as("max"),
        coalesce(m.getField("rate"), lit(0.0)).as("rate"),
        m.getField("percentiles").as("percentiles")).as("timer"),
      nul(setT).as("set")))
    val setEls = transform(col("p.sets"), m => struct(
      m.getField("name").as("metric_name"), lit("set").as("kind"),
      nul(counterT).as("counter"), nul(gaugeT).as("gauge"), nul(timerT).as("timer"),
      m.getField("values").as("set")))
    // an absent section parses to null; it must contribute zero elements,
    // not null the whole concat
    def orEmpty(c: Column): Column = coalesce(c, array().cast(taggedT))
    parsed
      .select(col("p.tenant_id").as("tenant_id"), col("p.timestamp").as("ts_ms"),
        explode(concat(orEmpty(counterEls), orEmpty(gaugeEls),
          orEmpty(timerEls), orEmpty(setEls))).as("m"))
      .select(col("tenant_id"), col("m.metric_name").as("metric_name"), col("ts_ms"),
        col("m.kind").as("kind"), col("m.counter").as("counter"),
        col("m.gauge").as("gauge"), col("m.timer").as("timer"), col("m.set").as("set"))
  }

  /** Counter merge: counts added; merged rate = Σcount / Σ(countᵢ/rateᵢ)
    * — the reference's total-time formula (BluefloodCounterRollup.java:
    * 102-115), zero-guarded like utils/Util.safeDiv. Input: rows with
    * (count, rate) per finer window. */
  def counterMerge(finer: DataFrame, g: Granularity): DataFrame = {
    // sample counts add across merges (BluefloodCounterRollup.java:120-128);
    // carried only when the input tier has the column, so merge inputs built
    // from sources without sampling metadata stay unchanged.
    val sampleAgg =
      if (finer.columns.contains("sample_count"))
        Seq(sum(col("sample_count")).cast("long").as("sample_count"))
      else Nil
    finer
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("bucket_ms"), g).as("bucket_ms"))
      .agg(
        sum(col("count")).as("count"),
        (sum(when(col("rate") =!= 0.0, col("count") / col("rate"))
          .otherwise(lit(0.0))).as("elapsed_s") +: sampleAgg): _*)
      .withColumn("rate",
        when(col("elapsed_s") =!= 0.0, col("count") / col("elapsed_s"))
          .otherwise(lit(0.0)))
      .drop("elapsed_s")
  }

  /** Timer percentile-map merge: per label, the UNWEIGHTED mean of the
    * finer windows' percentile means (BluefloodTimerRollup.java:242-254).
    * The map explodes to rows, averages per (group, label), and reassembles
    * with map_from_entries — no driver loop, shuffle-parallel. */
  def timerPercentileMerge(finer: DataFrame, g: Granularity): DataFrame = {
    val exploded = finer.select(
      col("tenant_id"), col("metric_name"),
      Tables.bucketMs(col("bucket_ms"), g).as("bucket_ms"),
      explode(col("percentiles")).as(Seq("label", "p_mean")))
    exploded
      .groupBy(col("tenant_id"), col("metric_name"), col("bucket_ms"), col("label"))
      .agg(avg(col("p_mean")).as("p_mean"))
      .groupBy(col("tenant_id"), col("metric_name"), col("bucket_ms"))
      // array_sort canonicalizes entry order (labels are unique per
      // group): collect_list order is task-order nondeterministic, and the
      // byte-identical repair contract at `merges` needs stored and
      // repaired rows to match exactly
      .agg(map_from_entries(array_sort(
          collect_list(struct(col("label"), col("p_mean")))))
        .as("percentiles"))
  }

  /** Full timer-state merge to a coarser tier — the scalar state plus the
    * percentile map in one operator (reference computeFromRollups,
    * BluefloodTimerRollup.java:210-256): counts and sums add, min/max
    * extremize, rate uses the total-OBSERVED-time formula
    * rate = Σcountᵢ / Σ(countᵢ/rateᵢ) (lines 226-228 — NOT count over the
    * coarser span: empty finer windows contribute no time), and percentile
    * means merge UNWEIGHTED (lines 242-254, lossy by design). The map state
    * merges relationally (explode → avg per label → map_from_entries); the
    * scalar and map aggregations share the same grouping key, so the join
    * re-uses the shuffle partitioning rather than adding an exchange. */
  def timerStateMerge(finer: DataFrame, g: Granularity): DataFrame = {
    val keyed = finer.withColumn("bucket_ms", Tables.bucketMs(col("bucket_ms"), g))
    val scalars = keyed
      .groupBy(col("tenant_id"), col("metric_name"), col("bucket_ms"))
      .agg(
        sum(col("count")).as("count"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"),
        sum(when(col("rate") =!= 0.0, col("count") / col("rate"))
          .otherwise(lit(0.0))).as("elapsed_s"))
      .withColumn("rate",
        when(col("elapsed_s") =!= 0.0, col("count") / col("elapsed_s"))
          .otherwise(lit(0.0)))
      .drop("elapsed_s")
    // the ONE percentile-merge implementation (bucketMs is idempotent on
    // keyed's already-coarsened bucket_ms) — a copy here would drift from
    // fixes landing on timerPercentileMerge
    val pmap = timerPercentileMerge(keyed, g)
    scalars.join(pmap, Seq("tenant_id", "metric_name", "bucket_ms"), "left")
  }

  /** Gauge merge: the latest value across inputs is the one with the max
    * latest_ts (BluefloodGaugeRollup.java:81-96); ties on latest_ts break
    * by value (lexicographic struct max) so the merge is total and
    * partition-order-independent. */
  def gaugeMerge(finer: DataFrame, g: Granularity): DataFrame =
    finer
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("bucket_ms"), g).as("bucket_ms"))
      .agg(
        sum(col("num_points")).as("num_points"),
        max(col("latest_ts")).as("latest_ts"),
        max(struct(col("latest_ts"), col("latest_v"))).getField("latest_v")
          .as("latest_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Set-state merge: stored exact hash-set arrays union'd per coarser
    * window; cardinality = union size (BluefloodSetRollup.java:35-70).
    * `flatten(collect_list(...))` keeps the state mergeable across tiers —
    * the declarative form of SetRollupAggregator. */
  def setStateMerge(finer: DataFrame, g: Granularity): DataFrame =
    finer
      .groupBy(col("tenant_id"), col("metric_name"),
        Tables.bucketMs(col("bucket_ms"), g).as("bucket_ms"))
      // array_sort canonicalizes element order — collect_list is
      // task-order nondeterministic and the stored/repaired tiers must be
      // byte-identical (the `merges` contract)
      .agg(array_sort(array_distinct(flatten(collect_list(col("set_state")))))
        .as("set_state"))
      .withColumn("distinct_count", size(col("set_state")))

  /** Kind → tier-merge algebra, the SINGLE source of truth shared by the
    * stored cascade ([[graft.streaming.IngestStream]] preaggCascadeFor)
    * and the read path's missing-day repair
    * ([[graft.query.MetricsQueryApi]] preaggLadder): gap repair must
    * produce byte-identical rows to what the cascade would have stored,
    * which only holds if both dispatch through the same map. */
  val merges: Map[String, (DataFrame, Granularity) => DataFrame] = Map(
    "counter" -> counterMerge,
    "gauge" -> gaugeMerge,
    "timer" -> timerStateMerge,
    "set" -> setStateMerge)

  /** Tier-1 (finest stored) merge states per kind from parsed payload rows —
    * the kind dispatch the reference performs in
    * RollupRunnable.getRollupComputer (service/RollupRunnable.java:162-178),
    * resolved here by each row's declared kind; the result tables are flat,
    * keyed (tenant_id, metric_name, bucket_ms), and directly mergeable by
    * the same kind operator that built them, so the whole ladder uses one
    * algebra per kind. A single flush state converts per the reference's
    * buildFromRawSamples semantics — a lone gauge reading has count 1 and
    * min = max = latest (BluefloodGaugeRollup.java:49-63). */
  def tier1FromParsed(parsed: DataFrame, g: Granularity): Map[String, DataFrame] = {
    def of(kind: String) = parsed.filter(col("kind") === kind)
      .withColumn("bucket_ms", col("ts_ms"))
    val counter = counterMerge(
      of("counter").select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
        col("counter.count").as("count"), col("counter.rate").as("rate"),
        col("counter.sample_count").as("sample_count")), g)
    val gauge = gaugeMerge(
      of("gauge").select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
        lit(1L).as("num_points"),
        col("gauge.latest_ts").as("latest_ts"), col("gauge.latest").as("latest_v"),
        col("gauge.latest").as("min_v"), col("gauge.latest").as("max_v")), g)
    val timer = timerStateMerge(
      of("timer").select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
        col("timer.count").as("count"), col("timer.sum").as("sum"),
        col("timer.min").as("min"), col("timer.max").as("max"),
        col("timer.rate").as("rate"), col("timer.percentiles").as("percentiles")), g)
    val set = setStateMerge(
      of("set").select(col("tenant_id"), col("metric_name"), col("bucket_ms"),
        col("set").as("set_state")), g)
    Map("counter" -> counter, "gauge" -> gauge, "timer" -> timer, "set" -> set)
  }
}
