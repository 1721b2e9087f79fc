package graft.operators

import graft.SparkSuite
import graft.core.{Granularity, Tables}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Results must not depend on physical parallelism: every operator is
  * re-run with adversarial repartitioning (1 vs 13 partitions) and must
  * produce identical rows. This is the local stand-in for "would the
  * answer change on a 1000-executor cluster?" — it guards the custom
  * merge algebra (timer/set/minhash) where Spark can't guarantee it
  * for us. */
class PartitionInvarianceSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def invariant(name: String)(f: DataFrame => DataFrame)(src: => DataFrame): Unit =
    test(s"$name is partition-invariant") {
      val one = sortedRows(f(src.repartition(1)))
      val many = sortedRows(f(src.repartition(13)))
      assert(one === many)
    }

  invariant("basicFromRaw@5m")(df => Rollups.basicFromRaw(df, Granularity.MIN_5))(
    Tables.metrics(spark, dir))

  invariant("basicMerge(5m→60m)")(df =>
    Rollups.basicMerge(Rollups.basicFromRaw(df, Granularity.MIN_5), Granularity.MIN_60)
      .select("tenant_id", "metric_name", "bucket_ms", "num_points", "min_v", "max_v"))(
    Tables.metrics(spark, dir))

  // avg_v excluded: a plain double sum is ulp-sensitive to partitioning,
  // which is precisely why the oracle-facing queries accumulate in DECIMAL
  // (QDef scaladoc); the structural stats must be exactly invariant.
  invariant("gaugeFromRaw@1440m")(df =>
    Rollups.gaugeFromRaw(df, Granularity.MIN_1440)
      .select("tenant_id", "metric_name", "bucket_ms", "num_points",
        "min_v", "max_v", "latest_ts", "latest_v"))(
    Tables.metrics(spark, dir))

  invariant("setFromRaw@1440m")(df => Rollups.setFromRaw(df, Granularity.MIN_1440))(
    Tables.metrics(spark, dir))

  invariant("minhashNearDups")(df =>
    Dedup.minhashNearDups(df).select("doc_id_1", "doc_id_2"))(
    Tables.load(spark, dir, "documents"))

  invariant("simhashNearDups")(df =>
    Dedup.simhashNearDups(df, maxDist = 6).select("doc_id_1", "doc_id_2"))(
    Tables.load(spark, dir, "documents"))

  invariant("bruteTopK")(df => {
    import org.apache.spark.sql.functions._
    val qs = df.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    Similarity.bruteTopK(df, qs, 10)
  })(Tables.load(spark, dir, "embeddings"))

  invariant("connectedComponents(minhash pairs)")(df => {
    import org.apache.spark.sql.functions._
    // maxLocalEdges = 0: the DISTRIBUTED loop is the path whose
    // partition-sensitivity this spec guards (the driver fast path is
    // trivially layout-independent)
    Dedup.connectedComponents(
      Dedup.minhashNearDups(df).select("doc_id_1", "doc_id_2"),
      df.select(col("doc_id")), maxLocalEdges = 0L)
  })(Tables.load(spark, dir, "documents"))

  invariant("contaminationReport")(df => {
    import org.apache.spark.sql.functions._
    Dedup.contaminationReport(df,
      substring(Sampling.hashHex(col("doc_id")), 1, 1) === "f", k = 8)
  })(Tables.load(spark, dir, "documents"))

  invariant("tileDedup")(df => Dedup.tileDedup(df, k = 5))(
    Tables.load(spark, dir, "documents"))

  invariant("selectByTokenBudget")(df => {
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => TF}
    Sampling.selectByTokenBudget(df, TF.qualityScore(col("text")),
      TF.tokenCountBpe(col("text")), budget = 12000L)
  })(Tables.load(spark, dir, "documents"))

  invariant("tileDedupDf")(df => Dedup.tileDedupDf(df, k = 5, minDf = 2))(
    Tables.load(spark, dir, "documents"))

  invariant("rollingZScores")(df =>
    Anomaly.rollingZScores(df, windowMs = 7L * 86400000L, threshold = 2.5))(
    Tables.metrics(spark, dir))

  invariant("Series.derivatives")(df => Series.derivatives(df))(
    Tables.metrics(spark, dir))

  invariant("Sessionize.sessions")(df => {
    import org.apache.spark.sql.functions._
    Sessionize.sessions(
      df.select(col("user_id"), Tables.tsMsCol(df).as("ts_ms"),
        col("event_id"), col("value")), gapMs = 86400000L)
  })(Tables.load(spark, dir, "events"))

  invariant("Series.timeShiftCompare")(df =>
    Series.timeShiftCompare(df, 86400000L, 7L * 86400000L))(
    Tables.metrics(spark, dir))

  invariant("Series.integral")(df => Series.integral(df))(
    Tables.metrics(spark, dir))

  invariant("Series.quantileOfSeries")(df =>
    Series.quantileOfSeries(df, "app.*.*", 0.9, 86400000L))(
    Tables.metrics(spark, dir))

  invariant("Series.linearTrend")(df =>
    Series.linearTrend(df, horizonS = 604800.0, threshold = 500.0))(
    Tables.metrics(spark, dir))

  invariant("Series.clampOutliers")(df => Series.clampOutliers(df, 0.95))(
    Tables.metrics(spark, dir))

  invariant("Anomaly.ewmaBands")(df => Anomaly.ewmaBands(df))(
    Tables.metrics(spark, dir))

  invariant("TextScoring.bm25TopK")(df => {
    import org.apache.spark.sql.functions.col
    TextScoring.bm25TopK(df, col("doc_id"), col("text"),
      Seq("dup", "join", "scan", "stream"), k = 20)
  })(Tables.load(spark, dir, "documents"))

  invariant("Dedup.sharedSpans")(df =>
    Dedup.sharedSpans(df, k = 3, minWords = 20, maxDf = 50L))(
    Tables.load(spark, dir, "documents"))

  invariant("Dedup.removeSharedSpans")(df =>
    Dedup.removeSharedSpans(df, k = 3, minWords = 20, maxDf = 50L))(
    Tables.load(spark, dir, "documents"))

  invariant("TextScoring.pmiPairs")(df =>
    TextScoring.pmiPairs(df, maxDist = 3, minCount = 5L, k = 50))(
    Tables.load(spark, dir, "documents"))

  invariant("Series.m4Downsample")(df => Series.m4Downsample(df, 12))(
    Tables.metrics(spark, dir))

  invariant("Series.madOutliers")(df => Series.madOutliers(df))(
    Tables.metrics(spark, dir))

  invariant("Series.resampleLinear")(df =>
    Series.resampleLinear(df, 21600000L))(
    Tables.metrics(spark, dir))

  invariant("TextScoring.perplexityRoute")(df =>
    TextScoring.perplexityRoute(df))(
    Tables.load(spark, dir, "documents"))

  invariant("Rollups.timerHdrFromRaw@60m")(df =>
    Rollups.timerHdrFromRaw(df, Granularity.MIN_60))(
    Tables.metrics(spark, dir))

  invariant("Anomaly.alertIntervals")(df =>
    Anomaly.alertIntervals(
      Anomaly.rollingZScores(df, windowMs = 7L * 86400000L,
        threshold = 2.5, minPoints = 5), gapMs = 3L * 86400000L))(
    Tables.metrics(spark, dir))

  invariant("Series.groupByNodes")(df =>
    Series.groupByNodes(df, Seq(0, 1), "sum", 3600000L))(
    Tables.metrics(spark, dir))

  // the derived-double stddev (exact-DECIMAL Σx/Σx² then one scalar
  // expression) must not move with layout — the recipe's whole point
  invariant("Series.aggregateSeries@stddev")(df =>
    Series.aggregateSeries(df, "app.*", "stddev", 3600000L))(
    Tables.metrics(spark, dir))

  invariant("Series.movingWindowPrefix")(df =>
    Series.movingWindowPrefix(df, 600000L))(
    Tables.metrics(spark, dir))
}
