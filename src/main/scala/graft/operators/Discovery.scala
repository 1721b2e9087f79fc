package graft.operators

import graft.core.GlobPattern
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metric discovery / search — the reference keeps these in Elasticsearch
  * (blueflood-elasticsearch/.../ElasticIO.java, ElasticTokensIO.java); here
  * they are relational operators over the metric catalog, so the same
  * DataFrame machinery (pushdown, broadcast) applies and no side index needs
  * maintaining. */
object Discovery {

  /** Glob search over metric names (reference: AbstractElasticIO.java:79-134;
    * glob→regex via utils/GlobPattern.java). */
  def globSearch(catalog: DataFrame, tenantId: String, glob: String): DataFrame =
    catalog
      .filter(col("tenant_id") === tenantId &&
        col("metric_name").rlike(GlobPattern.toAnchoredRegex(glob)))
      .select(col("metric_name"), col("unit"))
      .orderBy("metric_name")

  /** Token hierarchy of the dotted namespace (reference: types/Token.java:
    * 36-79; ES docs built by ElasticTokensIO.java:42-195). `posexplode` over
    * the split name is the engine's only generator-shaped operator; the
    * result is (parent, token, is_leaf) per level — computed on demand, no
    * materialized index. */
  def tokens(catalog: DataFrame): DataFrame = {
    val parts = split(col("metric_name"), "\\.")
    catalog
      .select(col("metric_name")).distinct()
      .select(col("metric_name"), posexplode(parts).as(Seq("pos", "token")),
        size(parts).as("n_tokens"))
      .select(
        when(col("pos") === 0, lit(""))
          .otherwise(concat_ws(".", slice(split(col("metric_name"), "\\."), lit(1), col("pos"))))
          .as("parent"),
        col("token"),
        (col("pos") === col("n_tokens") - 1).as("is_leaf"))
      .distinct()
  }

  /** Next-level browse for a `foo.bar.*` query (reference:
    * HttpMetricNamesHandler.java:45-106 + MetricIndexData.java — returns
    * matching complete names and next-level prefixes). */
  def metricNameBrowse(catalog: DataFrame, tenantId: String, query: String): DataFrame = {
    val baseLevel = query.count(_ == '.')
    val parts = split(col("metric_name"), "\\.")
    // Anchored match of the glob against the name's first baseLevel+1
    // tokens — an unanchored prefix regex would let 'foo.*.baz' also match
    // names whose token merely STARTS with 'baz' (e.g. foo.a.bazX).
    val prefix = concat_ws(".", slice(parts, lit(1), lit(baseLevel + 1)))
    catalog
      .filter(col("tenant_id") === tenantId &&
        size(parts) >= baseLevel + 1 &&
        prefix.rlike(GlobPattern.toAnchoredRegex(query)))
      .select(
        prefix.as("name"),
        (size(parts) === baseLevel + 1).as("is_complete_name"))
      .distinct()
      .orderBy("name")
  }

  /** Event/annotation search (reference: HttpEventsQueryHandler.java:29-75 →
    * EventElasticSearchIO.java:60-101: from/until range + tag filter). */
  def eventSearch(events: DataFrame, fromMs: Long, untilMs: Long, tagsRegex: String): DataFrame =
    events
      .filter(col("ts_ms") >= fromMs && col("ts_ms") < untilMs &&
        // props is nullable (an ingested event without data/tags): rlike
        // on NULL is NULL and the filter would drop the event even under
        // an empty tags query — a null props matches like an empty string
        coalesce(col("props"), lit("")).rlike(tagsRegex))
      .orderBy("event_id")
}
