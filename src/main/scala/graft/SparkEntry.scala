package graft

import graft.api._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All engine queries are registered as [[graft.api.QDef]]s in per-module
  * registries; this object only flattens them into the driver's shape. */
object SparkEntry {

  def allDefs: Seq[QDef] =
    RollupQueries.defs ++ RollupQueries2.defs ++ SeriesQueries.defs ++
      PreaggQueries.defs ++ DiscoveryQueries.defs ++ PipelineQueries.defs ++
      PipelineQueries2.defs ++ TpchQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 5m basic rollup — the engine's core operation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_rollup_basic_5m")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QDef(n, _, Some(sql)) => n -> sql }.toMap
}
