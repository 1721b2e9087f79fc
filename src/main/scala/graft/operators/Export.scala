package graft.operators

import graft.core.Granularity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rollup export + out-of-band backfill (reference: blueflood-cloudfiles/
  * CloudFilesService.java — gzipped JSON rollup export to object storage —
  * and blueflood-rollupTools/CloudFilesBackfiller, which re-rolls from the
  * exported files). On Spark both are one-liners over the same operators:
  * export is a partitioned compressed-JSON write, backfill re-aggregates
  * the exported full-res points and upserts the rollup tier. */
object Export {

  /** Export a rollup/points table as day-partitioned gzipped JSON. */
  def exportJson(df: DataFrame, outDir: String): Unit =
    df.withColumn("ts_day",
        col("bucket_ms") - pmod(col("bucket_ms"), lit(86400000L)))
      .write.mode("overwrite")
      .partitionBy("ts_day")
      .option("compression", "gzip")
      .json(outDir)

  /** Materialize a training-set export as token-balanced shard files:
    * [[Sampling.shardByTokens]] computes the (doc → shard) layout, this
    * writes one directory per shard (`shard_id=N/`), each holding the
    * shard's docs with their stream offsets (`shard_offset` — prefixed so
    * it cannot collide with a caller's own packing columns). `partitionBy`
    * makes the shard the physical unit: a 1000-executor write produces
    * every shard in parallel, and a reader opens exactly its shards.
    *
    * Returns max(shard_id) + 1. A document longer than `tokensPerShard`
    * spans shards, so an id in 0..count-1 may have NO directory (its
    * token range lies inside one long doc) — loaders must enumerate the
    * `shard_id=` directories, not the id range. The count comes from a
    * driver-side directory listing, not a read-back job. */
  def writeShards(docs: DataFrame, outDir: String,
      tokensPerShard: Long): Long = {
    val assign = Sampling.shardByTokens(docs,
        key = col("doc_id"),
        tokens = graft.functions.TextFunctions.tokenCountBpe(col("text")),
        tokensPerShard = tokensPerShard)
      .select(col("doc_id"), col("shard_id"),
        col("start_offset").as("shard_offset"))
    docs.join(assign, "doc_id")
      .write.mode("overwrite")
      .partitionBy("shard_id")
      .parquet(outDir)
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(
      docs.sparkSession.sessionState.newHadoopConf())
    val ids = fs.listStatus(path)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard_id="))
      .map(_.getPath.getName.stripPrefix("shard_id=").toLong)
    if (ids.isEmpty) 0L else ids.max + 1L
  }

  /** Backfill: read an exported full-res dump and rebuild a rollup tier
    * from it (recompute-from-source, idempotent). */
  def backfillFromExport(spark: SparkSession, exportDir: String,
      g: Granularity): DataFrame = {
    val raw = spark.read.json(exportDir)
      .select(col("tenant_id"), col("metric_name"),
        col("ts_ms").cast("long").as("ts_ms"), col("value").cast("double").as("value"))
    Rollups.basicFromRaw(raw, g)
  }
}
