package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Rolling corpus ingest with INCREMENTAL near-dup detection — the
  * streaming lifecycle around [[Dedup.incrementalNearDups]]: each arriving
  * document batch is deduplicated against everything already ingested,
  * then folded into the standing stores so the next batch sees it.
  *
  * Store layout under `storeDir` (all batch-id partitioned, overwrite):
  *  - `docs/`       the corpus (passthrough schema)
  *  - `signatures/` the minhash signature table the NEXT batch band-joins
  *  - `pairs/`      every (doc_id_1, doc_id_2, jaccard, batch_id) finding
  *
  * Idempotent under foreachBatch's at-least-once replays: every write is
  * an overwrite of the batch's own partition, and a replayed detection is
  * unchanged even though the store already holds the batch's signatures —
  * a document never pairs with itself and duplicate candidates collapse
  * in the exact verify (the algebra DedupSimilaritySpec pins with its
  * store-already-holds-everything case).
  *
  * Scale: the standing corpus participates per batch only through its
  * signature table and the semi-join-pruned verify set — per-batch cost
  * is O(|batch| + |signatures| + |candidates|), never O(|corpus|). */
object DocumentStream {

  /** One micro-batch of the rolling-dedup lifecycle. */
  def processDocumentBatch(batch: DataFrame, storeDir: String,
      batchId: Long = 0L): Unit = {
    val spark = batch.sparkSession
    val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (cached.isEmpty) return
      val oldSig =
        if (IngestStream.hasParquetData(spark, s"$storeDir/signatures"))
          spark.read.parquet(s"$storeDir/signatures").drop("batch_id")
        else Dedup.minhashSignatures(cached.limit(0)) // schema-only: no store yet
      val allDocs =
        if (IngestStream.hasParquetData(spark, s"$storeDir/docs"))
          spark.read.parquet(s"$storeDir/docs").drop("batch_id")
            .unionByName(cached)
        else cached
      val pairs = Dedup.incrementalNearDups(cached, oldSig, allDocs)
      // pairs first (a replayed batch that died mid-write must re-detect
      // against the PRE-batch store state, which appending last preserves)
      pairs.write.mode("overwrite").parquet(s"$storeDir/pairs/batch_id=$batchId")
      cached.write.mode("overwrite").parquet(s"$storeDir/docs/batch_id=$batchId")
      Dedup.minhashSignatures(cached)
        .write.mode("overwrite").parquet(s"$storeDir/signatures/batch_id=$batchId")
    } finally cached.unpersist()
  }

  /** Streaming entry: drive [[processDocumentBatch]] from any streaming
    * source of documents (doc_id, text, ...). */
  def start(docs: DataFrame, storeDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processDocumentBatch(batch, storeDir, id)
      }
      .start()

  /** Streaming search-index maintenance: fold each arriving document batch
    * into a [[graft.operators.TextScoring.writeTextIndex]]-layout inverted
    * index ([[graft.operators.TextScoring.appendTextIndex]] — batch-id
    * partitioned, replay-idempotent), so
    * [[graft.operators.TextScoring.bm25TopKFromIndex]] serves BM25 over
    * everything ingested so far. Compose with [[start]]'s rolling dedup
    * upstream when re-crawled doc_ids are possible — the index counts
    * every row it is handed, exactly as a corpus with copies would.
    *
    * `checkpointDir` and `indexDir` share ONE lifetime: replay idempotency
    * keys on the checkpoint's batch ids, so resetting the checkpoint
    * against a surviving index restarts ids at 0 and mixes the re-ingested
    * corpus with stale later batches. To restart from scratch, wipe both
    * (or rebuild with `writeTextIndex`, which truncates the index). */
  def startSearchIndex(docs: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // persist: the append tokenizes the batch for dl and again for tf
        // (and isEmpty is a third scan) — the processDocumentBatch pattern
        val cached = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (!cached.isEmpty)
            graft.operators.TextScoring.appendTextIndex(cached, indexDir, id)
        } finally cached.unpersist()
      }
      .start()

  /** All near-dup findings so far (doc_id_1, doc_id_2, jaccard, batch_id).
    * Before the first non-empty batch commits there is no parquet yet —
    * serve an empty frame with the store's schema, not a crash (same
    * contract as every other store reader; see
    * [[IngestStream.hasParquetData]]). */
  def pairsStore(spark: SparkSession, storeDir: String): DataFrame =
    if (IngestStream.hasParquetData(spark, s"$storeDir/pairs"))
      spark.read.parquet(s"$storeDir/pairs")
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Double, Int)]
        .toDF("doc_id_1", "doc_id_2", "jaccard", "batch_id")
    }
}
