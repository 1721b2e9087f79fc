package graft.operators

import graft.SparkSuite
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite with SparkSuite {

  test("streamingDedupKeepFirst: first arrival wins across batches, state is watermark-bounded") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = 1704067200000L

    // (doc_id, text, ts_ms) — docs 1 and 3 are byte-identical, as are 2 and 4
    val mem = MemoryStream[(Long, String, Long)]
    val deduped = Dedup.streamingDedupKeepFirst(
      mem.toDF().toDF("doc_id", "text", "ts_ms"),
      key = TF.fingerprint(col("text")),
      eventTime = timestamp_millis(col("ts_ms")))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()

    // batch 1: an original, a same-batch duplicate, a distinct doc
    mem.addData(
      (1L, "alpha beta gamma delta", base),
      (3L, "alpha beta gamma delta", base + 1000),
      (2L, "completely different text here", base + 2000))
    q.processAllAvailable()

    // batch 2: a cross-batch duplicate within the watermark + a reordered
    // copy (fingerprint dedup catches word order) + a fresh doc
    mem.addData(
      (4L, "different completely text here", base + 3000),
      (5L, "a genuinely new document", base + 4000))
    q.processAllAvailable()
    q.stop()

    val survivors = spark.table("dedup_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 2L, 5L),
      "first arrival of each fingerprint survives; 3 and 4 are duplicates")

    // input columns pass through unchanged, helper columns dropped
    assert(spark.table("dedup_out").columns.toSeq === Seq("doc_id", "text", "ts_ms"))
  }

  test("DocumentStream: rolling incremental near-dup across batches, replay-idempotent") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.DocumentStream
    val store = java.nio.file.Files.createTempDirectory("graft_docstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_docstream_ck").toString
    // 30 distinct words; one-word edits keep 3-shingle jaccard ≈ 27/29 ≥ 0.8
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val tailEdit = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val headEdit = "yy " + (2 to 30).map(i => s"w$i").mkString(" ")
    val unrelated = (1 to 30).map(i => s"u$i").mkString(" ")

    val mem = MemoryStream[(Long, String)]
    val q = DocumentStream.start(mem.toDF().toDF("doc_id", "text"), store, ckpt)
    // batch 0: near-dups 1≈2 inside the batch, 9 unrelated
    mem.addData((1L, base), (2L, tailEdit), (9L, unrelated))
    q.processAllAvailable()
    // batch 1: 3 near-dups BOTH standing docs — the cross-store case
    mem.addData((3L, headEdit))
    q.processAllAvailable()
    q.stop()

    def pairSet = DocumentStream.pairsStore(spark, store)
      .select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))

    // at-least-once replay: rerunning batch 1 with the store already
    // holding doc 3 (and its signatures) must converge to the same pairs
    DocumentStream.processDocumentBatch(
      Seq((3L, headEdit)).toDF("doc_id", "text"), store, batchId = 1L)
    assert(pairSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))

    // the signature store grew with the corpus (4 docs, 4 signature rows)
    assert(spark.read.parquet(s"$store/signatures").count() === 4L)
  }

  test("DocumentStream.startSearchIndex: BM25 over a growing corpus == batch index") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.DocumentStream
    val idx = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sidx_ck").toString
    val docs = Seq(
      (1L, "spark shuffles the join keys"),
      (2L, "a join without shuffle is a broadcast join"),
      (3L, "nothing relevant here at all"),
      (4L, "shuffle shuffle join"))
    val mem = MemoryStream[(Long, String)]
    val q = DocumentStream.startSearchIndex(
      mem.toDF().toDF("doc_id", "text"), idx, ckpt)
    mem.addData(docs.take(2): _*); q.processAllAvailable()
    mem.addData(docs.drop(2): _*); q.processAllAvailable()
    q.stop()
    val streamed = graft.operators.TextScoring
      .bm25TopKFromIndex(spark, idx, Seq("join", "shuffle"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val oneShot = java.nio.file.Files.createTempDirectory("graft_sidx_one").toString
    graft.operators.TextScoring.writeTextIndex(docs.toDF("doc_id", "text"), oneShot)
    val direct = graft.operators.TextScoring
      .bm25TopKFromIndex(spark, oneShot, Seq("join", "shuffle"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(streamed === direct,
      "stream-folded index must serve the one-shot batch answer exactly")
  }
}
