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
}
