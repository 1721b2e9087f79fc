package graft.operators

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** [[TextScoring.compactTextIndex]] / [[TextScoring
  * .recoverTextIndexCompaction]] — folding a streamed index's batch dirs
  * must serve hash-identical BM25 answers, never re-fold prior
  * compactions, spare a possibly-live newest dir, and survive a crash on
  * either side of the commit point. */
class TextIndexCompactionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val terms = Seq("dup", "join", "scan", "stream")

  private def docs = graft.core.Tables.load(spark,
    "/root/testdata/sf0.001", "documents")

  private def serve(p: String): Seq[(Long, Int, Double)] =
    TextScoring.bm25TopKFromIndex(spark, p, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

  private def batchDirs(p: String, sub: String): Seq[String] =
    fs.globStatus(new Path(s"$p/$sub", "batch_id=*"))
      .map(_.getPath.getName).toSeq.sorted

  test("compaction folds batch dirs; BM25 serve is hash-identical; prior " +
    "compactions never re-folded; ids increase") {
    val idx = java.nio.file.Files.createTempDirectory("graft_tic1").toString
    for (b <- 0L until 3L)
      TextScoring.appendTextIndex(docs.filter(col("doc_id") % 3 === b), idx, b)
    val before = serve(idx)
    val got = TextScoring.compactTextIndex(spark, idx, assumeQuiesced = true)
    assert(got === Some(Retention.CompactIdBase))
    val cdir = s"batch_id=${Retention.CompactIdBase}"
    assert(batchDirs(idx, "postings") === Seq(cdir))
    assert(batchDirs(idx, "stats") === Seq(cdir))
    assert(!fs.exists(new Path(idx, "_compact_manifest")))
    assert(serve(idx) === before,
      "compacted index must serve the exact pre-compaction answer")
    // term-bucket layout preserved inside the compacted dir
    assert(fs.globStatus(
      new Path(s"$idx/postings/$cdir", "wb=*")).nonEmpty)
    // nothing foldable left → no-op; the compacted dir is never re-read
    assert(TextScoring.compactTextIndex(spark, idx,
      assumeQuiesced = true) === None)
    // later appends fold in a second round with an increasing id; the
    // standing compaction is untouched
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 7 === 0), idx, 10L)
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 7 === 1), idx, 11L)
    val withNew = serve(idx)
    val again = TextScoring.compactTextIndex(spark, idx, assumeQuiesced = true)
    assert(again === Some(Retention.CompactIdBase + 1))
    assert(fs.exists(new Path(s"$idx/postings/$cdir")),
      "prior compaction must not be rewritten")
    assert(serve(idx) === withNew)
  }

  test("default (non-quiesced) mode spares the newest small dir") {
    val idx = java.nio.file.Files.createTempDirectory("graft_tic2").toString
    for (b <- 0L until 3L)
      TextScoring.appendTextIndex(docs.filter(col("doc_id") % 3 === b), idx, b)
    val before = serve(idx)
    assert(TextScoring.compactTextIndex(spark, idx).isDefined)
    assert(fs.exists(new Path(s"$idx/postings/batch_id=2")),
      "newest dir untouched (a live commit may still be filling it)")
    assert(!fs.exists(new Path(s"$idx/postings/batch_id=0")))
    assert(serve(idx) === before)
    // compacted + newest = nothing foldable
    assert(TextScoring.compactTextIndex(spark, idx) === None)
  }

  test("postings-only foldable dirs (no stats side) compact instead of " +
    "wedging the index") {
    val idx = java.nio.file.Files.createTempDirectory("graft_tic5").toString
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 2 === 0), idx, 0L)
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 2 === 1), idx, 1L)
    // strip the stats side of every foldable id (an interrupted rollback
    // can leave this shape); the stats/ dir itself remains
    fs.delete(new Path(s"$idx/stats/batch_id=0"), true)
    fs.delete(new Path(s"$idx/stats/batch_id=1"), true)
    val got = TextScoring.compactTextIndex(spark, idx, assumeQuiesced = true)
    assert(got === Some(Retention.CompactIdBase),
      "an empty stats fold must not abort the compaction after the manifest")
    val cdir = s"batch_id=${Retention.CompactIdBase}"
    assert(batchDirs(idx, "postings") === Seq(cdir))
    // the commit marker landed (zero-row folded stats) and the manifest
    // was consumed — the index is compact, not wedged mid-recovery
    assert(batchDirs(idx, "stats") === Seq(cdir))
    assert(!fs.exists(new Path(idx, "_compact_manifest")))
    assert(TextScoring.compactTextIndex(spark, idx,
      assumeQuiesced = true) === None)
  }

  test("recovery completes a crash AFTER the stats rename (commit point): " +
    "originals deleted, serve identical") {
    val idx = java.nio.file.Files.createTempDirectory("graft_tic3").toString
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 2 === 0), idx, 0L)
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 2 === 1), idx, 1L)
    val before = serve(idx)
    // craft the committed state: the folded batch (the same corpus as
    // batches 0+1, written as one) under the compaction id, manifest still
    // present, originals not yet deleted
    TextScoring.appendTextIndex(docs, idx, Retention.CompactIdBase)
    val out = fs.create(new Path(idx, "_compact_manifest"), true)
    out.write(s"${Retention.CompactIdBase}\nbatch_id=0\nbatch_id=1"
      .getBytes("UTF-8"))
    out.close()
    TextScoring.recoverTextIndexCompaction(spark, idx)
    assert(!fs.exists(new Path(s"$idx/postings/batch_id=0")))
    assert(!fs.exists(new Path(s"$idx/stats/batch_id=1")))
    assert(!fs.exists(new Path(idx, "_compact_manifest")))
    assert(serve(idx) === before)
  }

  test("recovery rolls back a crash BEFORE the stats rename: the raced " +
    "postings dir is dropped, originals intact, serve identical") {
    val idx = java.nio.file.Files.createTempDirectory("graft_tic4").toString
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 2 === 0), idx, 0L)
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 2 === 1), idx, 1L)
    val before = serve(idx)
    // craft the in-flight state: new postings dir landed, stats did NOT
    TextScoring.appendTextIndex(docs, idx, Retention.CompactIdBase)
    fs.delete(new Path(s"$idx/stats/batch_id=${Retention.CompactIdBase}"), true)
    val out = fs.create(new Path(idx, "_compact_manifest"), true)
    out.write(s"${Retention.CompactIdBase}\nbatch_id=0\nbatch_id=1"
      .getBytes("UTF-8"))
    out.close()
    TextScoring.recoverTextIndexCompaction(spark, idx)
    assert(!fs.exists(
      new Path(s"$idx/postings/batch_id=${Retention.CompactIdBase}")),
      "raced postings dir must be rolled back")
    assert(fs.exists(new Path(s"$idx/postings/batch_id=0")))
    assert(fs.exists(new Path(s"$idx/stats/batch_id=1")))
    assert(serve(idx) === before)
    // compact also self-heals: running it re-runs recovery first
    assert(TextScoring.compactTextIndex(spark, idx,
      assumeQuiesced = true).isDefined)
    assert(serve(idx) === before)
  }
}
