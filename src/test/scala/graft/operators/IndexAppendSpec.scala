package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF/PQ index refresh lifecycle: [[Similarity.appendIvfIndex]] /
  * [[Similarity.appendPqIndex]] fold new rows under the FROZEN model and
  * must serve exactly what a rebuild under the same model serves; the
  * recall-drift probes are the rebuild signal when the appended
  * distribution leaves the trained one. */
class IndexAppendSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001",
    "embeddings").select("vec_id", "embedding")
  private lazy val qs = emb.filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  private def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("IVF append == rebuild under the same centroids, exactly; replay " +
    "idempotent; legacy flat layout serves but refuses appends") {
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    val fresh = emb.filter(col("vec_id") % 3 === 0)
    val pathA = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString + "/ivf"
    Similarity.writeIvfIndex(old, pathA, nCells = 16)
    Similarity.appendIvfIndex(fresh, pathA, batchId = 1L)
    // rebuild the SAME corpus under the SAME (frozen) model
    val cents = Similarity.loadIvfCentroids(spark, pathA)
    val pathB = java.nio.file.Files.createTempDirectory("graft_ivf_reb").toString + "/ivf"
    Similarity.writeIvfIndex(emb, pathB, centroids = Some(cents))
    val appended = toSet(Similarity.ivfTopKFromIndex(spark, pathA, qs, 10))
    assert(appended === toSet(Similarity.ivfTopKFromIndex(spark, pathB, qs, 10)),
      "append must serve exactly the rebuild-under-same-model answer")
    assert(appended.nonEmpty)
    // at-least-once replay of the same batch changes nothing
    Similarity.appendIvfIndex(fresh, pathA, batchId = 1L)
    assert(toSet(Similarity.ivfTopKFromIndex(spark, pathA, qs, 10)) === appended)
    // a rebuild TRUNCATES appended batches (no stale assignments double-serve)
    Similarity.writeIvfIndex(emb, pathA, centroids = Some(cents))
    assert(fs.globStatus(new Path(s"$pathA/assignments", "batch_id=*"))
      .map(_.getPath.getName).toSeq === Seq("batch_id=0"))
    assert(toSet(Similarity.ivfTopKFromIndex(spark, pathA, qs, 10)) === appended)
    // legacy flat layout (pre-batch): reads fine, appends refuse
    val flat = java.nio.file.Files.createTempDirectory("graft_ivf_flat").toString + "/ivf"
    Similarity.writeIvfIndex(old, flat, centroids = Some(cents))
    for (st <- fs.globStatus(new Path(s"$flat/assignments/batch_id=0", "cell=*")))
      fs.rename(st.getPath, new Path(s"$flat/assignments", st.getPath.getName))
    fs.delete(new Path(s"$flat/assignments/batch_id=0"), true)
    assert(toSet(Similarity.ivfTopKFromIndex(spark, flat, qs, 10)) ===
      toSet(Similarity.ivfTopKWithCentroids(old, qs, cents, 10)),
      "flat legacy layout must keep serving")
    val e = intercept[IllegalStateException] {
      Similarity.appendIvfIndex(fresh, flat, batchId = 1L)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("planted drift: stale-model recall sags, the probe reports it, a " +
    "retrained rebuild restores it") {
    val rng = new scala.util.Random(60613L)
    val dim = 8
    def vec(active: Range): Seq[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian() * 0.05)
      for (i <- active) v(i) += 1.0 + rng.nextGaussian() * 0.3
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    // trained region: axes 0-3; drifted region: axes 4-7 (near-orthogonal)
    val oldRows = (0L until 300L).map(i => (i, vec(0 until 4)))
    val newRows = (1000L until 1300L).map(i => (i, vec(4 until 8)))
    val old = oldRows.toDF("vec_id", "embedding")
    val drifted = newRows.toDF("vec_id", "embedding")
    val all = (oldRows ++ newRows).toDF("vec_id", "embedding")
    val dq = newRows.filter(_._1 % 10 == 0)
      .toDF("query_id", "query_vec")
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString + "/ivf"
    Similarity.writeIvfIndex(old, path, nCells = 8)
    Similarity.appendIvfIndex(drifted, path, batchId = 1L)
    val stale = Similarity.ivfRecallProbe(spark, path, dq, k = 10, nProbe = 2)
    // retrain on the full corpus and re-assign
    Similarity.writeIvfIndex(all, path, nCells = 8)
    val retrained = Similarity.ivfRecallProbe(spark, path, dq, k = 10, nProbe = 2)
    assert(retrained >= 0.9,
      s"retrained model must serve the planted region well, got $retrained")
    assert(stale < retrained,
      s"drift must be visible to the probe: stale=$stale retrained=$retrained")
    assert(stale < 0.9, s"planted drift should sag stale recall, got $stale")
  }

  test("ANN index compaction: batch dirs fold to one, serving is " +
    "row-identical, both crash halves recover") {
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    val mid = emb.filter(col("vec_id") % 3 === 1)
    val last = emb.filter(col("vec_id") % 3 === 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_cmp").toString + "/ivf"
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 3 === 0), path,
      nCells = 16)
    Similarity.appendIvfIndex(mid, path, batchId = 1L)
    Similarity.appendIvfIndex(last, path, batchId = 2L)
    val before = toSet(Similarity.ivfTopKFromIndex(spark, path, qs, 10))
    val got = Similarity.compactAnnIndex(spark, path, "assignments",
      assumeQuiesced = true)
    assert(got === Some(Retention.CompactIdBase))
    assert(fs.globStatus(new Path(s"$path/assignments", "batch_id=*"))
      .map(_.getPath.getName).toSeq ===
      Seq(s"batch_id=${Retention.CompactIdBase}"))
    // cell partitions preserved inside the compacted dir (probe pruning)
    assert(fs.globStatus(new Path(
      s"$path/assignments/batch_id=${Retention.CompactIdBase}", "cell=*"))
      .nonEmpty)
    assert(toSet(Similarity.ivfTopKFromIndex(spark, path, qs, 10)) === before)
    assert(Similarity.compactAnnIndex(spark, path, "assignments",
      assumeQuiesced = true) === None)
    // crash ROLLBACK half: manifest present, new dir absent → temp dropped,
    // originals intact
    Similarity.appendIvfIndex(mid, path, batchId = 7L)
    Similarity.appendIvfIndex(last, path, batchId = 8L)
    val rollbackId = Retention.CompactIdBase + 1
    fs.mkdirs(new Path(s"$path/assignments/.compact_tmp_$rollbackId"))
    var out = fs.create(new Path(path, "_compact_assignments_manifest"), true)
    out.write(s"$rollbackId\nbatch_id=7\nbatch_id=8".getBytes("UTF-8"))
    out.close()
    Similarity.recoverAnnCompaction(spark, path, "assignments")
    assert(fs.exists(new Path(s"$path/assignments/batch_id=7")))
    assert(!fs.exists(new Path(s"$path/assignments/.compact_tmp_$rollbackId")))
    // crash FORWARD half: new dir landed, originals not yet deleted
    val fwd = Similarity.compactAnnIndex(spark, path, "assignments",
      assumeQuiesced = true)
    assert(fwd === Some(rollbackId))
    Similarity.appendIvfIndex(mid, path, batchId = 9L)
    out = fs.create(new Path(path, "_compact_assignments_manifest"), true)
    out.write(s"$rollbackId\nbatch_id=9".getBytes("UTF-8"))
    out.close()
    Similarity.recoverAnnCompaction(spark, path, "assignments")
    assert(!fs.exists(new Path(s"$path/assignments/batch_id=9")),
      "forward recovery must delete the listed originals")

    // codes subtree: same discipline, flat layout
    val pq = java.nio.file.Files.createTempDirectory("graft_pq_cmp").toString + "/pq"
    Similarity.writePqIndex(old, pq)
    Similarity.appendPqIndex(mid, pq, batchId = 1L)
    val pqCorpus = emb.filter(col("vec_id") % 3 =!= 2)
    val pqBefore = toSet(Similarity.pqTopKFromIndex(spark, pq, pqCorpus, qs, 10))
    assert(Similarity.compactAnnIndex(spark, pq, "codes",
      assumeQuiesced = true) === Some(Retention.CompactIdBase))
    assert(toSet(Similarity.pqTopKFromIndex(spark, pq, pqCorpus, qs, 10))
      === pqBefore)
  }

  test("interrupted rebuild fails serving and appends LOUD (marker left " +
    "behind), and a completed rebuild clears it") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_mk").toString + "/ivf"
    Similarity.writeIvfIndex(emb, path, nCells = 8)
    assert(!fs.exists(new Path(path, "_REBUILD_IN_PROGRESS")),
      "completed rebuild must clear its marker")
    assert(toSet(Similarity.ivfTopKFromIndex(spark, path, qs, 5)).nonEmpty)
    // simulate a crash inside the destructive phase: marker present means
    // model and rows may be from different builds — never serve silently
    fs.create(new Path(path, "_REBUILD_IN_PROGRESS"), true).close()
    val e = intercept[IllegalStateException] {
      Similarity.ivfTopKFromIndex(spark, path, qs, 5)
    }
    assert(e.getMessage.contains("interrupted rebuild"), e.getMessage)
    intercept[IllegalStateException] {
      Similarity.appendIvfIndex(emb.limit(5), path, batchId = 9L)
    }
    // a rerun of the rebuild repairs and clears
    Similarity.writeIvfIndex(emb, path, nCells = 8)
    assert(toSet(Similarity.ivfTopKFromIndex(spark, path, qs, 5)).nonEmpty)
  }

  test("k-means training is bit-deterministic under adversarial " +
    "repartitioning (exact-decimal mean update)") {
    val a = Similarity.trainIvfCentroids(emb, nCells = 16, iterations = 3)
    val b = Similarity.trainIvfCentroids(emb.repartition(17),
      nCells = 16, iterations = 3)
    val c = Similarity.trainIvfCentroids(emb.repartition(3, col("vec_id")),
      nCells = 16, iterations = 3)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "centroids must not depend on partition layout")
    assert(a.map(_.toSeq).toSeq === c.map(_.toSeq).toSeq)
    val p1 = Similarity.trainPqCodebooks(emb, dim = 64, m = 8, ksub = 16)
    val p2 = Similarity.trainPqCodebooks(emb.repartition(13), dim = 64,
      m = 8, ksub = 16)
    assert(p1.map(_.map(_.toSeq).toSeq).toSeq ===
      p2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PQ append == frozen-codebook encoding of the full corpus, exactly; " +
    "probe reports a sane recall") {
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    val fresh = emb.filter(col("vec_id") % 3 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft_pq_app").toString + "/pq"
    Similarity.writePqIndex(old, path)
    Similarity.appendPqIndex(fresh, path, batchId = 1L)
    val cb = Similarity.loadPqCodebooks(spark, path)
    val served = toSet(Similarity.pqTopKFromIndex(spark, path, emb, qs, 10))
    assert(served === toSet(Similarity.pqTopKWithCodebooks(emb, qs, cb, 10)),
      "append must serve exactly the inline frozen-codebook answer")
    assert(served.nonEmpty)
    // replay idempotent
    Similarity.appendPqIndex(fresh, path, batchId = 1L)
    assert(toSet(Similarity.pqTopKFromIndex(spark, path, emb, qs, 10)) === served)
    val recall = Similarity.pqRecallProbe(spark, path, emb, qs, k = 10)
    assert(recall >= 0.5 && recall <= 1.0, s"probe out of range: $recall")
    // legacy flat codes layout refuses appends
    val flat = java.nio.file.Files.createTempDirectory("graft_pq_flat").toString + "/pq"
    Similarity.writePqIndex(old, flat)
    for (st <- fs.globStatus(new Path(s"$flat/codes/batch_id=0", "*")))
      fs.rename(st.getPath, new Path(s"$flat/codes", st.getPath.getName))
    fs.delete(new Path(s"$flat/codes/batch_id=0"), true)
    val e = intercept[IllegalStateException] {
      Similarity.appendPqIndex(fresh, flat, batchId = 1L)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }
}
