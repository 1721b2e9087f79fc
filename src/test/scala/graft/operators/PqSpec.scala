package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN ([[Similarity.pqTopK]] and the
  * [[graft.functions.PqEncode]]/[[graft.functions.PqLut]]/
  * [[graft.functions.PqAdc]] kernels). Approximate by design → rows-only
  * gate query; these specs are the contract. */
class PqSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
    .select("vec_id", "embedding")
  private lazy val queries = emb.filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val cb = Similarity.trainPqCodebooks(emb)

  test("ADC score == lut-reconstructed dot; encode is in-range and total") {
    val rows = emb.limit(50)
      .select(col("vec_id"), col("embedding"),
        Similarity.pqEncode(col("embedding"), cb).as("codes"),
        Similarity.pqLut(col("embedding"), cb).as("lut"))
      .withColumn("adc", org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.PqAdc(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("codes")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("lut")))))
      .collect()
    val (m, ksub) = (cb.length, cb(0).length)
    rows.foreach { r =>
      val codes = r.getSeq[Int](2)
      assert(codes.length === m)
      assert(codes.forall(c => c >= 0 && c < ksub))
      val lut = r.getSeq[Double](3)
      assert(lut.length === m * ksub)
      // ADC of a row against its OWN lut = Σ_j dot(x_j, cw_{j, code_j}):
      // exactly the lut entries the codes select, summed left-to-right
      val expected = codes.zipWithIndex
        .foldLeft(0.0) { case (acc, (c, j)) => acc + lut(j * ksub + c) }
      assert(r.getDouble(4) === expected)
    }
  }

  test("encode picks the min-L2 codeword per subspace (local reference)") {
    val sample = emb.limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val enc = emb.limit(20)
      .select(col("vec_id"), Similarity.pqEncode(col("embedding"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val dsub = cb(0)(0).length
    sample.foreach { case (id, v) =>
      cb.indices.foreach { j =>
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        val dists = cb(j).map(cw =>
          cw.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum)
        // min-L2 argmin with ties to the lowest code (strict > in the scan)
        val want = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(enc(id)(j) === want, s"vec $id subspace $j")
      }
    }
  }

  test("recall floor vs brute-force top-10, and exact scores on survivors") {
    val brute = Similarity.bruteTopK(emb, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val pq = Similarity.pqTopKWithCodebooks(emb, queries, cb, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val hits = pq.keySet.intersect(brute.keySet)
    val recall = hits.size.toDouble / brute.size
    info(f"PQ recall@10 (m=8, ksub=16, rerank=4): $recall%.3f")
    assert(recall >= 0.5, f"recall $recall%.3f below floor")
    // survivors carry EXACT cosines (the rerank is exact), so any overlap
    // with brute force must agree bit-for-bit
    hits.foreach(k => assert(pq(k) === brute(k)))
  }

  test("persisted index path ≡ inline path under the same codebooks") {
    val path = java.nio.file.Files.createTempDirectory("pq_idx").toString
    Similarity.writePqIndex(emb, path)
    val fromIdx = Similarity.pqTopKFromIndex(spark, path, emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val inline = Similarity.pqTopKWithCodebooks(emb, queries, cb, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fromIdx === inline)
    // the compressed artifact really is codes, not vectors (batch_id is
    // the append lifecycle's partition level, not data)
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.drop("batch_id").columns.sorted ===
      Array("codes", "nrm", "vec_id"))
  }

  test("degenerate vectors yield null codes, not wrong numbers") {
    import spark.implicits._
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = bad.select(Similarity.pqEncode(col("embedding"), cb).as("c"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
