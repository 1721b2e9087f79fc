package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("media wrap + stubbed feature extraction is deterministic and total") {
    val docs = Tables.load(spark, dir, "documents")
    val media = Multimodal.asMedia(docs)
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "payload", "meta"))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === docs.count())
    val f1 = feats.orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.toSeq === f2.toSeq) // deterministic stub
    f1.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 640)
      assert(r.getAs[Double]("feature0") >= 0.0 && r.getAs[Double]("feature0") < 1.0)
    }
  }

  test("resize bounds dimensions and emits a thumbnail payload") {
    val media = Multimodal.asMedia(Tables.load(spark, dir, "documents"))
    val resized = Multimodal.resize(media, maxDim = 64)
    assert(resized.count() === media.count())
    resized.collect().foreach { r =>
      assert(r.getAs[Int]("width") <= 64 && r.getAs[Int]("height") <= 64)
      assert(r.getAs[Array[Byte]]("thumb").length <= 64)
    }
  }

  test("frame sampling is a deterministic 1->N expansion") {
    val media = Multimodal.asMedia(Tables.load(spark, dir, "documents"))
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
    assert(frames.count() > media.count()) // expanded
    frames.collect().foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 2 === 0)
      assert(r.getAs[Array[Byte]]("frame").length === 32)
    }
    // deterministic
    assert(frames.orderBy("media_id", "frame_idx").collect().toSeq ===
      Multimodal.sampleFrames(media, 32, 2).orderBy("media_id", "frame_idx").collect().toSeq)
  }

  test("payload byte length matches metadata") {
    val docs = Tables.load(spark, dir, "documents")
    val media = Multimodal.asMedia(docs)
    val feats = Multimodal.extractFeatures(media)
    val joined = feats.join(media.select("media_id", "meta"), "media_id")
    import org.apache.spark.sql.functions._
    assert(joined.filter(col("n_bytes") =!= col("meta.n_bytes")).count() === 0)
  }
}
