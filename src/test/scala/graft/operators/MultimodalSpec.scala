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

  test("image/* payloads get a REAL ImageIO decode: true dims, channels, luminance") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def encode(w: Int, h: Int, fmt: String, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      buf.toByteArray
    }
    val white = 0xffffff
    val media = Seq(
      (1L, encode(37, 21, "png", white), "image/png"),
      (2L, encode(64, 48, "jpg", 0x000000), "image/jpeg"),
      (3L, "not an image at all".getBytes("UTF-8"), "image/png"), // corrupt
      (4L, "plain text payload".getBytes("UTF-8"), "text/plain"))
      .toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        struct(col("mime"), octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("test").as("source")).as("meta"))
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // true dimensions and channel counts from the decoder, not the stub
    assert(f(1L).getAs[Int]("width") === 37 && f(1L).getAs[Int]("height") === 21)
    assert(f(1L).getAs[Int]("channels") === 3 && f(1L).getAs[Boolean]("real_decode"))
    assert(f(1L).getAs[Double]("feature0") > 0.99) // all-white luminance
    assert(f(2L).getAs[Int]("width") === 64 && f(2L).getAs[Int]("height") === 48)
    assert(f(2L).getAs[Double]("feature0") < 0.05) // all-black luminance
    // corrupt image payload and non-image mime both take the total stub path
    assert(!f(3L).getAs[Boolean]("real_decode") && f(3L).getAs[Int]("channels") === 0)
    assert(!f(4L).getAs[Boolean]("real_decode"))

    // real resize: aspect preserved, never upscaled, thumb is decodable PNG
    val r = Multimodal.resize(media, maxDim = 16).collect()
      .map(x => x.getAs[Long]("media_id") -> x).toMap
    assert(r(1L).getAs[Int]("width") === 16 && r(1L).getAs[Int]("height") === 9)
    val thumb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r(1L).getAs[Array[Byte]]("thumb")))
    assert(thumb.getWidth === 16 && thumb.getHeight === 9)
    assert(thumb.getRGB(8, 4) === (0xff000000 | white)) // scaling preserved color
  }

  test("audio/* payloads get a REAL javax.sound decode: rate, frames, channels, RMS") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Committed-fixture-free: synthesize a canonical WAV (16-bit signed PCM
    // sine) through the same JDK encoder the decoder reads.
    def wav(freq: Double, amp: Double, rate: Float, frames: Int, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val data = new Array[Byte](frames * 2 * channels)
      for (i <- 0 until frames) {
        val s = (amp * math.sin(2 * math.Pi * freq * i / rate) * 32767).round.toInt
        for (c <- 0 until channels) {
          val off = (i * channels + c) * 2
          data(off) = (s & 0xff).toByte
          data(off + 1) = ((s >> 8) & 0xff).toByte
        }
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = Seq(
      (1L, wav(440.0, 0.5, 8000f, 2000, 1), "audio/wav"),   // mono sine
      (2L, wav(220.0, 0.25, 44100f, 4410, 2), "audio/wav"), // stereo sine
      (3L, "definitely not audio".getBytes("UTF-8"), "audio/wav")) // corrupt
      .toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        struct(col("mime"), octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("test").as("source")).as("meta"))
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // audio mapping: width = sample rate, height = frames, channels = channels
    assert(f(1L).getAs[Int]("width") === 8000 && f(1L).getAs[Int]("height") === 2000)
    assert(f(1L).getAs[Int]("channels") === 1 && f(1L).getAs[Boolean]("real_decode"))
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ≈ 0.3536
    assert(math.abs(f(1L).getAs[Double]("feature0") - 0.5 / math.sqrt(2)) < 0.005)
    assert(f(2L).getAs[Int]("width") === 44100 && f(2L).getAs[Int]("height") === 4410)
    assert(f(2L).getAs[Int]("channels") === 2)
    assert(math.abs(f(2L).getAs[Double]("feature0") - 0.25 / math.sqrt(2)) < 0.005)
    // corrupt audio payload takes the total stub path
    assert(!f(3L).getAs[Boolean]("real_decode") && f(3L).getAs[Int]("channels") === 0)
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
