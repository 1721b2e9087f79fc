package graft.operators

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.perceptualHash]] / [[Multimodal.imageNearDups]] and the
  * generalized [[Dedup.hammingNearDups]] band join. */
class PhashSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** Seeded 8×8-block pattern scaled to 64×64 px — structured enough that
    * pHash is stable, distinct seeds give distinct hashes. */
  private def blockImage(seed: Int, brightness: Int = 0): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val blocks = Array.fill(8, 8)(rnd.nextInt(256))
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val g = math.min(255, math.max(0, blocks(y / 8)(x / 8) + brightness))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte], String)]) =
    rows.toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        struct(col("mime"), lit(0L).as("n_bytes"), lit("t").as("source"))
          .as("meta"))

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("pHash: brightness-shifted copy is near, distinct image is far") {
    val rows = Seq(
      (1L, blockImage(42), "image/png"),
      (2L, blockImage(42, brightness = 6), "image/png"), // near-copy
      (3L, blockImage(7), "image/png"))                  // different image
    val h = Multimodal.perceptualHash(mediaDf(rows))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(h.values.forall(_._2), "all should real-decode")
    assert(hamming(h(1L)._1, h(2L)._1) <= 6,
      s"near-copy too far: ${hamming(h(1L)._1, h(2L)._1)}")
    assert(hamming(h(1L)._1, h(3L)._1) > 6,
      s"distinct too near: ${hamming(h(1L)._1, h(3L)._1)}")
  }

  test("imageNearDups finds the planted pair and only it") {
    val rows = Seq(
      (1L, blockImage(42), "image/png"),
      (2L, blockImage(42, brightness = 6), "image/png"),
      (3L, blockImage(7), "image/png"),
      (4L, blockImage(99), "image/png"))
    val pairs = Multimodal.imageNearDups(mediaDf(rows), maxDist = 6)
      .select("media_id_1", "media_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("stub path: identical bytes pair at hamming 0, near bytes do not") {
    val p1 = "same payload".getBytes
    val rows = Seq(
      (1L, p1, "text/plain"),
      (2L, p1.clone(), "text/plain"),
      (3L, "same payloae".getBytes, "text/plain")) // one byte off
    val h = Multimodal.perceptualHash(mediaDf(rows))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(h.values.forall(!_._2), "stub must not claim real decode")
    assert(h(1L)._1 === h(2L)._1)
    assert(hamming(h(1L)._1, h(3L)._1) > 6, "avalanche must scatter near bytes")
    val pairs = Multimodal.imageNearDups(mediaDf(rows), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 0)))
  }

  test("corrupt image payload falls back to the stub, stays total") {
    val rows = Seq(
      (1L, Array[Byte](1, 2, 3, 4), "image/png"),
      (2L, Array.emptyByteArray, "image/png"))
    val h = Multimodal.perceptualHash(mediaDf(rows)).collect()
    assert(h.length === 2)
    assert(h.forall(!_.getBoolean(2)))
  }

  test("hammingNearDups ≡ brute force across band splits incl. 64 % bands != 0") {
    val rnd = new scala.util.Random(5)
    val bases = Seq.fill(12)(rnd.nextLong())
    // perturb each base with 0..8 bit flips
    val hashes = bases.zipWithIndex.flatMap { case (b, i) =>
      (0 to 2).map { j =>
        var v = b
        val flips = rnd.nextInt(9)
        (0 until flips).foreach(_ => v ^= (1L << rnd.nextInt(64)))
        (i * 10L + j, v)
      }
    }
    val df = hashes.toDF("id", "h")
    for (maxDist <- Seq(2, 3, 4, 6)) { // 3 and 4 bands don't divide 64
      val want = (for {
        (i1, h1) <- hashes; (i2, h2) <- hashes
        if i1 < i2 && hamming(h1, h2) <= maxDist
      } yield (i1, i2, hamming(h1, h2))).toSet
      val got = Dedup.hammingNearDups(df, "id", "h", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === want, s"maxDist=$maxDist")
    }
  }

  test("hammingNearDups argument guards") {
    val df = Seq((1L, 2L)).toDF("id", "h")
    intercept[IllegalArgumentException](Dedup.hammingNearDups(df, "id", "h", -1))
    intercept[IllegalArgumentException](Dedup.hammingNearDups(df, "id", "h", 64))
  }
}
