package graft.operators

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.audioFingerprint]] / [[Multimodal.audioNearDups]] — the
  * spectral time–frequency signature and its banded pair join. */
class AudioFpSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** Mono 16-bit WAV of summed tones (freq → amplitude), 1 s at 4 kHz. */
  private def wav(tones: Map[Double, Double], noiseAmp: Double = 0.0,
      seed: Int = 1): Array[Byte] = {
    val rate = 4000
    val n = rate
    val rnd = new scala.util.Random(seed)
    val pcm = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      var x = tones.map { case (f, a) =>
        a * math.sin(2.0 * math.Pi * f * i / rate)
      }.sum
      x += noiseAmp * (rnd.nextDouble() * 2 - 1)
      val s = math.max(-32767, math.min(32767, math.round(x * 20000.0).toInt))
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte], String)]) =
    rows.toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        struct(col("mime"), lit(0L).as("n_bytes"), lit("t").as("source"))
          .as("meta"))

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("fingerprint: rescaled+noisy copy is near, different tones are far") {
    val base = Map(151.0 -> 0.8, 523.0 -> 0.5)
    val rows = Seq(
      (1L, wav(base), "audio/wav"),
      // amplitude-scaled + mild noise: median normalization must absorb it
      (2L, wav(base.map { case (f, a) => f -> a * 0.7 }, noiseAmp = 0.02,
        seed = 9), "audio/wav"),
      (3L, wav(Map(229.0 -> 0.8, 1196.0 -> 0.5)), "audio/wav"))
    val h = Multimodal.audioFingerprint(mediaDf(rows))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(h.values.forall(_._2), "all should real-decode")
    assert(hamming(h(1L)._1, h(2L)._1) <= 6,
      s"copy too far: ${hamming(h(1L)._1, h(2L)._1)}")
    assert(hamming(h(1L)._1, h(3L)._1) > 6,
      s"distinct too near: ${hamming(h(1L)._1, h(3L)._1)}")
  }

  test("corrupt / non-audio payloads take the stub, stay total") {
    val rows = Seq(
      (1L, "not audio at all".getBytes, "audio/wav"),
      (2L, Array.emptyByteArray, "audio/wav"),
      (3L, "text".getBytes, "text/plain"))
    val h = Multimodal.audioFingerprint(mediaDf(rows)).collect()
    assert(h.length === 3)
    assert(h.forall(!_.getBoolean(2)))
  }

  test("vectorsAsWavMedia: vector perturbation ⇒ near fingerprint, " +
    "distinct vectors ⇒ far; audioNearDups finds exactly the planted pair") {
    val rnd = new scala.util.Random(13)
    def vec() = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val v1 = vec()
    val v2 = v1.clone(); v2(0) = v2(0) * 1.5f // one time–frequency cell moves
    val rows = Seq((1L, v1), (2L, v2), (3L, vec()), (4L, vec()))
    val media = Multimodal.vectorsAsWavMedia(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val h = Multimodal.audioFingerprint(media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(h.values.forall(_._2), "rendered WAVs must real-decode")
    assert(hamming(h(1L)._1, h(2L)._1) <= 4)
    assert(hamming(h(1L)._1, h(3L)._1) > 6)
    assert(hamming(h(3L)._1, h(4L)._1) > 6)
    val pairs = Multimodal.audioNearDups(media, maxDist = 6)
      .select("media_id_1", "media_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("fingerprint is deterministic and layout-invariant") {
    val rnd = new scala.util.Random(29)
    val rows = (1L to 20L).map(i =>
      (i, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val media = Multimodal.vectorsAsWavMedia(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val a = Multimodal.audioFingerprint(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Multimodal.audioFingerprint(media.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
