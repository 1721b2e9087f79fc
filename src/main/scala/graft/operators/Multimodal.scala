package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Decode routes by declared mime: image-mime payloads get a REAL decode
  * via `javax.imageio` (JDK-builtin — PNG/JPEG/GIF/BMP), audio-mime
  * payloads a REAL decode via `javax.sound.sampled` (JDK-builtin —
  * WAV/AIFF/AU containers); no external codec libraries needed for either.
  * Everything else (video mimes have no JDK demuxer) falls back to a
  * deterministic stub deriving "features" from payload bytes. The
  * Spark-side shape — schema, partition-local batched decode via
  * `mapPartitions`, explicit output schema — is identical either way, so
  * adding a native video decoder on executors changes one function, not
  * the pipeline. */
object Multimodal extends Serializable {

  /** One-time per-JVM ImageIO setup: disable the disk cache (executor tmp
    * churn for nothing on MB-scale in-memory payloads). `lazy val` so the
    * static global is set once per executor, not reset per row. */
  @transient private lazy val imageIoReady: Boolean = {
    javax.imageio.ImageIO.setUseCache(false); true
  }

  /** Canonical multimodal schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap the documents table as a media table: text bytes as the opaque
    * payload (stand-in for image/audio bytes). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, checksum: Long,
      width: Int, height: Int, channels: Int, real_decode: Boolean,
      feature0: Double)

  private def byteChecksum(payload: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
    checksum
  }

  /** STUB DECODER — deterministic fake for mimes with no JDK decoder
    * (audio/video, opaque text). Features are pure functions of the
    * payload bytes so tests are reproducible; channels = 0 marks the
    * dimensions as synthetic. */
  private def decodeStub(mediaId: Long, payload: Array[Byte]): MediaFeatures = {
    val checksum = byteChecksum(payload)
    MediaFeatures(
      media_id = mediaId,
      n_bytes = payload.length.toLong,
      checksum = checksum,
      width = (math.abs(checksum) % 640).toInt + 1,
      height = (math.abs(checksum) % 480).toInt + 1,
      channels = 0,
      real_decode = false,
      feature0 = (math.abs(checksum) % 1000) / 1000.0)
  }

  /** REAL image decode via `javax.imageio` (JDK-builtin): true
    * width/height/band-count, feature0 = mean luminance over a bounded
    * (≤64×64) pixel sample grid. None on empty, unrecognized, or corrupt
    * payloads — the caller falls back to the stub so the decode stays
    * total. In-memory only: ImageIO's disk cache is disabled (executor
    * tmp churn for nothing on MB-scale payloads). */
  private def decodeImage(mediaId: Long, payload: Array[Byte]): Option[MediaFeatures] = {
    if (payload.isEmpty) return None
    try {
      require(imageIoReady)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sx = math.max(1, w / 64)
        val sy = math.max(1, h / 64)
        var sum = 0.0
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)) / 255.0
            n += 1
            x += sx
          }
          y += sy
        }
        Some(MediaFeatures(
          media_id = mediaId,
          n_bytes = payload.length.toLong,
          checksum = byteChecksum(payload),
          width = w,
          height = h,
          channels = img.getRaster.getNumBands,
          real_decode = true,
          feature0 = if (n == 0) 0.0 else sum / n))
      }
    } catch { case _: Exception => None }
  }

  /** REAL audio decode via `javax.sound.sampled` (JDK-builtin: WAV/AIFF/AU
    * containers, PCM/µ-law/a-law payloads). Audio has no pixel dimensions,
    * so the typed feature slots carry the audio analogs:
    * width = sample rate (Hz), height = frame count, channels = channels,
    * feature0 = RMS amplitude in [0,1] over a bounded (≤65 536-frame)
    * prefix after conversion to 16-bit signed PCM — the same bounded-work
    * discipline as the image path's ≤64×64 luminance grid, so one huge
    * payload can't stall its whole partition. None on unrecognized or
    * corrupt payloads — the caller falls back to the stub so the decode
    * stays total. */
  private def decodeAudio(mediaId: Long, payload: Array[Byte]): Option[MediaFeatures] = {
    if (payload.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val headerFrames = in.getFrameLength // container-declared; -1 if unknown
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels,
          fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val frameSize = target.getFrameSize
        val maxFrames = 65536L
        val buf = new Array[Byte](frameSize * 4096)
        var sumSq = 0.0
        var nSamples = 0L
        var framesRead = 0L
        var eof = false
        while (!eof && framesRead < maxFrames) {
          val r = pcm.read(buf)
          if (r <= 0) eof = true
          else {
            var off = 0
            while (off + 1 < r) {
              // little-endian 16-bit signed, as requested in `target`
              val s = ((buf(off + 1): Int) << 8) | (buf(off) & 0xff)
              val x = s / 32768.0
              sumSq += x * x
              nSamples += 1
              off += 2
            }
            framesRead += r / frameSize
          }
        }
        val frames = if (headerFrames >= 0) headerFrames else framesRead
        Some(MediaFeatures(
          media_id = mediaId,
          n_bytes = payload.length.toLong,
          checksum = byteChecksum(payload),
          width = fmt.getSampleRate.toInt,
          height = math.min(frames, Int.MaxValue.toLong).toInt,
          channels = fmt.getChannels,
          real_decode = true,
          feature0 = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Mime-routed total decode: real ImageIO for image mimes, real
    * javax.sound for audio mimes, stub fallback for everything else (and
    * for corrupt image/audio payloads). */
  private def decodeAny(mediaId: Long, payload: Array[Byte], mime: String): MediaFeatures =
    if (mime != null && mime.startsWith("image/"))
      decodeImage(mediaId, payload).getOrElse(decodeStub(mediaId, payload))
    else if (mime != null && mime.startsWith("audio/"))
      decodeAudio(mediaId, payload).getOrElse(decodeStub(mediaId, payload))
    else decodeStub(mediaId, payload)

  /** Partition-local batched decode: one pass per partition, no shuffle;
    * the analog of a Pandas-UDF `mapInPandas` batch decode in the Scala
    * engine. Routes on `meta.mime` when the media schema carries it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val mime =
      if (media.columns.contains("meta")) col("meta.mime")
      else lit(null).cast("string")
    graft.core.Tables.spreadCpu(
        media.select(col("media_id"), col("payload"), mime.as("mime")))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, m) =>
        decodeAny(id, if (bytes == null) Array.emptyByteArray else bytes, m)
      })
      .toDF()
  }

  final case class ResizedMedia(media_id: Long, width: Int, height: Int,
      thumb: Array[Byte])

  /** Resize: decode → scale → re-encode, partition-local. Image-mime
    * payloads get a REAL bilinear scale + PNG re-encode via the JDK's
    * Graphics2D/ImageIO; other mimes keep the deterministic stub (scaled
    * synthetic dims, byte-slice "thumbnail"). Aspect ratio is preserved
    * and images are never upscaled. */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val spark = media.sparkSession
    import spark.implicits._
    val mime =
      if (media.columns.contains("meta")) col("meta.mime")
      else lit(null).cast("string")

    def scaled(w: Int, h: Int): (Int, Int) = {
      val s = math.min(maxDim.toDouble / math.max(w, h), 1.0)
      (math.max(1, (w * s).toInt), math.max(1, (h * s).toInt))
    }

    def resizeImage(id: Long, bytes: Array[Byte]): Option[ResizedMedia] =
      try {
        require(imageIoReady)
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .map { img =>
            val (tw, th) = scaled(img.getWidth, img.getHeight)
            val out = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, tw, th, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            ResizedMedia(id, tw, th, buf.toByteArray)
          }
      } catch { case _: Exception => None }

    def resizeStub(id: Long, bytes: Array[Byte]): ResizedMedia = {
      val f = decodeStub(id, bytes)
      val (tw, th) = scaled(f.width, f.height)
      ResizedMedia(id, tw, th, bytes.take(math.min(maxDim, bytes.length)))
    }

    graft.core.Tables.spreadCpu(
        media.select(col("media_id"), col("payload"), mime.as("mime")))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, m) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        if (m != null && m.startsWith("image/") && b.nonEmpty)
          resizeImage(id, b).getOrElse(resizeStub(id, b))
        else resizeStub(id, b)
      })
      .toDF()
  }

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: the 1→N expansion shape for video payloads — emit
    * every `stride`-th fixed-size chunk of the payload as a "frame"
    * (deterministic stub for a real demuxer). flatMap keeps it partition-
    * local; downstream per-frame ops parallelize over the exploded rows. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val nFrames = b.length / frameBytes
        (0 until nFrames by stride).map { i =>
          Frame(id, i, b.slice(i * frameBytes, (i + 1) * frameBytes))
        }
      }
      .toDF()
  }

  final case class MediaHash(media_id: Long, phash: Long, real_decode: Boolean)

  /** DCT pHash of a decoded image: box-downsample the luminance to 32×32,
    * 2-D DCT-II, keep the low-frequency 8×8 block, bit i = coeff_i >
    * median of the 64 — the classic perceptual fingerprint (Zauner 2010;
    * the shape/structure hash behind image dedup pipelines). Small pixel
    * edits (noise, mild brightness, re-encode) flip few low-frequency
    * signs → small Hamming distance; distinct images differ in ~32 bits. */
  /** The 8×32 DCT-II cosine basis, constant for the fixed 32×32 grid —
    * built once per JVM, not per payload. */
  @transient private lazy val dctTable: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 64.0))

  private def phashImage(payload: Array[Byte]): Option[Long] = {
    if (payload.isEmpty) return None
    try {
      require(imageIoReady)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val n = 32
      val w = img.getWidth
      val h = img.getHeight
      // box filter: each 32×32 cell averages its pixel block, sampled on
      // a ≤8×8 grid within the cell — total reads ≤ 32·32·64 = 65,536,
      // the file's bounded-per-payload-work discipline (one huge image
      // can't stall its partition); cells map to ≥1 pixel via floor bounds
      val gray = Array.ofDim[Double](n, n)
      var cy = 0
      while (cy < n) {
        val y0 = cy * h / n
        val y1 = math.max(y0 + 1, (cy + 1) * h / n)
        val sy = math.max(1, (y1 - y0 + 7) / 8) // ceil: ≤8 samples per axis
        var cx = 0
        while (cx < n) {
          val x0 = cx * w / n
          val x1 = math.max(x0 + 1, (cx + 1) * w / n)
          val sx = math.max(1, (x1 - x0 + 7) / 8)
          var sum = 0.0
          var cnt = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
              cnt += 1
              x += sx
            }
            y += sy
          }
          gray(cy)(cx) = sum / cnt
          cx += 1
        }
        cy += 1
      }
      // separable 2-D DCT-II of the low 8×8 block only: O(8·8·32·32)
      val cos = dctTable
      val coeffs = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0.0
          var y = 0
          while (y < n) {
            var x = 0
            while (x < n) {
              acc += gray(y)(x) * cos(u)(y) * cos(v)(x)
              x += 1
            }
            y += 1
          }
          coeffs(u * 8 + v) = acc
          v += 1
        }
        u += 1
      }
      val sorted = coeffs.sorted
      val median = (sorted(31) + sorted(32)) / 2.0
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (coeffs(i) > median) hash |= (1L << i)
        i += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
  }

  /** 64-bit avalanche of the byte checksum (murmur3 fmix64) — the stub
    * fingerprint for undecodable payloads: identical bytes collide
    * (exact dups still pair up), any byte change scatters ~32 bits (no
    * false near-dups from adjacent checksums). */
  private def stubHash(payload: Array[Byte]): Long = {
    var k = byteChecksum(payload)
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /** Per-media 64-bit perceptual hash: REAL DCT pHash for decodable
    * image mimes (`real_decode = true`), the avalanche stub otherwise —
    * total, partition-local, no shuffle. Feed to [[imageNearDups]] /
    * [[Dedup.hammingNearDups]] for the banded near-dup join. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val mime =
      if (media.columns.contains("meta")) col("meta.mime")
      else lit(null).cast("string")
    graft.core.Tables.spreadCpu(
        media.select(col("media_id"), col("payload"), mime.as("mime")))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, m) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val real = m != null && m.startsWith("image/")
        val ph = if (real) phashImage(b) else None
        MediaHash(id, ph.getOrElse(stubHash(b)), ph.isDefined)
      })
      .toDF()
  }

  /** Image near-duplicate pairs: pHash + the pigeonhole Hamming band join
    * ([[Dedup.hammingNearDups]]) at distance ≤ maxDist (pHash convention:
    * ≤ 10 of 64 ≈ same image re-encoded/resized/lightly edited). Scale
    * shape: hash is one partition-local pass over payload bytes; the pair
    * join is banded, never all-pairs; `maxBucket` caps degenerate
    * identical-image cliques. */
  def imageNearDups(media: DataFrame, maxDist: Int = 6,
      maxBucket: Option[Long] = None): DataFrame =
    Dedup.hammingNearDups(perceptualHash(media), "media_id", "phash",
      maxDist, maxBucket)

  /** The analyzer's 8 log-spaced band centers (100–1800 Hz); shared with
    * [[vectorsAsWavMedia]] so rendered cells land exactly on analysis
    * bands. */
  private[operators] val afpBands: Array[Double] =
    Array.tabulate(8)(b => 100.0 * math.pow(1.512, b))

  /** Spectral audio fingerprint of a decoded payload: mono-mix to 16-bit
    * PCM, average-downsample toward a ~4 kHz analysis rate, split the
    * captured signal into 8 time segments, measure 8 log-spaced band
    * energies (100–1800 Hz Goertzel filters) per segment, bit =
    * energy > median of the 64 — the time–frequency sign signature of the
    * Haitsma–Kalker (2002) audio-fingerprint family, median-normalized so
    * amplitude scaling and mild noise flip few bits. Work is bounded by
    * the same ≤65,536-frame capture as [[decodeAudio]]. */
  private def afpAudio(payload: Array[Byte]): Option[Long] = {
    if (payload.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels,
          fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val ch = fmt.getChannels
        val frameSize = 2 * ch
        val maxFrames = 65536
        // mono mix + average-downsample by `dec` toward ~4 kHz
        val dec = math.max(1, math.round(fmt.getSampleRate / 4000.0).toInt)
        val rate = fmt.getSampleRate / dec
        val samples = new Array[Double](maxFrames / dec + 1)
        var nOut = 0
        var acc = 0.0
        var accN = 0
        var framesRead = 0
        val buf = new Array[Byte](frameSize * 4096)
        var eof = false
        while (!eof && framesRead < maxFrames) {
          val r = pcm.read(buf)
          if (r <= 0) eof = true
          else {
            var f = 0
            val nf = r / frameSize
            while (f < nf && framesRead < maxFrames) {
              var mono = 0.0
              var c = 0
              while (c < ch) {
                val off = f * frameSize + 2 * c
                val s = ((buf(off + 1): Int) << 8) | (buf(off) & 0xff)
                mono += s / 32768.0
                c += 1
              }
              acc += mono / ch
              accN += 1
              if (accN == dec) {
                samples(nOut) = acc / dec; nOut += 1; acc = 0.0; accN = 0
              }
              f += 1
              framesRead += 1
            }
          }
        }
        if (nOut < 64) return None // too short for 8 segments of analysis
        val segLen = nOut / 8
        val bands = afpBands
        val energies = new Array[Double](64)
        var seg = 0
        while (seg < 8) {
          var b = 0
          while (b < 8) {
            // Goertzel at band frequency over this segment
            val w = 2.0 * math.Pi * math.min(bands(b), rate / 2.0 - 1.0) / rate
            val coeff = 2.0 * math.cos(w)
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
            var i = seg * segLen
            val end = i + segLen
            while (i < end) {
              s0 = samples(i) + coeff * s1 - s2
              s2 = s1; s1 = s0
              i += 1
            }
            energies(seg * 8 + b) = s1 * s1 + s2 * s2 - coeff * s1 * s2
            b += 1
          }
          seg += 1
        }
        val sorted = energies.sorted
        val median = (sorted(31) + sorted(32)) / 2.0
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (energies(i) > median) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Per-media 64-bit audio fingerprint: REAL spectral signature for
    * decodable audio mimes (`real_decode = true`), the avalanche stub
    * otherwise — the audio twin of [[perceptualHash]]. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val mime =
      if (media.columns.contains("meta")) col("meta.mime")
      else lit(null).cast("string")
    graft.core.Tables.spreadCpu(
        media.select(col("media_id"), col("payload"), mime.as("mime")))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, m) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val real = m != null && m.startsWith("audio/")
        val fp = if (real) afpAudio(b) else None
        MediaHash(id, fp.getOrElse(stubHash(b)), fp.isDefined)
      })
      .toDF()
  }

  /** Audio near-duplicate pairs: spectral fingerprint + the pigeonhole
    * Hamming band join — same scale shape as [[imageNearDups]]. */
  def audioNearDups(media: DataFrame, maxDist: Int = 6,
      maxBucket: Option[Long] = None): DataFrame =
    Dedup.hammingNearDups(audioFingerprint(media), "media_id", "phash",
      maxDist, maxBucket)

  /** Deterministic time–frequency rendering of a float-vector column as
    * mono 16-bit WAV media — the audio twin of [[vectorsAsPngMedia]]:
    * component k plays a tone at analysis band k % 8 ([[afpBands]])
    * during time segment k / 8 of a 1-second, 4 kHz clip (a poor-man's
    * inverse spectrogram), so each component maps to exactly one of the
    * fingerprint's 64 time–frequency energy cells and vector similarity
    * becomes fingerprint similarity. Peak-normalized; the audio-dedup
    * path runs end-to-end from plain parquet through the REAL javax.sound
    * codec. The render itself is partition-local; the [[graft.core.Tables.spreadCpu]]
    * entry guard may add ONE round-robin exchange on a single-row-group
    * input (identity at production scan parallelism). */
  def vectorsAsWavMedia(df: DataFrame, id: String, vec: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.core.Tables.spreadCpu(
        df.select(col(id).cast("long"), col(vec).cast("array<float>")))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (mid, v0) =>
        val v = if (v0 == null) Array.emptyFloatArray else v0
        val rate = 4000
        val n = rate // 1 second
        val segLen = n / 8
        val wave = new Array[Double](n)
        var k = 0
        while (k < v.length && k < 64) {
          val f = afpBands(k % 8)
          val start = (k / 8) * segLen
          var i = start
          while (i < start + segLen) {
            wave(i) += v(k) * math.sin(2.0 * math.Pi * f * (i - start) / rate)
            i += 1
          }
          k += 1
        }
        var peak = 1e-9
        wave.foreach(x => if (math.abs(x) > peak) peak = math.abs(x))
        val pcmBytes = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val s = math.max(-32767, math.min(32767,
            math.round(wave(i) / peak * 32000.0).toInt))
          pcmBytes(2 * i) = (s & 0xff).toByte
          pcmBytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val afmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcmBytes), afmt, n.toLong)
        val buf = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
        val bytes = buf.toByteArray
        (mid, bytes, ("audio/wav", bytes.length.toLong, "render"))
      })
      .toDF("media_id", "payload", "meta")
      .withColumn("meta", col("meta").cast(mediaSchema("meta").dataType))
  }

  /** Deterministic raster rendering of a float-vector column as a
    * `side`×`side` grayscale PNG media table (min-max normalized per
    * vector) — a REAL-codec fixture generator: it turns any embedding
    * table into image payloads whose visual similarity mirrors the
    * vectors', so the image-dedup path can be driven end-to-end (render →
    * ImageIO decode → DCT pHash → banded pair join) from plain parquet.
    * The render itself is partition-local; the [[graft.core.Tables.spreadCpu]]
    * entry guard may add ONE round-robin exchange on a single-row-group
    * input (identity at production scan parallelism). Vectors shorter than
    * side² are zero-padded; null/empty vectors render black. */
  def vectorsAsPngMedia(df: DataFrame, id: String, vec: String,
      side: Int): DataFrame = {
    require(side >= 2, s"side must be >= 2, got $side")
    val spark = df.sparkSession
    import spark.implicits._
    graft.core.Tables.spreadCpu(
        df.select(col(id).cast("long"), col(vec).cast("array<float>")))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (mid, v0) =>
        val v = if (v0 == null) Array.emptyFloatArray else v0
        val img = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        if (v.nonEmpty) {
          var mn = Float.MaxValue
          var mx = Float.MinValue
          v.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
          val range = if (mx > mn) (mx - mn).toDouble else 1.0
          var i = 0
          while (i < side * side) {
            val g =
              if (i < v.length) ((v(i) - mn) / range * 255.0).toInt max 0 min 255
              else 0
            img.setRGB(i % side, i / side, (g << 16) | (g << 8) | g)
            i += 1
          }
        }
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", buf)
        val bytes = buf.toByteArray
        (mid, bytes, ("image/png", bytes.length.toLong, "render"))
      })
      .toDF("media_id", "payload", "meta")
      .withColumn("meta", col("meta").cast(mediaSchema("meta").dataType))
  }
}
