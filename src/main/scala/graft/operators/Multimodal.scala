package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Decode routes by declared mime: image-mime payloads get a REAL decode
  * via `javax.imageio` (JDK-builtin — PNG/JPEG/GIF/BMP, no external codec
  * libraries needed), everything else (audio/video mimes have no JDK
  * decoder in this container) falls back to a deterministic stub deriving
  * "features" from payload bytes. The Spark-side shape — schema,
  * partition-local batched decode via `mapPartitions`, explicit output
  * schema — is identical either way, so adding a native audio/video
  * decoder on executors changes one function, not the pipeline. */
object Multimodal extends Serializable {

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
      javax.imageio.ImageIO.setUseCache(false)
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

  /** Mime-routed total decode: real ImageIO for image mimes, stub fallback
    * for everything else (and for corrupt image payloads). */
  private def decodeAny(mediaId: Long, payload: Array[Byte], mime: String): MediaFeatures =
    if (mime != null && mime.startsWith("image/"))
      decodeImage(mediaId, payload).getOrElse(decodeStub(mediaId, payload))
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
    media.select(col("media_id"), col("payload"), mime.as("mime"))
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
        javax.imageio.ImageIO.setUseCache(false)
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

    media.select(col("media_id"), col("payload"), mime.as("mime"))
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
}
