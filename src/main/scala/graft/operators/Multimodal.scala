package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with the decode step behind a deterministic stub.
  *
  * The Spark-side shape is the real deliverable — schema, partition-local
  * batched decode via `mapPartitions`, explicit output schema — so swapping
  * the stub for a real image/audio decoder (JNI/native lib on executors)
  * changes one function, not the pipeline. No codec libraries exist in this
  * container, so the decode is a STUB: a deterministic fake deriving
  * "features" from payload bytes. */
object Multimodal {

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
      width: Int, height: Int, feature0: Double)

  /** STUB DECODER — deterministic fake. A real deployment replaces the body
    * with an image/audio decode (the batch shape, schema, and partition
    * locality are already correct). Features are pure functions of the
    * payload bytes so tests are reproducible. */
  private def decodeStub(mediaId: Long, payload: Array[Byte]): MediaFeatures = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
    val n = payload.length.toLong
    MediaFeatures(
      media_id = mediaId,
      n_bytes = n,
      checksum = checksum,
      width = (math.abs(checksum) % 640).toInt + 1,
      height = (math.abs(checksum) % 480).toInt + 1,
      feature0 = (math.abs(checksum) % 1000) / 1000.0)
  }

  /** Partition-local batched decode: one pass per partition, no shuffle;
    * the analog of a Pandas-UDF `mapInPandas` batch decode in the Scala
    * engine. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeStub(id, if (bytes == null) Array.emptyByteArray else bytes)
      })
      .toDF()
  }

  final case class ResizedMedia(media_id: Long, width: Int, height: Int,
      thumb: Array[Byte])

  /** Resize plumbing: decode → scale → re-encode, partition-local. The
    * STUB "thumbnail" is a deterministic byte slice; a real deployment
    * swaps the body for an image scaler — the batch shape and output
    * schema stay put. */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val f = decodeStub(id, b)
        val scale = maxDim.toDouble / math.max(f.width, f.height)
        ResizedMedia(id,
          math.max(1, (f.width * math.min(scale, 1.0)).toInt),
          math.max(1, (f.height * math.min(scale, 1.0)).toInt),
          b.take(math.min(maxDim, b.length)))
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
