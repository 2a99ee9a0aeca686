package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct beside them.
  *
  * The Spark-side plumbing here is real and tested — schema contract,
  * partition-sized batch iteration, deterministic outputs. The actual
  * codec step is STUBBED (this container has no image/audio libraries):
  * [[StubDecoders.decodeImageMeta]] derives deterministic fake
  * width/height/format from the payload bytes. Swapping in a real decoder
  * changes only that one function — the operator shape (mapPartitions over
  * binary batches, one decode per row, metadata struct out) is exactly
  * what a production decode stage looks like.
  */
object Multimodal {

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("byte_len", LongType, nullable = true)))

  /** Wrap a string column as a binary payload column — the ingestion path
    * for content that arrives in-row. Real binary files come in via
    * `spark.read.format("binaryFile")` with the same downstream shape.
    */
  def asMedia(df: DataFrame, idCol: String, contentCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("payload"),
      lit(mediaType).as("media_type"),
      // length of the BINARY payload (bytes), not the string (chars) —
      // they differ for non-ASCII content
      length(col(contentCol).cast("binary")).cast("long").as("byte_len"))

  final case class DecodedMeta(
      media_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      format: String,
      checksum: Long)

  /** Decode stage: mapPartitions over the binary payloads. Batch shape:
    * one partition = one decoder session (a real codec would amortize
    * library init across the partition exactly here).
    */
  def decodeImages(media: DataFrame): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition decoder init would go here
        batch.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val (w, h, fmt, sum) = StubDecoders.decodeImageMeta(bytes)
          DecodedMeta(id, bytes.length.toLong, w, h, fmt, sum)
        }
      }
  }

  /** Frame sampling plumbing: every `stride`-th chunk of the payload as a
    * (media_id, frame_no, frame_bytes) row — the shape of video
    * frame-extraction output. Chunking is deterministic.
    */
  def sampleFrames(media: DataFrame, chunkSize: Int, stride: Int): DataFrame =
    media
      .withColumn("n_chunks",
        greatest(ceil(col("byte_len") / chunkSize.toDouble).cast("int"), lit(1)))
      .select(col("media_id"),
        explode(expr(s"sequence(0, n_chunks - 1, $stride)")).as("frame_no"),
        col("payload"))
      .withColumn("frame_bytes",
        expr(s"substring(payload, frame_no * $chunkSize + 1, $chunkSize)"))
      .drop("payload")
}

/** Deterministic stand-ins for codec calls (no media libs in-container). */
object StubDecoders {

  /** STUB: a real implementation would parse the image header (PNG IHDR /
    * JPEG SOF). Here: deterministic pseudo-metadata from the bytes so
    * tests are stable and the pipeline shape is exercised end-to-end.
    */
  def decodeImageMeta(payload: Array[Byte]): (Int, Int, String, Long) = {
    var h = 1125899906842597L // FNV-ish fold; any stable mix works
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 10, 1024).toInt
    val format = if (math.floorMod(h, 2) == 0L) "png" else "jpeg"
    (width, height, format, h)
  }
}
