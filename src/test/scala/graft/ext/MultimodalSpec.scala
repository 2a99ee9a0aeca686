package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Tables

class MultimodalSpec extends SparkSpec {

  test("asMedia produces the canonical schema with binary payloads") {
    val media = Multimodal.asMedia(Tables.documents(spark, sfDir), "doc_id", "text", "image/fake")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "media_type", "byte_len"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.orderBy("media_id").head()
    assert(r.getAs[Array[Byte]]("payload").length == r.getAs[Long]("byte_len"))
  }

  test("decode stage is deterministic across runs and partitionings") {
    val media = Multimodal.asMedia(Tables.documents(spark, sfDir), "doc_id", "text", "image/fake")
    val a = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeImages(media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.width >= 64 && m.height >= 64))
    assert(a.forall(m => m.format == "png" || m.format == "jpeg"))
  }

  test("frame sampling yields ceil(len/chunk) strided frames with bounded size") {
    val media = Multimodal.asMedia(Tables.documents(spark, sfDir), "doc_id", "text", "video/fake")
    val frames = Multimodal.sampleFrames(media, chunkSize = 50, stride = 2)
    val byDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(media.select(col("media_id"), col("byte_len")), "media_id")
      .collect()
    byDoc.foreach { r =>
      val expected = (math.ceil(r.getAs[Long]("byte_len") / 50.0).toLong + 1) / 2
      assert(r.getAs[Long]("n") == math.max(expected, 1L))
    }
    assert(frames.select(max(length(col("frame_bytes")))).head().getInt(0) <= 50)
  }
}
