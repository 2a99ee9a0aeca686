package graft.ext

import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spec.{PipelineSpec, SegType, Stage}

/** The image-curation pipeline — the multimodal twin of [[WebCurate]],
  * declared as a GASKET pipeline (`/root/reference/readme.md:83-111`
  * stage forms) over the binary-media operators: EXIF redaction →
  * content fingerprint → metadata-robust exact dedup → dimension gate.
  *
  * The dedup step is the reason the pipeline exists in this order:
  * crawled copies of the SAME image routinely differ only in metadata
  * (re-tagged EXIF, added GPS, touched timestamps), so byte-level dedup
  * before redaction finds nothing. Stripping first ([[Exif.strip]] —
  * pixels bit-identical) makes re-tagged copies byte-identical again,
  * so a plain md5-of-payload keyed aggregation collapses them — exact,
  * engine-portable, and certified end to end by q_media_curate_engine's
  * planted re-tagged duplicates.
  *
  * Scale shape: strip and decode are map-only; the fingerprint stage is
  * the one multi-consumer point (md5 pass + dimension decode share the
  * stripped corpus — persisted there under the map-tee discipline); the
  * dedup is ONE keyed aggregation on the 128-bit fingerprint. The
  * keeper's payload rides through `min_by` so the gate can certify the
  * decode; at 100 TB that column would be dropped (or replaced by a
  * pointer) once a certificate isn't being computed per run.
  */
object MediaCurate {

  /** Input contract: `(media_id long, payload binary)` — one image blob
    * per row. Output: `(keep_id, n_copies, width, height, pixel_sum,
    * exif_after)` per surviving content group.
    */
  def spec(minDim: Int = 8): PipelineSpec = {
    def stage(name: String)(fn: DataFrame => DataFrame): Stage =
      Stage.Inline(name, fn, SegType.Pipe)
    PipelineSpec(ListMap("media_curate" -> Seq(
      stage("exif_strip") { df =>
        Multimodal.stripExif(df)
      },
      stage("fingerprint") { df0 =>
        // two consumers of the stripped corpus (byte fingerprint +
        // pixel-layer decode) → persist once, the map-tee discipline
        val df = df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dims = Multimodal.decodeImages(df).toDF()
          .select(col("media_id"), col("width"), col("height"))
        df.select(col("media_id"), col("payload"),
            md5(col("payload")).as("fp"))
          .join(dims, "media_id")
      },
      stage("dedup") { df =>
        df.groupBy("fp")
          .agg(min(col("media_id")).as("keep_id"),
            count(lit(1)).as("n_copies"),
            min(col("width")).as("width"),
            min(col("height")).as("height"),
            min_by(col("payload"), col("media_id")).as("payload"))
      },
      stage("gate") { df =>
        val spark = df.sparkSession
        import spark.implicits._
        df.filter(col("width") >= minDim && col("height") >= minDim)
          .select(col("keep_id"), col("n_copies"), col("width"),
            col("height"), col("payload"))
          .as[(Long, Long, Int, Int, Array[Byte])]
          .mapPartitions(_.map { case (keepId, n, w, h, payload) =>
            val sum = Jpeg.decode(payload).orElse(Png.decodeAny(payload)) match {
              case Some(img) =>
                var s = 0L
                img.pixels.foreach(v => s += (v & 0xFF))
                s
              case None => -1L
            }
            (keepId, n, w, h, sum, if (Exif.meta(payload).isEmpty) 0 else 1)
          })
          .toDF("keep_id", "n_copies", "width", "height", "pixel_sum",
            "exif_after")
      })))
  }
}
