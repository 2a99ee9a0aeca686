package graft.ext

import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spec.{PipelineSpec, SegType, Stage}

/** Mixed-format curation THROUGH the sniff dispatcher — the realistic
  * multimodal landing where format is NOT known per row: one untyped
  * blob column, [[Multimodal.sniffFormat]] names each payload's family,
  * and per-format arms (image dims, WebP chunk walk, HEIF/AVIF ipma
  * resolution, MPEG audio triage, DOCX/XLSX and PDF text) produce one
  * uniform curation row. Declared
  * as a GASKET pipeline (`/root/reference/readme.md:83-111` stage
  * forms), the sibling of [[WebCurate]] (typed WARC input) and
  * [[MediaCurate]] (typed image input).
  *
  * Scale shape: sniff is map-only; the dispatch stage is the one
  * multi-consumer point (eight arm blocks — raster/WebP/HEIF/audio/
  * video/office-zip/text-documents/rest, the text arm routing 20+
  * formats, the video arm decoding WebM V_VP8 keyframe thumbnails —
  * filter the same sniffed corpus,
  * persisted there under the map-tee discipline); every arm is a
  * filter + mapPartitions over that cache, so the whole plan is one
  * InMemoryRelation fanned into map-only unions — no join, no shuffle
  * before the caller's sink. Payloads an arm cannot parse produce
  * defaults (dims 0, empty text), never a throw; unknown formats are
  * carried to the gate and dropped there, so the gate owns the
  * keep/drop policy, not the dispatch.
  */
object CurateDispatch {

  // every corpus the dispatch stage persists, so a driver can release
  // them deterministically after its sink action instead of leaning on
  // the ContextCleaner: a long-running stream that runs one engine
  // pipeline per micro-batch would otherwise accumulate a cached
  // relation per batch in the block manager until GC notices
  private val cached =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every corpus cached by [[spec]]'s dispatch stage since
    * the last call. Call AFTER the pipeline's sink action has
    * materialized (foreachBatch write, Verify dump) — the cache is
    * useless once the union is computed. Safe to call any time:
    * unpersisting is lazy-correct (recompute, not wrong answers).
    */
  def releaseCached(): Unit = {
    var d = cached.poll()
    while (d != null) {
      try d.unpersist() catch { case scala.util.control.NonFatal(_) => () }
      d = cached.poll()
    }
  }

  /** Input contract: `(media_id long, payload binary)` — format unknown
    * per row. Output: `(media_id, format, kind, width, height,
    * duration_ms, text)` for every payload an arm claims.
    */
  def spec(): PipelineSpec = {
    def stage(name: String)(fn: DataFrame => DataFrame): Stage =
      Stage.Inline(name, fn, SegType.Pipe)
    val cols = Seq("media_id", "format", "kind", "width", "height",
      "duration_ms", "text")
    PipelineSpec(ListMap("curate_dispatch" -> Seq(
      stage("sniff") { df =>
        val spark = df.sparkSession
        import spark.implicits._
        df.select(col("media_id").cast("long"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, p) =>
            (id, p,
              Multimodal.sniffFormat(if (p == null) Array.emptyByteArray else p))
          })
          .toDF("media_id", "payload", "format")
      },
      stage("dispatch") { df0 =>
        val spark = df0.sparkSession
        import spark.implicits._
        // six arms read the sniffed corpus: persist once (map-tee
        // discipline), every arm is filter + mapPartitions over it;
        // registered for deterministic post-action release
        val df = df0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached.add(df)
        def rows(formats: Seq[String]) = df
          .filter(col("format").isin(formats: _*))
          .select("media_id", "payload", "format")
          .as[(Long, Array[Byte], String)]
        // ico/tiff (round 13): Png.decodeAny now carries real arms for
        // both, so favicons and baseline TIFFs get true dimensions
        val raster = rows(Seq("png", "jpeg", "gif", "bmp", "ico", "tiff"))
          .mapPartitions(_.map { case (id, p, f) =>
            val (w, h) = Png.decodeAny(p)
              .map(i => (i.width, i.height)).getOrElse((0, 0))
            (id, f, "image", w, h, 0L, "")
          }).toDF(cols: _*)
        val webp = rows(Seq("webp"))
          .mapPartitions(_.map { case (id, p, f) =>
            val (w, h) = Webp.meta(p)
              .map(m => (m.width, m.height)).getOrElse((0, 0))
            (id, f, "image", w, h, 0L, "")
          }).toDF(cols: _*)
        val heif = rows(Seq("heic", "avif"))
          .mapPartitions(_.map { case (id, p, f) =>
            val (w, h) = Mp4.heifMeta(p)
              .map(m => (m.width, m.height)).getOrElse((0, 0))
            (id, f, "image", w, h, 0L, "")
          }).toDF(cols: _*)
        val audio = rows(Seq("mpeg_audio"))
          .mapPartitions(_.map { case (id, p, f) =>
            val dur = Mpeg.mp3Meta(p).map(_.duration_ms).getOrElse(0L)
            (id, f, "audio", 0, 0, dur, "")
          }).toDF(cols: _*)
        // video (round 16): WebM rides the raster seam — dims from the
        // first V_VP8 keyframe decoded through the real Vp8 arm (a
        // thumbnail decode, the video analog of the image dims), track
        // metadata as the fallback for codecs without a decoder arm
        val video = rows(Seq("webm"))
          .mapPartitions(_.map { case (id, p, f) =>
            val m = Webm.meta(p)
            val (w, h) = Webm.decodeFirstFrame(p)
              .map(i => (i.width, i.height))
              .orElse(m.flatMap(_.tracks.find(_.track_type == 1))
                .map(t => (t.width, t.height)))
              .getOrElse((0, 0))
            (id, f, "video", w, h, m.map(_.duration_ms).getOrElse(0L), "")
          }).toDF(cols: _*)
        val docs = rows(Seq("zip", "pdf"))
          .mapPartitions(_.map { case (id, p, f) =>
            val text =
              if (f == "pdf") Pdf.extractText(p).getOrElse("")
              else Office.docxText(p).orElse(Office.xlsxText(p)).getOrElse("")
            (id, f, "doc", 0, 0, 0L, text)
          }).toDF(cols: _*)
        // text-document formats (round 12b): EPUB spine text, RTF
        // tokenizer, MIME mail bodies — same uniform curation row
        val textdocs = rows(Seq("epub", "rtf", "eml", "mbox", "odt", "ods",
            "odp", "sqlite", "mhtml", "doc", "xls", "msg", "ppt",
            "rss", "atom", "ics", "vcf", "tnef", "tex", "bib", "ipynb",
            "dbf", "po", "xliff", "axml"))
          .mapPartitions(_.map { case (id, p, f) =>
            val text = f match {
              case "epub" => Epub.extract(p)
                .map(_._2.map(_.text).mkString("\n")).getOrElse("")
              case "rtf" => Rtf.text(p).getOrElse("")
              case "eml" => Mail.parseEml(p).text
              case "mhtml" => Mhtml.parse(p).map(_.text).getOrElse("")
              case "doc" => MsDoc.text(p).getOrElse("")
              case "xls" => Xls.text(p).getOrElse("")
              case "msg" => Msg.parse(p).map(_.body).getOrElse("")
              case "ppt" => Ppt.text(p).getOrElse("")
              case "rss" | "atom" => Feed.parse(p)
                .map(_.items.map(_.body).mkString("\n")).getOrElse("")
              case "ics" => VObject.events(p)
                .map(_.map(_.summary).mkString("\n")).getOrElse("")
              case "vcf" => VObject.cards(p)
                .map(_.map(_.fn).mkString("\n")).getOrElse("")
              case "tnef" => Tnef.parse(p).map(_.body).getOrElse("")
              case "tex" => Tex.text(p)
              case "bib" => Bib.entries(p)
                .map(e => e.fields.getOrElse("title", e.key)).mkString("\n")
              case "ipynb" => Ipynb.cells(p)
                .map(_.map(_.source).mkString("\n")).getOrElse("")
              case "dbf" => Dbf.read(p).map(_.rows.map(_.map {
                  case null => ""
                  case v => v.toString
                }.mkString("\t")).mkString("\n")).getOrElse("")
              case "po" => Gettext.pairs(p)
                .map { case (a, b2) => a + "\t" + b2 }.mkString("\n")
              case "xliff" => Xliff.parse(p).map(_.units
                .map(u => u.source + "\t" + u.target).mkString("\n"))
                .getOrElse("")
              case "axml" => Axml.manifest(p)
                .map { case (pkg, ver, perms) =>
                  (pkg +: ver +: perms).mkString("\n") }.getOrElse("")
              case "mbox" => Mail.parseMbox(p).map(_.text).mkString("\n")
              case "ods" => Odf.odsText(p).getOrElse("")
              case "sqlite" =>
                // the text layer of an app dump: every TEXT cell of
                // every table, rows as tab-joined lines
                Sqlite.tables(p).map(_.flatMap(t =>
                  Sqlite.readTable(p, t.name).map(_.rows.map(_._2.collect {
                    case s: String => s
                  }.mkString("\t")).mkString("\n")))
                  .mkString("\n")).getOrElse("")
              case _     => Odf.odtText(p).getOrElse("") // odt + odp share the walk
            }
            (id, f, "doc", 0, 0, 0L, text)
          }).toDF(cols: _*)
        // unclaimed formats ride to the gate labeled, so drop policy
        // lives in ONE stage
        val rest = df
          .filter(!col("format").isin("png", "jpeg", "gif", "bmp", "ico",
            "tiff", "webp", "webm",
            "heic", "avif", "mpeg_audio", "zip", "pdf",
            "epub", "rtf", "eml", "mbox", "odt", "ods", "odp", "sqlite",
            "mhtml", "doc", "xls", "msg", "ppt", "rss", "atom", "ics",
            "vcf", "tnef", "tex", "bib", "ipynb", "dbf", "po", "xliff",
            "axml"))
          .select(col("media_id"), col("format"), lit("unknown").as("kind"),
            lit(0).as("width"), lit(0).as("height"),
            lit(0L).as("duration_ms"), lit("").as("text"))
        raster.unionByName(webp).unionByName(heif).unionByName(audio)
          .unionByName(video)
          .unionByName(docs).unionByName(textdocs).unionByName(rest)
      },
      stage("gate") { df =>
        df.filter(col("kind") =!= "unknown")
      })))
  }
}
