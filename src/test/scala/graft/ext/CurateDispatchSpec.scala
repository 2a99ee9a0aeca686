package graft.ext

import graft.SparkSpec

class CurateDispatchSpec extends SparkSpec {

  test("untyped blobs route to their arms; unknowns gated out") {
    import spark.implicits._
    val png = Png.encode(Png.Image(9, 7, 1, Array.fill(63)(42.toByte)))
    val webp = Webp.container(Webp.losslessChunk(640, 360, alpha = false))
    val mp3 = {
      val f = new Array[Byte](417)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte; f(2) = 0x90.toByte
      Array.fill(25)(f).flatten
    }
    val docx = Zip.build(Seq(("word/document.xml",
      "<w:document><w:body><w:p><w:r><w:t>docx body</w:t></w:r></w:p></w:body></w:document>"
        .getBytes("UTF-8"), true)))
    val pdf = Pdf.buildSimple(Seq("pdf body"), flate = true)
    val junk = "no magic here".getBytes("UTF-8")
    val heic = Mp4.HeifBuild.still("heic", "hvc1", 4032, 3024)
    val media = Seq(
      (0L, png), (1L, webp), (2L, mp3), (3L, docx), (4L, pdf), (5L, junk),
      (6L, heic))
      .toDF("media_id", "payload")
    val out = new graft.engine.Engine(CurateDispatch.spec())
      .run("curate_dispatch", spark, Some(media),
        graft.engine.RunOptions(orderedConcat = false))
      .orderBy("media_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getString(6)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 6L)) // junk gated out
    assert(out(0) == ((0L, "png", "image", 9, 7, 0L, "")))
    assert(out(1) == ((1L, "webp", "image", 640, 360, 0L, "")))
    assert(out(2)._2 == "mpeg_audio" && out(2)._3 == "audio")
    assert(out(2)._6 == 25L * 1152 * 1000 / 44100)
    assert(out(3) == ((3L, "zip", "doc", 0, 0, 0L, "docx body\n")))
    assert(out(4) == ((4L, "pdf", "doc", 0, 0, 0L, "pdf body")))
    assert(out(5) == ((6L, "heic", "image", 4032, 3024, 0L, "")))
  }

  test("webm routes to the video arm: keyframe-decoded dims + duration") {
    import spark.implicits._
    // a real one-keyframe WebM (Vp8Enc stream): dims must come from the
    // DECODED keyframe, not just the track header
    val img = Png.Image(32, 20, 3, Array.tabulate(32 * 20 * 3)(i => (i * 7).toByte))
    val webm = Webm.wrapWebpLossy(Vp8Enc.encode(img)).get
    // V_VP9 track: no decoder arm → falls back to track-header dims
    import Webm.{el, uintB}
    val vp9 = el(0x1A45DFA3L, el(0x4282L, "webm".getBytes)) ++
      el(0x18538067L,
        el(0x1549A966L, el(0x2AD7B1L, uintB(1000000L)),
          el(0x4489L, Webm.floatB(1500f))),
        el(0x1654AE6BL, el(0xAEL, el(0xD7L, uintB(1)), el(0x83L, uintB(1)),
          el(0x86L, "V_VP9".getBytes),
          el(0xE0L, el(0xB0L, uintB(1280)), el(0xBAL, uintB(720))))))
    val media = Seq((0L, webm), (1L, vp9)).toDF("media_id", "payload")
    val out = new graft.engine.Engine(CurateDispatch.spec())
      .run("curate_dispatch", spark, Some(media),
        graft.engine.RunOptions(orderedConcat = false))
      .orderBy("media_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getString(6)))
    assert(out(0) == ((0L, "webm", "video", 32, 20, 33L, "")))
    assert(out(1) == ((1L, "webm", "video", 1280, 720, 1500L, "")))
  }

  test("damaged payloads produce defaults in their arm, never a throw") {
    import spark.implicits._
    // right magic, broken body: arm claims it, parse fails to defaults
    val brokenPng = Png.encode(Png.Image(4, 4, 1, new Array[Byte](16))).take(12)
    val brokenPdf = "%PDF-1.4\nnothing here".getBytes("UTF-8")
    val media = Seq((0L, brokenPng), (1L, brokenPdf)).toDF("media_id", "payload")
    val out = new graft.engine.Engine(CurateDispatch.spec())
      .run("curate_dispatch", spark, Some(media),
        graft.engine.RunOptions(orderedConcat = false))
      .orderBy("media_id")
      .collect()
    assert(out.length == 2)
    assert(out(0).getInt(3) == 0 && out(0).getInt(4) == 0) // dims default
    assert(out(1).getString(6) == "") // no text, still a doc row
  }
}
