package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class WebmSpec extends AnyFunSuite {
  import Webm.{el, floatB, uintB}

  private def header(dt: String = "webm") =
    el(0x1A45DFA3L, el(0x4282L, dt.getBytes("US-ASCII")))

  test("two-track tree: every field; default timecode scale applies") {
    // no TimecodeScale element → default 1e6 ns, duration units = ms
    val info = el(0x1549A966L, el(0x4489L, floatB(2500f)))
    val v = el(0xAEL, el(0xD7L, uintB(1)), el(0x83L, uintB(1)),
      el(0x86L, "V_VP8".getBytes),
      el(0xE0L, el(0xB0L, uintB(640)), el(0xBAL, uintB(360))))
    val a = el(0xAEL, el(0xD7L, uintB(2)), el(0x83L, uintB(2)),
      el(0x86L, "A_VORBIS".getBytes),
      el(0xE1L, el(0xB5L, floatB(44100f)), el(0x9FL, uintB(1))))
    val m = Webm.meta(header() ++ el(0x18538067L, info, el(0x1654AE6BL, v, a))).get
    assert(m.doc_type == "webm" && m.timescale_ns == 1000000L)
    assert(m.duration_ms == 2500)
    assert(m.tracks.map(_.codec) == Vector("V_VP8", "A_VORBIS"))
    assert(m.tracks(0).width == 640 && m.tracks(0).height == 360)
    assert(m.tracks(1).sample_rate == 44100 && m.tracks(1).channels == 1)
  }

  test("8-byte double duration and a non-default timecode scale") {
    // 25000 units at 40 000 ns each = 1 ms per 25 units → 1000 ms
    val info = el(0x1549A966L, el(0x2AD7B1L, uintB(40000L)),
      el(0x4489L, {
        val bits = java.lang.Double.doubleToLongBits(25000.0)
        Array.tabulate(8)(k => ((bits >>> (8 * (7 - k))) & 0xFF).toByte)
      }))
    val m = Webm.meta(header("matroska") ++ el(0x18538067L, info)).get
    assert(m.doc_type == "matroska" && m.timescale_ns == 40000L)
    assert(m.duration_ms == 1000)
  }

  test("unknown-size segment (streamed file) extends to end of payload") {
    val info = el(0x1549A966L, el(0x4489L, floatB(700f)))
    // segment with the all-ones 1-byte size code
    val seg = Array[Byte](0x18, 0x53.toByte, 0x80.toByte, 0x67, 0xFF.toByte) ++ info
    val m = Webm.meta(header() ++ seg).get
    assert(m.duration_ms == 700)
  }

  test("2-byte sizes (>126-byte payloads) walk correctly") {
    val bigVoid = el(0xECL, new Array[Byte](300)) // Void filler element
    val info = el(0x1549A966L, el(0x4489L, floatB(1200f)))
    val m = Webm.meta(header() ++ el(0x18538067L, bigVoid, info)).get
    assert(m.duration_ms == 1200)
  }

  test("non-EBML payloads and truncations: None/partial, never thrown") {
    assert(Webm.meta(null).isEmpty)
    assert(Webm.meta("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Webm.meta(Array[Byte](0x1A, 0x45)).isEmpty)
    // EBML magic but a PDF doctype → rejected
    assert(Webm.meta(header("pdfxx")).isEmpty)
    val full = header() ++ el(0x18538067L,
      el(0x1549A966L, el(0x4489L, floatB(100f))),
      el(0x1654AE6BL, el(0xAEL, el(0xD7L, uintB(1)), el(0x83L, uintB(1)),
        el(0x86L, "V_VP9".getBytes))))
    var i = 0
    while (i <= full.length) {
      Webm.meta(full.take(i))
      i += 1
    }
  }

  // ----------------------------------------- V_VP8 keyframe → raster

  /** 48×30 RGB gradient (dims NOT multiples of 16 → MB crop path). */
  private def gradient(): Png.Image = {
    val px = new Array[Byte](48 * 30 * 3)
    var y = 0
    while (y < 30) {
      var x = 0
      while (x < 48) {
        val o = (y * 48 + x) * 3
        px(o) = (x * 5).toByte; px(o + 1) = (y * 8).toByte
        px(o + 2) = ((x + y) * 3).toByte
        x += 1
      }
      y += 1
    }
    Png.Image(48, 30, 3, px)
  }

  private def vp8Frame(img: Png.Image): Array[Byte] = {
    val webp = Vp8Enc.encode(img)
    val (s, e) = Vp8.findVp8Chunk(webp).get
    java.util.Arrays.copyOfRange(webp, s, e)
  }

  test("V_VP8 keyframe decode == the same frame's WebP decode, bit-exact") {
    val img = gradient()
    val webp = Vp8Enc.encode(img)
    val webm = Webm.buildVp8(48, 30, Seq(vp8Frame(img)))
    val kf = Webm.firstVideoKeyframe(webm).get
    assert(kf.codec == "V_VP8" && kf.width == 48 && kf.height == 30)
    val thumb = Webm.decodeFirstFrame(webm).get
    val still = Vp8.decodeToImage(webp).get
    assert(thumb.width == 48 && thumb.height == 30 && thumb.channels == 3)
    assert(java.util.Arrays.equals(thumb.pixels, still.pixels))
    // and the decodeAny seam routes the container to the same raster
    val any = Png.decodeAny(webm).get
    assert(java.util.Arrays.equals(any.pixels, still.pixels))
  }

  test("delta-flagged leading SimpleBlock skipped; later keyframe found") {
    val f = vp8Frame(gradient())
    val junk = Array.fill[Byte](24)(0x55) // "delta frame" the walk must skip
    val tracks = el(0x1654AE6BL, el(0xAEL,
      el(0xD7L, uintB(1)), el(0x83L, uintB(1)), el(0x86L, "V_VP8".getBytes),
      el(0xE0L, el(0xB0L, uintB(48)), el(0xBAL, uintB(30)))))
    def sblock(frame: Array[Byte], flags: Int) =
      el(0xA3L, Array(0x81.toByte, 0, 0, flags.toByte), frame)
    val webm = header() ++ el(0x18538067L, tracks,
      el(0x1F43B675L, el(0xE7L, uintB(0)),
        sblock(junk, 0x00), sblock(f, 0x80)))
    val kf = Webm.firstVideoKeyframe(webm).get
    assert(kf.frame.sameElements(f))
    // no keyframe flag anywhere → None (builder's firstIsKey=false path)
    val nokey = Webm.buildVp8(48, 30, Seq(f), firstIsKey = false)
    assert(Webm.firstVideoKeyframe(nokey).isEmpty)
    assert(Webm.decodeFirstFrame(nokey).isEmpty)
  }

  test("BlockGroup: keyframe = no ReferenceBlock; laced blocks skipped") {
    val f = vp8Frame(gradient())
    val tracks = el(0x1654AE6BL, el(0xAEL,
      el(0xD7L, uintB(1)), el(0x83L, uintB(1)), el(0x86L, "V_VP8".getBytes),
      el(0xE0L, el(0xB0L, uintB(48)), el(0xBAL, uintB(30)))))
    def group(refd: Boolean) = el(0xA0L,
      (Seq(el(0xA1L, Array(0x81.toByte, 0, 0, 0x00.toByte), f)) ++
        (if (refd) Seq(el(0xFBL, uintB(1))) else Nil)): _*)
    val referenced = header() ++ el(0x18538067L, tracks,
      el(0x1F43B675L, el(0xE7L, uintB(0)), group(refd = true)))
    assert(Webm.firstVideoKeyframe(referenced).isEmpty)
    val keyed = header() ++ el(0x18538067L, tracks,
      el(0x1F43B675L, el(0xE7L, uintB(0)), group(refd = false)))
    assert(Webm.firstVideoKeyframe(keyed).get.frame.sameElements(f))
    // Xiph-laced SimpleBlock (flag 0x02) is out of envelope → skipped
    val laced = header() ++ el(0x18538067L, tracks,
      el(0x1F43B675L, el(0xE7L, uintB(0)),
        el(0xA3L, Array(0x81.toByte, 0, 0, 0x82.toByte, 1.toByte), f)))
    assert(Webm.firstVideoKeyframe(laced).isEmpty)
  }

  test("audio-first track order: blocks on the audio track are ignored") {
    val f = vp8Frame(gradient())
    val a = el(0xAEL, el(0xD7L, uintB(1)), el(0x83L, uintB(2)),
      el(0x86L, "A_VORBIS".getBytes),
      el(0xE1L, el(0xB5L, floatB(48000f)), el(0x9FL, uintB(2))))
    val v = el(0xAEL, el(0xD7L, uintB(2)), el(0x83L, uintB(1)),
      el(0x86L, "V_VP8".getBytes),
      el(0xE0L, el(0xB0L, uintB(48)), el(0xBAL, uintB(30))))
    val webm = header() ++ el(0x18538067L, el(0x1654AE6BL, a, v),
      el(0x1F43B675L, el(0xE7L, uintB(0)),
        // keyframe-flagged AUDIO block first — wrong track, must skip
        el(0xA3L, Array(0x81.toByte, 0, 0, 0x80.toByte), Array.fill[Byte](9)(1)),
        el(0xA3L, Array(0x82.toByte, 0, 0, 0x80.toByte), f)))
    val kf = Webm.firstVideoKeyframe(webm).get
    assert(kf.codec == "V_VP8" && kf.frame.sameElements(f))
  }

  test("V_VP9 keyframe surfaces but does not raster-decode; truncation soak") {
    val tracks = el(0x1654AE6BL, el(0xAEL,
      el(0xD7L, uintB(1)), el(0x83L, uintB(1)), el(0x86L, "V_VP9".getBytes),
      el(0xE0L, el(0xB0L, uintB(64)), el(0xBAL, uintB(64)))))
    val webm = header() ++ el(0x18538067L, tracks,
      el(0x1F43B675L, el(0xE7L, uintB(0)),
        el(0xA3L, Array(0x81.toByte, 0, 0, 0x80.toByte), Array.fill[Byte](40)(7))))
    assert(Webm.firstVideoKeyframe(webm).get.codec == "V_VP9")
    assert(Webm.decodeFirstFrame(webm).isEmpty)
    val full = Webm.buildVp8(48, 30, Seq(vp8Frame(gradient())))
    var i = 0
    while (i <= full.length) { // never a throw at any truncation point
      Webm.firstVideoKeyframe(full.take(i))
      Webm.decodeFirstFrame(full.take(i))
      i += 8
    }
  }

  test("q_video_thumb_anchor plant population: thumbnail aHash drift exactly 0") {
    // the oracle counts assume EVERY planted WebM pairs with its still
    // at Hamming 0 — sweep the full potential plant population (all
    // doc_id % 20 == 0 in [0, 90000), superset of every SF's corpus)
    // and assert the VP8 qIndex-4 noise never crosses an aHash
    // threshold on these 0/255 block rasters
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var id = 0L
    var n = 0
    while (id < 90000) {
      val base = (mix(id ^ 0x7EBAC0DEL) | 1L) & ~(1L << 63)
      val px = new Array[Byte](16 * 16)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val bit = (y / 2) * 8 + (x / 2)
          px(y * 16 + x) =
            if (((base >>> bit) & 1L) == 1L) 0xFF.toByte else 0x00.toByte
          x += 1
        }
        y += 1
      }
      val img = Png.Image(16, 16, 1, px)
      val still = Png.aHash(img)
      val webm = Webm.wrapWebpLossy(Vp8Enc.encode(img, 4, 0)).get
      val thumb = Png.aHash(Webm.decodeFirstFrame(webm).get)
      assert(thumb == still,
        s"doc $id: thumbnail aHash drifted " +
          java.lang.Long.bitCount(thumb ^ still) + " bits")
      n += 1
      id += 20
    }
    assert(n == 4500)
  }

  test("wrapWebpLossy: WebP → WebM re-container decodes to the same raster") {
    val img = gradient()
    val webp = Vp8Enc.encode(img, 4, 0)
    val webm = Webm.wrapWebpLossy(webp).get
    val m = Webm.meta(webm).get
    assert(m.doc_type == "webm" &&
      m.tracks.map(t => (t.codec, t.width, t.height)) == Vector(("V_VP8", 48, 30)))
    val still = Vp8.decodeToImage(webp).get
    val thumb = Webm.decodeFirstFrame(webm).get
    assert(java.util.Arrays.equals(thumb.pixels, still.pixels))
    assert(Webm.wrapWebpLossy(Array[Byte](1, 2, 3)).isEmpty)
  }
}
