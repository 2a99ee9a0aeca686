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
}
