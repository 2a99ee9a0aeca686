package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class OggSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >>> (8 * k)) & 0xFF).toByte)

  private def vorbisId(channels: Int, rate: Int): Array[Byte] =
    Array[Byte](1, 'v', 'o', 'r', 'b', 'i', 's') ++ le(0, 4) ++
      Array(channels.toByte) ++ le(rate, 4) ++ new Array[Byte](12) ++
      Array[Byte](0xB8.toByte, 1)

  private def opusHead(channels: Int, preSkip: Int): Array[Byte] =
    "OpusHead".getBytes ++ Array[Byte](1, channels.toByte) ++
      le(preSkip, 2) ++ le(48000, 4) ++ le(0, 2) ++ Array[Byte](0)

  test("Vorbis stream: codec, channels, rate, pages, granule duration") {
    val b = Ogg.page(2, 0, 7, 0, vorbisId(2, 44100)) ++
      Ogg.page(0, 22050, 7, 1, new Array[Byte](80)) ++
      Ogg.page(4, 44100 * 3, 7, 2, new Array[Byte](40))
    val m = Ogg.meta(b).get
    assert(m.codec == "vorbis" && m.channels == 2 && m.sample_rate == 44100)
    assert(m.n_pages == 3 && m.duration_ms == 3000)
  }

  test("Opus stream: pre-skip subtracted at 48 kHz per RFC 7845") {
    val b = Ogg.page(2, 0, 9, 0, opusHead(2, 312)) ++
      Ogg.page(4, 48L * 2500 + 312, 9, 1, new Array[Byte](10))
    val m = Ogg.meta(b).get
    assert(m.codec == "opus" && m.channels == 2 && m.sample_rate == 48000)
    assert(m.duration_ms == 2500)
  }

  test("Theora BOS is identified as video") {
    val id = Array[Byte](0x80.toByte, 't', 'h', 'e', 'o', 'r', 'a') ++
      new Array[Byte](35)
    val m = Ogg.meta(Ogg.page(2, 0, 3, 0, id)).get
    assert(m.codec == "theora")
  }

  test("a corrupt page is skipped by CRC, the rest survive") {
    val good = Ogg.page(2, 0, 5, 0, vorbisId(1, 8000)) ++
      Ogg.page(0, 4000, 5, 1, new Array[Byte](64)) ++
      Ogg.page(4, 16000, 5, 2, new Array[Byte](32))
    val p1Start = Ogg.page(2, 0, 5, 0, vorbisId(1, 8000)).length
    val bad = good.clone()
    bad(p1Start + 40) = (bad(p1Start + 40) ^ 0x55).toByte // flip payload bits
    val m = Ogg.meta(bad).get
    assert(m.n_pages == 2) // middle page dropped
    assert(m.duration_ms == 2000) // EOS granule still authoritative
    // corrupting the EOS page leaves the mid-page granule as the last
    val bad2 = good.clone()
    bad2(bad2.length - 1) = (bad2(bad2.length - 1) ^ 0x55).toByte
    assert(Ogg.meta(bad2).get.duration_ms == 500)
  }

  test("a packet of exactly 255 bytes gets the trailing zero lacing value") {
    val payload = new Array[Byte](255)
    val page = Ogg.page(0, 0, 1, 0, payload)
    assert((page(26) & 0xFF) == 2) // 255-run + 0 terminator
    val b = Ogg.page(2, 0, 1, 0, vorbisId(1, 8000)) ++ page
    assert(Ogg.meta(b).get.n_pages == 2)
  }

  test("granule -1 (no complete packet) pages don't move the duration") {
    val b = Ogg.page(2, 0, 4, 0, vorbisId(1, 8000)) ++
      Ogg.page(0, 8000, 4, 1, new Array[Byte](16)) ++
      Ogg.page(0, -1L, 4, 2, new Array[Byte](16))
    assert(Ogg.meta(b).get.duration_ms == 1000)
  }

  test("junk before and between pages: resync finds the captures") {
    val b = "leading junk".getBytes ++
      Ogg.page(2, 0, 8, 0, vorbisId(1, 16000)) ++
      "OggX not a page".getBytes ++
      Ogg.page(4, 16000, 8, 1, new Array[Byte](8))
    val m = Ogg.meta(b).get
    assert(m.n_pages == 2 && m.duration_ms == 1000)
  }

  test("non-Ogg payloads and every truncation: None or partial, never thrown") {
    assert(Ogg.meta(null).isEmpty)
    assert(Ogg.meta("no pages here at all -- plain text".getBytes).isEmpty)
    val full = Ogg.page(2, 0, 2, 0, opusHead(1, 0)) ++
      Ogg.page(4, 48000, 2, 1, new Array[Byte](20))
    var i = 0
    while (i <= full.length) {
      Ogg.meta(full.take(i))
      i += 3
    }
  }
}
