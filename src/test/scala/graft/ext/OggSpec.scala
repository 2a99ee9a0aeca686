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

  test("orphaned continued tail (no packet in flight) is discarded, not emitted") {
    // a damaged/resynced stream can present a page whose continued flag is
    // set while no packet is being assembled: the tail segments belong to a
    // packet whose head was lost. libogg discards them; emitting the tail
    // as a standalone packet hands downstream decoders a mid-packet
    // fragment dressed as a whole one.
    def rawPage(headerType: Int, serial: Long, seq: Long,
        lacing: Array[Int], payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](27 + lacing.length + payload.length)
      out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
      out(5) = headerType.toByte
      var k = 0
      while (k < 4) {
        out(14 + k) = ((serial >>> (8 * k)) & 0xFF).toByte
        out(18 + k) = ((seq >>> (8 * k)) & 0xFF).toByte
        k += 1
      }
      out(26) = lacing.length.toByte
      lacing.indices.foreach(j => out(27 + j) = lacing(j).toByte)
      System.arraycopy(payload, 0, out, 27 + lacing.length, payload.length)
      val c = Ogg.crc(out, 0, out.length, 22, 26)
      k = 0
      while (k < 4) { out(22 + k) = ((c >>> (8 * k)) & 0xFF).toByte; k += 1 }
      out
    }
    val bosPkt = vorbisId(1, 8000)
    val realPkt = Array[Byte](9, 8, 7, 6, 5)
    // page 1 (BOS): one complete packet; page 2: CONTINUED flag set but
    // nothing in flight — 10-byte orphan tail, then the 5-byte real packet
    val orphan = Array.fill[Byte](10)(0x42)
    val b = Ogg.page(2, 0, 9, 0, bosPkt) ++
      rawPage(1, 9, 2, Array(orphan.length, realPkt.length), orphan ++ realPkt)
    val pkts = Ogg.packets(b)
    assert(pkts.length == 2, s"expected BOS + real packet, got ${pkts.length}")
    assert(pkts(0).sameElements(bosPkt))
    assert(pkts(1).sameElements(realPkt), "orphan tail must be discarded")
    // an orphan tail that itself spans the whole page (all-255 lacing then
    // a terminator on a later page) keeps discarding across segments
    val longOrphan = Array.fill[Byte](255 + 20)(0x17)
    val b2 = Ogg.page(2, 0, 9, 0, bosPkt) ++
      rawPage(1, 9, 2, Array(255, 20, realPkt.length), longOrphan ++ realPkt)
    val pkts2 = Ogg.packets(b2)
    assert(pkts2.length == 2 && pkts2(1).sameElements(realPkt))
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
