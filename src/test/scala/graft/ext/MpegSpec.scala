package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class MpegSpec extends AnyFunSuite {

  /** One frame: header + zero fill to the ISO frame length. */
  private def frame(b1: Int, b2: Int, b3: Int, len: Int): Array[Byte] = {
    val f = new Array[Byte](len)
    f(0) = 0xFF.toByte; f(1) = b1.toByte; f(2) = b2.toByte; f(3) = b3.toByte
    f
  }
  // MPEG1 L3 128kbps 44.1k stereo: 144*128000/44100 = 417
  private def v1l3 = frame(0xFB, 0x90, 0x00, 417)
  // MPEG2 L3 64kbps 22.05k mono: 72*64000/22050 = 208
  private def v2l3 = frame(0xF3, 0x80, 0xC0, 208)

  test("CBR MPEG1 Layer III: all fields from the header tables") {
    val b = Array.fill(5)(v1l3).flatten.toArray[Byte]
    val m = Mpeg.mp3Meta(b).get
    assert(m.version == "1" && m.layer == 3)
    assert(m.sample_rate == 44100 && m.channels == 2)
    assert(m.bitrate_kbps == 128 && m.n_frames == 5 && !m.is_vbr)
    assert(m.duration_ms == 5L * 1152 * 1000 / 44100)
  }

  test("ID3v2 prefix is skipped via syncsafe length; ID3v1 trailer stops the scan") {
    val pad = 200 // syncsafe: 0,0,1,72
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
      Array[Byte](0, 0, ((pad >> 7) & 0x7F).toByte, (pad & 0x7F).toByte) ++
      new Array[Byte](pad)
    val tag = "TAG".getBytes ++ new Array[Byte](125)
    val b = id3 ++ v2l3 ++ v2l3 ++ v2l3 ++ tag
    val m = Mpeg.mp3Meta(b).get
    assert(m.version == "2" && m.sample_rate == 22050 && m.channels == 1)
    assert(m.n_frames == 3 && m.duration_ms == 3L * 576 * 1000 / 22050)
  }

  test("junk between frames: forward resync keeps counting") {
    val b = v1l3 ++ "random garbage here".getBytes ++ v1l3 ++ v1l3
    val m = Mpeg.mp3Meta(b).get
    assert(m.n_frames == 3)
  }

  test("Xing frame count is authoritative for a truncated VBR stream") {
    // MPEG1/32k 160kbps stereo: 144*160000/32000 = 720; Xing after the
    // 32-byte stereo side info declares 100 frames, only 2 are present
    val f0 = frame(0xFB, 0xA8, 0x00, 720)
    val x = 4 + 32
    System.arraycopy("Xing".getBytes, 0, f0, x, 4)
    f0(x + 7) = 1
    f0(x + 11) = 100.toByte
    val b = f0 ++ frame(0xFB, 0x88, 0x00, 504) // 112kbps → varied bitrate
    val m = Mpeg.mp3Meta(b).get
    assert(m.n_frames == 100 && m.is_vbr)
    assert(m.duration_ms == 100L * 1152 * 1000 / 32000)
    assert(m.bitrate_kbps == (160 + 112) / 2)
  }

  test("Layer II and Layer I frame lengths") {
    // V1 L2 192kbps 48k stereo: 144*192000/48000 = 576
    val l2 = frame(0xFD, 0xA4, 0x00, 576)
    val m2 = Mpeg.mp3Meta((l2 ++ l2).toArray[Byte]).get
    assert(m2.layer == 2 && m2.bitrate_kbps == 192 && m2.sample_rate == 48000)
    assert(m2.n_frames == 2)
    // V1 L1 128kbps 32k (idx 4, sr 2): (12*128000/32000 + 0)*4 = 192
    val l1 = frame(0xFF, 0x48, 0x00, 192)
    val m1 = Mpeg.mp3Meta((l1 ++ l1 ++ l1).toArray[Byte]).get
    assert(m1.layer == 1 && m1.bitrate_kbps == 128 && m1.n_frames == 3)
    assert(m1.duration_ms == 3L * 384 * 1000 / 32000)
  }

  test("free format, reserved codes, and non-MPEG payloads yield None") {
    assert(Mpeg.mp3Meta(null).isEmpty)
    assert(Mpeg.mp3Meta("plain text, no sync word anywhere".getBytes).isEmpty)
    // bitrate index 0 (free format) is desync, not a guess
    assert(Mpeg.mp3Meta(frame(0xFB, 0x00, 0x00, 417)).isEmpty)
    // bitrate index 15 / samplerate index 3 are reserved
    assert(Mpeg.mp3Meta(frame(0xFB, 0xF0, 0x00, 417)).isEmpty)
    assert(Mpeg.mp3Meta(frame(0xFB, 0x9C, 0x00, 417)).isEmpty)
    // version id 1 is reserved
    assert(Mpeg.mp3Meta(frame(0xEB, 0x90, 0x00, 417)).isEmpty)
  }

  test("a lone valid frame (chance sync in binary data) is rejected") {
    assert(Mpeg.mp3Meta(v1l3).isEmpty)
    // two chained frames qualify; two frames separated by junk do not
    assert(Mpeg.mp3Meta((v1l3 ++ v1l3).toArray[Byte]).nonEmpty)
    assert(Mpeg.mp3Meta(v1l3 ++ "junk".getBytes ++ v1l3).isEmpty)
  }

  test("every truncation parses or bails, never throws") {
    val full = ("ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10) ++ v1l3 ++ v1l3).toArray[Byte]
    var i = 0
    while (i <= full.length) {
      Mpeg.mp3Meta(full.take(i))
      i += 1
    }
  }
}
