package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class WebpSpec extends AnyFunSuite {

  test("lossy: key-frame header round-trips dims, no features") {
    val m = Webp.meta(Webp.container(Webp.lossyChunk(640, 480))).get
    assert(m.variant == "lossy")
    assert((m.width, m.height) == (640, 480))
    assert(!m.has_alpha && !m.has_animation && !m.has_exif && !m.has_icc)
    assert(m.n_frames == 0)
    // 14-bit boundary dims survive the packing
    val big = Webp.meta(Webp.container(Webp.lossyChunk(0x3FFF, 1))).get
    assert((big.width, big.height) == (0x3FFF, 1))
  }

  test("lossless: packed 14+14-bit dims and the alpha bit") {
    val m = Webp.meta(Webp.container(Webp.losslessChunk(16383, 1, alpha = false))).get
    assert(m.variant == "lossless")
    assert((m.width, m.height) == (16383, 1))
    assert(!m.has_alpha)
    val a = Webp.meta(Webp.container(Webp.losslessChunk(2, 16384, alpha = true))).get
    assert((a.width, a.height) == (2, 16384))
    assert(a.has_alpha)
  }

  test("extended: flags, u24 canvas, ANMF frame count, ALPH fallback") {
    val anmf = Webp.chunk("ANMF", new Array[Byte](16))
    val m = Webp.meta(Webp.extended(70000, 300, icc = true, alpha = false,
      exif = true, anim = true, anmf, anmf, anmf,
      Webp.losslessChunk(8, 8, alpha = false))).get
    assert(m.variant == "extended")
    assert((m.width, m.height) == (70000, 300)) // u24 canvas: >16383 fine
    assert(m.has_icc && m.has_exif && m.has_animation && !m.has_alpha)
    assert(m.n_frames == 3)
    // an ALPH chunk implies alpha even when the VP8X flag forgot it
    val withAlph = Webp.meta(Webp.extended(10, 10, icc = false, alpha = false,
      exif = false, anim = false, Webp.chunk("ALPH", new Array[Byte](4)),
      Webp.lossyChunk(10, 10))).get
    assert(withAlph.has_alpha)
  }

  test("EXIF chunk reads through the shared TIFF walk; stripMeta redacts") {
    def tiff(orientation: Int, gps: Boolean): Array[Byte] = {
      val n = if (gps) 2 else 1
      val b = new Array[Byte](8 + 2 + n * 12 + 4)
      b(0) = 'I'; b(1) = 'I'; b(2) = 42; b(4) = 8 // LE, magic, IFD@8
      def le16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
      def le32(i: Int, v: Long): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
        b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
      }
      le16(8, n)
      le16(10, 0x0112); le16(12, 3); le32(14, 1); le16(18, orientation)
      if (gps) { le16(22, 0x8825); le16(24, 4); le32(26, 1); le32(30, 0) }
      b
    }
    val img = Webp.losslessChunk(33, 17, alpha = false)
    val withExif = Webp.extended(33, 17, icc = false, alpha = false,
      exif = true, anim = false, img, Webp.chunk("EXIF", tiff(6, gps = true)))
    val m = Webp.exif(withExif).get
    assert(m.orientation == 6 && m.has_gps)
    // the "Exif\0\0"-prefixed variant some writers emit also reads
    val pref = Webp.extended(33, 17, icc = false, alpha = false,
      exif = true, anim = false, img,
      Webp.chunk("EXIF", "Exif".getBytes ++ Array[Byte](0, 0) ++
        tiff(3, gps = false)))
    val mp = Webp.exif(pref).get
    assert(mp.orientation == 3 && !mp.has_gps)
    // strip: EXIF chunk gone, VP8X flag cleared, dims untouched
    val stripped = Webp.stripMeta(withExif)
    assert(Webp.exif(stripped).isEmpty)
    val sm = Webp.meta(stripped).get
    assert(!sm.has_exif)
    assert((sm.width, sm.height) == (33, 17))
    // declared RIFF size stays consistent after the rewrite
    assert(Webp.meta(stripped.take(stripped.length)).isDefined)
    // metadata-free payloads come back reference-equal (no allocation)
    val clean = Webp.container(img)
    assert(Webp.stripMeta(clean) eq clean)
    assert(Webp.exif(clean).isEmpty)
  }

  test("malformed input: None / cut short, never thrown") {
    assert(Webp.meta(null).isEmpty)
    assert(Webp.meta("RIFFxxxxWAVE".getBytes).isEmpty) // a WAV is not a WebP
    assert(Webp.meta("not even riff at all".getBytes).isEmpty)
    val good = Webp.container(Webp.lossyChunk(32, 32))
    // truncations at every length must not throw
    (0 to good.length).foreach(i => Webp.meta(good.take(i)))
    assert(Webp.meta(good.take(19)).isEmpty) // shorter than any header
    // interframe tag (LSB 1) cannot open a still image
    val inter = good.clone()
    inter(20) = 1 // frame-tag byte 0 of the VP8 payload
    assert(Webp.meta(inter).isEmpty)
    // wrong VP8L signature byte
    val l = Webp.container(Webp.losslessChunk(4, 4, alpha = false))
    l(20) = 0x30
    assert(Webp.meta(l).isEmpty)
    // a VP8X whose trailing chunk overruns the container cuts short with
    // the frames counted so far
    val trunc = Webp.extended(5, 5, icc = false, alpha = false,
      exif = false, anim = true, Webp.chunk("ANMF", new Array[Byte](16)))
    val cut = trunc.take(trunc.length - 4)
    assert(Webp.meta(cut).exists(_.variant == "extended"))
  }

  test("sniff dispatch: webp named; heic/avif are NOT mp4") {
    assert(Multimodal.sniffFormat(Webp.container(Webp.lossyChunk(8, 8))) == "webp")
    def ftyp(brand: String): Array[Byte] =
      Array[Byte](0, 0, 0, 16) ++ ("ftyp" + brand).getBytes("US-ASCII") ++
        new Array[Byte](4)
    assert(Multimodal.sniffFormat(ftyp("heic")) == "heic")
    assert(Multimodal.sniffFormat(ftyp("mif1")) == "heic")
    assert(Multimodal.sniffFormat(ftyp("avif")) == "avif")
    assert(Multimodal.sniffFormat(ftyp("avis")) == "avif")
    assert(Multimodal.sniffFormat(ftyp("isom")) == "mp4")
    assert(Multimodal.sniffFormat(ftyp("mp42")) == "mp4")
    // truncated right after 'ftyp' (no brand readable): still mp4 family
    assert(Multimodal.sniffFormat(Array[Byte](0, 0, 0, 16) ++
      "ftyp".getBytes("US-ASCII")) == "mp4")
  }
}
