package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class Mp4Spec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val n = 8 + parts.map(_.length).sum
    be32(n) ++ tpe.getBytes("US-ASCII") ++ parts.flatten
  }
  private val full0 = Array[Byte](0, 0, 0, 0)
  private def ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0))
  private def mvhd(ts: Long, dur: Long) = {
    val p = new Array[Byte](100)
    System.arraycopy(be32(ts), 0, p, 12, 4)
    System.arraycopy(be32(dur), 0, p, 16, 4)
    box("mvhd", p)
  }
  private def mvhdV1(ts: Long, dur: Long) = {
    val p = new Array[Byte](112) // v1: c8 m8 ts4 dur8 + tail 80
    p(0) = 1
    System.arraycopy(be32(ts), 0, p, 20, 4)
    System.arraycopy(be64(dur), 0, p, 24, 8)
    box("mvhd", p)
  }
  private def tkhd(id: Long, w: Int, h: Int) = {
    val p = new Array[Byte](84)
    System.arraycopy(be32(id), 0, p, 12, 4)
    System.arraycopy(be32(w.toLong << 16), 0, p, 76, 4)
    System.arraycopy(be32(h.toLong << 16), 0, p, 80, 4)
    box("tkhd", p)
  }
  private def tkhdV1(id: Long, w: Int, h: Int) = {
    val p = new Array[Byte](96) // v1: c8 m8 id4 res4 dur8 + tail 60
    p(0) = 1
    System.arraycopy(be32(id), 0, p, 20, 4)
    System.arraycopy(be32(w.toLong << 16), 0, p, 88, 4)
    System.arraycopy(be32(h.toLong << 16), 0, p, 92, 4)
    box("tkhd", p)
  }
  private def mdhd(ts: Long, dur: Long) = {
    val p = new Array[Byte](24)
    System.arraycopy(be32(ts), 0, p, 12, 4)
    System.arraycopy(be32(dur), 0, p, 16, 4)
    box("mdhd", p)
  }
  private def mdhdV1(ts: Long, dur: Long) = {
    val p = new Array[Byte](36)
    p(0) = 1
    System.arraycopy(be32(ts), 0, p, 20, 4)
    System.arraycopy(be64(dur), 0, p, 24, 8)
    box("mdhd", p)
  }
  private def hdlr(h: String) =
    box("hdlr", full0, be32(0), h.getBytes("US-ASCII"),
      new Array[Byte](12), Array[Byte](0))
  private def stsd(codec: String) =
    box("stsd", full0, be32(1),
      be32(16), codec.getBytes("US-ASCII"), new Array[Byte](6), be16(1))
  private def stts(n: Long, delta: Long) =
    box("stts", full0, be32(1), be32(n), be32(delta))
  private def stszUniform(sz: Long, n: Long) =
    box("stsz", full0, be32(sz), be32(n))
  private def trak(parts: Array[Byte]*) = box("trak", parts: _*)
  private def mdia(parts: Array[Byte]*) = box("mdia", parts: _*)
  private def stbl(parts: Array[Byte]*) =
    box("minf", box("stbl", parts: _*))

  private def twoTrack: Array[Byte] = {
    val moov = box("moov",
      mvhd(1000, 30000),
      trak(tkhd(1, 320, 240), mdia(mdhd(90000, 90 * 3600), hdlr("vide"),
        stbl(stsd("jpeg"), stts(90, 3600), stszUniform(700, 90)))),
      trak(tkhd(2, 0, 0), mdia(mdhd(48000, 150 * 960), hdlr("soun"),
        stbl(stsd("mp4a"), stts(150, 960), stszUniform(256, 150)))))
    ftyp ++ moov
  }

  test("two-track container: every metadata field lands") {
    val m = Mp4.parse(twoTrack).get
    assert(m.brand == "isom")
    assert(m.timescale == 1000 && m.duration_ms == 30000)
    assert(m.tracks.size == 2)
    val v = m.tracks(0)
    assert(v.track_id == 1 && v.handler == "vide" && v.codec == "jpeg")
    assert(v.width == 320 && v.height == 240)
    assert(v.timescale == 90000 && v.duration_ms == 90 * 3600 * 1000L / 90000)
    assert(v.n_samples == 90 && v.total_bytes == 90L * 700)
    val a = m.tracks(1)
    assert(a.track_id == 2 && a.handler == "soun" && a.codec == "mp4a")
    assert(a.width == 0 && a.height == 0)
    assert(a.n_samples == 150 && a.total_bytes == 150L * 256)
  }

  test("version-1 (64-bit) mvhd/tkhd/mdhd parse identically") {
    val moov = box("moov",
      mvhdV1(1000, 30000),
      trak(tkhdV1(7, 640, 480), mdia(mdhdV1(90000, 90L * 3600), hdlr("vide"),
        stbl(stsd("avc1"), stts(90, 3600), stszUniform(700, 90)))))
    val m = Mp4.parse(ftyp ++ moov).get
    assert(m.timescale == 1000 && m.duration_ms == 30000)
    val t = m.tracks.head
    assert(t.track_id == 7 && t.width == 640 && t.height == 480)
    assert(t.codec == "avc1" && t.timescale == 90000)
  }

  test("largesize (size==1) and to-end (size==0) boxes walk correctly") {
    val moov = box("moov", mvhd(1000, 5000))
    // wrap moov's payload in a largesize header: u32 1 + type + u64 size
    val large = be32(1) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + moov.length - 8) ++ moov.drop(8)
    assert(Mp4.parse(ftyp ++ large).get.duration_ms == 5000)
    // size==0: moov extends to EOF
    val toEnd = be32(0) ++ "moov".getBytes("US-ASCII") ++ moov.drop(8)
    assert(Mp4.parse(ftyp ++ toEnd).get.duration_ms == 5000)
  }

  test("sample layout: multi-run stsc x stco x per-sample stsz") {
    // 5 samples, sizes 10/20/30/40/50; chunks at 1000 and 2000;
    // stsc: chunk 1 holds 3 samples, chunks >= 2 hold 2
    val sizes = Seq(10, 20, 30, 40, 50)
    val stsz = box("stsz", full0, be32(0), be32(5),
      sizes.flatMap(s => be32(s)).toArray)
    val stsc = box("stsc", full0, be32(2),
      be32(1), be32(3), be32(1), be32(2), be32(2), be32(1))
    val stco = box("stco", full0, be32(2), be32(1000), be32(2000))
    val sb = box("stbl", stsz, stsc, stco)
    val b = new Array[Byte](4096)
    System.arraycopy(sb, 0, b, 0, sb.length)
    val layout = Mp4.sampleLayout(b, 8, sb.length)
    assert(layout.toSeq == Seq((1000, 10), (1010, 20), (1030, 30),
      (2000, 40), (2040, 50)))
  }

  test("co64 chunk offsets resolve like stco") {
    val stsz = stszUniform(100, 4)
    val stsc = box("stsc", full0, be32(1), be32(1), be32(2), be32(1))
    val co64 = box("co64", full0, be32(2), be64(300), be64(900))
    val sb = box("stbl", stsz, stsc, co64)
    val b = new Array[Byte](2048)
    System.arraycopy(sb, 0, b, 0, sb.length)
    val layout = Mp4.sampleLayout(b, 8, sb.length)
    assert(layout.toSeq == Seq((300, 100), (400, 100), (900, 100), (1000, 100)))
  }

  test("truncated mdat: layout stops at the first out-of-range sample") {
    val stsz = stszUniform(100, 4)
    val stsc = box("stsc", full0, be32(1), be32(1), be32(4), be32(1))
    val stco = box("stco", full0, be32(1), be32(1000))
    val sb = box("stbl", stsz, stsc, stco)
    val b = new Array[Byte](1250) // room for 2 of the 4 samples
    System.arraycopy(sb, 0, b, 0, sb.length)
    assert(Mp4.sampleLayout(b, 8, sb.length).length == 2)
  }

  test("heif: primary dims resolve through ipma, not first/largest ispe") {
    val h = Mp4.HeifBuild.still("heic", "hvc1", 4032, 3024)
    val m = Mp4.heifMeta(h).get
    assert(m.brand == "heic")
    assert(m.primary_item == 1L)
    assert(m.item_type == "hvc1")
    assert(m.n_items == 2)
    // the fixture's aux ispe is FIRST in ipco and LARGER: only the ipma
    // association lands on the primary's true dims
    assert((m.width, m.height) == (4032, 3024))
    val a = Mp4.heifMeta(Mp4.HeifBuild.still("avif", "av01", 1280, 720)).get
    assert(a.brand == "avif" && a.item_type == "av01")
    assert((a.width, a.height) == (1280, 720))
  }

  test("heif: no ipma falls back to the largest ispe; movies stay None") {
    val h = Mp4.HeifBuild.still("heic", "hvc1", 100, 50, withIpma = false)
    val m = Mp4.heifMeta(h).get
    assert((m.width, m.height) == (200, 100)) // largest (the aux) stands in
    // a movie brand is mp4Meta's territory
    assert(Mp4.heifMeta(ftyp ++ mvhd(1000, 5000)).isEmpty)
    // truncations never throw
    val full = Mp4.HeifBuild.still("heic", "hvc1", 64, 64)
    (0 to full.length by 7).foreach(i => Mp4.heifMeta(full.take(i)))
  }

  test("heif: the Exif item resolves through iloc to the shared TIFF walk") {
    def tiff(orientation: Int, gps: Boolean): Array[Byte] = {
      val n = if (gps) 2 else 1
      val t = new Array[Byte](8 + 2 + n * 12 + 4)
      t(0) = 'I'; t(1) = 'I'; t(2) = 42; t(4) = 8
      def le16(i: Int, v: Int): Unit = { t(i) = v.toByte; t(i + 1) = (v >> 8).toByte }
      def le32(i: Int, v: Long): Unit = {
        t(i) = v.toByte; t(i + 1) = (v >> 8).toByte
        t(i + 2) = (v >> 16).toByte; t(i + 3) = (v >> 24).toByte
      }
      le16(8, n)
      le16(10, 0x0112); le16(12, 3); le32(14, 1); le16(18, orientation)
      if (gps) { le16(22, 0x8825); le16(24, 4); le32(26, 1); le32(30, 0) }
      t
    }
    val h = Mp4.HeifBuild.still("heic", "hvc1", 4032, 3024,
      exifTiff = tiff(8, gps = true))
    val m = Mp4.heifExif(h).get
    assert(m.orientation == 8 && m.has_gps)
    // the image walk still resolves dims alongside the metadata item
    val hm = Mp4.heifMeta(h).get
    assert((hm.width, hm.height) == (4032, 3024))
    assert(hm.n_items == 3)
    // no Exif item → None; truncations never throw
    assert(Mp4.heifExif(Mp4.HeifBuild.still("heic", "hvc1", 8, 8)).isEmpty)
    (0 to h.length by 11).foreach(i => Mp4.heifExif(h.take(i)))
  }

  test("non-MP4 payloads: None, never thrown") {
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4.parse("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Mp4.parse("not an mp4 at all".getBytes).isEmpty)
    assert(Mp4.frames("GIF89a".getBytes, 1).isEmpty)
  }

  test("every truncation of a valid container parses or bails, never throws") {
    val full = twoTrack
    var i = 0
    while (i < full.length) {
      Mp4.parse(full.take(i)) // must not throw
      Mp4.frames(full.take(i), 2)
      i += 7
    }
    // malformed size (smaller than header) stops the walk cleanly
    val bad = ftyp ++ be32(3) ++ "moov".getBytes("US-ASCII")
    assert(Mp4.parse(bad).isEmpty || Mp4.parse(bad).get.tracks.isEmpty)
  }

  test("heif grid: ImageGrid config dims beat the grid item's wrong ispe") {
    val b = Mp4.HeifBuild.grid("heic", 4032, 3024, 2016, 1512)
    val m = Mp4.heifMeta(b).get
    assert(m.item_type == "grid")
    assert(m.n_items == 5)
    assert((m.width, m.height) == (4032, 3024)) // NOT the ispe's 4039x3031
  }

  test("heif grid: zero output dims fall back to cols*tile / rows*tile math") {
    val b = Mp4.HeifBuild.grid("heic", 4032, 3024, 2016, 1512,
      zeroOutputDims = true)
    val m = Mp4.heifMeta(b).get
    assert((m.width, m.height) == (4032, 3024))
  }

  test("heif grid: damaged config keeps the ispe path (cut-short)") {
    val good = Mp4.HeifBuild.grid("heic", 4032, 3024, 2016, 1512)
    // corrupt rows_minus_one inside the idat payload (idat is the last
    // box: 8-byte header + 8-byte ImageGrid): rows*cols no longer
    // matches the 4 dimg tile refs, so the config is untrusted and the
    // grid item's associated ispe stands
    val bad = good.clone()
    bad(good.length - 8 + 2) = 4 // rows = 5
    val m = Mp4.heifMeta(bad).get
    assert(m.item_type == "grid")
    assert((m.width, m.height) == (4039, 3031)) // the associated ispe stands
    // every truncation parses or bails, never throws
    (1 to good.length by 7).foreach { k =>
      Mp4.heifMeta(java.util.Arrays.copyOf(good, good.length - k))
    }
  }
}
