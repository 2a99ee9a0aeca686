package graft.ext

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** JDK-encode a BufferedImage as baseline JPEG at the given quality. */
  private def jdkEncode(bi: java.awt.image.BufferedImage, q: Float,
      progressive: Boolean = false): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def jdkDecode(b: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))

  test("solid DCT-aligned gray blocks roundtrip exactly (the certificate invariant)") {
    for (id <- Seq(0L, 7L, 123L, 255L)) {
      val bi = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val blk = (y / 8) * 2 + (x / 8)
        val g = ((id * 7 + 13 + 29 * blk) % 256).toInt
        bi.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val got = Jpeg.decode(jdkEncode(bi, 1.0f))
      assert(got.isDefined, s"id=$id")
      val img = got.get
      assert(img.width == 16 && img.height == 16 && img.channels == 3)
      for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3) {
        val blk = (y / 8) * 2 + (x / 8)
        val g = ((id * 7 + 13 + 29 * blk) % 256).toInt
        assert((img.pixels((y * 16 + x) * 3 + c) & 0xFF) == g,
          s"id=$id ($x,$y,$c)")
      }
    }
  }

  test("random grayscale image: pure codec within ±1 of ImageIO on the same file") {
    val (w, h) = (37, 23) // non-multiple of 8: exercises edge-block cropping
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = rng(42)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, r.nextInt(256))
    val enc = jdkEncode(bi, 0.9f)
    val got = Jpeg.decode(enc)
    assert(got.isDefined)
    val img = got.get
    assert(img.width == w && img.height == h && img.channels == 1)
    val ref = jdkDecode(enc)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = img.pixels(y * w + x) & 0xFF
      val b = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 1, s"IDCT disagreement beyond compliance bound: $maxDiff")
  }

  test("random-luma flat-chroma color image: within ±2 of ImageIO (subsampling-neutral)") {
    val (w, h) = (40, 24)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val r = rng(7)
    for (y <- 0 until h; x <- 0 until w) {
      val g = r.nextInt(256) // R=G=B → Cb=Cr=128 everywhere: box vs fancy
      bi.setRGB(x, y, (g << 16) | (g << 8) | g) // upsampling can't diverge
    }
    val enc = jdkEncode(bi, 0.95f)
    val got = Jpeg.decode(enc)
    assert(got.isDefined)
    val img = got.get
    assert(img.width == w && img.height == h && img.channels == 3)
    val ref = jdkDecode(enc)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val a = img.pixels((y * w + x) * 3 + c) & 0xFF
      val rgb = ref.getRGB(x, y)
      val b = (rgb >> (16 - 8 * c)) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 2, s"color path disagreement: $maxDiff")
  }

  test("solid color image roundtrips within ±1 of the original at q=1.0") {
    val (w, h) = (32, 16)
    for ((rr, gg, bb) <- Seq((200, 30, 90), (0, 0, 0), (255, 255, 255), (17, 200, 64))) {
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
      val img = Jpeg.decode(jdkEncode(bi, 1.0f)).get
      for (c <- 0 until 3) {
        val want = Seq(rr, gg, bb)(c)
        val a = img.pixels(c) & 0xFF
        assert(math.abs(a - want) <= 1, s"solid ($rr,$gg,$bb) ch=$c got=$a")
      }
    }
  }

  test("progressive grayscale decodes within ±1 of ImageIO (Annex G scans)") {
    val (w, h) = (41, 27) // ragged: edge blocks + multi-scan bands
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = rng(99)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, r.nextInt(256))
    val enc = jdkEncode(bi, 0.9f, progressive = true)
    val got = Jpeg.decode(enc)
    assert(got.isDefined, "progressive grayscale must decode in the pure codec")
    val img = got.get
    assert(img.width == w && img.height == h && img.channels == 1)
    val ref = jdkDecode(enc)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs((img.pixels(y * w + x) & 0xFF) - ref.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 1, s"progressive disagreement: $maxDiff")
  }

  test("progressive color (luma-random flat-chroma) decodes within ±2 of ImageIO") {
    val (w, h) = (40, 24)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val r = rng(123)
    for (y <- 0 until h; x <- 0 until w) {
      val g = r.nextInt(256)
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val enc = jdkEncode(bi, 0.85f, progressive = true)
    val got = Jpeg.decode(enc)
    assert(got.isDefined, "progressive color must decode in the pure codec")
    val img = got.get
    assert(img.width == w && img.height == h && img.channels == 3)
    val ref = jdkDecode(enc)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val a = img.pixels((y * w + x) * 3 + c) & 0xFF
      val b2 = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(a - b2))
    }
    assert(maxDiff <= 2, s"progressive color disagreement: $maxDiff")
  }

  test("progressive solid DCT-aligned gray blocks roundtrip exactly") {
    val bi = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val g = Seq(40, 130, 200, 250)((y / 8) * 2 + (x / 8))
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val enc = jdkEncode(bi, 1.0f, progressive = true)
    val img = Jpeg.decode(enc).get
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3) {
      val want = Seq(40, 130, 200, 250)((y / 8) * 2 + (x / 8))
      assert((img.pixels((y * 16 + x) * 3 + c) & 0xFF) == want, s"($x,$y,$c)")
    }
  }

  test("corrupt and truncated payloads are rejected, never half-read") {
    val bi = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = rng(5)
    for (y <- 0 until 16; x <- 0 until 16) bi.getRaster.setSample(x, y, 0, r.nextInt(256))
    val good = jdkEncode(bi, 0.9f)
    assert(Jpeg.decode(good).isDefined)
    assert(Jpeg.decode(good.take(20)).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    val noSos = good.take(good.indexOfSlice(Seq(0xFF.toByte, 0xDA.toByte)))
    assert(Jpeg.decode(noSos).isEmpty, "no scan → None")
    // segment length pointing past the buffer
    val bad = good.clone()
    val sofAt = bad.indexOfSlice(Seq(0xFF.toByte, 0xC0.toByte))
    bad(sofAt + 2) = 0x7F
    assert(Jpeg.decode(bad).isEmpty)
  }

  // ------------------------------------------------------------------
  // Hand-rolled minimal baseline encoder: grayscale solid 8×8 blocks,
  // custom Huffman tables, restart markers — an independent construction
  // (the PngSpec buildPng discipline) that exercises DRI/RSTn and DHT
  // paths the JDK writer doesn't produce on demand.
  // ------------------------------------------------------------------

  /** Encode a grayscale image of solid 8×8 blocks (values per block,
    * row-major) as baseline JPEG with the given restart interval.
    * Quant table all-ones; custom DC table (12 five-bit codes), custom
    * AC table (single one-bit EOB code).
    */
  private def encodeSolidBlocks(blocks: Array[Int], bw: Int, bh: Int,
      restartInterval: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit, table 0
    for (_ <- 0 until 64) u8(1)
    marker(0xC0); u16(2 + 6 + 3); u8(8) // SOF0: 8-bit precision
    u16(bh * 8); u16(bw * 8); u8(1) // 1 component
    u8(1); u8(0x11); u8(0) // id 1, h=v=1, quant 0
    // DHT DC table 0: twelve 5-bit codes for categories 0..11
    marker(0xC4); u16(2 + 1 + 16 + 12); u8(0x00)
    for (l <- 1 to 16) u8(if (l == 5) 12 else 0)
    for (v <- 0 to 11) u8(v)
    // DHT AC table 0: one 1-bit code: EOB
    marker(0xC4); u16(2 + 1 + 16 + 1); u8(0x10)
    for (l <- 1 to 16) u8(if (l == 1) 1 else 0)
    u8(0x00)
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    marker(0xDA); u16(2 + 1 + 2 + 3); u8(1) // SOS
    u8(1); u8(0x00) // component 1 → DC 0 / AC 0
    u8(0); u8(63); u8(0) // Ss/Se/AhAl
    // entropy-coded data with byte stuffing
    var acc = 0; var nAcc = 0
    val ent = new ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1); nAcc += 1
        if (nAcc == 8) {
          ent.write(acc); if (acc == 0xFF) ent.write(0x00)
          acc = 0; nAcc = 0
        }
        k -= 1
      }
    }
    def flushAlign(): Unit = if (nAcc > 0) {
      acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1) // pad with 1s
      ent.write(acc); if ((acc & 0xFF) == 0xFF) ent.write(0x00)
      acc = 0; nAcc = 0
    }
    var pred = 0
    var rst = 0
    for (m <- blocks.indices) {
      if (restartInterval > 0 && m > 0 && m % restartInterval == 0) {
        flushAlign()
        ent.write(0xFF); ent.write(0xD0 + (rst % 8))
        rst += 1; pred = 0
      }
      // forward DCT of a flat block at value v: DC = 8(v-128), AC = 0
      val dc = 8 * (blocks(m) - 128)
      val diff = dc - pred
      pred = dc
      val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff)) // category
      putBits(t, 5) // DC code: category c encodes as value c in 5 bits
      if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      putBits(0, 1) // EOB (AC table's single 1-bit code 0)
    }
    flushAlign()
    out.write(ent.toByteArray)
    marker(0xD9) // EOI
    out.toByteArray
  }

  test("hand-built baseline JPEG with custom tables and restart markers decodes exactly") {
    val (bw, bh) = (4, 3)
    val r = rng(2024)
    val blocks = Array.fill(bw * bh)(r.nextInt(256))
    for (dri <- Seq(0, 1, 2, 5)) {
      val enc = encodeSolidBlocks(blocks, bw, bh, dri)
      // sanity: the JDK reader agrees the construction is valid JPEG
      val ref = jdkDecode(enc)
      assert(ref != null && ref.getWidth == bw * 8, s"dri=$dri")
      val got = Jpeg.decode(enc)
      assert(got.isDefined, s"dri=$dri")
      val img = got.get
      assert(img.width == bw * 8 && img.height == bh * 8 && img.channels == 1)
      for (y <- 0 until bh * 8; x <- 0 until bw * 8) {
        val want = blocks((y / 8) * bw + (x / 8))
        assert((img.pixels(y * bw * 8 + x) & 0xFF) == want,
          s"dri=$dri ($x,$y): got ${img.pixels(y * bw * 8 + x) & 0xFF} want $want")
        assert(ref.getRaster.getSample(x, y, 0) == want, s"jdk dri=$dri ($x,$y)")
      }
    }
  }

  test("wrong restart marker sequence is rejected") {
    val blocks = Array.fill(8)(77)
    val enc = encodeSolidBlocks(blocks, 4, 2, 2)
    // find the first RST0 (0xFFD0) in the entropy stream and break its index
    var i = 2
    var found = -1
    while (found < 0 && i + 1 < enc.length) {
      if ((enc(i) & 0xFF) == 0xFF && (enc(i + 1) & 0xFF) == 0xD0) found = i
      i += 1
    }
    assert(found > 0)
    val bad = enc.clone()
    bad(found + 1) = 0xD5.toByte // out-of-sequence RST5
    assert(Jpeg.decode(bad).isEmpty)
  }
}
