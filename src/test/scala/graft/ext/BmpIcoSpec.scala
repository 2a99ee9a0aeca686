package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** BMP/ICO codec certificates: builder-fed decode recovers pixels
  * byte-exactly across bit depths, row orders, and container nesting.
  */
class BmpIcoSpec extends AnyFunSuite {

  private def rgb(w: Int, h: Int, seed: Int): Png.Image =
    Png.Image(w, h, 3, Array.tabulate(w * h * 3)(i => ((i * 31 + seed) % 256).toByte))

  test("24-bit roundtrip, odd width exercises row padding") {
    for ((w, h) <- Seq((1, 1), (11, 7), (16, 4), (3, 9))) {
      val img = rgb(w, h, w * 17 + h)
      val dec = Bmp.decode(Bmp.build(img))
      assert(dec.isDefined, s"${w}x$h")
      assert(dec.get.channels == 3 && dec.get.pixels.sameElements(img.pixels),
        s"${w}x$h pixels")
    }
  }

  test("8-bit gray-palette roundtrip (decoded as 3-channel gray)") {
    val img = Png.Image(13, 5, 1, Array.tabulate(65)(i => (i * 7 % 256).toByte))
    val dec = Bmp.decode(Bmp.build(img))
    assert(dec.isDefined && dec.get.channels == 3)
    for (i <- 0 until 65; c <- 0 until 3)
      assert(dec.get.pixels(i * 3 + c) == img.pixels(i), s"px $i ch $c")
  }

  test("top-down rows decode (negative height)") {
    val img = rgb(6, 4, 3)
    val b = Bmp.build(img)
    // flip to top-down: negate height, reverse the stored row order
    val rowBytes = ((6 * 24 + 31) / 32) * 4
    val dataOff = 54
    val flipped = b.clone()
    val hNeg = -4
    flipped(22) = hNeg.toByte; flipped(23) = (hNeg >> 8).toByte
    flipped(24) = (hNeg >> 16).toByte; flipped(25) = (hNeg >> 24).toByte
    for (y <- 0 until 4)
      System.arraycopy(b, dataOff + rowBytes * (3 - y), flipped,
        dataOff + rowBytes * y, rowBytes)
    val dec = Bmp.decode(flipped)
    assert(dec.isDefined && dec.get.pixels.sameElements(img.pixels))
  }

  test("RLE / bad depth / truncation are None, never a throw") {
    val img = rgb(5, 5, 1)
    val b = Bmp.build(img)
    val rle = b.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(Bmp.decode(rle).isEmpty)
    for (cut <- Seq(1, 20, 53, b.length / 2))
      Bmp.decode(java.util.Arrays.copyOf(b, cut))
    assert(Bmp.decode("BMnope".getBytes("US-ASCII")).isEmpty)
  }

  test("ico: directory walk, largest-entry selection, png decode") {
    val small = Png.Image(8, 8, 1, Array.tabulate(64)(i => (i * 2).toByte))
    val big = Png.Image(16, 16, 1, Array.tabulate(256)(i => (i % 256).toByte))
    val ico = Ico.build(Seq(small, big))
    assert(Multimodal.sniffFormat(ico) == "ico")
    assert(Ico.entries(ico).exists(_.length == 2))
    val dec = Ico.decode(ico)
    assert(dec.isDefined && dec.get.width == 16)
    assert(dec.get.pixels.sameElements(big.pixels))
  }

  test("ico: hostile bytes and truncations are total") {
    val ico = Ico.build(Seq(Png.Image(4, 4, 1, Array.fill(16)(9.toByte))))
    for (cut <- Seq(0, 3, 6, 20, ico.length - 2))
      Ico.decode(java.util.Arrays.copyOf(ico, math.max(1, cut)))
    assert(Ico.decode(Array[Byte](0, 0, 1, 0, 0, 0)).isEmpty) // zero entries
  }

  test("pnm: P5/P6 roundtrip with comment headers; P4 bitmap decode") {
    val gray = Png.Image(9, 4, 1, Array.tabulate(36)(i => (i * 7).toByte))
    assert(Pnm.decode(Pnm.build(gray)).exists(_.pixels.sameElements(gray.pixels)))
    val color = rgb(7, 5, 2)
    assert(Pnm.decode(Pnm.build(color)).exists(_.pixels.sameElements(color.pixels)))
    // hand-built P4: 10x3, row bytes = 2, alternating bits; 1 = black
    val p4 = "P4 10 3 ".getBytes("US-ASCII") ++
      Array[Byte](0xAA.toByte, 0x80.toByte, 0x55, 0x40, 0xFF.toByte, 0xC0.toByte)
    val dec = Pnm.decode(p4)
    assert(dec.isDefined && dec.get.width == 10 && dec.get.channels == 1)
    assert(dec.get.pixels(0) == 0x00)          // bit 1 → black
    assert(dec.get.pixels(1) == 0xFF.toByte)   // bit 0 → white
    assert(dec.get.pixels(20) == 0x00)         // row 3 all black
    assert(Multimodal.sniffFormat(Pnm.build(gray)) == "pnm")
    // truncated raster / absurd dims are None
    assert(Pnm.decode("P6 5 5 255 xx".getBytes("US-ASCII")).isEmpty)
    assert(Pnm.decode("P5 999999999 9 255 ".getBytes("US-ASCII")).isEmpty)
    // the single header/raster separator must BE whitespace — a '#' (or
    // any other byte) there would silently shift the raster otherwise
    val body = Array.fill(4)(0x42.toByte)
    assert(Pnm.decode("P5 2 2 255\n".getBytes("US-ASCII") ++ body).isDefined)
    assert(Pnm.decode("P5 2 2 255#".getBytes("US-ASCII") ++ body).isEmpty)
    assert(Pnm.decode("P5 2 2 255x".getBytes("US-ASCII") ++ body).isEmpty)
  }

  test("decodeAny chains bmp and ico (image dedup seam)") {
    val img = rgb(10, 6, 8)
    assert(Png.decodeAny(Bmp.build(img)).exists(_.pixels.sameElements(img.pixels)))
    val gray = Png.Image(8, 8, 1, Array.tabulate(64)(i => (i * 3).toByte))
    assert(Png.decodeAny(Ico.build(Seq(gray))).exists(_.pixels.sameElements(gray.pixels)))
  }
}
