package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** TIFF pixel-decode certificates: builder-fed roundtrips across the
  * compression × byte-order × predictor × channel matrix, plus LZW
  * table-growth torture (width changes and the Clear restart).
  */
class TiffImgSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, ch: Int, seed: Int): Png.Image =
    Png.Image(w, h, ch, Array.tabulate(w * h * ch)(i =>
      ((i * 31 + seed * 7) % 256).toByte))

  test("roundtrip matrix: compression x byte order x predictor x channels") {
    for {
      comp <- Seq(1, 5, 32773)
      be <- Seq(false, true)
      pred <- Seq(1, 2)
      ch <- Seq(1, 3, 4)
    } {
      val src = img(13, 9, ch, comp + ch)
      val t = TiffImg.build(src, comp, be, pred, rowsPerStrip = 4)
      val dec = TiffImg.decode(t)
      val tag = s"comp=$comp be=$be pred=$pred ch=$ch"
      assert(dec.isDefined, tag)
      assert(dec.get.width == 13 && dec.get.height == 9 &&
        dec.get.channels == ch, tag)
      assert(dec.get.pixels.sameElements(src.pixels), tag)
    }
  }

  test("lzw: raw codec roundtrip through width growth and clear restart") {
    // enough distinct phrases to push the table past 511/1023/2047/4093
    // (width 9→10→11→12 plus the Clear restart)
    val it = Iterator.iterate(0x12345L)(x => x * 6364136223846793005L + 1442695040888963407L)
    val data = it.take(120000).map(x => ((x >>> 33) & 0xFF).toByte).toArray
    val enc = TiffImg.lzwEncode(data)
    val dec = TiffImg.lzwDecode(enc, 0, enc.length, data.length)
    assert(dec.isDefined && dec.get.sameElements(data))
    // and a highly repetitive stream (deep KwKwK chains)
    val rep = Array.tabulate(50000)(i => ((i / 97) % 7).toByte)
    val enc2 = TiffImg.lzwEncode(rep)
    assert(enc2.length < rep.length / 3, s"lzw should compress: ${enc2.length}")
    val dec2 = TiffImg.lzwDecode(enc2, 0, enc2.length, rep.length)
    assert(dec2.isDefined && dec2.get.sameElements(rep))
  }

  test("packbits: runs, literals, and the 128-boundary") {
    for (data <- Seq(
      Array.fill(300)(7.toByte),
      Array.tabulate(300)(i => i.toByte),
      Array.tabulate(300)(i => if (i % 5 == 0) 1.toByte else (i % 251).toByte))) {
      val enc = TiffImg.packBitsEncode(data)
      val dec = TiffImg.packBitsDecode(enc, 0, enc.length, data.length)
      assert(dec.isDefined && dec.get.sameElements(data))
    }
  }

  test("single-strip and whole-image strips decode") {
    val src = img(7, 5, 3, 2)
    val one = TiffImg.build(src, 1, bigEndian = false, rowsPerStrip = 100)
    assert(TiffImg.decode(one).exists(_.pixels.sameElements(src.pixels)))
  }

  test("decodeAny chains tiff (dedup seam)") {
    val src = img(10, 4, 1, 3)
    val t = TiffImg.build(src, 32773, bigEndian = true)
    assert(Png.decodeAny(t).exists(_.pixels.sameElements(src.pixels)))
  }

  test("hostile: truncation, RLE/garbage bounds, unsupported modes are None") {
    val t = TiffImg.build(img(9, 6, 3, 4), 5, bigEndian = false, predictor = 2)
    for (cut <- Seq(1, 4, 9, t.length / 2, t.length - 2))
      TiffImg.decode(java.util.Arrays.copyOf(t, cut))
    assert(TiffImg.decode("II*".getBytes("US-ASCII")).isEmpty)
    // metadata-only arm keeps working on the pixel-bearing file
    assert(Exif.tiffMeta(t).isDefined)
  }
}
