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

  // CPython Lib/test/imghdrdata/python.tiff — 1326 bytes, byte-pinned:
  // a REAL third-party TIFF (16x16 uncompressed little-endian RGBA,
  // ExtraSamples=2) that must decode through TiffImg forever. The same
  // shape as Vp8lInteropSpec's python.webp pin.
  private val pythonTiffHex: String =
    "49492a0008040000000000000000000000000000000000004e8dc0af4a86baed4883b4ff" +
    "447eadff4078a7ff3c719ef7376896920000000b00000003000000000000000000000000" +
    "000000000000000000000000000000004c8abcffffffffff457fafff4179a8ff3e74a2ff" +
    "3a6f9bff366994ff000000280000000b0000000000000000000000000000000000000000" +
    "00000000000000004985b7ff4680b1ff427baaff3e75a3ff3b709dff376a96ff366994ff" +
    "0000004100000015000000000000000000000000000000004e8fc47e4c8abfa04885b6a1" +
    "437dada33d74a1a7396c96aa366690aa386c97ff366994ff366994ff0000004800000018" +
    "0000000000000000000000005291c6bd4f8dc1ff4b88bbff4883b4ff447dadff4078a6ff" +
    "3d73a0ff396d99ff366994ff366994ff366994ff00000048ffe255fffddd4af7f9d53e82" +
    "0000000a508fc3ff4c89bcff4884b5ff457fafff4179a8ff3d74a1ff3a6f9bff366994ff" +
    "366994ff366994ff326087b600000043ffde4bffffda41fffdd536ed000000244d8bbeff" +
    "4985b7ff4680b0ff427baaff3e75a3ff3b709cff376a96ff366994ff356892f7326087b6" +
    "0000004fecce4588ffda42ffffd637ffffd32dff0000003d4a87b9ff4781b2ff437cabff" +
    "3f76a5ff366993b61b31455c0000004c000000480000004700000041e2c3456bfdd941f7" +
    "ffd738ffffd32dffffcf23ff000000464681b2f7447dadff4078a6ff366791aa0000004e" +
    "f2e16ea6fde96af7ffe661ffffe357ffffdf4dffffdb42ffffd738ffffd32effffcf24ff" +
    "fdcb1bf700000047437daed74179a8ff3d74a1ff1c324b5bf5e36fb3ffeb6cffffe761ff" +
    "ffe357ffffdf4dffffdb43ffffd739ffffd32effffcf24ffffcc1cfff3c11ac200000041" +
    "4075a36f3d73a2f73a709cff0000004bffeb6cffffe762ffffe358ffffdf4effffdb43ff" +
    "ffd739ffffd32fffffcf24ffffcc1cffffcc1cffc29a127a000000340000000800000021" +
    "0000003c00000035ffe762ffffe358ffffdf4effe8c73daaebc534a9ebc22aa9ebbe21a9" +
    "ebbb18a9ebbb18a9c69b1279000000410000002000000002000000090000001300000012" +
    "ffe358ffffdf4effffdb44ffffd73affffd330ffffd025ffffcc1cff0000004100000035" +
    "0000002c0000001e0000000b00000000000000000000000000000000fdde4ef7ffdb44ff" +
    "ffd83affffd430ffffd026fffffffffffdcb1bf7000000400000001c0000000900000005" +
    "0000000100000000000000000000000000000000f1d03f4cfad339ccfdd22ff7ffd026ff" +
    "ffcc1cfffac719d8c097127b0000003b0000001200000000000000000000000000000000" +
    "000000000000000000000000000000080000001d00000035000000420000004700000045" +
    "000000380000001f00000008000000000000000000000000110000010300010000001000" +
    "00000101030001000000100000000201030004000000da04000003010300010000000100" +
    "00000601030001000000020000000a01030001000000010000000d0102000c0000002205" +
    "000011010400010000000800000012010300010000000100000015010300010000000400" +
    "00001601030001000000800000001701040001000000000400001c010300010000000100" +
    "00002901030002000000000001003e01050002000000120500003f01050006000000e204" +
    "0000520103000100000002000000000000000800080008000800000ad7a3ffffffff80e1" +
    "7a54ffffffff00cdcc4cffffffff009a9999ffffffff80666626fffffffff0285c0fffff" +
    "ffff801b0d50ffffffff00583954ffffffff707974686f6e2e7469666600"

  test("pinned third-party artifact (python.tiff) decodes byte-for-byte") {
    val bytes = pythonTiffHex.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(bytes.length == 1326)
    // when the public on-disk copy is present, the pin must equal it
    val onDisk = new java.io.File(
      "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata/python.tiff")
    if (onDisk.isFile) {
      val disk = java.nio.file.Files.readAllBytes(onDisk.toPath)
      assert(java.util.Arrays.equals(bytes, disk), "pin != on-disk artifact")
    }
    val img = TiffImg.decode(bytes).get
    assert(img.width == 16 && img.height == 16 && img.channels == 4)
    assert(Png.pixelChecksum(img) == 6369931L)
    // the dedup seam reaches the same raster
    val any = Png.decodeAny(bytes).get
    assert(java.util.Arrays.equals(any.pixels, img.pixels))
    // and the metadata arm agrees on the declared geometry
    val meta = Exif.tiffMeta(bytes)
    assert(meta.isDefined)
  }
}
