package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** CCITT G3/G4/MH codec certificates: builder-feeds-parser roundtrips
  * across the scheme × content × geometry matrix, plus strictness
  * (corrupt streams gate to None). Third-party differential
  * certification against libtiff lives in CcittInteropSpec.
  */
class CcittSpec extends AnyFunSuite {

  private def lcg(seed: Long): Iterator[Int] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(s => ((s >>> 33) & 0xFF).toInt)

  /** Deterministic bilevel rasters: text-like (runs), speckle, solid. */
  private def bitmap(w: Int, h: Int, kind: String, seed: Long): Array[Byte] = {
    val bm = new Array[Byte](w * h)
    kind match {
      case "solid-white" => ()
      case "solid-black" => java.util.Arrays.fill(bm, 1.toByte)
      case "speckle" =>
        val r = lcg(seed)
        var i = 0
        while (i < bm.length) { bm(i) = (if (r.next() < 60) 1 else 0).toByte; i += 1 }
      case "runs" => // text-like horizontal runs of varying width
        val r = lcg(seed)
        var y = 0
        while (y < h) {
          var x = 0
          var black = false
          while (x < w) {
            val run = 1 + r.next() % 17
            var k = 0
            while (k < run && x < w) {
              bm(y * w + x) = (if (black) 1 else 0).toByte; x += 1; k += 1
            }
            black = !black
          }
          y += 1
        }
      case "vstripes" =>
        var i = 0
        while (i < bm.length) { bm(i) = ((i % w / 3) & 1).toByte; i += 1 }
    }
    bm
  }

  private val schemes = Seq[(String, Ccitt.Scheme)](
    "mh" -> Ccitt.Mh,
    "g3-1d" -> Ccitt.G3(twoD = false, fill = false),
    "g3-1d-fill" -> Ccitt.G3(twoD = false, fill = true),
    "g3-2d" -> Ccitt.G3(twoD = true, fill = false),
    "g3-2d-fill" -> Ccitt.G3(twoD = true, fill = true),
    "g4" -> Ccitt.G4)

  test("roundtrip matrix: scheme x content x width (incl. non-byte widths)") {
    for {
      (sname, scheme) <- schemes
      kind <- Seq("solid-white", "solid-black", "speckle", "runs", "vstripes")
      (w, h) <- Seq((64, 16), (61, 9), (7, 5), (1, 3), (333, 4))
    } {
      val bm = bitmap(w, h, kind, w * 1000L + h)
      val enc = Ccitt.encode(bm, w, h, scheme)
      val dec = Ccitt.decode(enc, 0, enc.length, w, h, scheme)
      assert(dec.isDefined, s"$sname $kind ${w}x$h: decode failed")
      assert(java.util.Arrays.equals(dec.get, bm), s"$sname $kind ${w}x$h")
    }
  }

  test("very long runs chain 2560 makeups (wide solid + near-solid rows)") {
    for ((sname, scheme) <- schemes; kind <- Seq("solid-white", "solid-black")) {
      val w = 6000; val h = 3
      val bm = bitmap(w, h, kind, 1L)
      bm(2 * w + 5999) = (1 - bm(2 * w + 5999)).toByte // one flipped pixel
      val enc = Ccitt.encode(bm, w, h, scheme)
      val dec = Ccitt.decode(enc, 0, enc.length, w, h, scheme)
      assert(dec.isDefined && java.util.Arrays.equals(dec.get, bm),
        s"$sname $kind wide")
    }
  }

  test("tiff integration: buildBilevel -> decode across compressions") {
    for {
      (comp, t4) <- Seq((2, 0), (3, 0), (3, 1), (3, 5), (4, 0))
      rps <- Seq(1 << 20, 4)
    } {
      val w = 43; val h = 11
      val bm = bitmap(w, h, "runs", comp * 100L + t4)
      val gray = bm.map(v => if (v != 0) 0x00.toByte else 0xFF.toByte)
      val tiff = TiffImg.buildBilevel(Png.Image(w, h, 1, gray), comp, t4, rps)
      val img = TiffImg.decode(tiff)
      assert(img.isDefined, s"comp=$comp t4=$t4 rps=$rps")
      assert(img.get.width == w && img.get.height == h && img.get.channels == 1)
      assert(java.util.Arrays.equals(img.get.pixels, gray),
        s"comp=$comp t4=$t4 rps=$rps pixels")
      // the dedup seam reaches the same raster
      assert(java.util.Arrays.equals(Png.decodeAny(tiff).get.pixels, gray))
    }
  }

  test("strictness: corrupt and truncated streams gate to None") {
    val w = 40; val h = 6
    val bm = bitmap(w, h, "runs", 9L)
    for ((sname, scheme) <- schemes) {
      val enc = Ccitt.encode(bm, w, h, scheme)
      // truncations: must never throw; most must fail (zero-fill at the
      // very tail can still complete a final white run legally)
      var cut = 1
      while (cut < enc.length) {
        Ccitt.decode(enc, 0, cut, w, h, scheme)
        cut += 1
      }
      // bit flips in the first bytes: None or a SAME-SIZE raster, never
      // a throw or a mis-sized one
      for (k <- 0 until math.min(enc.length, 8); bit <- 0 until 8) {
        val bad = enc.clone()
        bad(k) = (bad(k) ^ (1 << bit)).toByte
        Ccitt.decode(bad, 0, bad.length, w, h, scheme)
          .foreach(r => assert(r.length == w * h, s"$sname flip $k/$bit"))
      }
    }
    assert(Ccitt.decode(Array.emptyByteArray, 0, 0, w, h, Ccitt.G4).isEmpty)
    assert(Ccitt.decode(new Array[Byte](3), 0, 3, 0, 5, Ccitt.G4).isEmpty)
  }
}
