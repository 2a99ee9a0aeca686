package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class Vp8Spec extends AnyFunSuite {

  private def seedImg(w: Int, h: Int, seed: Int): Png.Image = {
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      px(i * 3) = ((x * 7 + seed * 13) & 0xFF).toByte
      px(i * 3 + 1) = ((y * 11 + seed) & 0xFF).toByte
      px(i * 3 + 2) = ((x * y + seed * 29) & 0xFF).toByte
      i += 1
    }
    Png.Image(w, h, 3, px)
  }

  test("bool encoder -> bool decoder roundtrip, arbitrary probs incl. carry paths") {
    val rng = new scala.util.Random(42)
    val probs = Array.fill(4096)(1 + rng.nextInt(254))
    val bits = Array.fill(4096)(rng.nextInt(2))
    val e = new Vp8Enc.BoolEnc
    var i = 0
    while (i < 4096) { e.bool(probs(i), bits(i)); i += 1 }
    val bytes = e.finish()
    val d = new Vp8.BoolDec(bytes, 0, bytes.length)
    i = 0
    while (i < 4096) {
      assert(d.bool(probs(i)) == bits(i), s"bit $i")
      i += 1
    }
    // high-prob all-ones stream exercises the 255-carry chain
    val e2 = new Vp8Enc.BoolEnc
    i = 0
    while (i < 2000) { e2.bool(254, 1); i += 1 }
    val b2 = e2.finish()
    val d2 = new Vp8.BoolDec(b2, 0, b2.length)
    i = 0
    while (i < 2000) { assert(d2.bool(254) == 1); i += 1 }
  }

  test("encode->decode roundtrip: drift bounded by the quantizer, all mode mixes") {
    for ((w, h, q, i4, budget) <- Seq(
        (32, 32, 4, 0, 6), (32, 32, 12, 3, 8), (33, 17, 8, 1, 8),
        (31, 19, 8, 2, 8), (16, 16, 0, 1, 6), (80, 64, 16, 4, 12))) {
      val src = Vp8Enc.toYuv420(seedImg(w, h, q + i4))
      val webp = Vp8Enc.encodeYuv(src, q, i4)
      val dec = Vp8.decode(webp)
      assert(dec.isDefined, s"${w}x$h q$q i4=$i4")
      val yuv = dec.get
      assert(yuv.width == w && yuv.height == h)
      def maxd(a: Array[Byte], b: Array[Byte]): Int = {
        var m = 0
        var i = 0
        while (i < a.length) { m = math.max(m, math.abs((a(i) & 0xFF) - (b(i) & 0xFF))); i += 1 }
        m
      }
      assert(maxd(yuv.y, src.y) <= budget, s"${w}x$h q$q i4=$i4 Y drift ${maxd(yuv.y, src.y)}")
      assert(maxd(yuv.u, src.u) <= budget, s"${w}x$h q$q i4=$i4 U drift")
      assert(maxd(yuv.v, src.v) <= budget, s"${w}x$h q$q i4=$i4 V drift")
    }
  }

  test("two token partitions by construction (the path libwebp never emits)") {
    val webp = Vp8Enc.encodeYuv(Vp8Enc.toYuv420(seedImg(48, 48, 9)), 8, 3)
    val (s, e) = Vp8.findVp8Chunk(webp).get
    // numParts lives in the bool-coded header; certify structurally via
    // decode success + the fact the sizes table is present: cut the last
    // partition and the image must gate to None instead of throwing
    assert(Vp8.decode(webp).isDefined)
    val cut = java.util.Arrays.copyOf(webp, webp.length - (e - s) / 3)
    Vp8.decode(cut) // must not throw
  }

  test("pixel identity feeds image dedup: same frame re-encoded pairs by content") {
    val img = seedImg(32, 32, 7)
    val a = Vp8Enc.encode(img, 4, 0)
    val b = Vp8Enc.encode(img, 4, 3) // different mode mix, same content
    val pa = Vp8.decode(a).map(Vp8.toPngImage).get
    val pb = Vp8.decode(b).map(Vp8.toPngImage).get
    val ha = Png.aHash(pa)
    val hb = Png.aHash(pb)
    assert(java.lang.Long.bitCount(ha ^ hb) <= 2,
      "re-encodes of the same raster must aHash together")
  }

  test("decodeAny routes lossy WebP through the VP8 arm") {
    val webp = Vp8Enc.encode(seedImg(24, 24, 3), 8, 2)
    val img = Png.decodeAny(webp)
    assert(img.isDefined && img.get.width == 24 && img.get.height == 24)
  }

  test("hostile bytes: garbage, truncations, bit flips, absurd dims gate to None") {
    val rng = new scala.util.Random(7)
    for (len <- Seq(0, 10, 64, 512)) {
      assert(Vp8.decode(Array.fill(len)(rng.nextInt(256).toByte)).isEmpty)
    }
    val good = Vp8Enc.encodeYuv(Vp8Enc.toYuv420(seedImg(32, 32, 1)), 8, 2)
    var cut = 0
    while (cut <= good.length) {
      Vp8.decode(java.util.Arrays.copyOf(good, cut)) // None or Some, never throw
      cut += 7
    }
    for (flip <- 20 until good.length by 13) {
      val bad = good.clone()
      bad(flip) = (bad(flip) ^ 0x5A).toByte
      Vp8.decode(bad)
    }
    // dimension bombs in the uncompressed header
    val bomb = good.clone()
    bomb(26 + 6) = 0xFF.toByte; bomb(26 + 7) = 0x3F.toByte // w = 16383
    bomb(26 + 8) = 0xFF.toByte; bomb(26 + 9) = 0x3F.toByte
    Vp8.decode(bomb) // gates (dims > 8192 rejected), never OOMs
  }

  test("iDCT/fDCT and WHT are inverse-compatible within rounding") {
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val res = Array.fill(16)(rng.nextInt(255) - 127)
      val plane = new Array[Byte](8 * 8)
      // decode path: idctAdd onto zero prediction
      val blk = new Array[Int](16)
      val enc = Vp8EncTestTap.fdct(res)
      var k = 0
      while (k < 16) { blk(k) = enc(k); k += 1 }
      Vp8.idctAddShared(plane, 9, 8, blk)
      k = 0
      while (k < 16) {
        val got = plane(9 + (k >> 2) * 8 + (k & 3)) & 0xFF
        val want = math.max(0, math.min(255, res(k)))
        assert(math.abs(got - want) <= 2, s"fdct/idct pair drift at $k: $got vs $want")
        k += 1
      }
    }
  }

  test("decodeCoeffs eob>first: explicit zero tokens still flag the block") {
    // libwebp GetCoeffs semantics: the nonzero CONTEXT and loop-filter
    // inner gate key on the end-of-block position, not on any nonzero
    // VALUE — a block coded as a pure zero-token run (legal bitstream,
    // never encoder-emitted) must set them. Streams are hand-written
    // with the encoder's BoolEnc over the default probability lattice.
    val probs = Vp8Tables.coefProbs
    val bt = 3 // standalone Y block
    val typeBase = bt * 8 * 3 * 11
    def enc(write: Vp8Enc.BoolEnc => Unit): Vp8.BoolDec = {
      val e = new Vp8Enc.BoolEnc
      write(e)
      val bytes = e.finish()
      new Vp8.BoolDec(bytes, 0, bytes.length)
    }
    def p(n: Int, ctx: Int) = typeBase + (Vp8Tables.bands(n) * 3 + ctx) * 11
    val out = new Array[Int](16)

    // (a) pure zero run to n=16: eob 16 > 0, every value zero
    val zeros = enc { e =>
      e.bool(probs(p(0, 0)), 1) // not-EOB
      e.bool(probs(p(0, 0) + 1), 0) // zero token → ctx 0, EOB suppressed
      var n = 1
      while (n < 16) { e.bool(probs(p(n, 0) + 1), 0); n += 1 }
    }
    java.util.Arrays.fill(out, 0)
    assert(Vp8.decodeCoeffs(zeros, probs, bt, 0, 0, 4, 4, out, 0) == 16)
    assert(out.forall(_ == 0))

    // (b) immediate EOB: eob == first → NOT flagged
    val eob = enc(e => e.bool(probs(p(0, 0)), 0))
    assert(Vp8.decodeCoeffs(eob, probs, bt, 0, 0, 4, 4, out, 0) == 0)

    // (c) zero, +1, EOB: eob 2; the value dequantizes at zigzag(1)
    val mixed = enc { e =>
      e.bool(probs(p(0, 0)), 1)
      e.bool(probs(p(0, 0) + 1), 0) // zero at n=0
      e.bool(probs(p(1, 0) + 1), 1) // nonzero at n=1 (no EOB bit after zero)
      e.bool(probs(p(1, 0) + 2), 0) // |v| = 1
      e.bit(0) // sign +
      e.bool(probs(p(2, 1)), 0) // EOB at n=2, ctx from |v|=1
    }
    java.util.Arrays.fill(out, 0)
    assert(Vp8.decodeCoeffs(mixed, probs, bt, 0, 0, 4, 5, out, 0) == 2)
    assert(out(Vp8Tables.zigzag(1)) == 5 && out.sum == 5)
  }
}

/** Test tap for the encoder's private transforms. */
object Vp8EncTestTap {
  def fdct(res: Array[Int]): Array[Int] = {
    val m = classOf[Vp8Enc.type].getDeclaredMethods.find(_.getName == "fdct").get
    m.setAccessible(true)
    m.invoke(Vp8Enc, res).asInstanceOf[Array[Int]]
  }
}
