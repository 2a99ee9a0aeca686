package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** VP8L codec roundtrip certificates: every encoder-reachable decoder
  * stage recovers pixels bit-exactly (lossless by definition — any
  * mismatch is a defect, not noise).
  */
class Vp8lSpec extends AnyFunSuite {

  private def rng(seed: Long): Iterator[Int] = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    Iterator.continually {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      ((x * 2685821657736338717L) >>> 32).toInt
    }
  }

  private def randomImage(w: Int, h: Int, seed: Long, opaque: Boolean = false): Vp8l.Image = {
    val it = rng(seed)
    Vp8l.Image(w, h, Array.fill(w * h) {
      val p = it.next()
      if (opaque) p | 0xFF000000 else p
    })
  }

  test("literal-only roundtrip at assorted sizes") {
    for ((w, h) <- Seq((1, 1), (3, 1), (1, 7), (7, 3), (16, 16), (63, 17))) {
      val img = randomImage(w, h, w * 1000L + h)
      val dec = Vp8l.decode(Vp8l.encode(img, rowCopy = false))
      assert(dec.isDefined, s"decode failed at ${w}x$h")
      assert(dec.get.width == w && dec.get.height == h)
      assert(dec.get.argb.sameElements(img.argb), s"pixels at ${w}x$h")
    }
  }

  test("row-copy LZ77 path: repeated rows roundtrip through backrefs") {
    val w = 23
    val rows = Seq.fill(3)(rng(42L).take(w).toArray)
    // rows: A A B B B C A — repeats exercise length=w, distance=w refs
    val pattern = Seq(0, 0, 1, 1, 1, 2, 0)
    val img = Vp8l.Image(w, pattern.length,
      pattern.flatMap(r => rows(r)).toArray)
    val enc = Vp8l.encode(img, rowCopy = true)
    val encLit = Vp8l.encode(img, rowCopy = false)
    assert(enc.length < encLit.length, "row copies should shrink the stream")
    val dec = Vp8l.decode(enc)
    assert(dec.isDefined && dec.get.argb.sameElements(img.argb))
  }

  test("constant and two-color images use simple codes and roundtrip") {
    val flat = Vp8l.Image(9, 4, Array.fill(36)(0xFF336699))
    assert(Vp8l.decode(Vp8l.encode(flat)).get.argb.sameElements(flat.argb))
    val twoTone = Vp8l.Image(8, 8,
      Array.tabulate(64)(i => if ((i / 8 + i % 8) % 2 == 0) 0xFF000000 else 0xFFFFFFFF))
    assert(Vp8l.decode(Vp8l.encode(twoTone)).get.argb.sameElements(twoTone.argb))
  }

  test("alpha channel is preserved (non-opaque pixels)") {
    val img = randomImage(11, 5, 77L, opaque = false)
    assert(Vp8l.decode(Vp8l.encode(img)).get.argb.sameElements(img.argb))
  }

  test("webp metadata arm agrees with the pixel decoder on dims") {
    val img = randomImage(31, 9, 5L)
    val bytes = Vp8l.encode(img)
    val meta = Webp.meta(bytes)
    assert(meta.isDefined)
    assert(meta.get.width == 31 && meta.get.height == 9)
  }

  test("subtract-green transform roundtrips") {
    val img = randomImage(21, 13, 101L)
    val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(subtractGreen = true)))
    assert(dec.isDefined && dec.get.argb.sameElements(img.argb))
  }

  test("cross-color transform roundtrips (constant multipliers)") {
    val img = randomImage(40, 22, 202L) // spans multiple 16x16 blocks
    val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(colorTransform = true)))
    assert(dec.isDefined && dec.get.argb.sameElements(img.argb))
  }

  test("predictor transform (mode T) roundtrips") {
    val img = randomImage(40, 22, 303L)
    val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(predictorT = true)))
    assert(dec.isDefined && dec.get.argb.sameElements(img.argb))
  }

  test("all three pixel-space transforms stacked roundtrip") {
    val img = randomImage(33, 19, 404L)
    val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(
      subtractGreen = true, colorTransform = true, predictorT = true)))
    assert(dec.isDefined && dec.get.argb.sameElements(img.argb))
  }

  test("palette transform roundtrips at every packing width") {
    // 2 colors → 8 px/byte, 4 → 4, 16 → 2, 200 → unpacked
    for (n <- Seq(2, 4, 16, 200)) {
      val pal = Array.tabulate(n)(k => 0xFF000000 | (k * 1103515245 + 7) & 0xFFFFFF)
      val it = rng(n.toLong)
      val img = Vp8l.Image(37, 11,
        Array.fill(37 * 11)(pal(math.abs(it.next()) % n)))
      val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(palette = true)))
      assert(dec.isDefined, s"palette $n decode failed")
      assert(dec.get.argb.sameElements(img.argb), s"palette $n pixels")
    }
  }

  test("color cache roundtrips (repeated colors hit the cache)") {
    val pal = Array.tabulate(8)(k => 0xFF000000 | (k * 2654435761L).toInt & 0xFFFFFF)
    val it = rng(55L)
    val img = Vp8l.Image(29, 17,
      Array.fill(29 * 17)(pal(math.abs(it.next()) % 8)))
    for (bits <- Seq(1, 4, 8)) {
      val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(cacheBits = bits)))
      assert(dec.isDefined && dec.get.argb.sameElements(img.argb),
        s"cacheBits $bits")
    }
  }

  test("meta prefix-code image (trivial single group) roundtrips") {
    val img = randomImage(35, 14, 606L)
    val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(metaTrivial = true)))
    assert(dec.isDefined && dec.get.argb.sameElements(img.argb))
  }

  test("kitchen sink: transforms + cache + meta + row copies together") {
    val w = 24
    val base = rng(77L).take(w).toArray
    val img = Vp8l.Image(w, 9,
      (0 until 9).flatMap { y =>
        val row: Seq[Int] =
          if (y % 3 == 2) base.toSeq else rng(y * 13L + 1).take(w).toSeq
        row
      }.toArray)
    val dec = Vp8l.decode(Vp8l.encode(img, Vp8l.EncOpts(
      subtractGreen = true, predictorT = true, cacheBits = 5,
      metaTrivial = true)))
    assert(dec.isDefined && dec.get.argb.sameElements(img.argb))
  }

  test("animated WebP: ANMF walk + per-frame VP8L decode + builder roundtrip") {
    val frames = (0 until 4).map(f => randomImage(12, 7, f * 31L + 5))
    val bytes = Webp.buildAnim(12, 7,
      frames.map(img => (0, 0, 33, img)))
    val meta = Webp.meta(bytes)
    assert(meta.exists(m => m.variant == "extended" && m.n_frames == 4))
    val dec = Webp.animFrames(bytes)
    assert(dec.isDefined && dec.get.length == 4)
    dec.get.zip(frames).foreach { case ((no, x, y, dur, img), want) =>
      assert(x == 0 && y == 0 && dur == 33)
      assert(img.argb.sameElements(want.argb), s"frame $no")
    }
    // still (non-animated) webp → None from the anim walk
    assert(Webp.animFrames(Vp8l.encode(frames.head)).isEmpty)
    // truncation/garbage total
    for (cut <- Seq(1, 20, bytes.length / 2)) {
      Webp.animFrames(java.util.Arrays.copyOf(bytes, cut))
    }
  }

  test("animated WebP with LOSSY (VP8) frames decodes since round 15") {
    // hand-build an anim container whose ANMF frames wrap VP8 chunks from
    // the lossy fixture encoder — the path real animated webp from lossy
    // toolchains takes, previously skipped as an envelope
    val w = 32; val h = 16
    def lossyFrameChunk(seed: Int): Array[Byte] = {
      val px = Array.tabulate(w * h * 3)(i => ((i * 7 + seed * 131) % 256).toByte)
      val full = Vp8Enc.encode(Png.Image(w, h, 3, px), 6, 2)
      val (s, e) = Vp8.findVp8Chunk(full).get
      Webp.chunk("VP8 ", java.util.Arrays.copyOfRange(full, s, e))
    }
    val anim = Webp.chunk("ANIM",
      Array[Byte](0, 0, 0, 0xFF.toByte, 0, 0))
    val anmfs = (0 until 3).map { f =>
      val hdr = new Array[Byte](16)
      def le24(off: Int, v: Int): Unit = {
        hdr(off) = (v & 0xFF).toByte
        hdr(off + 1) = ((v >> 8) & 0xFF).toByte
        hdr(off + 2) = ((v >> 16) & 0xFF).toByte
      }
      le24(6, w - 1); le24(9, h - 1); le24(12, 40)
      Webp.chunk("ANMF", hdr ++ lossyFrameChunk(f))
    }
    val bytes = Webp.extended(w, h, icc = false, alpha = false, exif = false,
      anim = true, (anim +: anmfs): _*)
    val dec = Webp.animFrames(bytes)
    assert(dec.isDefined && dec.get.length == 3,
      s"lossy anim frames: ${dec.map(_.length)}")
    dec.get.foreach { case (no, _, _, dur, img) =>
      assert(dur == 40 && img.width == w && img.height == h, s"frame $no")
      // decoded pixels are real (not uniform) and deterministic
      assert(img.argb.distinct.length > 16)
    }
  }

  test("animated lossy+alpha: per-frame ALPH chunk merges into the raster") {
    // an animated lossy+alpha WebP carries an ALPH chunk INSIDE each
    // ANMF, before the VP8 chunk — previously decoded opaque (0xFF)
    val w = 24; val h = 10
    val px = Array.tabulate(w * h * 3)(i => ((i * 13) % 256).toByte)
    val full = Vp8Enc.encode(Png.Image(w, h, 3, px), 6, 2)
    val (s, e) = Vp8.findVp8Chunk(full).get
    val vp8 = Webp.chunk("VP8 ", java.util.Arrays.copyOfRange(full, s, e))
    val alpha = Array.tabulate(w * h)(i => (i * 255 / (w * h - 1)).toByte)
    val alph = Webp.chunk("ALPH", Array[Byte](0) ++ alpha) // raw, no filter
    val hdr = new Array[Byte](16)
    def le24(off: Int, v: Int): Unit = {
      hdr(off) = (v & 0xFF).toByte
      hdr(off + 1) = ((v >> 8) & 0xFF).toByte
      hdr(off + 2) = ((v >> 16) & 0xFF).toByte
    }
    le24(6, w - 1); le24(9, h - 1); le24(12, 25)
    val anim = Webp.chunk("ANIM", Array[Byte](0, 0, 0, 0xFF.toByte, 0, 0))
    val withAlpha = Webp.chunk("ANMF", hdr ++ alph ++ vp8)
    val opaque = Webp.chunk("ANMF", hdr ++ vp8)
    val bytes = Webp.extended(w, h, icc = false, alpha = true, exif = false,
      anim = true, anim, withAlpha, opaque)
    val dec = Webp.animFrames(bytes).get
    assert(dec.length == 2)
    val (_, _, _, _, f0) = dec(0)
    val (_, _, _, _, f1) = dec(1)
    var i = 0
    while (i < w * h) { // frame 0: planted alpha; frame 1: opaque; same color
      assert(((f0.argb(i) >>> 24) & 0xFF) == (alpha(i) & 0xFF), s"alpha at $i")
      assert(((f1.argb(i) >>> 24) & 0xFF) == 0xFF, s"opaque at $i")
      assert((f0.argb(i) & 0xFFFFFF) == (f1.argb(i) & 0xFFFFFF), s"color at $i")
      i += 1
    }
  }

  test("APNG: builder/extractor roundtrip, default-image-as-frame rule") {
    val frames = (0 until 3).map(f => Png.Image(9, 5, 3,
      Array.tabulate(135)(i => ((i * 11 + f * 77) % 256).toByte)))
    val bytes = Apng.build(frames)
    val dec = Apng.frames(bytes)
    assert(dec.isDefined && dec.get.length == 3)
    dec.get.zip(frames).foreach { case ((no, x, y, delay, img), want) =>
      assert(x == 0 && y == 0 && delay == 10)
      assert(img.channels == 3 && img.pixels.sameElements(want.pixels), s"frame $no")
    }
    // a STILL png (no acTL) is not an animation
    assert(Apng.frames(Png.encode(frames.head)).isEmpty)
    // still decodes fine through the single-frame path
    assert(Png.decode(Png.encode(frames.head)).isDefined)
    for (cut <- Seq(1, 30, bytes.length / 2))
      Apng.frames(java.util.Arrays.copyOf(bytes, cut))
  }

  test("hostile bytes: garbage, truncation, bit flips never throw") {
    val valid = Vp8l.encode(randomImage(16, 16, 9L))
    for (cut <- Seq(0, 1, 12, 20, valid.length / 2, valid.length - 1))
      Vp8l.decode(java.util.Arrays.copyOf(valid, cut))
    val it = rng(123L)
    for (_ <- 0 until 50) {
      val b = valid.clone()
      val pos = math.abs(it.next()) % b.length
      b(pos) = (b(pos) ^ (1 << (math.abs(it.next()) % 8))).toByte
      Vp8l.decode(b) // Option-total: may be None, must not throw
    }
    for (n <- Seq(0, 1, 7, 64, 1024)) {
      val g = Array.fill(n)(it.next().toByte)
      Vp8l.decode(g)
    }
  }
}
