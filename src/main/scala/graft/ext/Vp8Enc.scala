package graft.ext

/** Fixture VP8 key-frame ENCODER — the builder-feeds-parser certificate
  * counterpart of [[Vp8]] (same discipline as Png/Flac/Vp8l/Mp3Enc/
  * VorbisEnc): deterministic, minimal, but emits fully valid RFC 6386
  * key-frame bitstreams in a RIFF/WEBP container.
  *
  * Coverage by construction: boolean arithmetic ENCODER with carry
  * propagation, default coefficient probabilities (zero update flags —
  * their bool probs are [[Vp8Tables.coefUpdateProbs]]), per-MB skip
  * flags, BOTH intra families (i16 DC/V/H/TM with Y2 WHT, and B_PRED
  * rotating through all ten 4x4 sub-modes so every predictor and
  * kf_bmode context row is exercised), the forward 4x4 DCT / WHT
  * matched to the inverse transforms, token coding over the band/ctx
  * lattice incl. the category extra-bit ladders, and TWO token
  * partitions (mb-row parity) — the multi-partition decode path that
  * libwebp's encoder never emits (it clamps config.partitions to one).
  *
  * Loop filter level is 0 by design: lossy drift in the certificate
  * then comes from quantization alone, which the roundtrip budget
  * measures. Filtered-path correctness is certified differentially in
  * Vp8InteropSpec against real libwebp streams; Vp8EncSpec additionally
  * pins libwebp's OWN decode of this encoder's output (generated via
  * tools/vp8_enc_groundtruth.py), so the encoder is certified
  * asymmetrically too, not just by its own decoder.
  */
object Vp8Enc {

  // ---------------------------------------------------- bool encoder

  /** RFC 6386 §8 boolean encoder (libvpx boolhuff form). */
  private[ext] final class BoolEnc {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var low = 0L
    private var range = 255
    private var count = -24

    def bool(prob: Int, bit: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { low += split; range -= split }
      else range = split
      var shift = 0
      while (range < 128) { range <<= 1; shift += 1 }
      count += shift
      if (count >= 0) {
        val offset = shift - count
        if (((low << (offset - 1)) & 0x80000000L) != 0) {
          var x = buf.length - 1
          while (buf(x) == 0xFF.toByte) { buf(x) = 0; x -= 1 }
          buf(x) = (buf(x) + 1).toByte
        }
        buf += ((low >> (24 - offset)) & 0xFF).toByte
        low = (low << offset) & 0xFFFFFF
        shift = count
        count -= 8
      }
      low = (low << shift) & 0xFFFFFFFFL
    }
    def bit(b: Int): Unit = bool(128, b)
    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    /** flagged magnitude+sign, mirroring BoolDec.signedOpt. */
    def signedOpt(v: Int, n: Int): Unit =
      if (v == 0) bit(0)
      else { bit(1); literal(math.abs(v), n); bit(if (v < 0) 1 else 0) }
    /** encode a leaf (RFC id, matching BoolDec.tree). */
    def tree(t: Array[Int], p: Array[Int], pOff: Int, leaf: Int): Unit = {
      // find the root-to-leaf bit path by DFS
      def path(node: Int): List[Int] = {
        val l = t(node); val r = t(node + 1)
        if (l == ~leaf) return List(0)
        if (r == ~leaf) return List(1)
        val viaL = if (l >= 0) path(l) else Nil
        if (viaL.nonEmpty) 0 :: viaL
        else {
          val viaR = if (r >= 0) path(r) else Nil
          if (viaR.nonEmpty) 1 :: viaR else Nil
        }
      }
      var node = 0
      path(0).foreach { b =>
        bool(p(pOff + (node >> 1)), b)
        node = t(node + b)
      }
    }
    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bit(0); i += 1 }
      buf.toArray
    }
  }

  // ------------------------------------------------- forward transforms

  /** libvpx short_fdct4x4 (matched to the RFC inverse). */
  private def fdct(res: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = (res(i * 4) + res(i * 4 + 3)) * 8
      val b1 = (res(i * 4 + 1) + res(i * 4 + 2)) * 8
      val c1 = (res(i * 4 + 1) - res(i * 4 + 2)) * 8
      val d1 = (res(i * 4) - res(i * 4 + 3)) * 8
      tmp(i * 4) = a1 + b1
      tmp(i * 4 + 2) = a1 - b1
      tmp(i * 4 + 1) = (c1 * 2217 + d1 * 5352 + 14500) >> 12
      tmp(i * 4 + 3) = (d1 * 2217 - c1 * 5352 + 7500) >> 12
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val a1 = tmp(i) + tmp(12 + i)
      val b1 = tmp(4 + i) + tmp(8 + i)
      val c1 = tmp(4 + i) - tmp(8 + i)
      val d1 = tmp(i) - tmp(12 + i)
      out(i) = (a1 + b1 + 7) >> 4
      out(8 + i) = (a1 - b1 + 7) >> 4
      out(4 + i) = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (if (d1 != 0) 1 else 0)
      out(12 + i) = (d1 * 2217 - c1 * 5352 + 51000) >> 16
      i += 1
    }
    out
  }

  /** libvpx short_walsh4x4 (Y2 forward, matched to the inverse WHT). */
  private def fwht(dcs: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = (dcs(i * 4) + dcs(i * 4 + 2)) << 2
      val d1 = (dcs(i * 4 + 1) + dcs(i * 4 + 3)) << 2
      val c1 = (dcs(i * 4 + 1) - dcs(i * 4 + 3)) << 2
      val b1 = (dcs(i * 4) - dcs(i * 4 + 2)) << 2
      tmp(i * 4) = a1 + d1 + (if (a1 != 0) 1 else 0)
      tmp(i * 4 + 1) = b1 + c1
      tmp(i * 4 + 2) = b1 - c1
      tmp(i * 4 + 3) = a1 - d1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val a1 = tmp(i) + tmp(8 + i)
      val d1 = tmp(4 + i) + tmp(12 + i)
      val c1 = tmp(4 + i) - tmp(12 + i)
      val b1 = tmp(i) - tmp(8 + i)
      var a2 = a1 + d1
      var b2 = b1 + c1
      var c2 = b1 - c1
      var d2 = a1 - d1
      if (a2 < 0) a2 += 1
      if (b2 < 0) b2 += 1
      if (c2 < 0) c2 += 1
      if (d2 < 0) d2 += 1
      out(i) = (a2 + 3) >> 3
      out(4 + i) = (b2 + 3) >> 3
      out(8 + i) = (c2 + 3) >> 3
      out(12 + i) = (d2 + 3) >> 3
      i += 1
    }
    out
  }

  // ------------------------------------------------------ YUV helpers

  /** BT.601 studio-range RGB -> YUV420 (box-averaged chroma). */
  private[graft] def toYuv420(img: Png.Image): Vp8.Yuv = {
    val w = img.width; val h = img.height
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = new Array[Byte](w * h)
    val u = new Array[Byte](cw * ch)
    val v = new Array[Byte](cw * ch)
    val stride = img.channels
    def px(xx: Int, yy: Int, c: Int): Int =
      img.pixels((yy * w + xx) * stride + math.min(c, stride - 1)) & 0xFF
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val r = px(xx, yy, 0); val g = px(xx, yy, 1); val b = px(xx, yy, 2)
        y(yy * w + xx) = (((66 * r + 129 * g + 25 * b + 128) >> 8) + 16).toByte
        xx += 1
      }
      yy += 1
    }
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var sr = 0; var sg = 0; var sb = 0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val xx = cx * 2 + dx; val yy2 = cy * 2 + dy
            if (xx < w && yy2 < h) {
              sr += px(xx, yy2, 0); sg += px(xx, yy2, 1); sb += px(xx, yy2, 2)
              n += 1
            }
            dx += 1
          }
          dy += 1
        }
        val r = sr / n; val g = sg / n; val b = sb / n
        u(cy * cw + cx) = (((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128).toByte
        v(cy * cw + cx) = (((112 * r - 94 * g - 18 * b + 128) >> 8) + 128).toByte
        cx += 1
      }
      cy += 1
    }
    Vp8.Yuv(w, h, y, u, v)
  }

  // ---------------------------------------------------------- encoder

  /** Encode a YUV420 frame as a RIFF/WEBP lossy VP8 key frame.
    *
    * @param qIndex  base quantizer index (0..127); lower = higher fidelity
    * @param i4Every every `i4Every`-th MB (by raster index) is coded
    *                B_PRED with sub-modes rotating over all ten
    *                predictors; 0 disables B_PRED
    */
  def encodeYuv(src: Vp8.Yuv, qIndex: Int = 12, i4Every: Int = 3): Array[Byte] = {
    val w = src.width; val h = src.height
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, "fixture encoder bounds")
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val qi = math.max(0, math.min(127, qIndex))
    val dqY1dc = Vp8Tables.dcQ(qi)
    val dqY1ac = Vp8Tables.acQ(qi)
    val dqY2dc = Vp8Tables.dcQ(qi) * 2
    val dqY2ac = { val v = Vp8Tables.acQ(qi) * 155 / 100; if (v < 8) 8 else v }
    val dqUVdc = math.min(Vp8Tables.dcQ(qi), 132)
    val dqUVac = Vp8Tables.acQ(qi)

    // mb-aligned planes with prediction borders (same canvas layout as
    // the decoder so prediction is bit-identical on both sides)
    val yS = mbW * 16 + 8
    val cS = mbW * 8 + 8
    val yP = new Array[Byte]((mbH * 16 + 1) * yS)
    val uP = new Array[Byte]((mbH * 8 + 1) * cS)
    val vP = new Array[Byte]((mbH * 8 + 1) * cS)
    java.util.Arrays.fill(yP, 0, yS, 127.toByte)
    java.util.Arrays.fill(uP, 0, cS, 127.toByte)
    java.util.Arrays.fill(vP, 0, cS, 127.toByte)
    var r = 1
    while (r < mbH * 16 + 1) { yP(r * yS) = 129.toByte; r += 1 }
    r = 1
    while (r < mbH * 8 + 1) { uP(r * cS) = 129.toByte; vP(r * cS) = 129.toByte; r += 1 }
    // source planes, edge-replicated to MB multiples
    val srcY = padPlane(src.y, w, h, mbW * 16, mbH * 16)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val srcU = padPlane(src.u, cw, ch, mbW * 8, mbH * 8)
    val srcV = padPlane(src.v, cw, ch, mbW * 8, mbH * 8)

    val numParts = 2
    val parts = Array.fill(numParts)(new BoolEnc)
    val hd = new BoolEnc

    // ---- frame header (partition 0, before per-MB records)
    hd.bit(0); hd.bit(0) // color space, clamping
    hd.bit(0) // segmentation off
    hd.bit(0) // filter type normal (level 0 -> no filtering anyway)
    hd.literal(0, 6) // filter level 0
    hd.literal(0, 3) // sharpness
    hd.bit(0) // no lf deltas
    hd.literal(1, 2) // log2(numParts) = 1 -> 2 partitions
    hd.literal(qi, 7)
    hd.bit(0); hd.bit(0); hd.bit(0); hd.bit(0); hd.bit(0) // 5 quant deltas
    hd.bit(1) // refresh entropy probs
    var ui = 0
    while (ui < 1056) { hd.bool(Vp8Tables.coefUpdateProbs(ui), 0); ui += 1 }
    val skipProb = 192
    hd.bit(1) // mb_no_coeff_skip on
    hd.literal(skipProb, 8)

    // per-MB state for token contexts
    val aNzY = new Array[Boolean](4 * mbW)
    val aNzU = new Array[Boolean](2 * mbW)
    val aNzV = new Array[Boolean](2 * mbW)
    val aNzY2 = new Array[Boolean](mbW)
    val aboveB = new Array[Int](4 * mbW)

    // two passes folded into one raster walk: mode decisions + recon are
    // deterministic, so the header (modes/skip) and the token partitions
    // can be written in the same pass
    var mbY = 0
    while (mbY < mbH) {
      val td = parts(mbY % numParts)
      val lNzY = new Array[Boolean](4)
      val lNzU = new Array[Boolean](2)
      val lNzV = new Array[Boolean](2)
      var lNzY2 = false
      val leftB = new Array[Int](4)
      var mbX = 0
      while (mbX < mbW) {
        val mbIdx = mbY * mbW + mbX
        val useI4 = i4Every > 0 && (mbIdx % i4Every) == i4Every - 1
        val yo = (mbY * 16 + 1) * yS + (mbX * 16 + 1)
        val co = (mbY * 8 + 1) * cS + (mbX * 8 + 1)

        // ---------- choose modes + compute residual levels
        val yLevels = Array.ofDim[Int](16, 16) // zigzag-ordered quantized
        val y2Levels = new Array[Int](16)
        val uLevels = Array.ofDim[Int](4, 16)
        val vLevels = Array.ofDim[Int](4, 16)
        var bModes: Array[Int] = null
        var yMode = 0

        if (useI4) {
          yMode = 4
          bModes = Array.tabulate(16)(j => (mbIdx + j) % 10)
          // replicate decoder's top-right scribble so prediction matches
          var rr = 1
          while (rr < 4) {
            var k = 0
            while (k < 4) { yP(yo + (rr * 4 - 1) * yS + 16 + k) = yP(yo - yS + 16 + k); k += 1 }
            rr += 1
          }
          var j = 0
          while (j < 16) {
            val br = j >> 2; val bc = j & 3
            val bo = yo + (br * 4) * yS + bc * 4
            val pred = predictBlock(bModes(j), yP, bo, yS)
            val res = new Array[Int](16)
            var k = 0
            while (k < 16) {
              val sy = (mbY * 16 + br * 4 + (k >> 2)) * (mbW * 16) + mbX * 16 + bc * 4 + (k & 3)
              res(k) = (srcY(sy) & 0xFF) - pred(k)
              k += 1
            }
            val lv = quantize(fdct(res), dqY1dc, dqY1ac, first = 0)
            yLevels(j) = lv
            // reconstruct in canvas exactly as the decoder will
            writeBlock(yP, bo, yS, pred)
            dequantAdd(yP, bo, yS, lv, dqY1dc, dqY1ac)
            j += 1
          }
        } else {
          yMode = ((mbIdx / 2) % 4) // rotate DC/V/H/TM on i16 MBs
          if (mbX == 0 && yMode == 2) yMode = 0
          if (mbY == 0 && yMode == 1) yMode = 0
          val pred16 = predict16Into(yMode, yP, yo, yS, mbX, mbY, 16)
          // per-block fdct; DC terms go through the Y2 WHT
          val dcs = new Array[Int](16)
          val acCoefs = Array.ofDim[Int](16, 16)
          var j = 0
          while (j < 16) {
            val br = j >> 2; val bc = j & 3
            val res = new Array[Int](16)
            var k = 0
            while (k < 16) {
              val sy = (mbY * 16 + br * 4 + (k >> 2)) * (mbW * 16) + mbX * 16 + bc * 4 + (k & 3)
              res(k) = (srcY(sy) & 0xFF) - pred16((br * 4 + (k >> 2)) * 16 + bc * 4 + (k & 3))
              k += 1
            }
            val f = fdct(res)
            dcs(j) = f(0)
            f(0) = 0
            acCoefs(j) = f
            j += 1
          }
          val y2 = fwht(dcs)
          var k = 0
          while (k < 16) {
            val dq = if (k == 0) dqY2dc else dqY2ac
            y2Levels(k) = roundDiv(y2(Vp8Tables.zigzag(k)), dq)
            k += 1
          }
          // reconstruct Y2 -> per-block DC exactly as the decoder
          val y2deq = new Array[Int](25 * 16)
          k = 0
          while (k < 16) {
            y2deq(24 * 16 + Vp8Tables.zigzag(k)) =
              y2Levels(k) * (if (k == 0) dqY2dc else dqY2ac)
            k += 1
          }
          Vp8.iwhtForEncoder(y2deq)
          j = 0
          while (j < 16) {
            yLevels(j) = quantizeAc(acCoefs(j), dqY1ac)
            val br = j >> 2; val bc = j & 3
            val bo = yo + (br * 4) * yS + bc * 4
            writeBlock(yP, bo, yS,
              Array.tabulate(16)(k2 => pred16((br * 4 + (k2 >> 2)) * 16 + bc * 4 + (k2 & 3))))
            // residual block = dequant(levels) with DC from Y2
            val blk = new Array[Int](16)
            var k2 = 1
            while (k2 < 16) {
              blk(Vp8Tables.zigzag(k2)) = yLevels(j)(k2) * dqY1ac
              k2 += 1
            }
            blk(0) = y2deq(j * 16)
            idctAddForEncoder(yP, bo, yS, blk)
            j += 1
          }
        }

        // chroma (DC mode always)
        val uvMode = 0
        val predU = predict16Into(uvMode, uP, co, cS, mbX, mbY, 8)
        val predV = predict16Into(uvMode, vP, co, cS, mbX, mbY, 8)
        var j = 0
        while (j < 4) {
          val br = j >> 1; val bc = j & 1
          val resU = new Array[Int](16)
          val resV = new Array[Int](16)
          var k = 0
          while (k < 16) {
            val sy = (mbY * 8 + br * 4 + (k >> 2)) * (mbW * 8) + mbX * 8 + bc * 4 + (k & 3)
            resU(k) = (srcU(sy) & 0xFF) - predU((br * 4 + (k >> 2)) * 8 + bc * 4 + (k & 3))
            resV(k) = (srcV(sy) & 0xFF) - predV((br * 4 + (k >> 2)) * 8 + bc * 4 + (k & 3))
            k += 1
          }
          uLevels(j) = quantize(fdct(resU), dqUVdc, dqUVac, first = 0)
          vLevels(j) = quantize(fdct(resV), dqUVdc, dqUVac, first = 0)
          val ou = co + (br * 4) * cS + bc * 4
          writeBlock(uP, ou, cS,
            Array.tabulate(16)(k2 => predU((br * 4 + (k2 >> 2)) * 8 + bc * 4 + (k2 & 3))))
          dequantAdd(uP, ou, cS, uLevels(j), dqUVdc, dqUVac)
          writeBlock(vP, ou, cS,
            Array.tabulate(16)(k2 => predV((br * 4 + (k2 >> 2)) * 8 + bc * 4 + (k2 & 3))))
          dequantAdd(vP, ou, cS, vLevels(j), dqUVdc, dqUVac)
          j += 1
        }

        val allZero =
          yLevels.forall(_.forall(_ == 0)) && uLevels.forall(_.forall(_ == 0)) &&
          vLevels.forall(_.forall(_ == 0)) && (useI4 || y2Levels.forall(_ == 0))

        // ---------- header records (partition 0)
        hd.bool(skipProb, if (allZero) 1 else 0)
        hd.tree(Vp8Tables.kfYModeTree, Vp8Tables.kfYModeProbs, 0,
          if (useI4) 4 else yMode)
        if (useI4) {
          var jj = 0
          while (jj < 16) {
            val br2 = jj >> 2; val bc2 = jj & 3
            val a = if (br2 == 0) aboveB(mbX * 4 + bc2) else bModes(jj - 4)
            val l = if (bc2 == 0) leftB(br2) else bModes(jj - 1)
            hd.tree(Vp8Tables.bModeTree, Vp8Tables.kfBModeProbs,
              (a * 10 + l) * 9, bModes(jj))
            jj += 1
          }
          var c2 = 0
          while (c2 < 4) { aboveB(mbX * 4 + c2) = bModes(12 + c2); leftB(c2) = bModes(c2 * 4 + 3); c2 += 1 }
        } else {
          val impl = Array(0, 2, 3, 1)(yMode)
          var c2 = 0
          while (c2 < 4) { aboveB(mbX * 4 + c2) = impl; leftB(c2) = impl; c2 += 1 }
        }
        hd.tree(Vp8Tables.uvModeTree, Vp8Tables.kfUvModeProbs, 0, uvMode)

        // ---------- tokens (partition by mb-row parity)
        if (!allZero) {
          val hasY2 = !useI4
          if (hasY2) {
            val ctx = (if (aNzY2(mbX)) 1 else 0) + (if (lNzY2) 1 else 0)
            val nz = encodeCoeffs(td, 1, 0, ctx, y2Levels)
            aNzY2(mbX) = nz; lNzY2 = nz
          }
          val yType = if (hasY2) 0 else 3
          val first = if (hasY2) 1 else 0
          var jj = 0
          while (jj < 16) {
            val br2 = jj >> 2; val bc2 = jj & 3
            val ctx = (if (aNzY(mbX * 4 + bc2)) 1 else 0) + (if (lNzY(br2)) 1 else 0)
            val nz = encodeCoeffs(td, yType, first, ctx, yLevels(jj))
            aNzY(mbX * 4 + bc2) = nz; lNzY(br2) = nz
            jj += 1
          }
          jj = 0
          while (jj < 4) {
            val br2 = jj >> 1; val bc2 = jj & 1
            val cu = (if (aNzU(mbX * 2 + bc2)) 1 else 0) + (if (lNzU(br2)) 1 else 0)
            val nzu = encodeCoeffs(td, 2, 0, cu, uLevels(jj))
            aNzU(mbX * 2 + bc2) = nzu; lNzU(br2) = nzu
            jj += 1
          }
          jj = 0
          while (jj < 4) {
            val br2 = jj >> 1; val bc2 = jj & 1
            val cv = (if (aNzV(mbX * 2 + bc2)) 1 else 0) + (if (lNzV(br2)) 1 else 0)
            val nzv = encodeCoeffs(td, 2, 0, cv, vLevels(jj))
            aNzV(mbX * 2 + bc2) = nzv; lNzV(br2) = nzv
            jj += 1
          }
        } else {
          var k = 0
          while (k < 4) { aNzY(mbX * 4 + k) = false; lNzY(k) = false; k += 1 }
          k = 0
          while (k < 2) {
            aNzU(mbX * 2 + k) = false; lNzU(k) = false
            aNzV(mbX * 2 + k) = false; lNzV(k) = false
            k += 1
          }
          if (!useI4) { aNzY2(mbX) = false; lNzY2 = false }
        }
        // rightmost-MB above-row extension, as the decoder does
        if (mbX == mbW - 1) {
          val rowEnd = yo + 15 * yS + 15
          var k = 1
          while (k <= 4) { yP(rowEnd + k) = yP(rowEnd); k += 1 }
        }
        mbX += 1
      }
      mbY += 1
    }

    val part0 = hd.finish()
    val partBytes = parts.map(_.finish())
    // uncompressed frame tag + start code + dims
    val tag = part0.length << 5 | (1 << 4) // keyframe(0), version 0, show=1
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag & 0xFF); out.write((tag >> 8) & 0xFF); out.write((tag >> 16) & 0xFF)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xFF); out.write((w >> 8) & 0x3F)
    out.write(h & 0xFF); out.write((h >> 8) & 0x3F)
    out.write(part0, 0, part0.length)
    // partition size table (all but last)
    var pi = 0
    while (pi < numParts - 1) {
      val sz = partBytes(pi).length
      out.write(sz & 0xFF); out.write((sz >> 8) & 0xFF); out.write((sz >> 16) & 0xFF)
      pi += 1
    }
    partBytes.foreach(p => out.write(p, 0, p.length))
    Webp.container(Webp.chunk("VP8 ", out.toByteArray))
  }

  /** Convenience: RGB image through [[toYuv420]]. */
  def encode(img: Png.Image, qIndex: Int = 12, i4Every: Int = 3): Array[Byte] =
    encodeYuv(toYuv420(img), qIndex, i4Every)

  // ------------------------------------------------------ small helpers

  private def padPlane(p: Array[Byte], w: Int, h: Int, pw: Int, ph: Int): Array[Byte] = {
    val out = new Array[Byte](pw * ph)
    var r = 0
    while (r < ph) {
      val sr = math.min(r, h - 1)
      var c = 0
      while (c < pw) {
        out(r * pw + c) = p(sr * w + math.min(c, w - 1))
        c += 1
      }
      r += 1
    }
    out
  }

  private def roundDiv(v: Int, q: Int): Int = {
    val a = math.abs(v)
    val d = (a + q / 2) / q
    val capped = math.min(d, 2047 + 67)
    if (v < 0) -capped else capped
  }

  /** zigzag-order quantized levels from raster coefficients. */
  private def quantize(coefs: Array[Int], dqDc: Int, dqAc: Int, first: Int): Array[Int] = {
    val out = new Array[Int](16)
    var n = first
    while (n < 16) {
      out(n) = roundDiv(coefs(Vp8Tables.zigzag(n)), if (n == 0) dqDc else dqAc)
      n += 1
    }
    out
  }

  private def quantizeAc(coefs: Array[Int], dqAc: Int): Array[Int] = {
    val out = new Array[Int](16)
    var n = 1
    while (n < 16) { out(n) = roundDiv(coefs(Vp8Tables.zigzag(n)), dqAc); n += 1 }
    out
  }

  private def writeBlock(p: Array[Byte], o: Int, s: Int, pred: Array[Int]): Unit = {
    var k = 0
    while (k < 16) { p(o + (k >> 2) * s + (k & 3)) = pred(k).toByte; k += 1 }
  }

  private def dequantAdd(p: Array[Byte], o: Int, s: Int, levels: Array[Int],
      dqDc: Int, dqAc: Int): Unit = {
    val blk = new Array[Int](16)
    var n = 0
    while (n < 16) {
      blk(Vp8Tables.zigzag(n)) = levels(n) * (if (n == 0) dqDc else dqAc)
      n += 1
    }
    idctAddForEncoder(p, o, s, blk)
  }

  private def idctAddForEncoder(p: Array[Byte], o: Int, s: Int, blk: Array[Int]): Unit =
    Vp8.idctAddShared(p, o, s, blk)

  private def predictBlock(mode: Int, p: Array[Byte], o: Int, s: Int): Array[Int] = {
    val P = p(o - s - 1) & 0xFF
    val A = Array.tabulate(8)(i => p(o - s + i) & 0xFF)
    val L = Array.tabulate(4)(i => p(o + i * s - 1) & 0xFF)
    val out = new Array[Int](16)
    Vp8.predictInto(mode, A, L, P, out)
    out
  }

  private def predict16Into(mode: Int, p: Array[Byte], o: Int, s: Int,
      mbX: Int, mbY: Int, n: Int): Array[Int] =
    Vp8.predict16Shared(mode, p, o, s, mbX, mbY, n)

  /** Mirror of the decoder's token emission (see Vp8.decodeCoeffs). */
  private def encodeCoeffs(e: BoolEnc, blockType: Int, first: Int, ctx0: Int,
      levels: Array[Int]): Boolean = {
    val probs = Vp8Tables.coefProbs
    val typeBase = blockType * 8 * 3 * 11
    var lastNz = -1
    var n = first
    while (n < 16) { if (levels(n) != 0) lastNz = n; n += 1 }
    n = first
    var ctx = ctx0
    var prevZero = false
    while (n < 16) {
      val p = typeBase + (Vp8Tables.bands(n) * 3 + ctx) * 11
      if (!prevZero) {
        if (n > lastNz) { e.bool(probs(p), 0); return lastNz >= 0 } // EOB
        e.bool(probs(p), 1)
      }
      val v = levels(n)
      if (v == 0) {
        e.bool(probs(p + 1), 0)
        ctx = 0; prevZero = true
      } else {
        e.bool(probs(p + 1), 1)
        val a = math.abs(v)
        if (a == 1) e.bool(probs(p + 2), 0)
        else {
          e.bool(probs(p + 2), 1)
          if (a <= 4) {
            e.bool(probs(p + 3), 0)
            if (a == 2) e.bool(probs(p + 4), 0)
            else { e.bool(probs(p + 4), 1); e.bool(probs(p + 5), a - 3) }
          } else {
            e.bool(probs(p + 3), 1)
            if (a <= 10) {
              e.bool(probs(p + 6), 0)
              if (a <= 6) { e.bool(probs(p + 7), 0); extra(e, Vp8Tables.cat1, a - 5) }
              else { e.bool(probs(p + 7), 1); extra(e, Vp8Tables.cat2, a - 7) }
            } else {
              e.bool(probs(p + 6), 1)
              if (a <= 34) {
                e.bool(probs(p + 8), 0)
                if (a <= 18) { e.bool(probs(p + 9), 0); extra(e, Vp8Tables.cat3, a - 11) }
                else { e.bool(probs(p + 9), 1); extra(e, Vp8Tables.cat4, a - 19) }
              } else {
                e.bool(probs(p + 8), 1)
                if (a <= 66) { e.bool(probs(p + 10), 0); extra(e, Vp8Tables.cat5, a - 35) }
                else { e.bool(probs(p + 10), 1); extra(e, Vp8Tables.cat6, a - 67) }
              }
            }
          }
        }
        e.bit(if (v < 0) 1 else 0)
        ctx = if (a > 1) 2 else 1
        prevZero = false
      }
      n += 1
    }
    lastNz >= 0
  }

  private def extra(e: BoolEnc, ps: Array[Int], v: Int): Unit = {
    var i = 0
    while (i < ps.length) { e.bool(ps(i), (v >> (ps.length - 1 - i)) & 1); i += 1 }
  }
}
