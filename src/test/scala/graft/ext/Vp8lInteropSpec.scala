package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** External-artifact interop certificate for the VP8L entropy decoder.
  *
  * Every other VP8L test round-trips through the in-repo fixture encoder,
  * which cannot catch a symmetric spec violation (encoder and decoder
  * sharing the same mistake — exactly the cache-info/meta-prefix field
  * ORDER swap found in round 13's review). This spec decodes a stream
  * produced by a REAL third-party libwebp encoder, so the field order,
  * prefix-code conventions, transform layout, and LZ77 plane codes are
  * certified against an independent implementation of the public spec.
  *
  * The artifact is the 16x16 Python-logo favicon WebP that ships as
  * public test data in CPython (Lib/test/test_email/data/python.webp,
  * PSF-licensed; identical bytes in Lib/test/imghdrdata/), byte-pinned
  * here. It is a VP8X container whose ALPH chunk uses compression
  * method 1 — i.e. its alpha plane is a HEADERLESS VP8L stream encoded
  * by libwebp itself ("Lavf"/libwebp toolchain), decoded through
  * [[Vp8l.decodeHeaderless]] / [[Webp.alphaPlane]]. The lossy VP8 color
  * chunk of the SAME artifact pixel-decodes through [[Vp8]] since round
  * 15, pinned against libwebp's own WebPDecodeYUV in Vp8InteropSpec.
  */
class Vp8lInteropSpec extends AnyFunSuite {

  // CPython Lib/test/test_email/data/python.webp — 432 bytes, byte-pinned.
  private val pythonWebpHex: String =
    "52494646a801000057454250565038580a000000100000000f00000f0000414c5048c3000000" +
      "0127a2a89124e57ae7185fe7df2a998898ff74718de02630e2e18b7732c8c1115c832b30e8b0" +
      "78158e785135c1080c024f92a06ab055191cd6b66d462f4ec6763cb6ed77fbaf29ae21a2ff49" +
      "d1fd8f90f7ba4449241b3a259134f3146d0ec7d3e51620f40b14be90e183b71a329e36827f1d" +
      "297e4e7608fb889eb391ef997346e83282dbf8cc48b2f745307d20fd36178c2132562da5d66b" +
      "23bc5de3a55915d59c81a4d96e96758a18310f8aaa2c5034fa3082dfba6b505229b52dcfe954" +
      "140a0100000056503820be0000009002009d012a1000100003003425b00274304f08850c7c03" +
      "1d082cfde800fefd74a0fd029b1f8af7437c9c37f6d20cafd3ff3568e2eea7bdc96f1bf4aac5" +
      "63aeba9f9784df41a23bda5be4eff8cbf1bd7fe1affa3fe509ecf4bb665fffaa29d97fc96ce7" +
      "86e6ac97b9e4c6f493238c5fdd8f3955207f954ffc39f8ff6fd26b03e89fbc8398666db1d513" +
      "ff7617e6b1fe5d8ae49f47bfb3fabffe1d1df3128ffe5ccfc1faf918c3bdcfcf1f9139a001fd" +
      "9a014b312cdebcd97baaac000000"

  private def fromHex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val bytes = fromHex(pythonWebpHex)

  test("the pinned artifact parses as VP8X + lossless-coded ALPH") {
    val m = Webp.meta(bytes)
    assert(m.isDefined)
    assert(m.get.variant == "extended")
    assert(m.get.width == 16 && m.get.height == 16)
    assert(m.get.has_alpha)
    // ALPH chunk header byte: compression method 1 = VP8L-coded
    val alphOff = 12 + 8 + 10 + 8 // RIFF hdr + VP8X chunk + ALPH chunk hdr
    assert(new String(bytes, alphOff - 8, 4, "US-ASCII") == "ALPH")
    assert((bytes(alphOff) & 3) == 1, "alpha plane must be lossless-coded")
  }

  test("real libwebp alpha stream decodes through the headerless VP8L path") {
    val out = Webp.alphaPlane(bytes)
    assert(out.isDefined, "libwebp-encoded VP8L alpha stream failed to decode")
    val (w, h, a) = out.get
    assert(w == 16 && h == 16)
    // the favicon has transparent corners and an opaque glyph body
    assert(a.exists(b => (b & 0xFF) == 0), "expected fully-transparent pixels")
    assert(a.exists(b => (b & 0xFF) == 255), "expected fully-opaque pixels")
    assert((a(0) & 0xFF) < 32, "top-left corner should be transparent")
    // value-pin the decoded plane so any future decoder drift is loud
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val sha = md.digest(a).map("%02x".format(_)).mkString
    assert(sha == PinnedAlphaSha, s"decoded alpha plane drifted: $sha")
  }

  // An independent LSB-first bit writer so the hand-constructed streams
  // below share no code with Vp8l's encoder (symmetric-bug isolation).
  private final class Bits {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def bit(v: Int): this.type = {
      cur |= (v & 1) << n; n += 1
      if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
      this
    }
    def bits(v: Int, len: Int): this.type = {
      var i = 0; while (i < len) { bit((v >> i) & 1); i += 1 }; this
    }
    /** prefix-code bits, MSB first (DEFLATE canonical convention). */
    def code(c: Int, len: Int): this.type = {
      var i = len - 1; while (i >= 0) { bit((c >> i) & 1); i -= 1 }; this
    }
    def result(): Array[Byte] =
      (if (n > 0) out :+ cur.toByte else out).toArray
  }

  /** Hand-build a headerless 2x1 stream per the RFC 9649 ABNF with the
    * color cache ENABLED: pixel0 a green-0x42 literal, pixel1 a cache
    * hit of pixel0. `cacheFirst` selects the field order — true is the
    * spec's (color-cache-info before meta-prefix), false reproduces the
    * round-13 swap. Everything below is transcribed from the ABNF, not
    * from the repo encoder.
    */
  private def cacheStream(cacheFirst: Boolean): Array[Byte] = {
    val px = 0xFF004200 // a=FF r=0 g=0x42 b=0
    val cacheBits = 2
    val cacheIdx = ((0x1e35a7bd * px) >>> (32 - cacheBits)).toInt
    val cacheSym = 256 + 24 + cacheIdx // green-code symbol for the hit
    val b = new Bits
    b.bit(0) // no transforms
    if (cacheFirst) { b.bit(1).bits(cacheBits, 4); b.bit(0) } // cache, meta
    else { b.bit(0); b.bit(1).bits(cacheBits, 4) } // r13 swap: meta, cache
    // GREEN code, normal form: lengths(0x42)=1, lengths(cacheSym)=1, rest 0.
    b.bit(0) // normal (code-length-coded) form
    b.bits(0, 4) // num_code_lengths = 4: clc order slots 17, 18, 0, 1
    // clc lengths: {17:2, 18:2, 0:2, 1:2} -> canonical 0=00 1=01 17=10 18=11
    b.bits(2, 3).bits(2, 3).bits(2, 3).bits(2, 3)
    b.bit(0) // no explicit max_symbol
    def zeros(n0: Int): Unit = { // zero-length runs via clc 17/18
      var n = n0
      while (n >= 11) { val take = math.min(n, 138); b.code(3, 2).bits(take - 11, 7); n -= take }
      while (n >= 3) { val take = math.min(n, 10); b.code(2, 2).bits(take - 3, 3); n -= take }
      var i = 0; while (i < n) { b.code(0, 2); i += 1 }
    }
    zeros(0x42) // symbols 0 .. 0x41
    b.code(1, 2) // length 1 at symbol 0x42
    zeros(cacheSym - 0x42 - 1)
    b.code(1, 2) // length 1 at cacheSym
    zeros(256 + 24 + (1 << cacheBits) - cacheSym - 1)
    // RED / BLUE / ALPHA / DISTANCE codes: simple form, single symbol
    def single(sym: Int): Unit = {
      b.bit(1) // simple
      b.bit(0) // one symbol
      if (sym < 2) { b.bit(0); b.bit(sym) } else { b.bit(1); b.bits(sym, 8) }
    }
    single(0x00) // red
    single(0x00) // blue
    single(0xFF) // alpha
    single(0)    // distance (unused)
    // data: pixel0 literal (green 0x42 = canonical code 0 of length 1;
    // red/blue/alpha are zero-bit single-symbol codes), pixel1 cache hit
    b.code(0, 1) // green literal 0x42
    b.code(1, 1) // cacheSym (canonically after 0x42, same length)
    b.result()
  }

  test("spec-derived cache-enabled stream decodes; the r13 field-order swap does not") {
    val good = Vp8l.decodeHeaderless(cacheStream(cacheFirst = true), 2, 1)
    assert(good.isDefined, "spec-ordered cache stream must decode")
    assert(good.get.argb.sameElements(Array(0xFF004200, 0xFF004200)))
    // the same stream written meta-prefix-first (the round-13 bug order)
    // must NOT decode to the same pixels — this pins the field order so a
    // symmetric encoder+decoder swap can never pass again
    val swapped = Vp8l.decodeHeaderless(cacheStream(cacheFirst = false), 2, 1)
    assert(
      swapped.isEmpty || !swapped.get.argb.sameElements(good.get.argb),
      "swapped-order stream decoded identically — order not discriminated")
  }

  // Pinned from the first verified decode (ASCII-rendered: the 16x16
  // Python-logo silhouette, transparent corners, opaque glyph).
  private val PinnedAlphaSha =
    "00d64fd72159f0e240eac94eb2a256366dad5e267b45a1920aa72771a8e6ff8c"
}
