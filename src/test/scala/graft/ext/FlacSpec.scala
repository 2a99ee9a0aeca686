package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec arm. The four `fix*` byte arrays were assembled by an
  * INDEPENDENT Python bit-writer implementing the public spec (RFC 9639)
  * — frame headers, UTF-8 numbers, CRC-8/CRC-16, rice/zigzag coding all
  * re-derived there, not read from `Flac.scala` — so a matched
  * encoder/decoder slip cannot cancel: the decoder must read truly
  * foreign bits, and (for fix1) the encoder must emit the byte-identical
  * stream for the same configuration.
  */
class FlacSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // mono 8 kHz bps16, blockSize 4 (16-bit from-end code), FIXED order 1,
  // samples [10,12,11,13], rice param 2
  private val fix1 = bytes(102, 76, 97, 67, 128, 0, 0, 34, 0, 4, 0, 4, 0,
    0, 0, 0, 0, 0, 1, 244, 0, 240, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 255, 248, 116, 8, 0, 0, 3, 156, 18, 0, 10, 0,
    146, 160, 165, 1)

  // CONSTANT subframe with 3 wasted bits: stored 3 at ebps 13 → 24
  private val fix2 = bytes(102, 76, 97, 67, 128, 0, 0, 34, 0, 4, 0, 4, 0,
    0, 0, 0, 0, 0, 1, 244, 0, 240, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 255, 248, 100, 8, 0, 3, 234, 1, 32, 3, 156, 180)

  // FIXED order 0 with the rice ESCAPE partition (raw 5-bit residuals),
  // samples [-5, 7, 0, -16]
  private val fix3 = bytes(102, 76, 97, 67, 128, 0, 0, 34, 0, 4, 0, 4, 0,
    0, 0, 0, 0, 0, 1, 244, 0, 240, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 255, 248, 100, 8, 0, 3, 234, 16, 3, 203, 179,
    130, 0, 225, 244)

  // stereo MID/SIDE verbatim: left=[100,102,104,106], right=[90,91,92,93]
  private val fix4 = bytes(102, 76, 97, 67, 128, 0, 0, 34, 0, 4, 0, 4, 0,
    0, 0, 0, 0, 0, 1, 244, 2, 240, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 255, 248, 100, 168, 0, 3, 162, 2, 0, 95, 0, 96,
    0, 98, 0, 99, 2, 0, 5, 0, 2, 192, 1, 128, 0, 208, 59, 23)

  test("independently-assembled FIXED-order-1 stream decodes exactly") {
    val a = Flac.decode(fix1).get
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bps == 16)
    assert(a.samples.toSeq == Seq(10, 12, 11, 13))
  }

  test("encoder emits the byte-identical stream for the same config") {
    val enc = Flac.encode(Array(Array(10, 12, 11, 13)), 8000, 16,
      blockSize = 4, Flac.Fixed(1, 2))
    assert(enc.toSeq == fix1.toSeq,
      "encoder bitstream must match the independent assembly byte-for-byte")
  }

  test("wasted bits restore the shifted samples") {
    val a = Flac.decode(fix2).get
    assert(a.samples.toSeq == Seq(24, 24, 24, 24))
  }

  test("rice escape partition reads raw residuals") {
    val a = Flac.decode(fix3).get
    assert(a.samples.toSeq == Seq(-5, 7, 0, -16))
  }

  test("mid/side decorrelation reconstructs exact integers") {
    val a = Flac.decode(fix4).get
    assert(a.channels == 2)
    // interleaved L,R
    assert(a.samples.toSeq ==
      Seq(100, 90, 102, 91, 104, 92, 106, 93))
  }

  private def traj(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i => (((seed * 31 + i * 17) % 4096) - 2048).toInt)

  test("round-trips: constant, verbatim, fixed 0-4, LPC, multi-frame") {
    val n = 600 // 2 full 256-blocks + a 88-sample tail frame
    val flat = Array.fill(n)(-123)
    assert(Flac.decode(Flac.encode(Array(flat), 8000, 16, 256,
      Flac.Constant)).get.samples.toSeq == flat.toSeq)
    val wild = traj(7, n)
    assert(Flac.decode(Flac.encode(Array(wild), 44100, 16, 256,
      Flac.Verbatim)).get.samples.toSeq == wild.toSeq)
    for (order <- 0 to 4) {
      // keep residuals bounded for higher orders: smooth-ish ramp + noise
      val s = Array.tabulate(n)(i => 3 * i + ((i * 2654435761L >>> 29) & 7).toInt)
      val got = Flac.decode(Flac.encode(Array(s), 8000, 16, 256,
        Flac.Fixed(order, 6))).get
      assert(got.samples.toSeq == s.toSeq, s"fixed order $order")
    }
    // LPC with coeff [2] shift 1 == order-1 fixed predictor
    val s = Array.tabulate(n)(i => 500 + ((i * 40503) % 11) - 5)
    val got = Flac.decode(Flac.encode(Array(s), 8000, 16, 256,
      Flac.Lpc(Array(2), 1, 3, 4))).get
    assert(got.samples.toSeq == s.toSeq)
  }

  test("round-trips: stereo independent and left/side, 8/24-bit depths") {
    val n = 300
    val l = traj(3, n); val r = traj(9, n)
    val st = Flac.decode(Flac.encode(Array(l, r), 8000, 16, 256,
      Flac.Verbatim)).get
    assert(st.channels == 2)
    assert((0 until n).forall(i =>
      st.samples(2 * i) == l(i) && st.samples(2 * i + 1) == r(i)))
    // left/side: encode ch0=left, ch1=side=l-r (side gets bps+1)
    val side = Array.tabulate(n)(i => l(i) - r(i))
    val ls = Flac.decode(Flac.encode(Array(l, side), 8000, 16, 256,
      Flac.Verbatim, chAssign = 8)).get
    assert((0 until n).forall(i =>
      ls.samples(2 * i) == l(i) && ls.samples(2 * i + 1) == r(i)))
    // 8-bit and 24-bit depths
    val s8 = Array.tabulate(n)(i => (i % 256) - 128)
    assert(Flac.decode(Flac.encode(Array(s8), 16000, 8, 256,
      Flac.Verbatim)).get.samples.toSeq == s8.toSeq)
    val s24 = Array.tabulate(n)(i => (i * 40009) % (1 << 23) - (1 << 22))
    assert(Flac.decode(Flac.encode(Array(s24), 48000, 24, 256,
      Flac.Verbatim)).get.samples.toSeq == s24.toSeq)
  }

  test("malformed streams: truncation, corruption, CRC damage → None") {
    val good = Flac.encode(Array(traj(5, 512)), 8000, 16, 256,
      Flac.Fixed(2, 5))
    assert(Flac.decode(good).isDefined)
    assert(Flac.decode(null) == None)
    assert(Flac.decode(Array.emptyByteArray) == None)
    assert(Flac.decode("not flac at all, definitely not".getBytes) == None)
    // truncation at every 13th byte boundary must never throw
    var cut = 4
    while (cut < good.length) {
      assert(Flac.decode(java.util.Arrays.copyOf(good, cut)).isEmpty,
        s"truncated at $cut")
      cut += 13
    }
    // flip one byte in the middle of the first frame: CRC-16 must catch it
    val damaged = good.clone()
    damaged(good.length - 20) = (damaged(good.length - 20) ^ 0x40).toByte
    assert(Flac.decode(damaged).isEmpty, "frame CRC must reject bit damage")
    // flip a header byte: CRC-8 must catch it (sync stays intact)
    val hdrDamage = good.clone()
    hdrDamage(44) = (hdrDamage(44) ^ 0x01).toByte
    assert(Flac.decode(hdrDamage).isEmpty)
  }
}
