package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** AudioFp contract: synth is the exact fingerprint inverse, the
  * fingerprint is gain-invariant and codec-invariant (WAV ↔ FLAC of the
  * same capture), and near-dup distances are constructible bit-exact —
  * the kernel the q_dedup_audio(_anchor) queries serve.
  */
class AudioFpSpec extends AnyFunSuite {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("fingerprint(synthSamples(t)) == t, including the walk extremes") {
    val targets = Seq(0L, -1L, 0x5555555555555555L, 0xAAAAAAAAAAAAAAAAL,
      Long.MaxValue, Long.MinValue) ++ (0L until 40L).map(mix)
    for (t <- targets)
      assert(AudioFp.fingerprint(AudioFp.synthSamples(t)) === t,
        f"target 0x$t%016x not recovered")
  }

  test("synth cosine table is bit-identical to the per-sample cos form") {
    // independent reimplementation of synthSamples with a LIVE math.cos
    // per sample (the pre-round-16 form); the table-based production
    // synth must emit byte-identical samples — the optimization is a
    // memoization, never a value change
    val target = 0x5A3C0FF1E2D4B897L
    val level = Array.ofDim[Int](AudioFp.Bands, AudioFp.Frames)
    for (b <- 0 until AudioFp.Bands; t <- 0 until AudioFp.Frames - 1) {
      val falling = ((target >>> (t * AudioFp.Bands + b)) & 1L) == 1L
      level(b)(t + 1) = level(b)(t) + (if (falling) -1 else 1)
    }
    def bin(b: Int) = 4 * (b + 1)
    val expected = new Array[Int](AudioFp.Frames * AudioFp.FrameLen)
    for (t <- 0 until AudioFp.Frames) {
      val amps = Array.tabulate(AudioFp.Bands)(b2 => 150.0 * math.pow(1.5, level(b2)(t)))
      for (n <- 0 until AudioFp.FrameLen) {
        var x = 0.0
        for (b2 <- 0 until AudioFp.Bands)
          x += amps(b2) * math.cos(2.0 * math.Pi * bin(b2) * n / AudioFp.FrameLen)
        expected(t * AudioFp.FrameLen + n) = math.round(x).toInt
      }
    }
    assert(AudioFp.synthSamples(target).sameElements(expected))
  }

  test("WAV container round-trip preserves the fingerprint") {
    for (seed <- 0L until 10L) {
      val t = mix(seed)
      val wav = AudioFp.wavPcm16(AudioFp.synthSamples(t))
      assert(AudioFp.fingerprint(wav) === Some(t))
    }
  }

  test("FLAC re-encode of the same capture fingerprints identically (cross-codec)") {
    for (seed <- 0L until 10L) {
      val samples = AudioFp.synthSamples(mix(seed))
      val wav = AudioFp.wavPcm16(samples)
      val flac = Flac.encode(Array(samples), 8000, 16, 256, Flac.Verbatim)
      assert(AudioFp.fingerprint(flac) === AudioFp.fingerprint(wav))
    }
  }

  test("uniform gain change never moves the fingerprint") {
    for (seed <- 0L until 10L) {
      val t = mix(seed)
      val samples = AudioFp.synthSamples(t)
      val half = samples.map(_ / 2)
      val threeQ = samples.map(v => v * 3 / 4)
      assert(AudioFp.fingerprint(half) === t)
      assert(AudioFp.fingerprint(threeQ) === t)
    }
  }

  test("small additive noise stays within a tight Hamming budget") {
    for (seed <- 0L until 10L) {
      val t = mix(seed)
      val noisy = AudioFp.synthSamples(t).zipWithIndex.map {
        case (v, i) => v + ((seed * 31 + i * 17) % 7).toInt - 3
      }
      val d = java.lang.Long.bitCount(AudioFp.fingerprint(noisy) ^ t)
      assert(d <= 2, s"noise moved the fingerprint $d bits (seed $seed)")
    }
  }

  test("constructed near-dups land at their exact Hamming distance") {
    val base = mix(7L)
    for (flips <- Seq(0x1L, 0xEL, 0x8001L, 1L << 63)) {
      val a = AudioFp.fingerprint(AudioFp.synthSamples(base))
      val b = AudioFp.fingerprint(AudioFp.synthSamples(base ^ flips))
      assert(java.lang.Long.bitCount(a ^ b) === java.lang.Long.bitCount(flips))
    }
  }

  test("stereo FLAC mixes down deterministically and fingerprints") {
    val samples = AudioFp.synthSamples(mix(3L))
    val flac = Flac.encode(Array(samples, samples), 8000, 16, 256, Flac.Verbatim,
      chAssign = 1) // two identical channels, L/R assignment
    // mean of identical channels is the channel itself
    assert(AudioFp.fingerprint(flac) === Some(mix(3L)))
  }

  test("undecodable payloads yield None, never a throw") {
    assert(AudioFp.fingerprint(Array.emptyByteArray) === None)
    assert(AudioFp.fingerprint("RIFFjunk".getBytes("US-ASCII")) === None)
    assert(AudioFp.fingerprint("not audio at all".getBytes("UTF-8")) === None)
  }

  test("truncated audio zero-pads (stable fingerprint for the decoded prefix)") {
    val samples = AudioFp.synthSamples(mix(11L))
    // keep 5 of 9 frames; remaining frames read as silence
    val prefix = samples.take(5 * AudioFp.FrameLen)
    val fp = AudioFp.fingerprint(prefix)
    // transitions 0..3 intact; transition 4 compares a live frame to
    // silence (energy fell → bits SET); transitions 5..7 silence-to-
    // silence (equal → bits clear)
    val t = mix(11L)
    assert((fp & 0xFFFFFFFFL) === (t & 0xFFFFFFFFL))
    assert(((fp >>> 32) & 0xFFL) === 0xFFL)
    assert((fp >>> 40) === 0L)
  }
  test("time-offset contract: plain framing is shift-sensitive, onset framing is not") {
    val target = 0x0F1E2D3C4B5A6978L
    val samples = AudioFp.synthSamples(target)
    assert(AudioFp.fingerprint(samples) == target)
    // a 128-sample leading-silence shift re-frames the capture: the plain
    // fingerprint must move far outside the pairing budget (the DOCUMENTED
    // sensitivity)...
    def shifted(n: Int): Array[Int] = {
      val out = new Array[Int](n + samples.length)
      System.arraycopy(samples, 0, out, n, samples.length)
      out
    }
    val plain128 = AudioFp.fingerprint(shifted(128))
    assert(java.lang.Long.bitCount(plain128 ^ target) > 5,
      "plain fingerprint unexpectedly survived a 128-sample shift")
    // ...while the onset-anchored variant is EXACT for arbitrary shifts
    assert(AudioFp.fingerprintOnset(samples) == target)
    for (n <- Seq(1, 37, 128, 255, 999, 2048)) {
      assert(AudioFp.fingerprintOnset(shifted(n)) == target,
        s"onset fingerprint drifted at shift $n")
    }
    // payload-level route (WAV) and silence fall-back
    assert(AudioFp.fingerprintOnset(AudioFp.wavPcm16(shifted(500))).contains(target))
    assert(AudioFp.fingerprintOnset(new Array[Int](4096)) ==
      AudioFp.fingerprint(new Array[Int](4096)))
  }

}
