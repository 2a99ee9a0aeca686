package graft.ext

/** MPEG-1/2/2.5 Audio Layer III (MP3) PCM decode — closes the lead
  * round-13 envelope cut: the audio fingerprint ([[AudioFp]]) previously
  * ran only on WAV-family and FLAC payloads, so MP3-heavy speech/podcast
  * corpora deduped on exact bytes only. Reference analog: the
  * byte-stream stage contract (/root/reference/index.js:14-27).
  *
  * Decode implements the public ISO/IEC 11172-3 / 13818-3 Layer III
  * pipeline end-to-end:
  *   - frame sync walk (shared conventions with [[Mpeg.mp3Meta]]):
  *     ID3v2 skip, resync over junk, CRC skip, free-format rejected;
  *   - side info for MPEG-1 (2 granules, 9-bit main_data_begin, scfsi)
  *     and LSF MPEG-2/2.5 (1 granule, 8-bit main_data_begin);
  *   - bit-reservoir assembly (main_data_begin back-pointer into the
  *     rolling main-data store);
  *   - scalefactors: MPEG-1 slen1/slen2 (+ scfsi reuse) and the LSF
  *     scalefac_compress partition algorithm (non-intensity rows);
  *   - Huffman: the big-value pair tables and both count1 quad tables,
  *     each machine-validated at class init (prefix-free AND
  *     Kraft-complete — see [[Tables.supported]]); linbits escape and
  *     sign bits; exact part2_3_length accounting with the standard
  *     count1-overrun rewind;
  *   - requantize (global_gain / scalefac_scale / preflag+pretab /
  *     subblock_gain), short-block reorder (dest = 3·freq + window),
  *     M/S stereo, alias-reduction butterflies, 36/12-point IMDCT with
  *     all four window types incl. mixed blocks, frequency inversion,
  *     and the 32-band polyphase synthesis.
  *
  * DOCUMENTED ENVELOPE (each arm gates to None, never garbage):
  *   - Huffman tables 13, 15 and the linbits families 16-23/24-31 are
  *     large tabulated data (ISO Table B.7) with no public copy in this
  *     container to transcribe (a container-wide byte-signature scan for
  *     every known decoder layout — ffmpeg uint16 codes, hlen byte rows,
  *     count1-A — finds nothing); a frame selecting them is reported
  *     unsupported via [[inventory]] and the stream decodes to None.
  *     Fabricating plausible codes would misdecode real streams, which
  *     is worse than gating them out.
  *     The round-15 recall experiment (tools/mp3_b7_recall_experiment.md)
  *     measured why these four trees cannot ship the way tables 1-12
  *     did: the 256-entry HLEN vector of table 13 was recalled EXACTLY
  *     (its Kraft sum is exactly 1 — a near-impossible accident), but
  *     the HCOD vector recalls at only ~70% fidelity (79 prefix
  *     collisions), and table 24's lengths don't even reach Kraft 0.5.
  *     At that fidelity even a validation PASS would be untrustworthy:
  *     the prefix+Kraft check is blind to swapped same-length codewords,
  *     so a high-error recall that happens to validate could still
  *     misdecode. Derivation was ruled out experimentally: neither
  *     canonical code assignment (any tie-break) nor canonical codeword
  *     SETS per length reproduce the 11 validated tables — the ISO
  *     codeword values are irreducible Huffman-tree data.
  *   - MPEG-1 intensity stereo is DECODED (round 15): is_pos bands
  *     project per §2.4.3.4.9.3, with M/S applied below the bound when
  *     both joint modes are set; LSF intensity scalefactors (the
  *     mode_ext&1 + MPEG-2 combination, a different is_pos coding)
  *     remain gated to None.
  *   - The polyphase prototype window is an analytically designed
  *     near-perfect-reconstruction pseudo-QMF lowpass (root-raised-
  *     cosine response — exactly power-complementary at the pi/64 band
  *     crossover — realized on 512 taps, parameters grid-tuned at init
  *     for flatness) because the ISO Table B.3 window is tabulated data
  *     unavailable here. The filterbank structure, modulation phases and
  *     everything discrete (framing, Huffman, requantize, IMDCT) follow
  *     the standard exactly; the prototype difference is a sub-dB
  *     passband effect — the measured analysis+synthesis reconstruction
  *     SNR (~43 dB, pinned in Mp3Spec) bounds it, and the band-energy-
  *     SIGN fingerprint this arm feeds is insensitive at that level.
  * Encode-side counterpart: [[Mp3Enc]] (fixture encoder) — the
  * builder-feeds-parser certificate discipline as PNG/FLAC/VP8L.
  */
object Mp3 {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Per-frame triage row for the real-stream interop certificate. */
  final case class FrameStat(
      offset: Int, version: Int, kbps: Int, rate: Int, channels: Int,
      tables: Set[Int], supported: Boolean)

  // ------------------------------------------------------------ tables

  /** Layer III Huffman tables, transcribed from the public standard
    * (ISO/IEC 11172-3 Table B.7) in x-major order; every shipped table
    * is machine-validated at init: the code set must be prefix-free AND
    * Kraft-complete (sum 2^-len == 1), so a transcription slip cannot
    * ship silently. Tables 16-23 share one tree (as do 24-31) with
    * per-table linbits; those trees are not shipped (envelope above).
    */
  private[ext] object Tables {
    final class Huff(val xlen: Int, val ylen: Int, val linbits: Int,
        val hlen: Array[Int], val hcod: Array[Int]) {
      // decode tree as flat arrays: node -> (child0, child1); negative
      // child = ~symbolIndex leaf
      val (left, right, valid) = {
        val l = scala.collection.mutable.ArrayBuffer(0)
        val r = scala.collection.mutable.ArrayBuffer(0)
        var ok = hlen.length == xlen * ylen && hcod.length == hlen.length
        var kraft = 0.0
        var s = 0
        while (ok && s < hlen.length) {
          val len = hlen(s)
          val cod = hcod(s)
          if (len < 1 || len > 19 || cod < 0 || cod >= (1 << len)) ok = false
          else {
            kraft += math.pow(2.0, -len)
            var node = 0
            var b = len - 1
            while (ok && b >= 0) {
              val bit = (cod >> b) & 1
              val arr = if (bit == 0) l else r
              val nxt = arr(node)
              if (b == 0) {
                if (nxt != 0) ok = false // collision: not prefix-free
                else arr(node) = ~s
              } else if (nxt == 0) {
                l += 0; r += 0
                arr(node) = l.length - 1
                node = l.length - 1
              } else if (nxt < 0) ok = false // prefix collision
              else node = nxt
              b -= 1
            }
          }
          s += 1
        }
        ok = ok && math.abs(kraft - 1.0) < 1e-12
        (l.toArray, r.toArray, ok)
      }
    }

    private def h(xlen: Int, ylen: Int, linbits: Int,
        hlen: Seq[Int], hcod: Seq[Int]) =
      new Huff(xlen, ylen, linbits, hlen.toArray, hcod.toArray)

    val ht1 = h(2, 2, 0, Seq(1, 3, 2, 3), Seq(1, 1, 1, 0))
    val ht2 = h(3, 3, 0,
      Seq(1, 3, 6, 3, 3, 5, 5, 5, 6),
      Seq(1, 2, 1, 3, 1, 1, 3, 2, 0))
    val ht3 = h(3, 3, 0,
      Seq(2, 2, 6, 3, 2, 5, 5, 5, 6),
      Seq(3, 2, 1, 1, 1, 1, 3, 2, 0))
    val ht5 = h(4, 4, 0,
      Seq(1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8),
      Seq(1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0))
    val ht6 = h(4, 4, 0,
      Seq(3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7),
      Seq(7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0))
    val ht7 = h(6, 6, 0,
      Seq(1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8, 8, 9,
        7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8, 9, 10, 10, 10),
      Seq(1, 2, 10, 19, 16, 10, 3, 3, 7, 10, 5, 3, 11, 4, 13, 17, 8, 4,
        12, 11, 18, 15, 11, 2, 7, 6, 9, 14, 3, 1, 6, 4, 5, 3, 2, 0))
    val ht8 = h(6, 6, 0,
      Seq(2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 6, 4, 6, 8, 8, 9,
        8, 8, 8, 9, 9, 10, 8, 7, 8, 9, 10, 10, 9, 8, 9, 9, 11, 11),
      Seq(3, 4, 6, 18, 12, 5, 5, 1, 2, 16, 9, 3, 7, 3, 5, 14, 7, 3,
        19, 17, 15, 13, 10, 4, 13, 5, 8, 11, 5, 1, 12, 4, 4, 1, 1, 0))
    val ht9 = h(6, 6, 0,
      Seq(3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6, 7, 8,
        6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7, 8, 8, 9, 9),
      Seq(7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7, 7, 6, 8, 8, 8, 5,
        15, 6, 9, 10, 5, 1, 11, 7, 9, 6, 4, 1, 14, 4, 6, 2, 6, 0))
    val ht10 = h(8, 8, 0,
      Seq(1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
        6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
        8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11, 10, 11,
        8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10, 10, 11, 11, 11),
      Seq(1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7,
        11, 9, 15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7,
        20, 19, 33, 47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3,
        14, 13, 10, 11, 16, 6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0))
    val ht11 = h(8, 8, 0,
      Seq(2, 3, 5, 7, 8, 9, 8, 9, 3, 3, 4, 6, 8, 8, 7, 8,
        5, 5, 6, 7, 8, 9, 8, 8, 7, 6, 7, 9, 8, 10, 8, 9,
        8, 8, 8, 9, 9, 10, 9, 10, 8, 9, 10, 10, 11, 11, 10, 11,
        8, 7, 7, 8, 9, 10, 10, 10, 8, 7, 8, 9, 10, 10, 10, 10),
      Seq(3, 4, 10, 24, 34, 33, 21, 15, 5, 3, 4, 10, 32, 17, 11, 10,
        11, 7, 13, 18, 30, 31, 20, 5, 25, 11, 19, 59, 27, 18, 12, 5,
        35, 33, 31, 58, 30, 16, 7, 5, 28, 26, 32, 19, 17, 15, 8, 14,
        14, 12, 9, 13, 14, 9, 4, 1, 11, 4, 6, 6, 6, 3, 2, 0))
    val ht12 = h(8, 8, 0,
      Seq(4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8,
        5, 4, 5, 6, 7, 8, 7, 8, 6, 5, 6, 6, 7, 8, 8, 8,
        7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8, 8, 9, 8, 9,
        8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10),
      Seq(9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11,
        17, 7, 11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5,
        32, 13, 22, 19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2,
        27, 12, 11, 15, 10, 7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0))
    // count1 quad tables (ISO B.7 tables "A"/"B"): symbol = 4-bit vwxy
    val cntA = h(16, 1, 0,
      Seq(1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6),
      Seq(1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1))
    val cntB = h(16, 1, 0,
      Seq.fill(16)(4), (0 until 16).map(v => 15 - v))

    /** table id -> validated tree; absent/invalid ids are unsupported. */
    val bigValue: Map[Int, Huff] = Map(
      1 -> ht1, 2 -> ht2, 3 -> ht3, 5 -> ht5, 6 -> ht6, 7 -> ht7,
      8 -> ht8, 9 -> ht9, 10 -> ht10, 11 -> ht11, 12 -> ht12
    ).filter(_._2.valid)

    /** ids decodable by this build: 0 (all-zero) + every validated tree. */
    val supported: Set[Int] = bigValue.keySet + 0
  }

  /** Scalefactor-band boundaries (ISO Table B.8 layout): 23 long-block
    * entries ending at 576 and 14 short-block entries ending at 192,
    * keyed by sample rate. Structure-validated at init (monotone, exact
    * endpoints).
    */
  private[ext] val sfbLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90,
      110, 134, 162, 196, 238, 288, 342, 418, 576),
    48000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88,
      106, 128, 156, 190, 230, 276, 330, 384, 576),
    32000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102,
      126, 156, 194, 240, 296, 364, 448, 550, 576),
    22050 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
      168, 200, 238, 284, 336, 396, 464, 522, 576),
    24000 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
      162, 194, 232, 278, 332, 394, 464, 540, 576),
    16000 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
      168, 200, 238, 284, 336, 396, 464, 522, 576),
    11025 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
      168, 200, 238, 284, 336, 396, 464, 522, 576),
    12000 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
      168, 200, 238, 284, 336, 396, 464, 540, 576),
    8000 -> Array(0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232,
      280, 336, 400, 476, 566, 568, 570, 572, 574, 576))

  private[ext] val sfbShort: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000 -> Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000 -> Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
    22050 -> Array(0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    24000 -> Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    16000 -> Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    11025 -> Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    12000 -> Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    8000 -> Array(0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192))

  locally { // structural validation of the band tables
    sfbLong.foreach { case (r, a) =>
      require(a.length == 23 && a.head == 0 && a.last == 576 &&
        a.sliding(2).forall(p => p(1) > p(0)), s"sfbLong $r")
    }
    sfbShort.foreach { case (r, a) =>
      require(a.length == 14 && a.head == 0 && a.last == 192 &&
        a.sliding(2).forall(p => p(1) > p(0)), s"sfbShort $r")
    }
  }

  private val pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)
  private val slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  // alias-reduction butterfly coefficients (spec constants c_i)
  private val aliasCs = new Array[Double](8)
  private val aliasCa = new Array[Double](8)
  locally {
    val c = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
    var i = 0
    while (i < 8) {
      val d = math.sqrt(1.0 + c(i) * c(i))
      aliasCs(i) = 1.0 / d
      aliasCa(i) = c(i) / d
      i += 1
    }
  }

  // ------------------------------------------------------------ bit IO

  private[ext] final class BitReader(val b: Array[Byte], startBit: Long) {
    var pos: Long = startBit // absolute bit position
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteI = (pos >> 3).toInt
        if (byteI >= b.length) throw new IllegalArgumentException("mp3: EOF")
        v = (v << 1) | ((b(byteI) >> (7 - (pos & 7).toInt)) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  // ------------------------------------------------------- side info

  private final class Granule {
    var part23 = 0
    var bigValues = 0
    var globalGain = 0
    var sfCompress = 0
    var windowSwitching = false
    var blockType = 0
    var mixed = false
    val tableSelect = new Array[Int](3)
    val subblockGain = new Array[Int](3)
    var region0Count = 0
    var region1Count = 0
    var preflag = 0
    var sfScale = 0
    var count1Table = 0
    // decoded per-granule state
    val sfLong = new Array[Int](23)
    val sfShort = Array.ofDim[Int](13, 3)
  }

  private final class SideInfo(val granules: Int, val channels: Int) {
    var mainDataBegin = 0
    val scfsi = Array.ofDim[Int](2, 4)
    val gr = Array.fill(2, 2)(new Granule)
  }

  private def parseSideInfo(r: BitReader, version: Int, channels: Int): SideInfo = {
    val lsf = version != 1
    val si = new SideInfo(if (lsf) 1 else 2, channels)
    si.mainDataBegin = r.bits(if (lsf) 8 else 9)
    r.bits(if (lsf) { if (channels == 1) 1 else 2 }
    else { if (channels == 1) 5 else 3 }) // private bits
    if (!lsf) {
      var ch = 0
      while (ch < channels) {
        var k = 0
        while (k < 4) { si.scfsi(ch)(k) = r.bit(); k += 1 }
        ch += 1
      }
    }
    var g = 0
    while (g < si.granules) {
      var ch = 0
      while (ch < channels) {
        val gr = si.gr(g)(ch)
        gr.part23 = r.bits(12)
        gr.bigValues = r.bits(9)
        gr.globalGain = r.bits(8)
        gr.sfCompress = r.bits(if (lsf) 9 else 4)
        gr.windowSwitching = r.bit() == 1
        if (gr.windowSwitching) {
          gr.blockType = r.bits(2)
          gr.mixed = r.bit() == 1
          gr.tableSelect(0) = r.bits(5)
          gr.tableSelect(1) = r.bits(5)
          gr.tableSelect(2) = 0
          var w = 0
          while (w < 3) { gr.subblockGain(w) = r.bits(3); w += 1 }
          // implicit region counts (spec): region0 = 8 for long-start/stop
          // with window switching, 7+1 sfb handling via sample clamp below
          gr.region0Count = if (gr.blockType == 2 && !gr.mixed) 8 else 7
          gr.region1Count = 36
        } else {
          gr.blockType = 0
          gr.mixed = false
          gr.tableSelect(0) = r.bits(5)
          gr.tableSelect(1) = r.bits(5)
          gr.tableSelect(2) = r.bits(5)
          gr.region0Count = r.bits(4)
          gr.region1Count = r.bits(3)
        }
        if (!lsf) gr.preflag = r.bit()
        gr.sfScale = r.bit()
        gr.count1Table = r.bit()
        ch += 1
      }
      g += 1
    }
    si
  }

  // -------------------------------------------------- scalefactors

  /** Returns part2 bit count. MPEG-1: slen pairs + scfsi reuse. */
  private def scalefactorsV1(r: BitReader, gr: Granule, prev: Granule,
      scfsi: Array[Int], granule: Int): Unit = {
    val s1 = slen1(gr.sfCompress)
    val s2 = slen2(gr.sfCompress)
    if (gr.windowSwitching && gr.blockType == 2) {
      if (gr.mixed) {
        var b = 0
        while (b < 8) { gr.sfLong(b) = if (s1 > 0) r.bits(s1) else 0; b += 1 }
        b = 3
        while (b < 12) {
          val sl = if (b < 6) s1 else s2
          var w = 0
          while (w < 3) { gr.sfShort(b)(w) = if (sl > 0) r.bits(sl) else 0; w += 1 }
          b += 1
        }
      } else {
        var b = 0
        while (b < 12) {
          val sl = if (b < 6) s1 else s2
          var w = 0
          while (w < 3) { gr.sfShort(b)(w) = if (sl > 0) r.bits(sl) else 0; w += 1 }
          b += 1
        }
      }
    } else {
      // long blocks: scfsi groups 0-5, 6-10, 11-15, 16-20
      val groups = Array((0, 6), (6, 11), (11, 16), (16, 21))
      var gi = 0
      while (gi < 4) {
        val (from, until) = groups(gi)
        if (granule == 1 && scfsi(gi) == 1) {
          var b = from
          while (b < until) { gr.sfLong(b) = prev.sfLong(b); b += 1 }
        } else {
          val sl = if (gi < 2) s1 else s2
          var b = from
          while (b < until) { gr.sfLong(b) = if (sl > 0) r.bits(sl) else 0; b += 1 }
        }
        gi += 1
      }
    }
  }

  /** LSF (MPEG-2/2.5) scalefactors, non-intensity channel: the
    * scalefac_compress partition algorithm (13818-3 §2.4.3.4). The
    * decoded run of nr_of_sfb values maps onto long or short bands by
    * block type.
    */
  private def scalefactorsLsf(r: BitReader, gr: Granule): Boolean = {
    val sfc = gr.sfCompress
    val slen = new Array[Int](4)
    val nr = new Array[Int](4)
    val bt = if (gr.windowSwitching && gr.blockType == 2) {
      if (gr.mixed) 2 else 1
    } else 0 // 0 long, 1 short, 2 mixed
    if (sfc < 400) {
      slen(0) = (sfc >> 4) / 5; slen(1) = (sfc >> 4) % 5
      slen(2) = (sfc % 16) >> 2; slen(3) = sfc % 4
      gr.preflag = 0
      val rows = Array(Array(6, 5, 5, 5), Array(9, 9, 9, 9), Array(6, 9, 9, 9))
      rows(bt).copyToArray(nr)
    } else if (sfc < 500) {
      val s = sfc - 400
      slen(0) = (s >> 2) / 5; slen(1) = (s >> 2) % 5
      slen(2) = s % 4; slen(3) = 0
      gr.preflag = 0
      val rows = Array(Array(6, 5, 7, 3), Array(9, 9, 12, 6), Array(6, 9, 12, 6))
      rows(bt).copyToArray(nr)
    } else {
      val s = sfc - 500
      slen(0) = s / 3; slen(1) = s % 3; slen(2) = 0; slen(3) = 0
      gr.preflag = 1
      val rows = Array(Array(11, 10, 0, 0), Array(18, 18, 0, 0), Array(15, 18, 0, 0))
      rows(bt).copyToArray(nr)
    }
    if (slen.exists(s => s < 0 || s > 5)) return false
    // read the flat run, then distribute
    val total = nr.sum
    val vals = new Array[Int](total)
    var i = 0
    var part = 0
    while (part < 4) {
      var k = 0
      while (k < nr(part)) {
        vals(i) = if (slen(part) > 0) r.bits(slen(part)) else 0
        i += 1; k += 1
      }
      part += 1
    }
    bt match {
      case 0 =>
        var b = 0
        while (b < math.min(total, 22)) { gr.sfLong(b) = vals(b); b += 1 }
      case 1 =>
        var b = 0
        while (b < 12 && b * 3 + 2 < total) {
          var w = 0
          while (w < 3) { gr.sfShort(b)(w) = vals(b * 3 + w); w += 1 }
          b += 1
        }
      case _ =>
        var b = 0
        while (b < 6 && b < total) { gr.sfLong(b) = vals(b); b += 1 }
        var k = 6
        var sb = 3
        while (sb < 12 && k + 2 < total) {
          var w = 0
          while (w < 3) { gr.sfShort(sb)(w) = vals(k); k += 1; w += 1 }
          sb += 1
        }
    }
    true
  }

  // ---------------------------------------------------- huffman decode

  private def readTree(r: BitReader, t: Tables.Huff): Int = {
    var node = 0
    var depth = 0
    while (depth < 20) {
      val nxt = if (r.bit() == 0) t.left(node) else t.right(node)
      if (nxt < 0) return ~nxt
      if (nxt == 0) throw new IllegalArgumentException("mp3: bad code")
      node = nxt
      depth += 1
    }
    throw new IllegalArgumentException("mp3: code too deep")
  }

  // ------------------------------------------------ requantize etc.

  private val pow43 = Array.tabulate(8207)(i => math.pow(i, 4.0 / 3.0))

  private def requantize(gr: Granule, rate: Int, is: Array[Int],
      xr: Array[Double]): Unit = {
    val gainBase = (gr.globalGain - 210) * 0.25
    val mult = if (gr.sfScale == 0) 0.5 else 1.0
    val long = sfbLong(rate)
    val short = sfbShort(rate)
    val shortStart = // first bitstream sample index coded short
      if (gr.windowSwitching && gr.blockType == 2) { if (gr.mixed) 36 else 0 }
      else 576
    var i = 0
    var lb = 0 // long sfb cursor
    while (i < 576) {
      val v = is(i)
      if (i < shortStart) {
        while (lb < 21 && long(lb + 1) <= i) lb += 1
        val sf = gr.sfLong(math.min(lb, 21)) +
          (if (gr.preflag == 1) pretab(math.min(lb, 21)) else 0)
        val exp = gainBase - mult * sf
        xr(i) = (if (v < 0) -pow43(math.min(-v, 8206)) else pow43(math.min(v, 8206))) *
          math.pow(2.0, exp)
        i += 1
      } else {
        // short region: bitstream order is sfb-major, window-major
        val base = if (gr.mixed) 36 else 0
        val fOff = (i - base) // offset within short-coded region
        // find sfb: widths w, blocks of 3w
        var sb = if (gr.mixed) 3 else 0
        var acc = 0
        while (sb < 13 && acc + 3 * (short(sb + 1) - short(sb)) <= fOff) {
          acc += 3 * (short(sb + 1) - short(sb))
          sb += 1
        }
        val width = short(math.min(sb, 12) + 1) - short(math.min(sb, 12))
        val within = fOff - acc
        val win = within / width
        val sfv = if (sb < 12) gr.sfShort(sb)(math.min(win, 2)) else 0
        val sbg = gr.subblockGain(math.min(win, 2))
        val exp = gainBase - 2.0 * sbg - mult * sfv
        xr(i) = (if (v < 0) -pow43(math.min(-v, 8206)) else pow43(math.min(v, 8206))) *
          math.pow(2.0, exp)
        i += 1
      }
    }
  }

  /** Short-block reorder: bitstream order (sfb-major, window-major) to
    * dest = 3*freq + window, applied over the short-coded region.
    */
  private def reorderShort(gr: Granule, rate: Int, xr: Array[Double]): Unit = {
    if (!(gr.windowSwitching && gr.blockType == 2)) return
    val short = sfbShort(rate)
    val out = new Array[Double](576)
    val base = if (gr.mixed) 36 else 0
    System.arraycopy(xr, 0, out, 0, base)
    var sb = if (gr.mixed) 3 else 0
    var src = base
    while (sb < 13) {
      val start = short(sb)
      val width = short(sb + 1) - short(sb)
      var w = 0
      while (w < 3) {
        var k = 0
        while (k < width) {
          val dst = 3 * (start + k) + w
          if (src < 576 && dst < 576) out(dst) = xr(src)
          src += 1
          k += 1
        }
        w += 1
      }
      sb += 1
    }
    System.arraycopy(out, 0, xr, 0, 576)
  }

  /** MPEG-1 intensity-stereo projection (ISO 11172-3 §2.4.3.4.9.3),
    * closing the round-14 "decode as coded" envelope for the V1 case:
    * bands above the right channel's zero boundary carry the summed
    * signal in the LEFT channel and a position 0..6 in the RIGHT
    * channel's scalefactor slot; is_ratio = tan(pos·π/12) splits it as
    * L' = L·ir/(1+ir), R' = L·1/(1+ir) (pos 6 ⇒ all left, pos 7 ⇒ band
    * not intensity-coded). Below the bound — and on pos-7 bands — M/S
    * applies when mode_ext&2 is also set (the dist10 III_stereo
    * semantics, block structure from the LEFT granule, positions from
    * the RIGHT granule's scalefactors). Operates on the POST-reorder
    * spectra, where short-block (sfb, window) cells sit at
    * 3·(start+k)+w. Mixed-block long parts stay non-intensity (M/S or
    * copy) — real encoders place the intensity bound far above the
    * mixed long region. LSF intensity (the MPEG-2 scalefac variant)
    * remains a documented gate.
    */
  private def intensityStereo(l: Array[Double], r: Array[Double],
      grL: Granule, grR: Granule, rate: Int, msAlso: Boolean): Unit = {
    val inv = 1.0 / math.sqrt(2.0)
    @inline def msAt(i: Int): Unit = {
      val m = l(i); val s = r(i); l(i) = (m + s) * inv; r(i) = (m - s) * inv
    }
    @inline def isAt(i: Int, pos: Int): Unit = {
      if (pos == 6) { r(i) = 0.0 }
      else {
        val t = math.tan(pos * math.Pi / 12)
        val v = l(i)
        l(i) = v * (t / (1 + t))
        r(i) = v * (1 / (1 + t))
      }
    }
    @inline def cell(i: Int, intensity: Boolean, pos: Int): Unit =
      if (intensity && pos != 7) isAt(i, pos)
      else if (msAlso) msAt(i)
    val shortBlocks = grL.windowSwitching && grL.blockType == 2
    if (!shortBlocks) {
      val long = sfbLong(rate)
      var top = 575
      while (top >= 0 && r(top) == 0.0) top -= 1
      var sfb = 0
      while (sfb < 22) {
        val s = long(sfb); val e = long(sfb + 1)
        val intensity = s > top
        val pos = if (sfb < 21) grR.sfLong(sfb) else grR.sfLong(20)
        var i = s
        while (i < e) { cell(i, intensity, pos); i += 1 }
        sfb += 1
      }
    } else {
      val short = sfbShort(rate)
      val mixedBase = if (grL.mixed) 36 else 0
      if (grL.mixed && msAlso) { var i = 0; while (i < mixedBase) { msAt(i); i += 1 } }
      // per-window zero boundary over the reordered layout
      val topLine = new Array[Int](3)
      var w = 0
      while (w < 3) {
        var line = 191
        while (line >= 0 && (3 * line + w >= 576 || r(3 * line + w) == 0.0)) line -= 1
        topLine(w) = line
        w += 1
      }
      var sb = if (grL.mixed) 3 else 0
      while (sb < 13) {
        val start = short(sb)
        val end = short(sb + 1)
        w = 0
        while (w < 3) {
          val intensity = start > topLine(w)
          val pos = if (sb < 12) grR.sfShort(sb)(w) else grR.sfShort(11)(w)
          var k = start
          while (k < end) {
            val i = 3 * k + w
            if (i >= mixedBase && i < 576) cell(i, intensity, pos)
            k += 1
          }
          w += 1
        }
        sb += 1
      }
    }
  }

  private def midSide(l: Array[Double], r: Array[Double]): Unit = {
    val inv = 1.0 / math.sqrt(2.0)
    var i = 0
    while (i < 576) {
      val m = l(i); val s = r(i)
      l(i) = (m + s) * inv
      r(i) = (m - s) * inv
      i += 1
    }
  }

  /** Decoder-side alias-reduction butterflies (long-block subband
    * boundaries; on short non-mixed blocks none, on mixed only the first
    * boundary).
    */
  private def aliasReduce(gr: Granule, xr: Array[Double]): Unit = {
    val bounds =
      if (gr.windowSwitching && gr.blockType == 2) { if (gr.mixed) 1 else 0 }
      else 31
    var b = 0
    while (b < bounds) {
      var j = 0
      while (j < 8) {
        val u = xr(18 * b + 17 - j)
        val d = xr(18 * b + 18 + j)
        xr(18 * b + 17 - j) = u * aliasCs(j) - d * aliasCa(j)
        xr(18 * b + 18 + j) = d * aliasCs(j) + u * aliasCa(j)
        j += 1
      }
      b += 1
    }
  }

  // ------------------------------------------------ IMDCT + windows

  private[ext] val winLong = Array.tabulate(36)(n => math.sin(math.Pi / 36 * (n + 0.5)))
  private[ext] val winStart = Array.tabulate(36) { n =>
    if (n < 18) math.sin(math.Pi / 36 * (n + 0.5))
    else if (n < 24) 1.0
    else if (n < 30) math.sin(math.Pi / 12 * (n - 18 + 0.5))
    else 0.0
  }
  private[ext] val winStop = Array.tabulate(36) { n =>
    if (n < 6) 0.0
    else if (n < 12) math.sin(math.Pi / 12 * (n - 6 + 0.5))
    else if (n < 18) 1.0
    else math.sin(math.Pi / 36 * (n + 0.5))
  }
  private[ext] val winShort = Array.tabulate(12)(n => math.sin(math.Pi / 12 * (n + 0.5)))

  private val imdctLongCos = Array.tabulate(36, 18)((n, k) =>
    math.cos(math.Pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1)))
  private val imdctShortCos = Array.tabulate(12, 6)((n, k) =>
    math.cos(math.Pi / 24.0 * (2 * n + 1 + 6) * (2 * k + 1)))

  /** 36-sample windowed IMDCT output of one subband's 18 lines (long /
    * start / stop), or the three overlapped 12-point short transforms.
    * Scaling: inverse carries 4/N so that windowed forward+inverse+OLA
    * reconstructs (TDAC) — pinned numerically by Mp3Spec.
    */
  private[ext] def imdctBlock(x: Array[Double], off: Int, blockType: Int): Array[Double] = {
    val out = new Array[Double](36)
    if (blockType == 2) {
      var w = 0
      while (w < 3) {
        var n = 0
        while (n < 12) {
          var acc = 0.0
          var k = 0
          while (k < 6) { acc += x(off + 3 * k + w) * imdctShortCos(n)(k); k += 1 }
          out(6 + 6 * w + n) += acc * (4.0 / 12.0) * winShort(n)
          n += 1
        }
        w += 1
      }
    } else {
      val win = blockType match {
        case 1 => winStart
        case 3 => winStop
        case _ => winLong
      }
      var n = 0
      while (n < 36) {
        var acc = 0.0
        var k = 0
        while (k < 18) { acc += x(off + k) * imdctLongCos(n)(k); k += 1 }
        out(n) = acc * (4.0 / 36.0) * win(n)
        n += 1
      }
    }
    out
  }

  // -------------------------------------------- polyphase filterbank

  /** Analytic near-PR pseudo-QMF prototype (512 taps, Kaiser beta=9,
    * cutoff pi/64, symmetric about 255.5) — see the envelope note in the
    * object scaladoc. Shared by decode synthesis and [[Mp3Enc]] analysis.
    */
  private[ext] val prototype: Array[Double] = {
    def i0(x: Double): Double = { // modified Bessel I0, series
      var sum = 1.0
      var term = 1.0
      var k = 1
      while (k < 50) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k))
        sum += term
        k += 1
      }
      sum
    }
    // Root-raised-cosine target response: exactly power-complementary at
    // the band crossover pi/64 (cos^2 + sin^2 across the mirrored
    // transition), realized by numeric inverse-DFT onto 512 taps with a
    // light Kaiser window to bound the truncation ripple.
    def build(rolloff: Double, beta: Double): Array[Double] = {
      val w0 = math.Pi / 64.0
      def target(w: Double): Double = {
        val lo = w0 * (1.0 - rolloff)
        val hi = w0 * (1.0 + rolloff)
        if (w <= lo) 1.0
        else if (w >= hi) 0.0
        else math.cos(math.Pi / 2.0 * (w - lo) / (hi - lo))
      }
      val grid = 4096
      val wMax = math.Pi / 16.0
      Array.tabulate(512) { n =>
        val t = n - 255.5
        var acc = 0.0
        var g = 0
        while (g < grid) {
          val w = (g + 0.5) * wMax / grid
          acc += target(w) * math.cos(w * t)
          g += 1
        }
        val kais = i0(beta * math.sqrt(math.max(0.0, 1.0 - math.pow(t / 256.0, 2)))) / i0(beta)
        (acc * wMax / grid / math.Pi) * kais
      }
    }
    // Near-PR pseudo-QMF needs POWER complementarity at the band
    // crossover: |P(w)|^2 + |P(pi/32 - w)|^2 ~ const over the transition
    // band (-3 dB at w = pi/64, not the windowed-sinc's natural -6 dB).
    // A one-dimensional cutoff-scale search at init picks the flattest
    // design — deterministic double math, ~1 ms once per JVM.
    def flatnessErr(h: Array[Double]): Double = {
      def mag(w: Double): Double = {
        var re = 0.0
        var im = 0.0
        var n = 0
        while (n < 512) {
          re += h(n) * math.cos(w * n)
          im -= h(n) * math.sin(w * n)
          n += 1
        }
        math.sqrt(re * re + im * im)
      }
      val dc = mag(1e-7)
      var err = 0.0
      var i = 0
      while (i <= 32) {
        val w = i / 32.0 * (math.Pi / 32.0)
        val p1 = mag(w) / dc
        val p2 = mag(math.abs(math.Pi / 32.0 - w)) / dc
        err = math.max(err, math.abs(p1 * p1 + p2 * p2 - 1.0))
        i += 1
      }
      err
    }
    var bestRoll = 0.8
    var bestBeta = 5.0
    var bestErr = Double.MaxValue
    val rolls = Array(0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
    val betas = Array(3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    var ri = 0
    while (ri < rolls.length) {
      var bi = 0
      while (bi < betas.length) {
        val e = flatnessErr(build(rolls(ri), betas(bi)))
        if (e < bestErr) { bestErr = e; bestRoll = rolls(ri); bestBeta = betas(bi) }
        bi += 1
      }
      ri += 1
    }
    build(bestRoll, bestBeta)
  }

  private val synthCos = Array.tabulate(64, 32)((i, k) =>
    math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0))

  /** End-to-end gain of analysis+synthesis with [[prototype]], measured
    * once at init on a mid-band sine; synthesis divides by it so the
    * filterbank is unity-gain (the analytic prototype's absolute scale
    * is arbitrary).
    */
  private[ext] lazy val fbGain: Double = {
    val n = 4096
    val x = Array.tabulate(n)(t => math.sin(2 * math.Pi * 0.09 * t))
    val y = filterRoundtrip(x)
    // steady-state RMS ratio over the middle (skip 1024 warm/tail)
    def rms(a: Array[Double], from: Int, until: Int): Double = {
      var s = 0.0
      var i = from
      while (i < until) { s += a(i) * a(i); i += 1 }
      math.sqrt(s / (until - from))
    }
    rms(y, 1500, 2800) / rms(x, 1500, 2800)
  }

  /** Roundtrip SNR for candidate modulation phase offsets — the probe
    * that pinned the (analysis d-16, synthesis n+17) pairing this
    * implementation's newest-first buffering requires (Mp3Spec explains;
    * the ISO C/D formulation's +-16 pair assumes its own indexing).
    */
  private[ext] def phaseProbe(anOff: Int, synOff: Int): (Int, Double) = {
    val n = 4096
    val x = Array.tabulate(n)(t => math.sin(2 * math.Pi * 0.0131 * t) +
      0.6 * math.sin(2 * math.Pi * 0.094 * t + 1.1))
    val cosA = Array.tabulate(32, 128)((k, d) =>
      math.cos((2 * k + 1) * (d - anOff) * math.Pi / 64.0))
    val cosS = Array.tabulate(64, 32)((i, k) =>
      math.cos((synOff + i) * (2 * k + 1) * math.Pi / 64.0))
    val buf = new Array[Double](512)
    val v = Array.ofDim[Double](16, 64)
    var head = 0
    val y = new Array[Double](n)
    val s = new Array[Double](32)
    var t = 0
    while (t + 32 <= n) {
      System.arraycopy(buf, 0, buf, 32, 480)
      var j = 0
      while (j < 32) { buf(j) = x(t + 31 - j); j += 1 }
      var k = 0
      while (k < 32) {
        var acc = 0.0
        var d = 0
        while (d < 512) { acc += prototype(d) * buf(d) * cosA(k)(d & 127); d += 1 }
        s(k) = acc
        k += 1
      }
      head = (head + 15) % 16
      var i2 = 0
      while (i2 < 64) {
        var acc = 0.0
        var k2 = 0
        while (k2 < 32) { acc += cosS(i2)(k2) * s(k2); k2 += 1 }
        v(head)(i2) = acc
        i2 += 1
      }
      j = 0
      while (j < 32) {
        var acc = 0.0
        var a = 0
        while (a < 16) {
          val blk = v((head + a) % 16)
          val idx = if (a % 2 == 0) j else 32 + j
          val sgn = if (a % 4 < 2) 1.0 else -1.0
          acc += prototype(32 * a + j) * sgn * blk(idx)
          a += 1
        }
        y(t + j) = acc
        j += 1
      }
      t += 32
    }
    // best delay + gain-compensated SNR over the interior
    def snrAt(d: Int): Double = {
      var sxy = 0.0
      var sxx = 0.0
      var i = 1024
      while (i < n - 1024) { sxy += x(i) * y(i + d); sxx += y(i + d) * y(i + d); i += 1 }
      val g = if (sxx == 0) 1.0 else sxy / sxx
      var se = 0.0
      var ss = 0.0
      i = 1024
      while (i < n - 1024) {
        val e = x(i) - g * y(i + d)
        se += e * e
        ss += x(i) * x(i)
        i += 1
      }
      10.0 * math.log10(ss / math.max(se, 1e-30))
    }
    val best = (380 to 640).maxBy(snrAt)
    (best, snrAt(best))
  }

  /** analysis then synthesis, no MDCT — init calibration + spec probe.
    * Output y[t] aligned to input with the filterbank's group delay
    * (~511 samples) still in place.
    */
  private[ext] def filterRoundtrip(x: Array[Double]): Array[Double] = {
    val an = new Analysis
    val sy = new Synthesis(1.0)
    val out = new Array[Double](x.length)
    val s = new Array[Double](32)
    val blk = new Array[Double](32)
    var t = 0
    while (t + 32 <= x.length) {
      var j = 0
      while (j < 32) { blk(j) = x(t + j); j += 1 }
      an.push(blk, s)
      sy.next(s, out, t)
      t += 32
    }
    out
  }

  /** Sliding-window analysis filterbank (encoder + calibration). */
  private[ext] final class Analysis {
    private val buf = new Array[Double](512) // buf(d) = x[t - d]
    private val folded = new Array[Double](128)
    private val cosA = Array.tabulate(32, 128)((k, x) =>
      math.cos((2 * k + 1) * (x - 16) * math.Pi / 64.0))
    def push(in32: Array[Double], outS: Array[Double]): Unit = {
      // shift 32 newest in (in32(31) is the newest sample)
      System.arraycopy(buf, 0, buf, 32, 480)
      var j = 0
      while (j < 32) { buf(j) = in32(31 - j); j += 1 }
      var x = 0
      while (x < 128) {
        // cos((2k+1)(d-16)pi/64) has period 128 in d with NO sign flip
        // ((2k+1)*128*pi/64 = (2k+1)*2pi), so the 4-way fold is a plain
        // sum — the ISO C-window's alternating signs belong to its own
        // 64-wide Z/Y formulation, not to this direct form
        var acc = 0.0
        var p = 0
        while (p < 4) {
          val d = x + 128 * p
          acc += prototype(d) * buf(d)
          p += 1
        }
        folded(x) = acc
        x += 1
      }
      var k = 0
      while (k < 32) {
        var acc = 0.0
        var xx = 0
        while (xx < 128) { acc += cosA(k)(xx) * folded(xx); xx += 1 }
        outS(k) = acc
        k += 1
      }
    }
  }

  /** 16-block V-ring synthesis (decoder). `gain` divides the output. */
  private[ext] final class Synthesis(gain: Double) {
    private val v = Array.ofDim[Double](16, 64)
    private var head = 0
    def next(s: Array[Double], out: Array[Double], off: Int): Unit = {
      head = (head + 15) % 16
      val vb = v(head)
      var i = 0
      while (i < 64) {
        var acc = 0.0
        var k = 0
        while (k < 32) { acc += synthCos(i)(k) * s(k); k += 1 }
        vb(i) = acc
        i += 1
      }
      var j = 0
      while (j < 32) {
        var acc = 0.0
        var a = 0
        while (a < 16) {
          val blk = v((head + a) % 16)
          val idx = if (a % 2 == 0) j else 32 + j
          val sgn = if (a % 4 < 2) 1.0 else -1.0
          acc += prototype(32 * a + j) * sgn * blk(idx)
          a += 1
        }
        out(off + j) = acc / gain
        j += 1
      }
    }
  }

  // ------------------------------------------------------- decoding

  /** Codec delay of the full encode+decode chain: the QMF pair's group
    * delay — 481 under this implementation's block convention (the
    * symmetric 512-tap pair's 511 minus the 30-sample offset from
    * newest-sample-first block buffering) — plus one granule of MDCT
    * overlap (576). Decode trims this many output samples so
    * decode(Mp3Enc.encode(x)) aligns with x from sample 0 — measured and
    * pinned at the sample level by Mp3Spec.
    */
  private[ext] val CodecDelay = 481 + 576

  private final class ChannelState {
    val overlap = Array.ofDim[Double](32, 18)
    val synthesis = new Synthesis(fbGain)
  }

  /** Decode every Layer III frame of `payload` to PCM; None if the
    * stream is not MPEG audio, uses an unsupported arm (see envelope),
    * or any frame is malformed. Output is interleaved 16-bit-equivalent
    * ints at the stream's sample rate.
    */
  def decode(payload: Array[Byte]): Option[Audio] = {
    try decodeImpl(payload, null)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-frame triage for the interop certificate: every frame's header
    * fields + the Huffman tables its granules select + whether this
    * build supports them. Works on streams [[decode]] gates out.
    */
  def inventory(payload: Array[Byte]): Seq[FrameStat] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[FrameStat]
    try { decodeImpl(payload, acc); () }
    catch { case scala.util.control.NonFatal(_) => () }
    acc.toSeq
  }

  private def decodeImpl(payload: Array[Byte],
      stats: scala.collection.mutable.ArrayBuffer[FrameStat]): Option[Audio] = {
    if (payload == null || payload.length < 4) return None
    var i = 0
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3')
      i = 10 + (((payload(6) & 0x7F) << 21) | ((payload(7) & 0x7F) << 14) |
        ((payload(8) & 0x7F) << 7) | (payload(9) & 0x7F))
    // rolling main-data store
    var res = new Array[Byte](8192)
    var resLen = 0
    val pcm = new scala.collection.mutable.ArrayBuilder.ofInt
    var sampleRate = 0
    var channels = 0
    var states: Array[ChannelState] = null
    var allOk = true
    var frames = 0
    while (i + 4 <= payload.length) {
      if (payload.length - i == 128 && payload(i) == 'T' &&
          payload(i + 1) == 'A' && payload(i + 2) == 'G') {
        i = payload.length
      } else headerAt(payload, i) match {
        case None =>
          var j = i + 1
          while (j + 4 <= payload.length && headerAt(payload, j).isEmpty) j += 1
          i = if (j + 4 <= payload.length) j else payload.length
        case Some((version, kbps, rate, chans, mode, modeExt, crc, frameLen)) =>
          if (i + frameLen > payload.length) { i = payload.length }
          else {
            if (sampleRate == 0) {
              sampleRate = rate
              channels = chans
              states = Array.fill(chans)(new ChannelState)
            }
            val lsf = version != 1
            if (rate != sampleRate || chans != channels) allOk = false
            else if (lsf && mode == 1 && (modeExt & 1) == 1) allOk = false // LSF intensity
            else {
              val sideStart = i + 4 + (if (crc) 2 else 0)
              val sideBytes = if (lsf) { if (chans == 1) 9 else 17 }
              else { if (chans == 1) 17 else 32 }
              if (sideStart + sideBytes > i + frameLen) allOk = false
              else {
                val r = new BitReader(payload, sideStart.toLong * 8)
                val si = parseSideInfo(r, version, chans)
                // append this frame's main data to the store
                val mdStart = sideStart + sideBytes
                val mdLen = i + frameLen - mdStart
                if (resLen + mdLen > res.length) {
                  // keep the last 4096 bytes (main_data_begin <= 511)
                  val keep = math.min(resLen, 4096)
                  System.arraycopy(res, resLen - keep, res, 0, keep)
                  resLen = keep
                  if (resLen + mdLen > res.length)
                    res = java.util.Arrays.copyOf(res, (resLen + mdLen) * 2)
                }
                val frameDataStart = resLen - si.mainDataBegin
                System.arraycopy(payload, mdStart, res, resLen, mdLen)
                resLen += mdLen
                val tset = scala.collection.mutable.Set.empty[Int]
                var frameOk = frameDataStart >= 0
                if (frameOk) {
                  val mr = new BitReader(res, frameDataStart.toLong * 8)
                  val out = Array.ofDim[Double](chans, 576)
                  var g = 0
                  while (g < si.granules && frameOk) {
                    val xr = Array.ofDim[Double](chans, 576)
                    var ch = 0
                    while (ch < chans && frameOk) {
                      val gr = si.gr(g)(ch)
                      val part2Start = mr.pos
                      if (!lsf)
                        scalefactorsV1(mr, gr, si.gr(0)(ch), si.scfsi(ch), g)
                      else if (!scalefactorsLsf(mr, gr)) frameOk = false
                      if (frameOk) {
                        val is = new Array[Int](576)
                        // huffman reads exactly up to part2Start + part23
                        val limitReader = mr
                        val saved = limitReader.pos
                        frameOk = huffmanAt(limitReader, gr, part2Start, rate, is, tset)
                        if (frameOk) {
                          requantize(gr, rate, is, xr(ch))
                          reorderShort(gr, rate, xr(ch))
                        } else limitReader.pos = saved
                      }
                      ch += 1
                    }
                    if (frameOk) {
                      if (chans == 2 && mode == 1 && (modeExt & 1) != 0 && !lsf)
                        intensityStereo(xr(0), xr(1), si.gr(g)(0), si.gr(g)(1),
                          rate, msAlso = (modeExt & 2) != 0)
                      else if (chans == 2 && mode == 1 && (modeExt & 2) != 0)
                        midSide(xr(0), xr(1))
                      var ch2 = 0
                      while (ch2 < chans) {
                        val gr = si.gr(g)(ch2)
                        aliasReduce(gr, xr(ch2))
                        hybridAndSynth(gr, xr(ch2), states(ch2), out(ch2))
                        ch2 += 1
                      }
                      emit(pcm, out, chans)
                    }
                    g += 1
                  }
                }
                if (!frameOk) allOk = false
                if (stats != null)
                  stats += FrameStat(i, version, kbps, rate, chans,
                    tset.toSet, frameOk)
              }
            }
            frames += 1
            i += frameLen
          }
      }
    }
    if (frames == 0 || sampleRate == 0 || !allOk) None
    else {
      val all = pcm.result()
      // trim the codec delay so output aligns with the encoder's input
      val trim = math.min(all.length, CodecDelay * channels)
      Some(Audio(sampleRate, channels,
        java.util.Arrays.copyOfRange(all, trim, all.length)))
    }
  }

  private def huffmanAt(r: BitReader, gr: Granule, part2Start: Long,
      rate: Int, is: Array[Int],
      tset: scala.collection.mutable.Set[Int]): Boolean = {
    val limit = part2Start + gr.part23
    if (r.pos > limit) return false
    huffmanRegions(r, gr, limit, rate, is, tset)
  }

  private def huffmanRegions(r: BitReader, gr: Granule, limit: Long,
      rate: Int, is: Array[Int],
      tset: scala.collection.mutable.Set[Int]): Boolean = {
    java.util.Arrays.fill(is, 0)
    val bv2 = math.min(gr.bigValues * 2, 576)
    val long = sfbLong(rate)
    val (r0, r1) =
      if (gr.windowSwitching) (math.min(36, bv2), bv2)
      else {
        val b0 = long(math.min(gr.region0Count + 1, 22))
        val b1 = long(math.min(gr.region0Count + 1 + gr.region1Count + 1, 22))
        (math.min(b0, bv2), math.min(b1, bv2))
      }
    var i = 0
    while (i < bv2) {
      val region = if (i < r0) 0 else if (i < r1) 1 else 2
      val tid = gr.tableSelect(region)
      tset += tid
      if (!Tables.supported(tid)) return false
      if (tid == 0) { i += 2 }
      else {
        val t = Tables.bigValue(tid)
        val sym = readTree(r, t)
        var x = sym / t.ylen
        var y = sym % t.ylen
        if (x == 15 && t.linbits > 0) x += r.bits(t.linbits)
        val sx = if (x != 0 && r.bit() == 1) -x else x
        if (y == 15 && t.linbits > 0) y += r.bits(t.linbits)
        val sy = if (y != 0 && r.bit() == 1) -y else y
        is(i) = sx; is(i + 1) = sy
        i += 2
      }
      if (r.pos > limit) return false
    }
    val cnt = if (gr.count1Table == 1) Tables.cntB else Tables.cntA
    var stop = false
    while (!stop && r.pos < limit && i + 3 < 576) {
      val mark = r.pos
      val vwxy = readTree(r, cnt)
      val quad = new Array[Int](4)
      var k = 0
      while (k < 4) {
        if (((vwxy >> (3 - k)) & 1) == 1)
          quad(k) = if (r.bit() == 1) -1 else 1
        k += 1
      }
      if (r.pos > limit) { r.pos = mark; stop = true } // overrun rewind
      else {
        var q = 0
        while (q < 4) { is(i + q) = quad(q); q += 1 }
        i += 4
      }
    }
    r.pos = limit
    true
  }

  /** IMDCT per subband (window type per block type / mixed split),
    * overlap-add with the stored second halves, frequency inversion,
    * then 18 polyphase synthesis calls into `out` (576 samples).
    */
  private def hybridAndSynth(gr: Granule, xr: Array[Double],
      st: ChannelState, out: Array[Double]): Unit = {
    val time = Array.ofDim[Double](32, 18)
    var sb = 0
    while (sb < 32) {
      val effBt =
        if (!gr.windowSwitching) 0
        else if (gr.blockType == 2 && gr.mixed && sb < 2) 0
        else gr.blockType
      val w = imdctBlock(xr, sb * 18, effBt)
      var n = 0
      while (n < 18) {
        time(sb)(n) = w(n) + st.overlap(sb)(n)
        st.overlap(sb)(n) = w(n + 18)
        n += 1
      }
      // frequency inversion: odd time samples of odd subbands
      if (sb % 2 == 1) {
        var t = 1
        while (t < 18) { time(sb)(t) = -time(sb)(t); t += 2 }
      }
      sb += 1
    }
    val s = new Array[Double](32)
    var t = 0
    while (t < 18) {
      var k = 0
      while (k < 32) { s(k) = time(k)(t); k += 1 }
      st.synthesis.next(s, out, t * 32)
      t += 1
    }
  }

  private def emit(pcm: scala.collection.mutable.ArrayBuilder.ofInt,
      out: Array[Array[Double]], chans: Int): Unit = {
    var t = 0
    while (t < 576) {
      var ch = 0
      while (ch < chans) {
        val v = math.round(out(ch)(t)).toInt
        pcm += (if (v > 32767) 32767 else if (v < -32768) -32768 else v)
        ch += 1
      }
      t += 1
    }
  }

  /** (version 1|2|25, kbps, rate, channels, mode, modeExt, crc,
    * frameLen) — Layer III only (Layer I/II stay metadata-only in
    * [[Mpeg]]).
    */
  private[ext] def headerAt(b: Array[Byte], i: Int): Option[(Int, Int, Int, Int, Int, Int, Boolean, Int)] = {
    if (i + 4 > b.length) return None
    val h1 = b(i) & 0xFF; val h2 = b(i + 1) & 0xFF
    val h3 = b(i + 2) & 0xFF; val h4 = b(i + 3) & 0xFF
    if (h1 != 0xFF || (h2 & 0xE0) != 0xE0) return None
    val verId = (h2 >> 3) & 3
    val layerId = (h2 >> 1) & 3
    if (verId == 1 || layerId != 1) return None // Layer III only here
    val version = if (verId == 3) 1 else if (verId == 2) 2 else 25
    val brIdx = (h3 >> 4) & 0xF
    val srIdx = (h3 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val pad = (h3 >> 1) & 1
    val mode = (h4 >> 6) & 3
    val modeExt = (h4 >> 4) & 3
    val channels = if (mode == 3) 1 else 2
    val kbps =
      if (version == 1) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
      else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
    val rate = (version match {
      case 1 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    })(srIdx)
    val spf = if (version == 1) 1152 else 576
    val frameLen = spf / 8 * kbps * 1000 / rate + pad
    if (frameLen <= 4) None
    else Some((version, kbps, rate, channels, mode, modeExt, (h2 & 1) == 0, frameLen))
  }

  /** Mono 16-bit-equivalent samples (channel mean) — the [[AudioFp]]
    * seam, the MP3 twin of WAV/FLAC [[AudioFp.monoSamples]] arms.
    */
  def decodeMono(payload: Array[Byte]): Option[Array[Int]] =
    decode(payload).map { a =>
      if (a.channels == 1) a.samples
      else {
        val n = a.samples.length / a.channels
        Array.tabulate(n) { i =>
          var acc = 0L
          var c = 0
          while (c < a.channels) { acc += a.samples(i * a.channels + c); c += 1 }
          (acc / a.channels).toInt
        }
      }
    }

  /** True when the payload leads with an MPEG Layer III frame chain or
    * ID3v2 tag (sniff gate; [[Mpeg.mp3Meta]] stays the triage arm).
    */
  def isMp3(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') || headerAt(b, 0).isDefined)
}
