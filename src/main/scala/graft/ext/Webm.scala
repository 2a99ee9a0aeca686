package graft.ext

import scala.collection.mutable.ArrayBuffer

/** WebM / Matroska (EBML, RFC 8794) container walk — the third video
  * container arm beside [[Mp4]] (ISO-BMFF) and the RIFF/AVI path:
  * web-native video is MP4 + WebM, and triage over a crawl blob column
  * needs codec/dimension/duration metadata from both without decoding.
  *
  * Structure parsed:
  *   - EBML varints: the leading-zero count of the first byte gives the
  *     length; element IDs keep their marker bit, sizes strip it; an
  *     all-ones size means "unknown" (streamed files) and extends to the
  *     end of the enclosing element.
  *   - EBML header → DocType ("webm" / "matroska").
  *   - Segment → Info (TimecodeScale, default 1 000 000 ns; Duration, a
  *     4- or 8-byte IEEE float in timecode units) and Tracks →
  *     TrackEntry (TrackNumber, TrackType, CodecID, Video PixelWidth /
  *     PixelHeight, Audio SamplingFrequency / Channels).
  *
  * Every read is bounds-checked; malformed varints or truncated
  * elements end the walk with what parsed so far, never a throw.
  */
object Webm {

  final case class Track(
      track_number: Long,
      track_type: Int, // 1 = video, 2 = audio (Matroska enum)
      codec: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      channels: Int)

  final case class Meta(
      doc_type: String,
      timescale_ns: Long,
      duration_ms: Long,
      tracks: Vector[Track])

  /** (value, bytesUsed); marker bit kept for IDs, stripped for sizes.
    * (-1, 0) on malformed/out-of-range input.
    */
  private def varint(b: Array[Byte], i: Int, keepMarker: Boolean): (Long, Int) = {
    if (i >= b.length) return (-1L, 0)
    val first = b(i) & 0xFF
    if (first == 0) return (-1L, 0)
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (i + len > b.length || len > 8) return (-1L, 0)
    var v = (first & (if (keepMarker) 0xFF else (0xFF >>> len))).toLong
    var k = 1
    while (k < len) {
      v = (v << 8) | (b(i + k) & 0xFF)
      k += 1
    }
    (v, len)
  }

  /** True when the size varint was the all-ones "unknown size" code. */
  private def unknownSize(b: Array[Byte], i: Int, len: Int): Boolean = {
    if (len <= 0) return false
    val mask = 0xFF >>> len
    if ((b(i) & mask) != mask) return false
    var k = 1
    while (k < len) {
      if ((b(i + k) & 0xFF) != 0xFF) return false
      k += 1
    }
    true
  }

  /** Iterate child elements of [start, end) as (id, payloadStart,
    * payloadEnd). Unknown-size elements extend to the container end.
    */
  private def children(b: Array[Byte], start: Int, end: Int): Iterator[(Long, Int, Int)] =
    new Iterator[(Long, Int, Int)] {
      private var i = start
      private var nxt: (Long, Int, Int) = _
      private def advance(): Unit = {
        nxt = null
        if (i >= end) return
        val (id, idLen) = varint(b, i, keepMarker = true)
        if (idLen == 0) return
        val (size, szLen) = varint(b, i + idLen, keepMarker = false)
        if (szLen == 0) return
        val payload = i + idLen + szLen
        val pEnd =
          if (unknownSize(b, i + idLen, szLen)) end
          else if (size < 0 || payload + size > end.toLong) return
          else (payload + size).toInt
        nxt = (id, payload, pEnd)
        i = pEnd
      }
      advance()
      override def hasNext: Boolean = nxt != null
      override def next(): (Long, Int, Int) = { val r = nxt; advance(); r }
    }

  private def uint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
    v
  }

  private def float(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, s, e))
    case _ => 0.0
  }

  private def ascii(b: Array[Byte], s: Int, e: Int): String = {
    var n = e - s
    while (n > 0 && b(s + n - 1) == 0) n -= 1 // zero-padding is legal
    new String(b, s, n, "US-ASCII")
  }

  /** Container metadata. None unless the payload opens with an EBML
    * header carrying a matroska-family DocType.
    */
  def meta(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xFF) != 0x1A || (b(1) & 0xFF) != 0x45 ||
        (b(2) & 0xFF) != 0xDF || (b(3) & 0xFF) != 0xA3) return None
    try {
      var docType = ""
      var timescale = 1000000L // Matroska default: 1 ms per timecode unit
      var duration = 0.0
      val tracks = ArrayBuffer.empty[Track]
      for ((id, s, e) <- children(b, 0, b.length)) id match {
        case 0x1A45DFA3L => // EBML header
          for ((cid, cs, ce) <- children(b, s, e))
            if (cid == 0x4282L) docType = ascii(b, cs, ce)
        case 0x18538067L => // Segment
          for ((cid, cs, ce) <- children(b, s, e)) cid match {
            case 0x1549A966L => // Info
              for ((iid, is, ie) <- children(b, cs, ce)) iid match {
                case 0x2AD7B1L => timescale = uint(b, is, ie)
                case 0x4489L => duration = float(b, is, ie)
                case _ => ()
              }
            case 0x1654AE6BL => // Tracks
              for ((tid, ts, te) <- children(b, cs, ce))
                if (tid == 0xAEL) { // TrackEntry
                  var num = 0L; var tpe = 0; var codec = ""
                  var w = 0; var h = 0; var rate = 0; var ch = 0
                  for ((eid, es, ee) <- children(b, ts, te)) eid match {
                    case 0xD7L => num = uint(b, es, ee)
                    case 0x83L => tpe = uint(b, es, ee).toInt
                    case 0x86L => codec = ascii(b, es, ee)
                    case 0xE0L => // Video
                      for ((vid, vs, ve) <- children(b, es, ee)) vid match {
                        case 0xB0L => w = uint(b, vs, ve).toInt
                        case 0xBAL => h = uint(b, vs, ve).toInt
                        case _ => ()
                      }
                    case 0xE1L => // Audio
                      for ((aid, as_, ae) <- children(b, es, ee)) aid match {
                        case 0xB5L => rate = math.round(float(b, as_, ae)).toInt
                        case 0x9FL => ch = uint(b, as_, ae).toInt
                        case _ => ()
                      }
                    case _ => ()
                  }
                  tracks += Track(num, tpe, codec, w, h, rate, ch)
                }
            case _ => ()
          }
        case _ => ()
      }
      if (!docType.startsWith("webm") && !docType.startsWith("matroska")) None
      else Some(Meta(docType, timescale,
        math.floor(duration * timescale / 1e6).toLong, tracks.toVector))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ----------------------------------------------- keyframe extraction

  /** First video keyframe of the first video track: codec ID, declared
    * pixel dims, and the raw coded frame bytes.
    *
    * Walk: Segment → Tracks → first TrackEntry with TrackType 1 gives
    * the wanted TrackNumber + CodecID; then Segment → Clusters in file
    * order, taking the first block on that track that is a keyframe —
    * for SimpleBlock (0xA3) the 0x80 flag bit, for BlockGroup (0xA0)
    * the ABSENCE of a ReferenceBlock child (the Matroska rule; Block's
    * own 0x80 bit is not a keyframe flag there). Envelope: laced blocks
    * (flag bits 0x06) are skipped — lacing packs many small AUDIO
    * frames per block; video is one frame per block in practice.
    */
  final case class Keyframe(
      codec: String, width: Int, height: Int, frame: Array[Byte])

  def firstVideoKeyframe(b: Array[Byte]): Option[Keyframe] = {
    val vtOpt = meta(b).flatMap(_.tracks.find(_.track_type == 1))
    if (vtOpt.isEmpty) return None
    val vt = vtOpt.get
    try {
      val blocks = for {
        (id, s, e) <- children(b, 0, b.length) if id == 0x18538067L // Segment
        (cid, cs, ce) <- children(b, s, e) if cid == 0x1F43B675L // Cluster
        (bid, bs, be) <- children(b, cs, ce)
        frame <- (bid match {
          case 0xA3L => // SimpleBlock: keyframe = 0x80 flag
            blockFrame(b, bs, be, vt.track_number, needKeyBit = true)
          case 0xA0L => // BlockGroup: keyframe = no ReferenceBlock
            var fr: Option[Array[Byte]] = None
            var referenced = false
            for ((gid, gs, ge) <- children(b, bs, be)) gid match {
              case 0xA1L => // Block
                fr = blockFrame(b, gs, ge, vt.track_number, needKeyBit = false)
              case 0xFBL => referenced = true
              case _ => ()
            }
            if (referenced) None else fr
          case _ => None
        }).iterator
      } yield frame
      if (blocks.hasNext)
        Some(Keyframe(vt.codec, vt.width, vt.height, blocks.next()))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Frame bytes of a (Simple)Block payload [s, e) if it is on `track`,
    * unlaced, and (when `needKeyBit`) carries the keyframe flag.
    */
  private def blockFrame(
      b: Array[Byte], s: Int, e: Int, track: Long,
      needKeyBit: Boolean): Option[Array[Byte]] = {
    val (tn, tl) = varint(b, s, keepMarker = false)
    if (tl == 0 || tn != track) return None
    val p = s + tl // 2-byte timecode + 1 flags byte precede the frame
    if (p + 3 >= e) return None
    val flags = b(p + 2) & 0xFF
    if ((flags & 0x06) != 0) return None // laced — out of envelope
    if (needKeyBit && (flags & 0x80) == 0) return None
    Some(java.util.Arrays.copyOfRange(b, p + 3, e))
  }

  /** Video-thumbnail decode: the first V_VP8 keyframe through the
    * [[Vp8]] intra decoder to the canonical RGB raster — how a video
    * joins the IMAGE dedup/triage cell ([[Png.decodeAny]] chains here
    * on the EBML magic). V_VP9/V_AV1 tracks (no decoder arm) and laced
    * or keyframe-less streams gate to None. Alpha (Matroska
    * BlockAdditions) is out of envelope — thumbnails are opaque.
    */
  def decodeFirstFrame(b: Array[Byte]): Option[Png.Image] =
    firstVideoKeyframe(b).flatMap { kf =>
      if (kf.codec == "V_VP8")
        Vp8.decodeFrame(kf.frame, 0, kf.frame.length).map(Vp8.toPngImage)
      else None
    }

  /** Wrap raw VP8 keyframe bitstreams in a minimal playable WebM (EBML
    * header + Segment{Info, Tracks[V_VP8], Cluster}) — the fixture /
    * plant builder behind WebmSpec and q_video_thumb_anchor. The first
    * frame is flagged keyframe; the rest are delta-flagged (a real
    * stream's shape). 33 ms per frame at the default 1 ms timescale.
    */
  private[graft] def buildVp8(
      w: Int, h: Int, frames: Seq[Array[Byte]],
      trackNumber: Long = 1L,
      firstIsKey: Boolean = true): Array[Byte] = {
    require(trackNumber > 0 && trackNumber < 127, "builder: 1-byte track varint")
    val ebml = el(0x1A45DFA3L,
      el(0x4286L, uintB(1)), el(0x42F7L, uintB(1)), el(0x42F2L, uintB(4)),
      el(0x42F3L, uintB(8)), el(0x4282L, "webm".getBytes("US-ASCII")),
      el(0x4287L, uintB(4)), el(0x4285L, uintB(2)))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uintB(1000000L)),
      el(0x4489L, floatB(33.0f * frames.length)))
    val tracks = el(0x1654AE6BL, el(0xAEL,
      el(0xD7L, uintB(trackNumber)), el(0x73C5L, uintB(trackNumber)),
      el(0x83L, uintB(1)), el(0x86L, "V_VP8".getBytes("US-ASCII")),
      el(0xE0L, el(0xB0L, uintB(w)), el(0xBAL, uintB(h)))))
    val blocks = frames.zipWithIndex.map { case (f, i) =>
      val key = if (i == 0 && firstIsKey) 0x80 else 0x00
      val tc = i * 33
      el(0xA3L, Array((0x80 | trackNumber).toByte,
        ((tc >> 8) & 0xFF).toByte, (tc & 0xFF).toByte, key.toByte), f)
    }
    val cluster = el(0x1F43B675L, (el(0xE7L, uintB(0)) +: blocks): _*)
    ebml ++ el(0x18538067L, info, tracks, cluster)
  }

  /** Re-container a lossy simple WebP as WebM: lift the 'VP8 ' chunk's
    * raw keyframe out of the RIFF and wrap it with [[buildVp8]] — the
    * cross-CONTAINER plant builder (same coded bits, video file).
    */
  private[graft] def wrapWebpLossy(webp: Array[Byte]): Option[Array[Byte]] =
    Vp8.findVp8Chunk(webp).flatMap { case (s, e) =>
      val frame = java.util.Arrays.copyOfRange(webp, s, e)
      Vp8.decodeFrame(frame, 0, frame.length)
        .map(yuv => buildVp8(yuv.width, yuv.height, Seq(frame)))
    }

  /** Assemble one EBML element (raw id bytes + 1/2/4-byte size varint +
    * payload) — shared by the spec/certificate builders.
    */
  private[graft] def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    // strict: each size width excludes its all-ones pattern (16383
    // 2-byte, 0x0FFFFFFF 4-byte) — EBML readers (including this parser)
    // treat all-ones as "unknown size", swallowing the container tail
    require(body.length < 0x0FFFFFFF,
      s"builder supports <2^28-1 B elements: ${body.length}")
    val idLen = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    val idB = Array.tabulate(idLen)(k => ((id >>> (8 * (idLen - 1 - k))) & 0xFF).toByte)
    val sizeB =
      if (body.length < 127) Array((0x80 | body.length).toByte)
      else if (body.length < 16383)
        Array((0x40 | (body.length >>> 8)).toByte, (body.length & 0xFF).toByte)
      else Array((0x10 | (body.length >>> 24)).toByte,
        ((body.length >>> 16) & 0xFF).toByte,
        ((body.length >>> 8) & 0xFF).toByte, (body.length & 0xFF).toByte)
    idB ++ sizeB ++ body
  }

  private[graft] def uintB(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    Array.tabulate(n)(k => ((v >>> (8 * (n - 1 - k))) & 0xFF).toByte)
  }

  private[graft] def floatB(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array.tabulate(4)(k => ((bits >>> (8 * (3 - k))) & 0xFF).toByte)
  }
}
