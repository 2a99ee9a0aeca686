package graft.ext

import scala.collection.mutable.ArrayBuffer

/** Subtitle text extraction — SRT and WebVTT, the transcript formats
  * riding beside crawled video. Transcripts are prime training text
  * (aligned, punctuated, conversational), so the curation pipeline
  * wants them as (cue, start, end, text) rows the same way [[Warc]]
  * yields HTTP records.
  *
  * Envelope:
  *   - SRT: blank-line-separated blocks — optional numeric index line,
  *     `HH:MM:SS,mmm --> HH:MM:SS,mmm` time line, text lines joined
  *     with newlines. Cue numbers are assigned in document order (the
  *     declared indices of real-world files are unreliable).
  *   - WebVTT (W3C): `WEBVTT` header line; NOTE/STYLE/REGION blocks
  *     skipped; optional cue-identifier lines; dot milliseconds and
  *     hour-less `MM:SS.mmm` timestamps; inline markup (`<i>`, `<c>`,
  *     `<00:00:01.000>` karaoke stamps) stripped from the text.
  *   - Timestamps after the `-->` may carry cue settings
  *     (`align:start`), ignored.
  * Malformed blocks are skipped, never thrown on.
  */
object Subtitles {

  final case class Cue(cue_no: Int, start_ms: Long, end_ms: Long, text: String)

  /** `HH:MM:SS,mmm`, `HH:MM:SS.mmm`, or `MM:SS.mmm` → milliseconds;
    * -1 when unparseable.
    */
  private[ext] def timestampMs(s0: String): Long = {
    val s = s0.trim
    val parts = s.split(":")
    if (parts.length < 2 || parts.length > 3) return -1L
    try {
      val secMs = parts.last.split("[,.]")
      if (secMs.length != 2) return -1L
      val sec = secMs(0).trim.toInt
      // the fraction scales by its digit count: WebVTT mandates 3 digits
      // but real-world files carry 1-2 ("1.5" is 1500 ms, not 1005) and
      // occasionally more (truncated to ms precision)
      val frac = secMs(1).trim
      if (frac.isEmpty || !frac.forall(_.isDigit)) return -1L
      val ms =
        if (frac.length <= 3)
          frac.toInt * math.pow(10, 3 - frac.length).toInt
        else frac.substring(0, 3).toInt
      val min = parts(parts.length - 2).trim.toInt
      val hr = if (parts.length == 3) parts(0).trim.toInt else 0
      if (sec < 0 || ms < 0 || min < 0 || hr < 0) -1L
      else hr * 3600000L + min * 60000L + sec * 1000L + ms
    } catch { case _: NumberFormatException => -1L }
  }

  private def parseTimeLine(line: String): Option[(Long, Long)] = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) return None
    val start = timestampMs(line.substring(0, arrow))
    // cue settings after the end stamp (VTT `align:start`) are ignored
    val endPart = line.substring(arrow + 3).trim.split("\\s+").head
    val end = timestampMs(endPart)
    if (start < 0 || end < 0) None else Some((start, end))
  }

  /** Inline VTT markup removed: `<i>`, `</c>`, `<00:00:01.000>` …. */
  private[ext] def stripMarkup(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') depth += 1
      else if (c == '>' && depth > 0) depth -= 1
      else if (depth == 0) out.append(c)
      i += 1
    }
    out.toString
  }

  /** SRT cues in document order. */
  def srt(content: String): Seq[Cue] = parse(content, vtt = false)

  /** WebVTT cues; None unless the payload leads with a WEBVTT header. */
  def vtt(content: String): Option[Seq[Cue]] =
    if (content == null || !content.stripPrefix("﻿").startsWith("WEBVTT")) None
    else Some(parse(content, vtt = true))

  private def parse(content: String, vtt: Boolean): Seq[Cue] = {
    if (content == null) return Nil
    val lines = content.stripPrefix("﻿").split("\r?\n", -1)
    val out = ArrayBuffer.empty[Cue]
    var i = 0
    var cueNo = 0
    def isBlank(s: String): Boolean = s.trim.isEmpty
    if (vtt) { // header line + anything until the first blank line
      while (i < lines.length && !isBlank(lines(i))) i += 1
    }
    while (i < lines.length) {
      if (isBlank(lines(i))) i += 1
      else if (vtt && (lines(i).startsWith("NOTE") || lines(i).startsWith("STYLE") ||
          lines(i).startsWith("REGION"))) {
        while (i < lines.length && !isBlank(lines(i))) i += 1 // skip block
      } else {
        // optional index / cue-identifier line, then the time line
        var timeLine = parseTimeLine(lines(i))
        if (timeLine.isEmpty && i + 1 < lines.length) {
          val next = parseTimeLine(lines(i + 1))
          if (next.nonEmpty) { timeLine = next; i += 1 }
        }
        timeLine match {
          case Some((start, end)) =>
            i += 1
            val text = new ArrayBuffer[String]
            while (i < lines.length && !isBlank(lines(i))) {
              text += (if (vtt) stripMarkup(lines(i)) else lines(i))
              i += 1
            }
            cueNo += 1
            out += Cue(cueNo, start, end, text.mkString("\n"))
          case None =>
            // not a cue block: skip this stray line
            i += 1
        }
      }
    }
    out.toSeq
  }
}
