package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class SubtitlesSpec extends AnyFunSuite {

  test("SRT: CRLF endings, multi-line text, document-order numbering") {
    val srt = "1\r\n00:00:01,000 --> 00:00:02,500\r\nline one\r\nline two\r\n" +
      "\r\n99\r\n00:01:00,250 --> 00:01:02,000\r\nsecond cue\r\n"
    val cues = Subtitles.srt(srt)
    assert(cues.length == 2)
    assert(cues(0) == Subtitles.Cue(1, 1000, 2500, "line one\nline two"))
    // declared index 99 is ignored: numbering is document order
    assert(cues(1).cue_no == 2 && cues(1).start_ms == 60250)
  }

  test("VTT: BOM, hour-less stamps, NOTE blocks, ids, settings, markup") {
    val vtt = "﻿WEBVTT - some title\n\nNOTE\nmulti-line note\n\n" +
      "intro-cue\n01:02.500 --> 01:04.000 align:start position:10%\n" +
      "<i>styled</i> and <00:01:03.000>karaoke <c.red>color</c>\n\n" +
      "00:00:05.000 --> 00:00:06.000\nplain\n"
    val cues = Subtitles.vtt(vtt).get
    assert(cues.length == 2)
    assert(cues(0).start_ms == 62500 && cues(0).end_ms == 64000)
    assert(cues(0).text == "styled and karaoke color")
    assert(cues(1).text == "plain")
    // SRT content is not VTT
    assert(Subtitles.vtt("1\n00:00:01,000 --> 00:00:02,000\nx\n").isEmpty)
    assert(Subtitles.vtt(null).isEmpty)
  }

  test("malformed blocks are skipped, never thrown") {
    val messy = "garbage line\n\nnot a time --> also not\n\n" +
      "2\n00:00:01,000 --> 00:00:02,000\nsurvivor\n\n" +
      "3\n00:00:bad,000 --> 00:00:05,000\ndropped\n"
    val cues = Subtitles.srt(messy)
    assert(cues.map(_.text) == Seq("survivor"))
    assert(Subtitles.srt(null).isEmpty)
    assert(Subtitles.srt("").isEmpty)
  }

  test("timestamp grammar: comma/dot millis, hour-less, negatives rejected") {
    assert(Subtitles.timestampMs("01:02:03,456") == 3723456L)
    assert(Subtitles.timestampMs("01:02:03.456") == 3723456L)
    assert(Subtitles.timestampMs("02:03.456") == 123456L)
    // fractional part scales by digit count: "1.5" is 1500 ms, not 1005
    // (WebVTT mandates 3 digits; real-world files carry 1-2)
    assert(Subtitles.timestampMs("00:00:01.5") == 1500L)
    assert(Subtitles.timestampMs("00:00:01.50") == 1500L)
    assert(Subtitles.timestampMs("00:00:01.05") == 1050L)
    assert(Subtitles.timestampMs("00:00:01.5005") == 1500L) // truncated to ms
    assert(Subtitles.timestampMs("00:00:01.") == -1L)
    assert(Subtitles.timestampMs("00:00:01.5x") == -1L)
    assert(Subtitles.timestampMs("bad") == -1L)
    assert(Subtitles.timestampMs("1:2") == -1L)
  }

  test("ID3v2 text frames: padding stop, unknown frames, truncation fuzz") {
    // v2.3, one known + one unknown frame + padding
    def be32(v: Int) = Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val tit = "TIT2".getBytes ++ be32(6) ++ Array[Byte](0, 0) ++
      (0.toByte +: "hello".getBytes("ISO-8859-1"))
    val unknown = "WXYZ".getBytes ++ be32(3) ++ Array[Byte](0, 0, 9, 9, 9)
    val frames = tit ++ unknown ++ new Array[Byte](20) // padding
    def ss(v: Int) = Array(((v >>> 21) & 0x7F).toByte, ((v >>> 14) & 0x7F).toByte,
      ((v >>> 7) & 0x7F).toByte, (v & 0x7F).toByte)
    val tag = "ID3".getBytes ++ Array[Byte](3, 0, 0) ++ ss(frames.length) ++ frames
    val t = Mpeg.id3Tags(tag).get
    assert(t.title == "hello" && t.artist == "" && t.year == "")
    assert(Mpeg.id3Tags("no tag here".getBytes).isEmpty)
    assert(Mpeg.id3Tags(null).isEmpty)
    // unsynchronised tag (flag 0x80): fail-safe None, never corrupt text
    val unsync = tag.clone(); unsync(5) = 0x80.toByte
    assert(Mpeg.id3Tags(unsync).isEmpty)
    var i = 0
    while (i <= tag.length) { Mpeg.id3Tags(tag.take(i)); i += 1 }
    // UTF-16BE (encoding 2) with a NUL terminator
    val be = "TIT2".getBytes ++ be32(1 + 10) ++ Array[Byte](0, 0) ++
      (2.toByte +: ("café".getBytes("UTF-16BE") ++ Array[Byte](0, 0)))
    val tag2 = "ID3".getBytes ++ Array[Byte](3, 0, 0) ++ ss(be.length) ++ be
    assert(Mpeg.id3Tags(tag2).get.title == "café")
  }
}
