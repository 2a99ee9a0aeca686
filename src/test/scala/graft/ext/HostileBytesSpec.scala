package graft.ext

/** Crawl data is hostile: every parser entry point must TOTAL-function
  * over arbitrary bytes (None / empty / default — never a throw). Two
  * deterministic rounds:
  *
  *   1. seeded-PRNG garbage at assorted lengths (incl. 0 and 1);
  *   2. every builder's VALID fixture with deterministic bit flips —
  *      the "almost valid" shapes truncation and corruption produce in
  *      the wild, which hit deeper code paths than pure noise.
  */
class HostileBytesSpec extends org.scalatest.funsuite.AnyFunSuite {

  // xorshift64* — deterministic across runs/JVMs
  private def bytes(seed: Long, n: Int): Array[Byte] = {
    var x = seed * 2685821657736338717L + 1
    Array.fill(n) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      ((x * 2685821657736338717L) >>> 56).toByte
    }
  }

  private def parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    ("sniff", b => Multimodal.sniffFormat(b)),
    ("epub", b => Epub.extract(b)),
    ("rtf", b => Rtf.text(b)),
    ("eml", b => Mail.parseEml(b)),
    ("mbox", b => Mail.parseMbox(b)),
    ("mhtml", b => Mhtml.parse(b)),
    ("sqlite_tables", b => Sqlite.tables(b)),
    ("sqlite_read", b => Sqlite.readTable(b, "t")),
    ("cfb", b => Cfb.entries(b)),
    ("cfb_read", b => Cfb.read(b, "WordDocument")),
    ("msdoc", b => MsDoc.text(b)),
    ("xls", b => Xls.cells(b)),
    ("ppt", b => Ppt.text(b)),
    ("msg", b => Msg.parse(b)),
    ("tnef", b => Tnef.parse(b)),
    ("iso", b => Iso.entries(b)),
    ("feed", b => Feed.parse(b)),
    ("torrent", b => Bencode.torrent(b)),
    ("ics", b => VObject.events(b)),
    ("vcf", b => VObject.cards(b)),
    ("ipynb", b => Ipynb.cells(b)),
    ("tex", b => Tex.text(b)),
    ("bib", b => Bib.entries(b)),
    ("lzfu", b => Lzfu.decompress(b)),
    ("odt", b => Odf.odtText(b)),
    ("ods", b => Odf.odsText(b)),
    ("dbf", b => Dbf.read(b)),
    ("axml", b => Axml.elements(b)),
    ("po", b => Gettext.entries(b)),
    ("xliff", b => Xliff.parse(b)),
    ("audio_fp", b => AudioFp.fingerprint(b)),
    ("vp8l", b => Vp8l.decode(b)),
    ("vp8", b => Vp8.decode(b)),
    ("webp_anim", b => Webp.animFrames(b)),
    ("apng", b => Apng.frames(b)),
    ("bmp", b => Bmp.decode(b)),
    ("ico", b => Ico.decode(b)),
    ("tiff_img", b => TiffImg.decode(b)),
    ("pnm", b => Pnm.decode(b)),
    ("mp3", b => Mp3.decode(b)),
    ("mp3_inventory", b => Mp3.inventory(b)),
    ("vorbis", b => Vorbis.decode(b)),
    ("ogg_packets", b => Ogg.packets(b)),
    ("webp_alpha", b => Webp.alphaPlane(b)))

  test("round 1: seeded garbage never throws") {
    for ((name, p) <- parsers; seed <- 0L until 40L;
         n <- Seq(0, 1, 7, 64, 1024, 4096)) {
      try p(bytes(seed * 1000 + n, n))
      catch {
        case e: Throwable =>
          fail(s"$name threw on garbage(seed=$seed, n=$n): $e")
      }
    }
  }

  private def fixtures: Seq[(String, Array[Byte])] = Seq(
    ("epub", Epub.build("T", Seq(("c.xhtml", "<html><body><p>x</p></body></html>")))),
    ("rtf", Rtf.build("some text\nline").getBytes("US-ASCII")),
    ("msdoc", MsDoc.build(Seq(("hello\r", true), ("more é", false)))),
    ("xls", Xls.build(Seq(Xls.Cell(0, 0, "a"), Xls.Cell(1, 0, 2.5)),
      sstSplitAt = 2)),
    ("ppt", Ppt.build(Seq("slide one", "slide ✓"))),
    ("msg", Msg.build("s", "f", "body", Seq(("n", "e@x")),
      Seq(("a.bin", Array[Byte](1, 2))), rtfBodyOnly = false)),
    ("msg_rtf", Msg.build("s", "f", "body", Seq.empty, Seq.empty,
      rtfBodyOnly = true)),
    ("tnef", Tnef.build("s", "b", rtfBody = true, Seq(("t", Array[Byte](3))))),
    ("iso", Iso.build(Seq(("a.txt", "x".getBytes), ("d/b.txt", "y".getBytes)))),
    ("sqlite", Sqlite.build(512, Seq(("t", Seq("id INTEGER PRIMARY KEY",
      "v TEXT"), (1 to 30).map(k => Seq[Any](null, "r" + k)))))),
    ("mhtml", Mhtml.build("t", "https://e", "<html><body>x</body></html>",
      Seq(("https://e/r", "text/css", "c{}".getBytes)))),
    ("torrent", Bencode.encode(Map("announce" -> "http://t",
      "info" -> Map("name" -> "n", "piece length" -> 1L, "length" -> 2L)))),
    ("ipynb", Ipynb.build(Seq(("code", "x=1\n", Some("1\n"))))),
    ("lzfu", Lzfu.compress("{\\rtf1 body}".getBytes("US-ASCII"))),
    ("odt", Odf.buildOdt(Seq("<text:p>t</text:p>"))),
    ("ods", Odf.buildOds(Seq(Seq("a", "b")))),
    ("dbf", Dbf.build(Seq(Dbf.DbfField("A", 'C', 5, 0),
      Dbf.DbfField("N", 'N', 6, 0)),
      Seq((false, Seq("x", 1L)), (true, Seq("y", 2L))))),
    ("axml", Axml.build(Seq(
      (0, "manifest", Seq(("package", "a.b"), ("v", 1))),
      (1, "application", Seq(("debuggable", true)))))),
    ("po", Gettext.build(Seq(("c", "id", Seq("str"), false)))),
    ("xliff", Xliff.build("en", "de", Seq(("u", "s", "t", "new")))),
    ("audio_fp_wav", AudioFp.wavPcm16(AudioFp.synthSamples(0x0123456789ABCDEFL))),
    ("audio_fp_flac", Flac.encode(
      Array(AudioFp.synthSamples(-1L)), 8000, 16, 256, Flac.Verbatim)),
    ("vp8l", Vp8l.encode(Vp8l.Image(16, 16,
      Array.tabulate(256)(i => 0xFF000000 | (i * 790951))),
      Vp8l.EncOpts(subtractGreen = true, predictorT = true, cacheBits = 4))),
    ("vp8", Vp8Enc.encode(Png.Image(24, 16, 3,
      Array.tabulate(24 * 16 * 3)(i => (i * 53 % 256).toByte)), 8, 2)),
    ("webp_anim", Webp.buildAnim(8, 8, (0 until 3).map(f =>
      (0, 0, 25, Vp8l.Image(8, 8,
        Array.tabulate(64)(i => 0xFF000000 | (i * 131071 + f * 777))))))),
    ("apng", Apng.build((0 until 3).map(f => Png.Image(8, 6, 3,
      Array.tabulate(144)(i => ((i * 37 + f * 91) % 256).toByte))))),
    ("bmp", Bmp.build(Png.Image(9, 5, 3,
      Array.tabulate(135)(i => (i * 29 % 256).toByte)))),
    ("ico", Ico.build(Seq(Png.Image(8, 8, 1,
      Array.tabulate(64)(i => (i * 4 % 256).toByte))))),
    ("tiff_img", TiffImg.build(Png.Image(12, 9, 3,
      Array.tabulate(324)(i => (i * 13 % 256).toByte)),
      compression = 5, bigEndian = true, predictor = 2)),
    ("tiff_g4", TiffImg.buildBilevel(Png.Image(21, 8, 1,
      Array.tabulate(168)(i => if (i * 7 % 13 < 5) 0x00.toByte else 0xFF.toByte)),
      compression = 4)),
    ("tiff_g3_2d", TiffImg.buildBilevel(Png.Image(21, 8, 1,
      Array.tabulate(168)(i => if (i * 11 % 17 < 6) 0x00.toByte else 0xFF.toByte)),
      compression = 3, t4Options = 5)),
    ("pnm", Pnm.build(Png.Image(11, 6, 3,
      Array.tabulate(198)(i => (i * 41 % 256).toByte)))))

  test("round 2: bit-flipped and truncated valid fixtures never throw") {
    for ((name, fix) <- fixtures) {
      val all = parsers
      // 24 deterministic single-bit flips spread over the payload
      for (k <- 0 until 24) {
        val b = fix.clone()
        val pos = ((k * 2654435761L) % b.length).toInt.abs
        b(pos) = (b(pos) ^ (1 << (k % 8))).toByte
        for ((pn, p) <- all) {
          try p(b)
          catch {
            case e: Throwable =>
              fail(s"$pn threw on bit-flipped $name (flip $k at $pos): $e")
          }
        }
      }
      // truncations at structural-ish points
      for (cut <- Seq(1, fix.length / 3, fix.length / 2, fix.length - 1)) {
        val b = java.util.Arrays.copyOf(fix, math.max(1, cut))
        for ((pn, p) <- all) {
          try p(b)
          catch {
            case e: Throwable =>
              fail(s"$pn threw on truncated $name (cut $cut): $e")
          }
        }
      }
    }
  }
}
