package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  test("built PDF round-trips its lines, raw and Flate") {
    val lines = Seq("Hello world", "second line here", "third one",
      "a (parenthetical) \\ backslash", "fin")
    for (flate <- Seq(false, true)) {
      val pdf = Pdf.buildSimple(lines, flate)
      assert(Pdf.extractText(pdf).get == lines.mkString("\n"),
        s"flate=$flate")
    }
  }

  test("/Differences: rot13 tables resolve, inline and indirect") {
    val lines = Seq("Hello world", "second line here", "third one",
      "Mixed CASE and (escapes) \\ too", "fin")
    for (flate <- Seq(false, true); indirect <- Seq(false, true)) {
      val pdf = Pdf.buildWithDifferences(lines, flate, indirect)
      // the stored bytes are rot13 garbage: only the table recovers them
      assert(Pdf.extractText(pdf).get == lines.mkString("\n"),
        s"flate=$flate indirect=$indirect")
      if (!flate) // compressed streams hide the raw bytes, check raw only
        assert(new String(pdf, "ISO-8859-1").contains("Uryyb"), // rot13(Hello)
          "fixture must actually store remapped bytes")
    }
  }

  test("Type0/CID fonts: two-byte codes resolve through the ToUnicode CMap") {
    val lines = Seq("Hello CID world", "Second (line) \\ here", "fin")
    for (flate <- Seq(false, true)) {
      val pdf = Pdf.buildType0(lines, flate)
      assert(Pdf.extractText(pdf).get == lines.mkString("\n"), s"flate=$flate")
    }
    // the raw bytes carry only 0x01xx code pairs — no plain text leaks
    val rawDoc = Pdf.buildType0(Seq("XYZ"), flate = false)
    assert(!new String(rawDoc, "ISO-8859-1").contains("XYZ"))
    // a Type0 font whose ToUnicode is missing yields no text, not garbage
    val noMap = new String(rawDoc, "ISO-8859-1")
      .replace("/ToUnicode 6 0 R", "                 ").getBytes("ISO-8859-1")
    assert(Pdf.extractText(noMap).get == "")
  }

  test("parseCMap: bfchar pairs, array ranges, ligature targets") {
    val (m, w) = Pdf.parseCMap(
      """2 beginbfchar
        |<0041> <0061>
        |<0042> <006600660069>
        |endbfchar
        |1 beginbfrange
        |<0050> <0052> [<0078> <0079> <007A>]
        |endbfrange
        |1 beginbfrange
        |<0100> <0102> <0041>
        |endbfrange""".stripMargin)
    assert(w == 2)
    assert(m(0x41) == "a")
    assert(m(0x42) == "ffi") // multi-unit UTF-16 target (ligature)
    assert(m(0x50) == "x" && m(0x51) == "y" && m(0x52) == "z")
    assert(m(0x100) == "A" && m(0x101) == "B" && m(0x102) == "C")
    // malformed sections keep the entries before the damage, never throw
    val (m2, _) = Pdf.parseCMap("1 beginbfchar <0041> <0062> <zz oops")
    assert(m2(0x41) == "b" && m2.size == 1)
  }

  test("/Differences inside an /ObjStm object stream resolve") {
    val lines = Seq("Hello object streams", "Second Line")
    for (flate <- Seq(false, true)) {
      val pdf = Pdf.buildWithDifferencesObjStm(lines, flate)
      // font object 5 exists ONLY inside the compressed ObjStm: a reader
      // that skips object streams sees no table and returns rot13 noise
      assert(!new String(pdf, "ISO-8859-1").contains("5 0 obj"))
      assert(Pdf.extractText(pdf).get == lines.mkString("\n"), s"flate=$flate")
    }
    // a damaged ObjStm degrades to no table (rot13 bytes pass through
    // unmapped), never a throw
    val pdf = Pdf.buildWithDifferencesObjStm(lines, flate = false)
    val at = new String(pdf, "ISO-8859-1").indexOf("/ObjStm")
    val bad = pdf.clone()
    bad(at + 60) = (bad(at + 60) ^ 0x55).toByte // corrupt the deflate data
    val got = Pdf.extractText(bad)
    assert(got.isDefined)
    assert(got.get.contains("Uryyb")) // rot13(Hello): unmapped fallback
  }

  test("/Differences: named glyphs, uniXXXX, unknown names pass through") {
    // hand-written doc: font F1 maps 65→/one 66→/uniloc 67→/quoteright
    // 68→/bogusname (unknown: byte passes through) 69→/space
    val content = "BT /F1 9 Tf (ABCDE) Tj ET"
    val doc = ("%PDF-1.4\n" +
      "3 0 obj\n<< /Type /Page /Resources << /Font << /F1 5 0 R >> >> " +
      "/Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Encoding << /Differences [ 65 /one /uni00E9 " +
      "/quoteright /bogusname /space ] >> >>\nendobj\n" +
      "%%EOF\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(doc).get == "1é’D ")
    // without a Tf naming a mapped font, bytes stay unmapped
    val content2 = "BT (ABCDE) Tj ET"
    val doc2 = new String(doc, "ISO-8859-1")
      .replace(content, content2 + " " * (content.length - content2.length))
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(doc2).get == "ABCDE")
  }

  test("hand-written content stream: operators, escapes, hex, kerns") {
    val content =
      """BT
        |/F1 9 Tf
        |10 700 Td
        |(A\(b\)c \\ d) Tj
        |( and ) Tj
        |<48657821> Tj
        |0 -12 Td
        |[(wor) 30 (d) -300 (gap)] TJ
        |(next via quote) '
        |T*
        |(oct \101\102\103 end) Tj
        |ET""".stripMargin.replace("\r", "")
    val pdf = ("%PDF-1.4\n4 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val got = Pdf.extractText(pdf).get
    // small kerns (30, above -180) join "wor"+"d"; -300 inserts the gap
    assert(got ==
      "A(b)c \\ d and Hex!\nword gap\nnext via quote\noct ABC end")
  }

  test("escape edge cases: octal widths, line continuation, odd hex") {
    val content = "BT (\\7a\\77b\\101) Tj (line\\\ncontinues) Tj " +
      "<414> Tj ET"
    val pdf = ("%PDF-1.4\nstream\n" + content + "\nendstream\n")
      .getBytes("ISO-8859-1")
    val got = Pdf.extractText(pdf).get
    // \7 → 0x07, \77 → '?', \101 → 'A'; continuation vanishes; <414> →
    // 'A' then 0x40 ('@', odd digit padded with 0)
    assert(got == "a?bAlinecontinues" + "A@")
  }

  test("non-PDF, encrypted, broken-Flate, truncated → safe") {
    assert(Pdf.extractText(null).isEmpty)
    assert(Pdf.extractText("plain text".getBytes).isEmpty)
    val enc = ("%PDF-1.4\ntrailer\n<< /Encrypt 9 0 R /Root 1 0 R >>\n")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(enc).isEmpty, "encrypted → None")
    // /Encrypt INSIDE stream data must not trigger the encrypted path
    val sneaky = ("%PDF-1.4\nstream\nBT (/Encrypt is just text) Tj ET" +
      "\nendstream\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(sneaky).get == "/Encrypt is just text")
    // broken Flate stream skipped whole, good raw stream still read
    val mixed = ("%PDF-1.4\n2 0 obj\n<< /Length 5 /Filter /FlateDecode " +
      ">>\nstream\nnotfl\nendstream\nendobj\n3 0 obj\n<< /Length 14 >>" +
      "\nstream\nBT (ok) Tj ET\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(mixed).get == "ok")
    // truncated mid-stream: cut short, never thrown
    val good = Pdf.buildSimple(Seq("abc", "def"), flate = true)
    var cut = 8
    while (cut < good.length) {
      Pdf.extractText(java.util.Arrays.copyOf(good, cut)) // must not throw
      cut += 23
    }
  }
}
