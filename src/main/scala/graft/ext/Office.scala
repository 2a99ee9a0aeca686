package graft.ext

/** Office-document text extraction — the OOXML arm of the document
  * family ([[graft.functions.HtmlText]] owns HTML, [[Pdf]] owns PDF):
  * a `.docx` is a ZIP ([[Zip]]) whose `word/document.xml` carries the
  * text in WordprocessingML runs. The envelope is the text layer:
  *   - `<w:t>` element content, concatenated in document order
  *     (`xml:space="preserve"` runs keep their whitespace — content is
  *     taken verbatim either way);
  *   - `</w:p>` (paragraph end) and `<w:br/>` emit a newline, `<w:tab/>`
  *     a tab;
  *   - the five XML named entities plus decimal/hex character
  *     references decode; anything else markup-shaped is skipped.
  * Headers, footnotes, comments and embedded objects live in other ZIP
  * members and are deliberately out of scope — mirroring the
  * line-oriented WET envelope of the HTML arm.
  */
object Office {

  /** Extracted text of a `.docx` payload. None when the payload is not
    * a ZIP or has no readable `word/document.xml` member.
    */
  def docxText(b: Array[Byte]): Option[String] =
    Zip.read(b, "word/document.xml")
      .map(xml => extractWml(new String(xml, java.nio.charset.StandardCharsets.UTF_8)))

  /** Text layer of a WordprocessingML document string. */
  private[ext] def extractWml(xml: String): String = {
    val out = new java.lang.StringBuilder(xml.length / 4)
    val n = xml.length
    var i = 0
    while (i < n) {
      val c = xml.charAt(i)
      if (c != '<') i += 1 // inter-tag content outside w:t is ignored
      else if (xml.startsWith("<w:t", i) && i + 4 < n &&
          (xml.charAt(i + 4) == '>' || xml.charAt(i + 4) == ' ' ||
            xml.charAt(i + 4) == '/')) {
        val close = xml.indexOf('>', i)
        if (close < 0) i = n
        else if (xml.charAt(close - 1) == '/') i = close + 1 // <w:t/>
        else {
          val end = xml.indexOf("</w:t>", close + 1)
          val until = if (end < 0) n else end
          appendDecoded(out, xml, close + 1, until)
          i = if (end < 0) n else end + 6
        }
      } else if (xml.startsWith("</w:p>", i)) { out.append('\n'); i += 6 }
      else if (xml.startsWith("<w:br", i)) { out.append('\n'); i = skipTag(xml, i) }
      else if (xml.startsWith("<w:tab", i) && i + 6 < n &&
          (xml.charAt(i + 6) == '/' || xml.charAt(i + 6) == '>' ||
            xml.charAt(i + 6) == ' ')) {
        out.append('\t'); i = skipTag(xml, i)
      } else i = skipTag(xml, i)
    }
    out.toString
  }

  /** Extracted cell text of a `.xlsx` payload — first worksheet, rows as
    * lines, cells tab-separated: shared-string cells (`t="s"`) resolve
    * through `xl/sharedStrings.xml` (each `<si>` the concatenation of
    * its `<t>` runs, entity-decoded), other cells take their `<v>` value
    * verbatim (numbers, formula results). None when the payload is not
    * a ZIP or has no first worksheet.
    */
  def xlsxText(b: Array[Byte]): Option[String] = {
    // one central-directory walk for both members
    val es = Zip.entries(b)
    def member(name: String): Option[Array[Byte]] =
      es.find(_.name == name).flatMap(Zip.readEntry(b, _))
    member("xl/worksheets/sheet1.xml").map { sheetB =>
      val shared = member("xl/sharedStrings.xml")
        .map(sb => parseShared(new String(sb, java.nio.charset.StandardCharsets.UTF_8)))
        .getOrElse(Vector.empty)
      val xml = new String(sheetB, java.nio.charset.StandardCharsets.UTF_8)
      val out = new java.lang.StringBuilder()
      var i = xml.indexOf("<row")
      while (i >= 0) {
        val rowTagEnd = xml.indexOf('>', i)
        if (rowTagEnd < 0) { out.append('\n'); i = -1 }
        else if (xml.charAt(rowTagEnd - 1) == '/') {
          // self-closing <row/> (sparse-sheet writers): an empty line,
          // and the NEXT row's closer must not be mistaken for this one's
          out.append('\n')
          i = xml.indexOf("<row", rowTagEnd)
        } else {
        val rowEnd = xml.indexOf("</row>", rowTagEnd) match {
          case -1 => xml.length
          case e => e
        }
        var c = xml.indexOf("<c", rowTagEnd)
        var firstCell = true
        while (c >= 0 && c < rowEnd) {
          val tagEnd = xml.indexOf('>', c)
          if (tagEnd < 0 || tagEnd > rowEnd) c = -1
          else {
            val attrs = xml.substring(c, tagEnd)
            val isShared = attrs.contains("t=\"s\"")
            if (!firstCell) out.append('\t')
            firstCell = false
            val v = xml.indexOf("<v>", c)
            val cEnd = xml.indexOf("</c>", c) match {
              case -1 => rowEnd
              case e => e
            }
            if (v >= 0 && v < cEnd) {
              val vEnd = xml.indexOf("</v>", v)
              if (vEnd > 0 && vEnd <= cEnd) {
                val raw = xml.substring(v + 3, vEnd)
                if (isShared) {
                  val idx = try raw.trim.toInt catch { case _: NumberFormatException => -1 }
                  if (idx >= 0 && idx < shared.length) out.append(shared(idx))
                } else appendDecoded(out, raw, 0, raw.length)
              }
            }
            c = xml.indexOf("<c", math.max(cEnd, tagEnd))
          }
        }
        out.append('\n')
        i = xml.indexOf("<row", rowEnd)
        }
      }
      out.toString
    }
  }

  /** `<si>` entries of a sharedStrings document: each is the
    * concatenation of its `<t>` run contents.
    */
  private def parseShared(xml: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = xml.indexOf("<si")
    while (i >= 0) {
      val end = xml.indexOf("</si>", i) match {
        case -1 => xml.length
        case e => e
      }
      val sb = new java.lang.StringBuilder()
      var t = xml.indexOf("<t", i)
      while (t >= 0 && t < end) {
        val after = if (t + 2 < xml.length) xml.charAt(t + 2) else ' '
        if (after == '>' || after == ' ' || after == '/') {
          val close = xml.indexOf('>', t)
          if (close < 0 || close >= end) t = -1
          else if (xml.charAt(close - 1) == '/') t = xml.indexOf("<t", close)
          else {
            val tEnd = xml.indexOf("</t>", close) match {
              case -1 => end
              case e => math.min(e, end)
            }
            appendDecoded(sb, xml, close + 1, tEnd)
            t = xml.indexOf("<t", tEnd)
          }
        } else t = xml.indexOf("<t", t + 2)
      }
      out += sb.toString
      i = xml.indexOf("<si", end)
    }
    out.result()
  }

  private[ext] def skipTag(xml: String, i: Int): Int = {
    val close = xml.indexOf('>', i)
    if (close < 0) xml.length else close + 1
  }

  /** XML character data with entity decoding appended to `out`. */
  private[ext] def appendDecoded(out: java.lang.StringBuilder, s: String, from: Int, until: Int): Unit = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi >= until || semi - i > 10) { out.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val decoded: Int = name match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case _ if name.startsWith("#x") || name.startsWith("#X") =>
              try Integer.parseInt(name.substring(2), 16) catch { case _: NumberFormatException => -1 }
            case _ if name.startsWith("#") =>
              try Integer.parseInt(name.substring(1)) catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded >= 0 && Character.isValidCodePoint(decoded)) {
            out.appendCodePoint(decoded); i = semi + 1
          } else { out.append(c); i += 1 } // unknown entity: literal
        }
      }
    }
  }
}
