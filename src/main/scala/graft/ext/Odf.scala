package graft.ext

/** OpenDocument text extraction — the ODF arm of the document family
  * ([[Office]] owns OOXML, [[Epub]] books, [[Pdf]] PDFs): an `.odt` /
  * `.ods` / `.odp` is a ZIP ([[Zip]]) whose `content.xml` carries the
  * text in ODF 1.2 (OASIS) markup. Same envelope philosophy as the
  * OOXML arm — the text layer only:
  *
  *   - `<text:p>` / `<text:h>` element ends emit a newline; character
  *     data inside the body is taken verbatim (entity-decoded);
  *   - `<text:tab/>` emits a tab, `<text:line-break/>` a newline,
  *     `<text:s text:c="N"/>` N spaces (1 when the attribute is absent)
  *     — ODF strips runs of literal spaces on save, so these three
  *     carry ALL intra-paragraph whitespace;
  *   - `<office:annotation>`, `<text:note>` (foot/endnotes),
  *     `<text:tracked-changes>` and the `<office:automatic-styles>`
  *     prolog are skipped subtree-wise — their nested `text:p`s are
  *     margin apparatus, not body text;
  *   - spreadsheets (`.ods`) render the FIRST `<table:table>` with rows
  *     as lines and cells tab-separated, honoring
  *     `table:number-columns-repeated` (clamped) and trimming the
  *     trailing run of empty cells each row ships as padding.
  *
  * Scale shape: one document = one payload row, map-only on executors;
  * the walk allocates the inflated `content.xml` once (bounded by the
  * member, not the archive).
  */
object Odf {

  /** ODF mimetypes as they appear in the mandatory STORED first member
    * `mimetype` — the container-level magic [[Multimodal.sniffFormat]]
    * routes on (ODF 1.2 §3.3: first member, uncompressed, no extra
    * field, exactly the media type).
    */
  val MimeText         = "application/vnd.oasis.opendocument.text"
  val MimeSpreadsheet  = "application/vnd.oasis.opendocument.spreadsheet"
  val MimePresentation = "application/vnd.oasis.opendocument.presentation"

  /** Text layer of an `.odt` (or `.odp` — slides are `draw:text-box`es
    * of the same `text:p` paragraphs). None when the payload is not a
    * ZIP or has no readable `content.xml`.
    */
  def odtText(b: Array[Byte]): Option[String] =
    contentXml(b).map(extractText)

  /** Cell grid of an `.ods`: first table, rows as lines, cells
    * tab-separated. None when the payload is not a ZIP or has no
    * readable `content.xml` / table.
    */
  def odsText(b: Array[Byte]): Option[String] =
    contentXml(b).flatMap(extractSheet)

  private def contentXml(b: Array[Byte]): Option[String] =
    Zip.read(b, "content.xml")
      .map(x => new String(x, java.nio.charset.StandardCharsets.UTF_8))

  // subtrees whose nested paragraphs are apparatus, not body text
  private val skipSubtrees = Array(
    "office:annotation", "text:note", "text:tracked-changes",
    "office:automatic-styles", "office:styles")

  /** Walk `content.xml` emitting the ODT/ODP text layer. Text nodes
    * outside the skip subtrees but also outside any `text:p`/`text:h`
    * don't occur in well-formed ODF bodies (all character data is
    * paragraph-wrapped), so the walk takes character data whenever the
    * paragraph depth is positive — exact for documents the spec admits.
    */
  private[ext] def extractText(xml: String): String = {
    val out = new java.lang.StringBuilder(xml.length / 4)
    val n = xml.length
    var i = 0
    var pDepth = 0
    while (i < n) {
      val c = xml.charAt(i)
      if (c != '<') {
        if (pDepth > 0) {
          val next = xml.indexOf('<', i)
          val until = if (next < 0) n else next
          Office.appendDecoded(out, xml, i, until)
          i = until
        } else i += 1
      } else if (startsTag(xml, i, "text:p") || startsTag(xml, i, "text:h")) {
        val close = xml.indexOf('>', i)
        if (close < 0) i = n
        else if (xml.charAt(close - 1) == '/') { out.append('\n'); i = close + 1 }
        else { pDepth += 1; i = close + 1 }
      } else if (xml.startsWith("</text:p>", i) || xml.startsWith("</text:h>", i)) {
        if (pDepth > 0) pDepth -= 1
        out.append('\n')
        i += 9
      } else if (startsTag(xml, i, "text:tab")) {
        if (pDepth > 0) out.append('\t'); i = Office.skipTag(xml, i)
      } else if (startsTag(xml, i, "text:line-break")) {
        if (pDepth > 0) out.append('\n'); i = Office.skipTag(xml, i)
      } else if (startsTag(xml, i, "text:s")) {
        if (pDepth > 0) {
          val close = xml.indexOf('>', i)
          val tag = xml.substring(i, if (close < 0) n else close + 1)
          val cnt = attrVal(tag, "text:c").flatMap(_.toIntOption)
            .getOrElse(1).max(1).min(4096)
          var k = 0
          while (k < cnt) { out.append(' '); k += 1 }
        }
        i = Office.skipTag(xml, i)
      } else {
        skipSubtrees.find(t => startsTag(xml, i, t)) match {
          case Some(t) => i = skipSubtree(xml, i, t)
          case None    => i = Office.skipTag(xml, i)
        }
      }
    }
    out.toString
  }

  /** First `<table:table>` of a spreadsheet `content.xml` as
    * tab-separated lines; repeated cells expanded (clamped at 1024 —
    * ODS pads rows to the 16k column grid with one repeated empty),
    * trailing empty cells trimmed per row.
    */
  private[ext] def extractSheet(xml: String): Option[String] = {
    val tStart = xml.indexOf("<table:table")
    if (tStart < 0) return None
    val tEnd = xml.indexOf("</table:table>", tStart) match {
      case -1 => xml.length
      case e  => e
    }
    val out = new java.lang.StringBuilder()
    var i = xml.indexOf("<table:table-row", tStart)
    while (i >= 0 && i < tEnd) {
      val rowEnd = xml.indexOf("</table:table-row>", i) match {
        case -1 => tEnd
        case e  => e
      }
      val cells = Vector.newBuilder[String]
      var j = xml.indexOf("<table:table-cell", i)
      while (j >= 0 && j < rowEnd) {
        val open = xml.indexOf('>', j)
        if (open < 0) j = rowEnd
        else {
          val tag = xml.substring(j, open + 1)
          val rep = attrVal(tag, "table:number-columns-repeated")
            .flatMap(_.toIntOption).getOrElse(1).max(1).min(1024)
          val text =
            if (xml.charAt(open - 1) == '/') ""
            else {
              val cEnd = xml.indexOf("</table:table-cell>", open) match {
                case -1 => rowEnd
                case e  => e
              }
              // cell content is one or more text:p paragraphs
              extractText(xml.substring(open + 1, cEnd))
                .stripSuffix("\n").replace('\n', ' ')
            }
          var k = 0
          while (k < rep) { cells += text; k += 1 }
          j = xml.indexOf("<table:table-cell",
            if (xml.charAt(open - 1) == '/') open + 1
            else xml.indexOf("</table:table-cell>", open) match {
              case -1 => rowEnd
              case e  => e + 19
            })
        }
      }
      val row = cells.result()
      val trimmed = row.take(row.lastIndexWhere(_.nonEmpty) + 1)
      out.append(trimmed.mkString("\t")).append('\n')
      i = xml.indexOf("<table:table-row", rowEnd)
    }
    Some(out.toString)
  }

  private def startsTag(xml: String, i: Int, name: String): Boolean =
    xml.startsWith("<" + name, i) && {
      val after = i + 1 + name.length
      after < xml.length && (xml.charAt(after) == '>' ||
        xml.charAt(after) == '/' || xml.charAt(after).isWhitespace)
    }

  private def attrVal(tag: String, key: String): Option[String] = {
    val hit = tag.indexOf(key + "=\"")
    if (hit < 0) None
    else {
      val st = hit + key.length + 2
      val en = tag.indexOf('"', st)
      if (en < 0) None else Some(tag.substring(st, en))
    }
  }

  /** Skip a subtree `<name ...>...</name>` honoring nesting; `i` points
    * at the opening '<'. Self-closing tags consume just themselves.
    */
  private def skipSubtree(xml: String, i: Int, name: String): Int = {
    val close = xml.indexOf('>', i)
    if (close < 0) return xml.length
    if (xml.charAt(close - 1) == '/') return close + 1
    var depth = 1
    var j = close + 1
    val openPat = "<" + name
    val closePat = "</" + name + ">"
    while (depth > 0 && j < xml.length) {
      val nextOpen = xml.indexOf(openPat, j)
      val nextClose = xml.indexOf(closePat, j)
      if (nextClose < 0) return xml.length
      if (nextOpen >= 0 && nextOpen < nextClose &&
        startsTag(xml, nextOpen, name)) {
        val oc = xml.indexOf('>', nextOpen)
        if (oc < 0) return xml.length
        if (xml.charAt(oc - 1) != '/') depth += 1
        j = oc + 1
      } else { depth -= 1; j = nextClose + closePat.length }
    }
    j
  }

  // ----- deterministic builders for certificates/specs --------------

  /** Standard ODT layout: stored `mimetype` first (the magic), then
    * deflated manifest + content. `paragraphs` are raw ODF body XML
    * snippets the caller escapes.
    */
  private[graft] def buildOdt(paragraphs: Seq[String]): Array[Byte] =
    buildPkg(MimeText,
      """<office:body><office:text>""" +
        paragraphs.mkString + "</office:text></office:body>")

  /** Standard ODS layout: one table, rows of (already-escaped) cell
    * paragraphs.
    */
  private[graft] def buildOds(rows: Seq[Seq[String]]): Array[Byte] =
    buildPkg(MimeSpreadsheet,
      """<office:body><office:spreadsheet><table:table table:name="Sheet1">""" +
        rows.map { r =>
          "<table:table-row>" + r.map { cell =>
            if (cell.isEmpty) "<table:table-cell/>"
            else s"<table:table-cell office:value-type=\"string\"><text:p>$cell</text:p></table:table-cell>"
          }.mkString + "</table:table-row>"
        }.mkString +
        "</table:table></office:spreadsheet></office:body>")

  /** ODS package around a caller-supplied raw `office:body` snippet —
    * for certificates that need exact control of row/cell markup.
    */
  private[graft] def buildOdsRaw(body: String): Array[Byte] =
    buildPkg(MimeSpreadsheet, body)

  private def buildPkg(mime: String, body: String): Array[Byte] = {
    val content =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<office:document-content """ +
        """xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """ +
        """xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" """ +
        """xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" office:version="1.2">""" +
        """<office:automatic-styles><text:p>STYLE NOISE</text:p></office:automatic-styles>""" +
        body + "</office:document-content>"
    val manifest =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">""" +
        s"""<manifest:file-entry manifest:full-path="/" manifest:media-type="$mime"/>""" +
        """<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>""" +
        "</manifest:manifest>"
    Zip.build(Seq(
      ("mimetype", mime.getBytes("US-ASCII"), false),
      ("META-INF/manifest.xml", manifest.getBytes("UTF-8"), true),
      ("content.xml", content.getBytes("UTF-8"), true)))
  }
}
