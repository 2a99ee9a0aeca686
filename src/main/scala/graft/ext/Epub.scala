package graft.ext

import org.apache.spark.unsafe.types.UTF8String

/** EPUB text extraction — the ebook container a book corpus ships in.
  *
  * An EPUB is a ZIP (read through the repo's own central-directory walk,
  * [[Zip]]) with a fixed discovery chain: `META-INF/container.xml` names
  * the OPF package document; the OPF's `<manifest>` maps ids to hrefs and
  * its `<spine>` gives the reading order; each spine item is XHTML that
  * the [[graft.functions.HtmlText]] state machine (the same pass WET-style
  * web extraction uses) reduces to text. Books are long documents — the
  * chapter, not the book, is the natural row downstream (chunking,
  * dedup, tokenization all want bounded rows), so the API returns the
  * ordered chapter list and lets the query decide how to reassemble.
  *
  * Scale shape: one book = one payload row; the walk is allocation-
  * bounded by the largest member, runs map-only on executors.
  */
object Epub {

  /** One spine chapter: position, manifest href, extracted text. */
  final case class Chapter(pos: Int, href: String, text: String)

  /** (dc:title, ordered chapters). None when the container chain is
    * broken (not a zip, no container.xml, no OPF, empty spine).
    */
  def extract(b: Array[Byte]): Option[(String, Vector[Chapter])] = {
    val container = Zip.read(b, "META-INF/container.xml").map(s => new String(s, "UTF-8"))
      .getOrElse(return None)
    val opfPath = attr(container, "rootfile", "full-path").getOrElse(return None)
    val opfBytes = Zip.read(b, opfPath).getOrElse(return None)
    val opf = new String(opfBytes, "UTF-8")
    val title = tagText(opf, "dc:title").getOrElse("")
    val base = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i  => opfPath.substring(0, i + 1)
    }
    // manifest: id -> href
    val items = tags(opf, "item").flatMap { t =>
      for (id <- attrOf(t, "id"); href <- attrOf(t, "href")) yield id -> href
    }.toMap
    // spine: ordered idrefs
    val spine = tags(opf, "itemref").flatMap(attrOf(_, "idref"))
    if (spine.isEmpty) return None
    val chapters = spine.zipWithIndex.flatMap { case (idref, k) =>
      items.get(idref).flatMap { href =>
        Zip.read(b, base + href).map { xhtml =>
          Chapter(k, href, graft.functions.HtmlText.compute(
            UTF8String.fromBytes(xhtml)).toString)
        }
      }
    }.toVector
    if (chapters.isEmpty) None else Some((title, chapters))
  }

  // minimal, deterministic XML scraping — the OPF subset is regular
  // enough that attribute scans are exact for well-formed packages

  private def tags(xml: String, name: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i >= 0 && i < xml.length) {
      val hit = xml.indexOf("<" + name, i)
      if (hit < 0) i = -1
      else {
        val after = hit + 1 + name.length
        // must be followed by whitespace, '>' or '/' (not a name prefix)
        if (after < xml.length && (xml.charAt(after).isWhitespace ||
          xml.charAt(after) == '>' || xml.charAt(after) == '/')) {
          val e = xml.indexOf('>', hit)
          if (e < 0) i = -1
          else { out += xml.substring(hit, e + 1); i = e + 1 }
        } else i = after
      }
    }
    out.result()
  }

  private def attrOf(tag: String, key: String): Option[String] = {
    val hit = tag.indexOf(key + "=\"")
    if (hit < 0) None
    else {
      val st = hit + key.length + 2
      val en = tag.indexOf('"', st)
      if (en < 0) None else Some(tag.substring(st, en))
    }
  }

  private def attr(xml: String, tag: String, key: String): Option[String] =
    tags(xml, tag).flatMap(attrOf(_, key)).headOption

  private def tagText(xml: String, name: String): Option[String] = {
    val open = xml.indexOf("<" + name)
    if (open < 0) return None
    val st = xml.indexOf('>', open)
    val en = xml.indexOf("</" + name, st)
    if (st < 0 || en < 0) None else Some(xml.substring(st + 1, en).trim)
  }

  /** Deterministic EPUB builder for certificates/specs: standard layout
    * (stored `mimetype` first — the spec's magic requirement — then
    * deflated container/OPF/chapters).
    */
  private[graft] def build(title: String,
      chapters: Seq[(String, String)]): Array[Byte] = {
    val opf =
      """<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" version="3.0">""" +
        s"<metadata xmlns:dc=\"http://purl.org/dc/elements/1.1/\"><dc:title>$title</dc:title></metadata>" +
        "<manifest>" +
        chapters.zipWithIndex.map { case ((href, _), k) =>
          s"""<item id="c$k" href="$href" media-type="application/xhtml+xml"/>"""
        }.mkString +
        "</manifest><spine>" +
        chapters.indices.map(k => s"""<itemref idref="c$k"/>""").mkString +
        "</spine></package>"
    val container =
      """<?xml version="1.0"?><container version="1.0" """ +
        """xmlns="urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles>""" +
        """<rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>""" +
        "</rootfiles></container>"
    Zip.build(
      ("mimetype", "application/epub+zip".getBytes("US-ASCII"), false) +:
        ("META-INF/container.xml", container.getBytes("UTF-8"), true) +:
        ("OEBPS/content.opf", opf.getBytes("UTF-8"), true) +:
        chapters.map { case (href, xhtml) =>
          ("OEBPS/" + href, xhtml.getBytes("UTF-8"), true)
        })
  }
}
