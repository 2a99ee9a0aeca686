package graft.ext

/** RSS 2.0 / Atom feed extraction — the syndication layer a web crawl
  * surfaces constantly (every blog, podcast and news site exports one).
  * A light, deterministic XML scrape in the [[Epub]] OPF style, plus
  * the two things feeds need beyond it: CDATA sections taken verbatim
  * and entity-decoded element text ([[Office.appendDecoded]] owns the
  * decode table).
  *
  *   - RSS: `<channel>` title/link/description; `<item>` title, link,
  *     pubDate, description;
  *   - Atom: `<feed>` title; `<entry>` title, `<link href=>`, updated,
  *     summary (falling back to content).
  *
  * Scale shape: one feed = one payload row, map-only on executors.
  */
object Feed {

  final case class Item(title: String, link: String, date: String,
      body: String)

  final case class FeedData(kind: String, title: String,
      items: Vector[Item])

  /** None when the payload is neither an RSS channel nor an Atom feed. */
  def parse(b: Array[Byte]): Option[FeedData] = {
    val xml = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    val isAtom = xml.contains("http://www.w3.org/2005/Atom")
    val isRss = xml.contains("<rss") || xml.contains("<channel")
    if (!isAtom && !isRss) return None
    if (isAtom) {
      val items = blocks(xml, "entry").map { e =>
        Item(text(e, "title"), attrOfFirst(e, "link", "href"),
          text(e, "updated"),
          { val s = text(e, "summary"); if (s.nonEmpty) s else text(e, "content") })
      }
      Some(FeedData("atom", text(xml, "title"), items))
    } else {
      val chan = blocks(xml, "channel").headOption.getOrElse(xml)
      val items = blocks(chan, "item").map { e =>
        Item(text(e, "title"), text(e, "link"), text(e, "pubDate"),
          text(e, "description"))
      }
      // channel title = the first <title> OUTSIDE any item
      val chanHead = chan.indexOf("<item") match {
        case -1 => chan
        case i  => chan.substring(0, i)
      }
      Some(FeedData("rss", text(chanHead, "title"), items))
    }
  }

  /** Inner text of every `<name>...</name>` block, in order. */
  private def blocks(xml: String, name: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i >= 0 && i < xml.length) {
      val open = xml.indexOf("<" + name, i)
      if (open < 0) i = -1
      else {
        val after = open + 1 + name.length
        if (after < xml.length && (xml.charAt(after) == '>' ||
          xml.charAt(after).isWhitespace)) {
          val st = xml.indexOf('>', open)
          val en = xml.indexOf("</" + name + ">", st)
          if (st < 0 || en < 0) i = -1
          else { out += xml.substring(st + 1, en); i = en + name.length + 3 }
        } else i = after
      }
    }
    out.result()
  }

  /** Entity-decoded text of the FIRST `<name>` element, CDATA verbatim. */
  private def text(xml: String, name: String): String =
    blocks(xml, name).headOption.map(decode).getOrElse("")

  private def attrOfFirst(xml: String, tag: String, key: String): String = {
    var i = 0
    while (i >= 0 && i < xml.length) {
      val open = xml.indexOf("<" + tag, i)
      if (open < 0) return ""
      val after = open + 1 + tag.length
      if (after < xml.length && (xml.charAt(after).isWhitespace ||
        xml.charAt(after) == '/' || xml.charAt(after) == '>')) {
        val en = xml.indexOf('>', open)
        val t = xml.substring(open, if (en < 0) xml.length else en + 1)
        val hit = t.indexOf(key + "=\"")
        if (hit >= 0) {
          val st = hit + key.length + 2
          val q = t.indexOf('"', st)
          if (q > 0) return t.substring(st, q)
        }
        i = if (en < 0) xml.length else en + 1
      } else i = after
    }
    ""
  }

  /** CDATA sections verbatim; everything else entity-decoded. */
  private[ext] def decode(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cd = s.indexOf("<![CDATA[", i)
      if (cd < 0) {
        Office.appendDecoded(out, s, i, s.length)
        i = s.length
      } else {
        Office.appendDecoded(out, s, i, cd)
        val en = s.indexOf("]]>", cd + 9)
        val until = if (en < 0) s.length else en
        out.append(s, cd + 9, until)
        i = if (en < 0) s.length else en + 3
      }
    }
    out.toString.trim
  }
}
