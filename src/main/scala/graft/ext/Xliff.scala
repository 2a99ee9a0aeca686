package graft.ext

/** XLIFF (XML Localization Interchange) — the other parallel-text
  * container localization pipelines export, and [[Gettext]]'s XML
  * sibling. Envelope (1.2 and the 2.x `segment` shape):
  *
  *   - `<trans-unit id>` with `<source>`/`<target>` children (1.2), or
  *     `<unit id>` / `<segment>` with the same children (2.x);
  *   - element text entity-decoded, inline markup tags (`<g>`, `<x/>`,
  *     `<bpt>`…) stripped to their text content;
  *   - `state`/`approved` attributes read so a pipeline can gate
  *     unreviewed targets; file-level `source-language` /
  *     `target-language` (or `srcLang`/`trgLang`) captured.
  */
object Xliff {

  final case class Unit2(id: String, source: String, target: String,
      state: String)

  final case class XliffDoc(srcLang: String, trgLang: String,
      units: Vector[Unit2])

  /** None when the payload is not an XLIFF document. */
  def parse(b: Array[Byte]): Option[XliffDoc] = {
    val xml = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    if (!xml.contains("<xliff")) return None
    val srcLang = firstAttr(xml, Seq("source-language", "srcLang"))
    val trgLang = firstAttr(xml, Seq("target-language", "trgLang"))
    val units = Vector.newBuilder[Unit2]
    for (tag <- Seq("trans-unit", "unit")) {
      var i = 0
      while (i >= 0 && i < xml.length) {
        val open = xml.indexOf("<" + tag, i)
        if (open < 0) i = -1
        else {
          val after = open + 1 + tag.length
          if (after < xml.length && (xml.charAt(after).isWhitespace ||
            xml.charAt(after) == '>')) {
            val hdrEnd = xml.indexOf('>', open)
            val end = xml.indexOf("</" + tag + ">", open)
            if (hdrEnd < 0 || end < 0) i = -1
            else {
              val hdr = xml.substring(open, hdrEnd + 1)
              val body = xml.substring(hdrEnd + 1, end)
              // 2.x nests source/target under <segment>; the inner-text
              // scrape sees them either way
              val src = innerText(body, "source")
              val trg = innerText(body, "target")
              if (src.nonEmpty || trg.nonEmpty)
                units += Unit2(attr(hdr, "id").getOrElse(""), src, trg,
                  attr(hdr, "approved")
                    .orElse(stateOf(body)).getOrElse(""))
              i = end + tag.length + 3
            }
          } else i = after
        }
      }
    }
    val us = units.result()
    if (us.isEmpty && srcLang.isEmpty) None
    else Some(XliffDoc(srcLang, trgLang, us))
  }

  private def stateOf(body: String): Option[String] = {
    val t = body.indexOf("<target")
    if (t < 0) None
    else {
      val e = body.indexOf('>', t)
      if (e < 0) None else attr(body.substring(t, e + 1), "state")
    }
  }

  private def firstAttr(xml: String, keys: Seq[String]): String =
    keys.flatMap { k =>
      val hit = xml.indexOf(k + "=\"")
      if (hit < 0) None
      else {
        val st = hit + k.length + 2
        val en = xml.indexOf('"', st)
        if (en < 0) None else Some(xml.substring(st, en))
      }
    }.headOption.getOrElse("")

  private def attr(tag: String, key: String): Option[String] = {
    val hit = tag.indexOf(key + "=\"")
    if (hit < 0) None
    else {
      val st = hit + key.length + 2
      val en = tag.indexOf('"', st)
      if (en < 0) None else Some(tag.substring(st, en))
    }
  }

  /** Entity-decoded text of the first `<name>` element with inline
    * markup stripped to its text content.
    */
  private def innerText(xml: String, name: String): String = {
    val open = xml.indexOf("<" + name)
    if (open < 0) return ""
    val after = open + 1 + name.length
    if (after >= xml.length ||
      (!xml.charAt(after).isWhitespace && xml.charAt(after) != '>' &&
        xml.charAt(after) != '/')) return ""
    val st = xml.indexOf('>', open)
    if (st >= 1 && xml.charAt(st - 1) == '/') return "" // self-closing
    val en = xml.indexOf("</" + name + ">", st)
    if (st < 0 || en < 0) return ""
    val body = xml.substring(st + 1, en)
    // strip inline tags, decode entities
    val out = new java.lang.StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '<') {
        val e = body.indexOf('>', i)
        i = if (e < 0) body.length else e + 1
      } else {
        val next = body.indexOf('<', i)
        val until = if (next < 0) body.length else next
        Office.appendDecoded(out, body, i, until)
        i = until
      }
    }
    out.toString
  }

  /** Deterministic XLIFF 1.2 builder for certificates/specs. */
  private[graft] def build(srcLang: String, trgLang: String,
      units: Seq[(String, String, String, String)]): Array[Byte] = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""")
    sb.append("""<xliff version="1.2" xmlns="urn:oasis:names:tc:xliff:document:1.2">""")
    sb.append(s"""<file source-language="$srcLang" target-language="$trgLang" datatype="plaintext" original="fixture"><body>""")
    for ((id, src, trg, state) <- units) {
      sb.append(s"""<trans-unit id="$id">""")
      sb.append(s"<source>${esc(src)}</source>")
      val st = if (state.nonEmpty) s""" state="$state"""" else ""
      sb.append(s"<target$st>${esc(trg)}</target>")
      sb.append("</trans-unit>")
    }
    sb.append("</body></file></xliff>")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
