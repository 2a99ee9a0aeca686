package graft.ext

import scala.collection.mutable.ArrayBuffer

/** gettext `.po` catalogs — the largest freely-crawlable source of
  * ALIGNED parallel text (every open-source project's translations),
  * i.e. machine-translation training pairs. The PO grammar:
  *
  *   - entries separated by blank lines: optional `msgctxt`, `msgid`,
  *     then `msgstr` (or `msgid_plural` + indexed `msgstr[n]`);
  *   - every value is one or more adjacent C strings that CONCATENATE
  *     (`msgid ""` + continuation lines is the normal long-string
  *     shape) with escapes `\n \t \r \" \\`;
  *   - `#,` flag comments read for the `fuzzy` marker (fuzzy pairs are
  *     flagged — a training pipeline drops them); other `#` comments
  *     skipped; the header entry (empty msgid) carries metadata and is
  *     excluded from pairs.
  *
  * Scale shape: one catalog = one payload row, map-only on executors.
  */
object Gettext {

  final case class PoEntry(ctxt: String, id: String, strs: Vector[String],
      fuzzy: Boolean)

  def entries(b: Array[Byte]): Vector[PoEntry] =
    entries(new String(b, java.nio.charset.StandardCharsets.UTF_8))

  def entries(src: String): Vector[PoEntry] = {
    val out = Vector.newBuilder[PoEntry]
    var ctxt = ""
    var id: Option[String] = None
    var plural: Option[String] = None
    var strs = ArrayBuffer.empty[(Int, String)]
    var fuzzy = false
    var cur: Option[Int] = None // -2 ctxt, -1 id, -3 plural, n>=0 msgstr[n]
    val buf = new java.lang.StringBuilder()

    def commit(slot: Option[Int]): Unit = slot.foreach { s =>
      val v = buf.toString
      s match {
        case -2 => ctxt = v
        case -1 => id = Some(v)
        case -3 => plural = Some(v)
        case n => strs += ((n, v))
      }
      buf.setLength(0)
    }
    def endEntry(): Unit = {
      commit(cur); cur = None
      id.foreach { i =>
        if (i.nonEmpty) // the header entry is metadata, not a pair
          out += PoEntry(ctxt, i,
            strs.sortBy(_._1).map(_._2).toVector, fuzzy)
      }
      ctxt = ""; id = None; plural = None
      strs = ArrayBuffer.empty; fuzzy = false
    }

    for (rawLine <- src.split("\r?\n", -1)) {
      val line = rawLine.trim
      if (line.isEmpty) endEntry()
      else if (line.startsWith("#,")) {
        if (line.substring(2).split(",").exists(_.trim == "fuzzy")) fuzzy = true
      } else if (line.startsWith("#")) { // comments/references: skipped
      } else if (line.startsWith("msgctxt")) {
        commit(cur); cur = Some(-2)
        buf.append(unquote(line.substring(7).trim))
      } else if (line.startsWith("msgid_plural")) {
        commit(cur); cur = Some(-3)
        buf.append(unquote(line.substring(12).trim))
      } else if (line.startsWith("msgid")) {
        // a new msgid without a blank separator also ends the entry
        if (id.isDefined && (cur.exists(_ >= 0))) endEntry()
        else commit(cur)
        cur = Some(-1)
        buf.append(unquote(line.substring(5).trim))
      } else if (line.startsWith("msgstr[")) {
        val close = line.indexOf(']')
        val n = line.substring(7, close).toInt
        commit(cur); cur = Some(n)
        buf.append(unquote(line.substring(close + 1).trim))
      } else if (line.startsWith("msgstr")) {
        commit(cur); cur = Some(0)
        buf.append(unquote(line.substring(6).trim))
      } else if (line.startsWith("\"")) {
        buf.append(unquote(line)) // continuation string
      }
    }
    endEntry()
    out.result()
  }

  /** Aligned (source, target) pairs — the MT-training view: singular
    * msgstr (or plural form 0), fuzzy and untranslated entries dropped.
    */
  def pairs(b: Array[Byte]): Vector[(String, String)] =
    entries(b).collect {
      case e if !e.fuzzy && e.strs.headOption.exists(_.nonEmpty) =>
        (e.id, e.strs.head)
    }

  /** One C string literal (quotes stripped, escapes decoded). */
  private[ext] def unquote(s: String): String = {
    val t =
      if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
        s.substring(1, s.length - 1)
      else s
    val out = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '\\' && i + 1 < t.length) {
        t.charAt(i + 1) match {
          case 'n' => out.append('\n')
          case 't' => out.append('\t')
          case 'r' => out.append('\r')
          case other => out.append(other)
        }
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Escape for the builder. */
  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t") + "\""

  /** Deterministic .po builder: long values wrap at 40 chars into
    * continuation strings (the msgfmt shape).
    */
  private[graft] def build(
      es: Seq[(String, String, Seq[String], Boolean)]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("# generated fixture\nmsgid \"\"\nmsgstr \"\"\n")
    sb.append("\"Content-Type: text/plain; charset=UTF-8\\n\"\n\n")
    def value(keyword: String, v: String): Unit =
      if (v.length <= 40) sb.append(s"$keyword ${quote(v)}\n")
      else {
        sb.append(s"$keyword \"\"\n")
        v.grouped(40).foreach(seg => sb.append(quote(seg)).append('\n'))
      }
    for ((ctxt, id, strs, fuzzy) <- es) {
      if (fuzzy) sb.append("#, fuzzy\n")
      sb.append("#: src/ref.c:42\n")
      if (ctxt.nonEmpty) value("msgctxt", ctxt)
      value("msgid", id)
      if (strs.length <= 1) value("msgstr", strs.headOption.getOrElse(""))
      else {
        value("msgid_plural", id + "s")
        strs.zipWithIndex.foreach { case (v, k) => value(s"msgstr[$k]", v) }
      }
      sb.append('\n')
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
