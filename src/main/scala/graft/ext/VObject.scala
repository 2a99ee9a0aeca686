package graft.ext

/** iCalendar (.ics, RFC 5545) and vCard (.vcf, RFC 6350) — the
  * calendar/contact sidecars of a mail or device crawl, sharing ONE
  * content-line grammar this object implements once:
  *
  *   - physical lines CRLF-separated; a line starting with space/tab
  *     CONTINUES the previous one (unfolding drops the CRLF + 1 char);
  *   - `NAME;PARAM=V;PARAM=V:VALUE` — params split on ';' outside
  *     double quotes, name case-insensitive;
  *   - TEXT value escapes: `\\n`/`\\N` → newline, `\\,` `\\;` `\\\\`
  *     literal.
  *
  * On top: BEGIN/END component nesting — [[events]] pulls VEVENTs out
  * of a VCALENDAR (summary/location/dtstart/dtend), [[cards]] pulls
  * VCARDs (fn/email/tel), both skipping unrelated components.
  *
  * Scale shape: one file = one payload row, map-only on executors.
  */
object VObject {

  final case class Prop(name: String, params: Map[String, String],
      value: String)

  /** Unfolded, parsed content lines in order. */
  private[ext] def lines(b: Array[Byte]): Vector[Prop] = {
    val raw = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    // unfold: CRLF (or bare LF) followed by SP/HT joins
    val unfolded = raw.replace("\r\n ", "").replace("\r\n\t", "")
      .replace("\n ", "").replace("\n\t", "")
    unfolded.split("\r?\n").toVector.filter(_.nonEmpty).flatMap { line =>
      // find the ':' outside quotes
      var i = 0
      var inQ = false
      var colon = -1
      while (i < line.length && colon < 0) {
        line.charAt(i) match {
          case '"' => inQ = !inQ
          case ':' if !inQ => colon = i
          case _ =>
        }
        i += 1
      }
      if (colon < 0) None
      else {
        val head = line.substring(0, colon)
        val segs = splitOutsideQuotes(head, ';')
        val params = segs.drop(1).flatMap { p =>
          p.indexOf('=') match {
            case -1 => None
            case e => Some(p.substring(0, e).toUpperCase ->
              p.substring(e + 1).stripPrefix("\"").stripSuffix("\""))
          }
        }.toMap
        Some(Prop(segs.head.toUpperCase, params, line.substring(colon + 1)))
      }
    }
  }

  private def splitOutsideQuotes(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    var st = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => inQ = !inQ
        case c if c == sep && !inQ => out += s.substring(st, i); st = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(st)
    out.result()
  }

  /** RFC 5545 §3.3.11 TEXT unescape. */
  private[ext] def unescape(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' | 'N' => out.append('\n')
          case other => out.append(other)
        }
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  final case class Event(summary: String, location: String,
      dtStart: String, dtEnd: String)

  /** VEVENTs of a VCALENDAR payload. None when no VCALENDAR envelope. */
  def events(b: Array[Byte]): Option[Vector[Event]] = {
    val ls = try lines(b) catch { case _: Exception => return None }
    if (!ls.exists(p => p.name == "BEGIN" &&
      p.value.equalsIgnoreCase("VCALENDAR"))) return None
    val out = Vector.newBuilder[Event]
    var cur: scala.collection.mutable.Map[String, String] = null
    var depth = 0 // nested components inside VEVENT (e.g. VALARM) skipped
    for (p <- ls) p.name match {
      case "BEGIN" if p.value.equalsIgnoreCase("VEVENT") && cur == null =>
        cur = scala.collection.mutable.Map.empty
      case "BEGIN" if cur != null => depth += 1
      case "END" if cur != null && depth > 0 => depth -= 1
      case "END" if p.value.equalsIgnoreCase("VEVENT") && cur != null =>
        out += Event(cur.getOrElse("SUMMARY", ""),
          cur.getOrElse("LOCATION", ""),
          cur.getOrElse("DTSTART", ""), cur.getOrElse("DTEND", ""))
        cur = null
      case n if cur != null && depth == 0 =>
        cur(n) = unescape(p.value)
      case _ =>
    }
    Some(out.result())
  }

  final case class Card(fn: String, emails: Vector[String],
      tels: Vector[String])

  /** VCARDs of a .vcf payload (files commonly carry many). */
  def cards(b: Array[Byte]): Option[Vector[Card]] = {
    val ls = try lines(b) catch { case _: Exception => return None }
    if (!ls.exists(p => p.name == "BEGIN" &&
      p.value.equalsIgnoreCase("VCARD"))) return None
    val out = Vector.newBuilder[Card]
    var fn = ""
    var emails = Vector.empty[String]
    var tels = Vector.empty[String]
    var in = false
    for (p <- ls) p.name match {
      case "BEGIN" if p.value.equalsIgnoreCase("VCARD") =>
        in = true; fn = ""; emails = Vector.empty; tels = Vector.empty
      case "END" if p.value.equalsIgnoreCase("VCARD") && in =>
        out += Card(fn, emails, tels); in = false
      case "FN" if in => fn = unescape(p.value)
      case "EMAIL" if in => emails :+= p.value.trim
      case "TEL" if in => tels :+= p.value.trim
      case _ =>
    }
    Some(out.result())
  }
}
