package graft.ext

import scala.collection.mutable.ArrayBuffer

/** BibTeX parser — the citation sidecar of every LaTeX corpus. The
  * envelope:
  *
  *   - `@type{key, field = value, ...}` entries; type and field names
  *     case-folded to lowercase, keys verbatim;
  *   - values: `{brace-balanced}` (nesting kept, outer braces and any
  *     remaining grouping braces stripped from the RESULT), `"quoted"`,
  *     or bare numerals/identifiers;
  *   - `#` string concatenation joins the pieces; `@string` definitions
  *     resolve into later values (single pass, forward references
  *     unresolved stay as the macro name);
  *   - `@comment` and `@preamble` blocks and free text between entries
  *     are skipped;
  *   - internal whitespace runs (incl. newlines from wrapped fields)
  *     collapse to one space.
  */
object Bib {

  final case class BibEntry(entryType: String, key: String,
      fields: Map[String, String])

  def entries(b: Array[Byte]): Vector[BibEntry] =
    entries(new String(b, java.nio.charset.StandardCharsets.UTF_8))

  def entries(src: String): Vector[BibEntry] = {
    val out = Vector.newBuilder[BibEntry]
    val strings = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    val n = src.length
    while (i < n) {
      val at = src.indexOf('@', i)
      if (at < 0) i = n
      else {
        var j = at + 1
        while (j < n && (src.charAt(j).isLetter)) j += 1
        val typ = src.substring(at + 1, j).toLowerCase
        while (j < n && src.charAt(j).isWhitespace) j += 1
        if (j >= n || (src.charAt(j) != '{' && src.charAt(j) != '(')) i = at + 1
        else {
          val open = src.charAt(j)
          val close = if (open == '{') '}' else ')'
          val (body, after) = balanced(src, j, open, close)
          typ match {
            case "comment" | "preamble" => // skipped
            case "string" =>
              // name = value
              val eq = body.indexOf('=')
              if (eq > 0) {
                val name = body.substring(0, eq).trim.toLowerCase
                strings(name) = parseValue(body.substring(eq + 1).trim, strings)
              }
            case _ =>
              val comma = body.indexOf(',')
              if (comma > 0) {
                val key = body.substring(0, comma).trim
                val fields = parseFields(body.substring(comma + 1), strings)
                out += BibEntry(typ, key, fields)
              }
          }
          i = after
        }
      }
    }
    out.result()
  }

  /** Body between matching delimiters at `i`; returns (inner, next). */
  private def balanced(src: String, i: Int, open: Char, close: Char): (String, Int) = {
    var depth = 0
    var j = i
    while (j < src.length) {
      val c = src.charAt(j)
      if (c == open || (open == '{' && c == '{')) depth += 1
      else if (c == close) {
        depth -= 1
        if (depth == 0) return (src.substring(i + 1, j), j + 1)
      }
      j += 1
    }
    (src.substring(i + 1), src.length)
  }

  private def parseFields(body: String,
      strings: scala.collection.mutable.Map[String, String]): Map[String, String] = {
    val out = scala.collection.immutable.VectorMap.newBuilder[String, String]
    var i = 0
    val n = body.length
    while (i < n) {
      while (i < n && (body.charAt(i).isWhitespace || body.charAt(i) == ',')) i += 1
      var j = i
      while (j < n && (body.charAt(j).isLetterOrDigit ||
        body.charAt(j) == '-' || body.charAt(j) == '_')) j += 1
      if (j > i) {
        val name = body.substring(i, j).toLowerCase
        var k = j
        while (k < n && body.charAt(k).isWhitespace) k += 1
        if (k < n && body.charAt(k) == '=') {
          // value runs to the next top-level comma
          var depth = 0
          var inQ = false
          var e = k + 1
          while (e < n && !(depth == 0 && !inQ && body.charAt(e) == ',')) {
            body.charAt(e) match {
              case '{' => depth += 1
              case '}' => depth -= 1
              case '"' if depth == 0 => inQ = !inQ
              case _ =>
            }
            e += 1
          }
          out += name -> parseValue(body.substring(k + 1, e).trim, strings)
          i = e
        } else i = j + 1
      } else i = j + 1
    }
    out.result()
  }

  /** One field value: `#`-joined pieces of braced / quoted / bare. */
  private def parseValue(v: String,
      strings: scala.collection.mutable.Map[String, String]): String = {
    val pieces = ArrayBuffer.empty[String]
    var i = 0
    val n = v.length
    while (i < n) {
      while (i < n && (v.charAt(i).isWhitespace || v.charAt(i) == '#')) i += 1
      if (i < n) v.charAt(i) match {
        case '{' =>
          val (inner, after) = balanced(v, i, '{', '}')
          pieces += inner.replace("{", "").replace("}", "")
          i = after
        case '"' =>
          val e = v.indexOf('"', i + 1)
          val until = if (e < 0) n else e
          pieces += v.substring(i + 1, until).replace("{", "").replace("}", "")
          i = until + 1
        case _ =>
          var j = i
          while (j < n && !v.charAt(j).isWhitespace && v.charAt(j) != '#') j += 1
          val bare = v.substring(i, j)
          pieces += strings.getOrElse(bare.toLowerCase, bare)
          i = j
      }
    }
    pieces.mkString.replaceAll("\\s+", " ").trim
  }
}
