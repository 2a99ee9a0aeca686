package graft.ext

import java.nio.charset.Charset

/** RTF text extraction — the legacy rich-text format office corpora and
  * email attachments still carry in volume.
  *
  * RTF is a brace-grouped control-word stream; getting text out means a
  * real tokenizer, not a regex: destination groups (`\fonttbl`,
  * `\colortbl`, `{\*\...}` …) must be skipped wholesale or their payload
  * leaks into the text; `\uN` Unicode escapes carry a signed 16-bit code
  * point AND consume the next `\ucN` fallback bytes; `\'hh` escapes
  * decode through the document's ANSI code page; `\binN` embeds raw
  * bytes that would desync a text-level scan. This implements exactly
  * that envelope as a single forward pass — per-row, allocation-bounded,
  * executor-side (the triage contract of the PDF/DOCX/HTML arms).
  */
object Rtf {

  private val skipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "footerl", "footerr",
    "ftnsep", "ftnsepc", "aftnsep", "generator", "themedata",
    "colorschememapping", "latentstyles", "datastore", "xmlnstbl")

  /** Extracted text, or None when the payload is not RTF (`{\rtf`). */
  def text(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 5 || b(0) != '{' || b(1) != '\\' ||
      b(2) != 'r' || b(3) != 't' || b(4) != 'f') return None
    val out = new java.lang.StringBuilder
    // group state: (uc skip count, inside-skipped-destination)
    var ucStack = List(1)
    var skipDepth = 0 // brace depth inside a skipped destination (0 = not skipping)
    var depth = 0
    var cp: Charset = charsetFor(1252)
    var i = 0
    var pendingSkip = 0 // bytes to swallow after \uN (current group's uc)
    def uc: Int = ucStack.head
    while (i < b.length) {
      val c = b(i)
      c match {
        case '{' =>
          depth += 1
          ucStack = uc :: ucStack
          if (skipDepth > 0) skipDepth += 1
          i += 1
        case '}' =>
          depth -= 1
          if (ucStack.tail.nonEmpty) ucStack = ucStack.tail
          if (skipDepth > 0) skipDepth -= 1
          i += 1
        case '\\' if i + 1 < b.length =>
          val n = b(i + 1)
          if (n == '\\' || n == '{' || n == '}') {
            if (skipDepth == 0) {
              if (pendingSkip > 0) pendingSkip -= 1 else out.append(n.toChar)
            }
            i += 2
          } else if (n == '\'') {
            if (i + 3 < b.length) {
              val v = Integer.parseInt(new String(b, i + 2, 2, "US-ASCII"), 16)
              if (skipDepth == 0) {
                if (pendingSkip > 0) pendingSkip -= 1
                else out.append(new String(Array(v.toByte), cp))
              }
              i += 4
            } else i = b.length
          } else if (n == '*') {
            // {\*\dest ...}: an optional destination — skip the group
            if (skipDepth == 0) skipDepth = 1
            i += 2
          } else if (n == '~') { if (skipDepth == 0) out.append('\u00A0'); i += 2 }
          else if (n == '-' || n == '_' || n == ':') { i += 2 } // soft hyphen/opt
          else if (n == '\r' || n == '\n') {
            // \<newline> is an escaped \par
            if (skipDepth == 0) out.append('\n')
            i += 2
          } else if (isAlpha(n)) {
            // control word: letters then optional signed integer then
            // one optional space delimiter
            var j = i + 1
            while (j < b.length && isAlpha(b(j))) j += 1
            val word = new String(b, i + 1, j - i - 1, "US-ASCII")
            var neg = false
            var num = 0L
            var hasNum = false
            if (j < b.length && (b(j) == '-' || (b(j) >= '0' && b(j) <= '9'))) {
              if (b(j) == '-') { neg = true; j += 1 }
              while (j < b.length && b(j) >= '0' && b(j) <= '9') {
                num = num * 10 + (b(j) - '0'); hasNum = true; j += 1
              }
            }
            val value = if (neg) -num else num
            if (j < b.length && b(j) == ' ') j += 1 // delimiter space consumed
            word match {
              case "bin" =>
                val len = if (hasNum) value.toInt else 0
                j += math.max(0, len) // raw bytes: swallow
              case "u" =>
                if (skipDepth == 0) {
                  val code = (if (value < 0) value + 65536 else value).toInt
                  out.appendCodePoint(code)
                  pendingSkip = uc
                }
              case "uc" =>
                ucStack = value.toInt :: ucStack.tail
              case "ansicpg" =>
                cp = charsetFor(value.toInt)
              case "par" | "line" | "row" =>
                if (skipDepth == 0) out.append('\n')
              case "tab" | "cell" =>
                if (skipDepth == 0) out.append('\t')
              case "emdash" => if (skipDepth == 0) out.append('\u2014')
              case "endash" => if (skipDepth == 0) out.append('\u2013')
              case "lquote" => if (skipDepth == 0) out.append('\u2018')
              case "rquote" => if (skipDepth == 0) out.append('\u2019')
              case "ldblquote" => if (skipDepth == 0) out.append('\u201C')
              case "rdblquote" => if (skipDepth == 0) out.append('\u201D')
              case "bullet" => if (skipDepth == 0) out.append('\u2022')
              case w if skipDestinations.contains(w) =>
                if (skipDepth == 0) skipDepth = 1
              case _ => // formatting word: no text effect
            }
            i = j
          } else i += 2 // unknown control symbol
        case '\r' | '\n' => i += 1 // raw newlines are NOT text in RTF
        case _ =>
          if (skipDepth == 0) {
            if (pendingSkip > 0) pendingSkip -= 1 else out.append((c & 0xFF).toChar)
          }
          i += 1
      }
    }
    Some(out.toString)
  }

  private def isAlpha(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def charsetFor(cpg: Int): Charset =
    try Charset.forName(s"windows-$cpg")
    catch { case _: Exception => Charset.forName("windows-1252") }

  /** Deterministic RTF builder for certificates: escapes `\{}`, encodes
    * non-ASCII as `\uN` with a `\'3f` fallback, maps newline/tab to
    * `\par`/`\tab`, and wraps the body in a font table + an optional
    * `{\*\generator}` destination that extraction must drop.
    */
  private[graft] def build(body: String, generator: String = "graft 1.0"): String = {
    val sb = new java.lang.StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0")
    sb.append("{\\fonttbl{\\f0\\fswiss Helvetica;}}")
    sb.append("{\\colortbl;\\red0\\green0\\blue0;}")
    sb.append(s"{\\*\\generator $generator;}")
    sb.append("\\f0\\fs24 ")
    body.foreach {
      case '\\' => sb.append("\\\\")
      case '{'  => sb.append("\\{")
      case '}'  => sb.append("\\}")
      case '\n' => sb.append("\\par\n")
      case '\t' => sb.append("\\tab ")
      case ch if ch > 127 => sb.append(s"\\u${ch.toInt}\\'3f")
      case ch   => sb.append(ch)
    }
    sb.append("}")
    sb.toString
  }
}
