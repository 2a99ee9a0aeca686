package graft.ext

/** LaTeX text extraction — the arXiv corpus format, the single biggest
  * scientific-text source an LLM pipeline ingests. A deterministic
  * "detex" envelope (every rule below is the certificate contract):
  *
  *   - `%` comments to end-of-line dropped (`\%` is a literal percent);
  *   - math dropped: `$...$`, `$$...$$`, `\(...\)`, `\[...\]` and the
  *     equation/align/displaymath environments;
  *   - text-bearing one-argument commands unwrap (section/subsection/
  *     subsubsection/title emit their argument + newline; textbf/textit/
  *     texttt/emph/underline/mbox/text inline);
  *   - reference/metadata commands drop WITH their argument (cite/ref/
  *     eqref/label/usepackage/documentclass/bibliography/
  *     bibliographystyle/input/include/includegraphics);
  *   - `\begin{env}`/`\end{env}` markers vanish (content kept except
  *     for the math and verbatim-dropped envs above); `\item` emits
  *     "- "; `\\` emits a newline;
  *   - escapes `\% \& \_ \# \$ \{ \}` go literal, `~` a space, `--`/
  *     `---` kept as-is; any OTHER `\command` is dropped, its brace
  *     argument (if immediately following) kept as text;
  *   - runs of blank lines collapse to one (paragraph break).
  *
  * Scale shape: one source file = one payload row, map-only.
  */
object Tex {

  private val unwrap = Set("textbf", "textit", "texttt", "emph",
    "underline", "mbox", "text")
  private val unwrapLine = Set("section", "subsection", "subsubsection",
    "title", "paragraph", "chapter")
  private val dropArg = Set("cite", "citep", "citet", "ref", "eqref",
    "label", "usepackage", "documentclass", "bibliography",
    "bibliographystyle", "input", "include", "includegraphics",
    "vspace", "hspace", "pagestyle", "author", "date")
  private val mathEnvs = Set("equation", "equation*", "align", "align*",
    "displaymath", "eqnarray", "math")

  def text(b: Array[Byte]): String =
    text(new String(b, java.nio.charset.StandardCharsets.UTF_8))

  def text(src: String): String = {
    val out = new java.lang.StringBuilder(src.length)
    val n = src.length
    var i = 0
    var mathDepth = 0 // inside a dropped math environment
    while (i < n) {
      val c = src.charAt(i)
      if (c == '%') { // comment to EOL
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '$') {
        // inline or display math: skip to the closing delimiter
        val dbl = i + 1 < n && src.charAt(i + 1) == '$'
        i += (if (dbl) 2 else 1)
        var closed = false
        while (i < n && !closed) {
          if (src.charAt(i) == '$') {
            if (dbl) {
              if (i + 1 < n && src.charAt(i + 1) == '$') { i += 2; closed = true }
              else i += 1
            } else { i += 1; closed = true }
          } else i += 1
        }
      } else if (c == '\\') {
        if (i + 1 < n) {
          val c2 = src.charAt(i + 1)
          if ("%&_#${}".indexOf(c2) >= 0) {
            if (mathDepth == 0) out.append(c2)
            i += 2
          } else if (c2 == '\\') {
            if (mathDepth == 0) out.append('\n')
            i += 2
          } else if (c2 == '(') { // \( ... \)
            i = skipUntil(src, i + 2, "\\)")
          } else if (c2 == '[') { // \[ ... \]
            i = skipUntil(src, i + 2, "\\]")
          } else if (c2.isLetter) {
            var j = i + 1
            while (j < n && src.charAt(j).isLetter) j += 1
            val cmd = src.substring(i + 1, j)
            // optional [..] argument is never text
            var k = j
            while (k < n && src.charAt(k).isWhitespace) k += 1
            if (k < n && src.charAt(k) == '[') {
              val e = src.indexOf(']', k)
              k = if (e < 0) n else e + 1
            }
            cmd match {
              case "begin" | "end" =>
                val (env, after) = braceArg(src, k)
                if (cmd == "begin" && mathEnvs.contains(env)) mathDepth += 1
                else if (cmd == "end" && mathEnvs.contains(env) && mathDepth > 0)
                  mathDepth -= 1
                i = after
              case "item" =>
                if (mathDepth == 0) out.append("- ")
                i = j
              case cmd2 if dropArg.contains(cmd2) =>
                val (_, after) = braceArg(src, k)
                i = after
              case cmd2 if unwrapLine.contains(cmd2) =>
                val (arg, after) = braceArg(src, k)
                if (mathDepth == 0) { out.append(text(arg)); out.append('\n') }
                i = after
              case cmd2 if unwrap.contains(cmd2) =>
                val (arg, after) = braceArg(src, k)
                if (mathDepth == 0) out.append(text(arg))
                i = after
              case _ =>
                // unknown command: drop the name (and nothing else)
                i = j
            }
          } else i += 2 // \<symbol>: dropped
        } else i += 1
      } else if (c == '{' || c == '}') {
        i += 1 // bare grouping braces vanish
      } else if (c == '~') {
        if (mathDepth == 0) out.append(' ')
        i += 1
      } else {
        if (mathDepth == 0) out.append(c)
        i += 1
      }
    }
    collapseBlank(out.toString)
  }

  /** `{...}` argument at `i` (nesting honored); returns (content, next).
    * Absent brace → empty content.
    */
  private def braceArg(src: String, i: Int): (String, Int) = {
    var k = i
    while (k < src.length && src.charAt(k).isWhitespace) k += 1
    if (k >= src.length || src.charAt(k) != '{') return ("", i)
    var depth = 0
    var j = k
    while (j < src.length) {
      src.charAt(j) match {
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return (src.substring(k + 1, j), j + 1)
        case '\\' => j += 1 // escaped brace
        case _ =>
      }
      j += 1
    }
    (src.substring(k + 1), src.length)
  }

  private def skipUntil(src: String, from: Int, lit: String): Int = {
    val hit = src.indexOf(lit, from)
    if (hit < 0) src.length else hit + lit.length
  }

  /** Collapse runs of blank lines to one; trim trailing spaces. */
  private def collapseBlank(s: String): String = {
    val lines = s.split("\n", -1).map(l =>
      l.replaceAll("[ \t]+$", "").replaceAll("^[ \t]+", "")
        .replaceAll("[ \t]{2,}", " "))
    val out = Vector.newBuilder[String]
    var blank = false
    for (l <- lines) {
      if (l.isEmpty) { if (!blank) out += l; blank = true }
      else { out += l; blank = false }
    }
    out.result().mkString("\n")
      .replaceAll("^\n+", "").replaceAll("\n+$", "")
  }
}
