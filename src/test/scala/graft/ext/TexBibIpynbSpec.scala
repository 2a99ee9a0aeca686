package graft.ext

/** LaTeX detex envelope, BibTeX entries, Jupyter notebook cells. */
class TexBibIpynbSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("tex: comments, math, sectioning, unwraps, drops, escapes") {
    // NB: "\'u'sepackage" must be assembled — Scala decodes \uXXXX even
    // inside triple quotes
    val src =
      """\documentclass{article}
        |\USEPKG{amsmath}
        |% a comment line
        |\begin{document}
        |\section{Intro \textbf{bold}}
        |Plain text with 100\% math $x^2 + y$ inline and \(a=b\) more.
        |\begin{equation}
        |E = mc^2
        |\end{equation}
        |We cite \cite{knuth84} and ref \ref{fig:1}.
        |\begin{itemize}
        |\item first
        |\item second~item
        |\end{itemize}
        |A \emph{stressed} word.\\
        |next line
        |\end{document}""".stripMargin
      .replace("\\USEPKG", "\\" + "usepackage")
    val t = Tex.text(src)
    assert(t ==
      """Intro bold
        |
        |Plain text with 100% math inline and more.
        |
        |We cite and ref .
        |
        |- first
        |- second item
        |
        |A stressed word.
        |
        |next line""".stripMargin)
  }

  test("tex: nested unwraps and unknown commands keep brace text") {
    assert(Tex.text("\\textbf{a \\emph{b} c}") == "a b c")
    assert(Tex.text("\\unknowncmd{kept text}") == "kept text")
    assert(Tex.text("pre \\[ x=1 \\] post") == "pre post")
  }

  test("bib: entries, brace/quote/bare values, concatenation, @string") {
    val src =
      """Free text is ignored.
        |@string{pub = {ACM Press}}
        |@comment{this is skipped}
        |@article{knuth84,
        |  author = {Knuth, Donald E.},
        |  title  = "The {TeX}book",
        |  year   = 1984,
        |  publisher = pub # { New York},
        |  pages = {1--483}
        |}
        |@inproceedings{dean2004, title={MapReduce:
        |  Simplified Data Processing}, year={2004}}""".stripMargin
    val es = Bib.entries(src)
    assert(es.map(_.key) == Vector("knuth84", "dean2004"))
    val k = es.head
    assert(k.entryType == "article")
    assert(k.fields("author") == "Knuth, Donald E.")
    assert(k.fields("title") == "The TeXbook")
    assert(k.fields("year") == "1984")
    assert(k.fields("publisher") == "ACM Press New York")
    assert(es(1).fields("title") == "MapReduce: Simplified Data Processing")
  }

  test("ipynb: cells in order, line-list sources, stream + result outputs") {
    val nb = Ipynb.build(Seq(
      ("markdown", "# Title\nsome *prose*\n", None),
      ("code", "x = 1\nprint(x)\n", Some("1\n")),
      ("code", "x + 1", None)))
    val Some(cs) = Ipynb.cells(nb)
    assert(cs.map(_.cellType) == Vector("markdown", "code", "code"))
    assert(cs(0).source == "# Title\nsome *prose*\n")
    assert(cs(1).source == "x = 1\nprint(x)\n")
    assert(cs(1).output == "1\n\nres") // stream text + text/plain result
    assert(cs(1).richOutputs == 1)     // the image/png counted, not decoded
    assert(cs(2).output == "")
  }

  test("ipynb: malformed is None") {
    assert(Ipynb.cells("not json".getBytes).isEmpty)
    assert(Ipynb.cells("{\"cells\": 5}".getBytes).isEmpty)
  }
}
