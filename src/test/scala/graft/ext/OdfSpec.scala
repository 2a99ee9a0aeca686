package graft.ext

/** OpenDocument text layer: whitespace carriers, subtree skips, sheet
  * grid semantics, sniff routing via the stored-mimetype magic.
  */
class OdfSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("odt: paragraphs, heading, tab/space-run/line-break, entities") {
    val odt = Odf.buildOdt(Seq(
      "<text:h>Title</text:h>",
      "<text:p>plain &amp; &#x41;</text:p>",
      """<text:p>a<text:tab/>b<text:s text:c="2"/>c<text:line-break/>d</text:p>""",
      "<text:p/>"))
    assert(Odf.odtText(odt).contains("Title\nplain & A\na\tb  c\nd\n\n"))
  }

  test("odt: annotation/note subtrees and the styles prolog are skipped") {
    val odt = Odf.buildOdt(Seq(
      "<text:p>keep<office:annotation><text:p>DROP</text:p></office:annotation> this</text:p>",
      "<text:p>x<text:note><text:p>FOOTNOTE</text:p></text:note>y</text:p>"))
    val t = Odf.odtText(odt).get
    assert(t == "keep this\nxy\n")
    assert(!t.contains("DROP") && !t.contains("FOOTNOTE") &&
      !t.contains("STYLE NOISE"))
  }

  test("ods: repeated columns expand, trailing empties trim, empty row survives") {
    val ods = Odf.buildOds(Seq(
      Seq("h1", "h2"),
      Seq("a", "", "c", "", "")))
    assert(Odf.odsText(ods).contains("h1\th2\na\t\tc\n"))
    val raw = Odf.buildOdsRaw(
      """<office:body><office:spreadsheet><table:table>""" +
        """<table:table-row><table:table-cell table:number-columns-repeated="3" """ +
        """office:value-type="string"><text:p>x</text:p></table:table-cell>""" +
        """<table:table-cell table:number-columns-repeated="5"/></table:table-row>""" +
        """<table:table-row><table:table-cell/></table:table-row>""" +
        "</table:table></office:spreadsheet></office:body>")
    assert(Odf.odsText(raw).contains("x\tx\tx\n\n"))
  }

  test("ods: multi-paragraph cells flatten to spaces") {
    val raw = Odf.buildOdsRaw(
      """<office:body><office:spreadsheet><table:table>""" +
        """<table:table-row><table:table-cell>""" +
        "<text:p>line1</text:p><text:p>line2</text:p>" +
        "</table:table-cell></table:table-row>" +
        "</table:table></office:spreadsheet></office:body>")
    assert(Odf.odsText(raw).contains("line1 line2\n"))
  }

  test("broken payloads are None, not crashes") {
    assert(Odf.odtText("not a zip".getBytes).isEmpty)
    val noContent = Zip.build(Seq(("mimetype", Odf.MimeText.getBytes, false)))
    assert(Odf.odtText(noContent).isEmpty)
    val noTable = Odf.buildOdt(Seq("<text:p>t</text:p>"))
    assert(Odf.odsText(noTable).isEmpty)
  }

  test("sniff routes odt/ods/odp off the stored-mimetype magic") {
    assert(Multimodal.sniffFormat(Odf.buildOdt(Seq("<text:p>t</text:p>"))) == "odt")
    assert(Multimodal.sniffFormat(Odf.buildOds(Seq(Seq("a")))) == "ods")
    // a plain zip (no mimetype member) stays zip
    assert(Multimodal.sniffFormat(
      Zip.build(Seq(("a.txt", "x".getBytes, false)))) == "zip")
  }
}
