package graft.ext

/** gettext .po and XLIFF parallel-text extraction. */
class GettextXliffSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("po: entries, continuation strings, escapes, plurals, fuzzy, header skip") {
    val po = Gettext.build(Seq(
      ("", "Hello, world!", Seq("Hallo, Welt!"), false),
      ("menu", "Open \"file\"\nnow", Seq("Öffne \"Datei\"\njetzt"), false),
      ("", "a very long source string that certainly wraps across multiple continuation lines in the catalog",
        Seq("eine sehr lange Zielzeichenkette die sicher über mehrere Fortsetzungszeilen umbricht"), false),
      ("", "One file", Seq("Eine Datei", "%d Dateien"), false),
      ("", "Fuzzy entry", Seq("Unsichere Übersetzung"), true),
      ("", "Untranslated", Seq(""), false)))
    val es = Gettext.entries(po)
    assert(es.length == 6) // header excluded
    assert(es(0).id == "Hello, world!" && es(0).strs == Vector("Hallo, Welt!"))
    assert(es(1).ctxt == "menu")
    assert(es(1).id == "Open \"file\"\nnow")
    assert(es(1).strs.head == "Öffne \"Datei\"\njetzt")
    assert(es(2).id.startsWith("a very long source") && es(2).id.length > 80)
    assert(es(3).strs == Vector("Eine Datei", "%d Dateien"))
    assert(es(4).fuzzy)
    // MT pairs: fuzzy + untranslated dropped
    val ps = Gettext.pairs(po)
    assert(ps.length == 4)
    assert(ps.head == ("Hello, world!", "Hallo, Welt!"))
  }

  test("po: garbage degrades to empty, never throws") {
    assert(Gettext.entries("random text\nno po here".getBytes).isEmpty)
  }

  test("xliff: units, langs, entity decode, inline-markup strip, state") {
    val x = Xliff.build("en", "de", Seq(
      ("u1", "Save & exit", "Speichern & beenden", "translated"),
      ("u2", "A <b> tagged </b> source", "Ziel", ""),
      ("u3", "untouched", "", "new")))
    val Some(d) = Xliff.parse(x)
    assert(d.srcLang == "en" && d.trgLang == "de")
    assert(d.units.length == 3)
    assert(d.units(0).source == "Save & exit")
    assert(d.units(0).target == "Speichern & beenden")
    assert(d.units(0).state == "translated")
    // builder escapes the <b>; a raw inline tag is stripped by innerText
    val raw = ("""<xliff version="1.2"><file source-language="fr" """ +
      """target-language="en"><body><trans-unit id="a">""" +
      "<source>du <g id=\"1\">texte</g> riche</source>" +
      "<target state=\"final\">some <g id=\"1\">rich</g> text</target>" +
      "</trans-unit></body></file></xliff>").getBytes("UTF-8")
    val Some(d2) = Xliff.parse(raw)
    assert(d2.units.head.source == "du texte riche")
    assert(d2.units.head.target == "some rich text")
    assert(d2.units.head.state == "final")
  }

  test("xliff: non-xliff payloads are None") {
    assert(Xliff.parse("<html><body>no</body></html>".getBytes).isEmpty)
  }
}
