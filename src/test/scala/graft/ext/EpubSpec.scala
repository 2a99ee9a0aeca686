package graft.ext

/** EPUB container chain: discovery, spine order, graceful failure. */
class EpubSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val ch1 = "<html><body><h1>One</h1><p>first chapter</p></body></html>"
  private val ch2 = "<html><body><h1>Two</h1><p>second chapter</p></body></html>"

  test("container.xml -> OPF -> spine-ordered chapters with extracted text") {
    val epub = Epub.build("My Book", Seq(("a.xhtml", ch1), ("b.xhtml", ch2)))
    val Some((title, chapters)) = Epub.extract(epub)
    assert(title == "My Book")
    assert(chapters.map(_.href) == Vector("a.xhtml", "b.xhtml"))
    assert(chapters(0).text == "One\nfirst chapter")
    assert(chapters(1).text == "Two\nsecond chapter")
  }

  test("chapters resolve relative to the OPF directory (OEBPS/)") {
    val epub = Epub.build("B", Seq(("sub/c.xhtml", ch1)))
    val Some((_, chapters)) = Epub.extract(epub)
    assert(chapters.head.href == "sub/c.xhtml")
    assert(chapters.head.text.contains("first chapter"))
  }

  test("broken chains are None, not crashes") {
    assert(Epub.extract("not a zip".getBytes).isEmpty)
    // a zip without the container chain
    val plain = Zip.build(Seq(("readme.txt", "x".getBytes, false)))
    assert(Epub.extract(plain).isEmpty)
    // container pointing at a missing OPF
    val broken = Zip.build(Seq(
      ("META-INF/container.xml",
        """<container><rootfiles><rootfile full-path="gone.opf"/></rootfiles></container>"""
          .getBytes, true)))
    assert(Epub.extract(broken).isEmpty)
  }
}
