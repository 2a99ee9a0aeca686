package graft.ext

/** MHTML web archives: root selection, resource inventory by
  * Content-Location, QP/base64 decode through the MIME walk, sniff
  * split from plain eml.
  */
class MhtmlSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val html =
    "<html><head><title>T</title></head><body><p>hello = world</p></body></html>"

  test("build/parse round-trip: title, root URL, text, resources") {
    val css = "body{margin:0}".getBytes("US-ASCII")
    val img = Array.tabulate(32)(_.toByte)
    val m = Mhtml.build("My Page", "https://example.org/a", html, Seq(
      ("https://example.org/s.css", "text/css", css),
      ("https://example.org/i.bin", "application/octet-stream", img)))
    val Some(doc) = Mhtml.parse(m)
    assert(doc.title == "My Page")
    assert(doc.rootLocation == "https://example.org/a")
    assert(doc.text == "T\nhello = world") // QP '=' round-trips
    assert(doc.resources == Vector(
      Mhtml.Resource("https://example.org/s.css", "text/css", css.length),
      Mhtml.Resource("https://example.org/i.bin", "application/octet-stream", 32)))
  }

  test("no html part -> None") {
    val eml = ("Subject: x\r\nContent-Type: text/plain\r\n\r\nbody\r\n")
      .getBytes("US-ASCII")
    assert(Mhtml.parse(eml).isEmpty)
  }

  test("sniff: multipart/related mail-shaped bytes are mhtml, others eml") {
    val m = Mhtml.build("P", "https://e.org", html, Seq.empty)
    assert(Multimodal.sniffFormat(m) == "mhtml")
    val eml = ("Message-ID: <1@e>\r\nContent-Type: text/plain\r\n\r\nhi\r\n")
      .getBytes("US-ASCII")
    assert(Multimodal.sniffFormat(eml) == "eml")
  }
}
