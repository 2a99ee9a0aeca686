package graft.ext

/** Feed (RSS/Atom), bencode/.torrent, and iCalendar/vCard parsers. */
class FeedBencodeVSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("rss: channel title, items with CDATA and entities") {
    val rss =
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>My &amp; Blog</title><link>https://b.example</link>
        |<item><title>First &lt;post&gt;</title><link>https://b.example/1</link>
        |<pubDate>Mon, 12 Jan 2026 00:00:00 GMT</pubDate>
        |<description><![CDATA[Raw <b>html</b> & stuff]]></description></item>
        |<item><title>Second</title><link>https://b.example/2</link>
        |<pubDate>d2</pubDate><description>plain</description></item>
        |</channel></rss>""".stripMargin
    val Some(f) = Feed.parse(rss.getBytes("UTF-8"))
    assert(f.kind == "rss" && f.title == "My & Blog")
    assert(f.items.map(_.title) == Vector("First <post>", "Second"))
    assert(f.items.head.body == "Raw <b>html</b> & stuff")
    assert(f.items.head.link == "https://b.example/1")
  }

  test("atom: entries with href links and summary/content fallback") {
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>Atom T</title>
        |<entry><title>E1</title><link href="https://a.example/e1"/>
        |<updated>2026-01-12</updated><summary>s1</summary></entry>
        |<entry><title>E2</title><link href="https://a.example/e2"/>
        |<updated>2026-01-13</updated><content>c2 body</content></entry>
        |</feed>""".stripMargin
    val Some(f) = Feed.parse(atom.getBytes("UTF-8"))
    assert(f.kind == "atom" && f.title == "Atom T")
    assert(f.items.map(_.link) ==
      Vector("https://a.example/e1", "https://a.example/e2"))
    assert(f.items.map(_.body) == Vector("s1", "c2 body"))
  }

  test("feed: non-feeds are None") {
    assert(Feed.parse("<html><body>no</body></html>".getBytes).isEmpty)
  }

  test("torrent: single-file and multi-file, infohash over the exact span") {
    val info = Map(
      "name" -> "corpus.bin", "piece length" -> 262144L, "length" -> 1000000L)
    val t1 = Bencode.encode(Map("announce" -> "http://t.example/ann",
      "info" -> info))
    val Some(p1) = Bencode.torrent(t1)
    assert(p1.announce == "http://t.example/ann" && p1.name == "corpus.bin")
    assert(p1.pieceLength == 262144L && p1.totalLength == 1000000L)
    // infohash must equal SHA-1 of the encoded info dict alone
    val expect = java.security.MessageDigest.getInstance("SHA-1")
      .digest(Bencode.encode(info)).map(x => f"${x & 0xFF}%02x").mkString
    assert(p1.infoHashHex == expect)

    val multi = Map("announce" -> "udp://t2.example",
      "info" -> Map("name" -> "pack", "piece length" -> 16384L,
        "files" -> Seq(
          Map("length" -> 10L, "path" -> Seq("a", "b.txt")),
          Map("length" -> 20L, "path" -> Seq("c.bin")))))
    val Some(p2) = Bencode.torrent(Bencode.encode(multi))
    assert(p2.files == Vector(("a/b.txt", 10L), ("c.bin", 20L)))
    assert(p2.totalLength == 30L)
  }

  test("torrent: malformed is None") {
    assert(Bencode.torrent("not bencode".getBytes).isEmpty)
    assert(Bencode.torrent("d3:fooi1ee".getBytes).isEmpty) // no info
  }

  test("ics: folded lines, escapes, VALARM skipped") {
    val ics = ("BEGIN:VCALENDAR\r\nVERSION:2.0\r\n" +
      "BEGIN:VEVENT\r\nSUMMARY:Team\\, meeting\r\n  continues\r\n" +
      "LOCATION:Room\\n42\r\nDTSTART;TZID=UTC:20260115T100000\r\n" +
      "DTEND:20260115T110000\r\n" +
      "BEGIN:VALARM\r\nSUMMARY:ignore me\r\nEND:VALARM\r\n" +
      "END:VEVENT\r\nEND:VCALENDAR\r\n").getBytes("UTF-8")
    val Some(es) = VObject.events(ics)
    assert(es.length == 1)
    assert(es.head.summary == "Team, meeting continues")
    assert(es.head.location == "Room\n42")
    assert(es.head.dtStart == "20260115T100000")
  }

  test("vcf: multiple cards, FN/EMAIL/TEL") {
    val vcf = ("BEGIN:VCARD\r\nVERSION:3.0\r\nFN:Ann Ärger\r\n" +
      "EMAIL;TYPE=work:ann@example.org\r\nTEL:+1-555-0101\r\n" +
      "TEL:+1-555-0102\r\nEND:VCARD\r\n" +
      "BEGIN:VCARD\r\nFN:Bob\r\nEMAIL:bob@example.org\r\nEND:VCARD\r\n")
      .getBytes("UTF-8")
    val Some(cs) = VObject.cards(vcf)
    assert(cs.map(_.fn) == Vector("Ann Ärger", "Bob"))
    assert(cs.head.emails == Vector("ann@example.org"))
    assert(cs.head.tels == Vector("+1-555-0101", "+1-555-0102"))
  }

  test("vobject: non-calendar/card payloads are None") {
    assert(VObject.events("hello".getBytes).isEmpty)
    assert(VObject.cards("hello".getBytes).isEmpty)
  }
}
