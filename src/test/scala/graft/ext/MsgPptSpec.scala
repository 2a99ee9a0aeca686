package graft.ext

/** Outlook .msg property walk and PowerPoint record-tree text. */
class MsgPptSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("msg: subject/sender/body, recipients, attachments with bytes") {
    val att = Array.tabulate(50)(k => ((k * 3) % 256).toByte)
    val msg = Msg.build("Quartärbericht ✓", "Jörg Müller",
      "Hello\r\nbody ✓ text",
      Seq(("Ann A", "ann@example.org"), ("Bob B", "bob@example.org")),
      Seq(("report.pdf", att), ("näme.txt", "inner".getBytes)))
    assert(Cfb.family(msg) == "msg") // property streams are the signature
    val Some(m) = Msg.parse(msg)
    assert(m.subject == "Quartärbericht ✓")
    assert(m.senderName == "Jörg Müller")
    assert(m.body == "Hello\r\nbody ✓ text")
    assert(m.recipients == Vector(("Ann A", "ann@example.org"),
      ("Bob B", "bob@example.org")))
    assert(m.attachments.map(_.filename) == Vector("report.pdf", "näme.txt"))
    assert(java.util.Arrays.equals(m.attachments.head.bytes, att))
  }

  test("msg: ANSI (001E) property streams decode too") {
    val cfb = Cfb.build(Seq(
      ("__substg1.0_0037001E", "plain subject".getBytes("ISO-8859-1")),
      ("__substg1.0_1000001E", "plain body".getBytes("ISO-8859-1"))))
    val Some(m) = Msg.parse(cfb)
    assert(m.subject == "plain subject" && m.body == "plain body")
    assert(m.recipients.isEmpty && m.attachments.isEmpty)
  }

  test("lzfu: round-trip with dictionary references, stored form, bad magic") {
    val rtf = "{\\rtf1\\ansi\\ansicpg1252\\pard hello world " +
      "hello world hello world}\r\n"
    val raw = rtf.getBytes("US-ASCII")
    val comp = Lzfu.compress(raw)
    // the init dictionary covers the {\rtf1\ansi prefix and the
    // repeated phrase self-references: compression must actually shrink
    assert(comp.length < raw.length + 16)
    assert(Lzfu.decompress(comp).map(_.toSeq).contains(raw.toSeq))
    // stored (MELA) form passes through
    val stored = new Array[Byte](16 + raw.length)
    stored(4) = (raw.length & 0xFF).toByte
    stored(5) = ((raw.length >> 8) & 0xFF).toByte
    stored(8) = 'M'; stored(9) = 'E'; stored(10) = 'L'; stored(11) = 'A'
    System.arraycopy(raw, 0, stored, 16, raw.length)
    assert(Lzfu.decompress(stored).map(_.toSeq).contains(raw.toSeq))
    assert(Lzfu.decompress("garbage!!".getBytes).isEmpty)
    // long bodies wrap the 4096 dictionary and still round-trip
    val big = ("lorem ipsum dolor sit amet " * 400).getBytes("US-ASCII")
    assert(Lzfu.decompress(Lzfu.compress(big)).map(_.toSeq).contains(big.toSeq))
  }

  test("msg: compressed-RTF body fallback when the plain property is absent") {
    val msg = Msg.build("S", "from", "Fallback body ✓ text",
      Seq.empty, Seq.empty, rtfBodyOnly = true)
    val Some(m) = Msg.parse(msg)
    assert(m.body == "Fallback body ✓ text")
  }

  test("msg: non-msg CFB and non-CFB payloads are None") {
    assert(Msg.parse(Cfb.build(Seq(("Other", "x".getBytes)))).isEmpty)
    assert(Msg.parse("nope".getBytes).isEmpty)
  }

  test("ppt: slide text atoms in order, wide and byte forms, marks normalized") {
    val ppt = Ppt.build(Seq(
      "Title slide\rsecond line", // Latin-1 -> TextBytesAtom
      "Unicode ✓ slide\u000Bwrapped", // wide -> TextCharsAtom
      "café third"))
    val t = Ppt.text(ppt).get
    assert(t == "Title slide\nsecond line\nUnicode ✓ slide\nwrapped\ncafé third")
  }

  test("ppt: broken payloads are None or empty, never a throw") {
    assert(Ppt.text("nope".getBytes).isEmpty)
    assert(Ppt.text(Cfb.build(Seq(("Other", "x".getBytes)))).isEmpty)
    // malformed record tail inside the stream: stops cleanly
    val bad = Cfb.build(Seq(
      ("PowerPoint Document", Array[Byte](0x0F, 0, 1, 2, 127, 0, 0, 0))))
    assert(Ppt.text(bad).contains(""))
  }

  test("sniff: ppt routes by signature stream") {
    assert(Multimodal.sniffFormat(Ppt.build(Seq("s"))) == "ppt")
  }
}
