package graft.ext

/** TNEF attribute walk: checksums, body resolution (plain vs
  * PR_RTF_COMPRESSED through LZFu), attachment triples.
  */
class TnefSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("plain body, subject, two attachments") {
    val a1 = Array.tabulate(33)(k => ((k * 5) % 256).toByte)
    val t = Tnef.build("Übergabe €5", "plain body text",
      rtfBody = false, Seq(("report.pdf", a1), ("b.bin", "xy".getBytes)))
    val Some(d) = Tnef.parse(t)
    assert(d.subject == "Übergabe €5") // cp1252 high bytes round-trip
    assert(d.body == "plain body text")
    assert(d.attachments.map(_.title) == Vector("report.pdf", "b.bin"))
    assert(java.util.Arrays.equals(d.attachments.head.data, a1))
  }

  test("RTF-compressed body through the MAPI property block") {
    val t = Tnef.build("S", "rich body — dashes & more", rtfBody = true,
      Seq.empty)
    val Some(d) = Tnef.parse(t)
    assert(d.body == "rich body — dashes & more")
  }

  test("corrupt checksum ends the walk as None") {
    val t = Tnef.build("S", "b", rtfBody = false, Seq.empty)
    t(20) = (t(20) ^ 0x7F).toByte // flip a data byte: checksum mismatch
    assert(Tnef.parse(t).isEmpty)
  }

  test("non-TNEF payloads are None; sniff routes the signature") {
    assert(Tnef.parse("winmail?".getBytes).isEmpty)
    val t = Tnef.build("S", "b", rtfBody = false, Seq.empty)
    assert(Multimodal.sniffFormat(t) == "tnef")
  }
}
