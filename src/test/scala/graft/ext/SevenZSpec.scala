package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class SevenZSpec extends AnyFunSuite {

  private val members = Seq(
    ("docs/text.txt", "seven zip member text".getBytes("UTF-8")),
    ("meta/info.bin", Array.tabulate[Byte](300)(i => (i * 3).toByte)))

  test("build → entries → read round-trips (LZMA2)") {
    val z = SevenZ.build(members)
    assert(Multimodal.sniffFormat(z) == "7z")
    val es = SevenZ.entries(z)
    assert(es.map(_.name) == Seq("docs/text.txt", "meta/info.bin"))
    assert(es.map(_.size) == Seq(21L, 300L))
    assert(new String(SevenZ.read(z, "docs/text.txt").get, "UTF-8") ==
      "seven zip member text")
    assert(java.util.Arrays.equals(SevenZ.read(z, "meta/info.bin").get,
      members(1)._2))
    assert(SevenZ.read(z, "nope").isEmpty)
  }

  test("AES-256 password archives: read with password, gate out without") {
    val z = SevenZ.build(members, password = Some("s3cret"))
    // listing works (header is plain), content needs the password
    assert(SevenZ.entries(z).map(_.name) == Seq("docs/text.txt", "meta/info.bin"))
    assert(SevenZ.read(z, "docs/text.txt").isEmpty)
    assert(SevenZ.read(z, "docs/text.txt", Some("wrong")).isEmpty)
    assert(new String(SevenZ.read(z, "docs/text.txt", Some("s3cret")).get,
      "UTF-8") == "seven zip member text")
  }

  test("junk and truncation: Nil/None, never thrown") {
    assert(SevenZ.entries(null) == Nil)
    assert(SevenZ.entries("not 7z at all".getBytes) == Nil)
    val z = SevenZ.build(members)
    assert(SevenZ.entries(java.util.Arrays.copyOf(z, 40)) == Nil)
    val corrupt = z.clone()
    corrupt(z.length / 2) = (corrupt(z.length / 2) ^ 0x5A).toByte
    SevenZ.read(corrupt, "docs/text.txt") // must not throw
  }
}
