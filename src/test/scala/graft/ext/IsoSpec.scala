package graft.ext

/** ISO 9660: volume-descriptor scan, Joliet preference, Rock Ridge NM,
  * directory traversal, file reads.
  */
class IsoSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val files = Seq(
    ("readme with spaces.txt", "root payload".getBytes("US-ASCII")),
    ("Ünïcode-name.bin", Array.tabulate(3000)(k => (k % 251).toByte)),
    ("docs/nested file.md", "# nested".getBytes("US-ASCII")))

  test("joliet tree preferred: real names, nested dirs, exact file bytes") {
    val iso = Iso.build(files)
    assert(Iso.isIso(iso))
    val Some(es) = Iso.entries(iso)
    assert(es.exists(e => e.path == "readme with spaces.txt" && !e.isDir))
    assert(es.exists(e => e.path == "docs" && e.isDir))
    assert(es.exists(e => e.path == "docs/nested file.md" && !e.isDir))
    assert(new String(Iso.read(iso, "readme with spaces.txt").get) == "root payload")
    assert(Iso.read(iso, "Ünïcode-name.bin").get.toSeq == files(1)._2.toSeq)
    assert(new String(Iso.read(iso, "docs/nested file.md").get) == "# nested")
  }

  test("primary tree with Rock Ridge NM when the SVD is absent") {
    val iso = Iso.build(files)
    // surgically blank the SVD type byte so only the PVD remains
    iso(17 * 2048) = 0xFF.toByte
    val Some(es) = Iso.entries(iso)
    // NM overrides restore the real names on the primary tree
    assert(es.exists(_.path == "readme with spaces.txt"))
    assert(es.exists(_.path == "docs/nested file.md"))
    assert(new String(Iso.read(iso, "docs/nested file.md").get) == "# nested")
  }

  test("broken payloads are None, not crashes") {
    assert(Iso.entries("tiny".getBytes).isEmpty)
    assert(Iso.entries(new Array[Byte](40000)).isEmpty)
    val trunc = java.util.Arrays.copyOf(Iso.build(files), 18 * 2048)
    assert(Iso.entries(trunc).isEmpty)
  }

  test("sniff routes the CD001 descriptor") {
    assert(Multimodal.sniffFormat(Iso.build(files)) == "iso")
  }
}
