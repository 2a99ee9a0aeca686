package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class PkgSpec extends AnyFunSuite {

  private val bin = Array.tabulate[Byte](300)(i => ((i * 17 + 3) % 251).toByte)

  test("ar: members list and read back byte-exact; junk is Nil/None") {
    val a = Pkg.arBuild(Seq(
      ("hello.txt", "ar member payload".getBytes("UTF-8")),
      ("lib.bin", bin)))
    assert(Pkg.isAr(a))
    assert(Pkg.arEntries(a).map(e => (e.name, e.size)) ==
      Seq(("hello.txt", 17L), ("lib.bin", 300L)))
    assert(new String(Pkg.arRead(a, "hello.txt").get, "UTF-8") ==
      "ar member payload")
    assert(Pkg.arRead(a, "lib.bin").get.toSeq == bin.toSeq)
    assert(Pkg.arRead(a, "missing").isEmpty)
    assert(Pkg.arEntries("not an archive".getBytes).isEmpty)
    assert(Pkg.arEntries(a.take(70)).map(_.name).forall(_ == "hello.txt"))
    // truncated mid-member: the complete listing survives, read gates out
    assert(Pkg.arRead(a.take(70), "hello.txt").isEmpty)
  }

  test("ar: BSD long names round-trip") {
    val name = "a-name-well-past-the-sixteen-byte-field.txt"
    val a = Pkg.arBuild(Seq((name, "long".getBytes)))
    assert(Pkg.arEntries(a).map(_.name) == Seq(name))
    assert(new String(Pkg.arRead(a, name).get) == "long")
  }

  test("cpio: all three ASCII dialects round-trip; CRC detects tampering") {
    for (dialect <- Seq("newc", "crc", "odc")) {
      val c = Pkg.cpioBuild(Seq(
        ("docs/t.txt", s"cpio $dialect payload".getBytes("UTF-8")),
        ("b.bin", bin)), dialect)
      assert(Pkg.isCpio(c), dialect)
      assert(Pkg.cpioEntries(c).map(_.name) == Seq("docs/t.txt", "b.bin"), dialect)
      assert(new String(Pkg.cpioRead(c, "docs/t.txt").get, "UTF-8") ==
        s"cpio $dialect payload", dialect)
      assert(Pkg.cpioRead(c, "b.bin").get.toSeq == bin.toSeq, dialect)
    }
    // flip a data byte in a CRC archive: the reader's checksum rejects
    val c = Pkg.cpioBuild(Seq(("x", bin)), "crc")
    val dataOff = c.indexOfSlice(bin.take(16))
    val bad = c.clone()
    bad(dataOff + 5) = (bad(dataOff + 5) ^ 0x40).toByte
    assert(Pkg.cpioRead(bad, "x").isEmpty)
    assert(Pkg.cpioEntries("junk!".getBytes).isEmpty)
  }

  test(".deb: ar shell + control parse + magic-routed data tar, all codecs") {
    for (codec <- Seq("xz", "gzip", "zstd", "bzip2", "none")) {
      val deb = Pkg.debBuild("Package: p1\nVersion: 2\n",
        Seq(("./usr/share/doc/p1/readme", s"deb $codec body".getBytes("UTF-8")),
          ("./usr/bin/p1", bin)), codec)
      val names = Pkg.arEntries(deb).map(_.name)
      assert(names.head == "debian-binary" && names.size == 3, codec)
      assert(new String(Pkg.arRead(deb, "debian-binary").get) == "2.0\n")
      assert(Pkg.debControl(deb).exists(_.contains("Package: p1")), codec)
      assert(Pkg.debDataEntries(deb).map(_.name) ==
        Seq("./usr/share/doc/p1/readme", "./usr/bin/p1"), codec)
      assert(new String(Pkg.debDataRead(deb,
        "./usr/share/doc/p1/readme").get, "UTF-8") == s"deb $codec body", codec)
      assert(Pkg.debDataRead(deb, "./usr/bin/p1").get.toSeq == bin.toSeq, codec)
    }
    // a non-deb ar archive gates out of the deb views, listing intact
    val plain = Pkg.arBuild(Seq(("a.o", bin)))
    assert(Pkg.debControl(plain).isEmpty && Pkg.debDataEntries(plain).isEmpty)
  }

  test("sniff: ar and cpio magics route to the new labels") {
    assert(Multimodal.sniffFormat(Pkg.arBuild(Seq(("x", bin)))) == "ar")
    for (d <- Seq("newc", "crc", "odc"))
      assert(Multimodal.sniffFormat(Pkg.cpioBuild(Seq(("x", bin)), d)) == "cpio")
    // a .deb IS an ar archive — triage names the shell, Pkg resolves it
    assert(Multimodal.sniffFormat(
      Pkg.debBuild("Package: q\n", Seq(("./f", bin)), "gzip")) == "ar")
  }
}
