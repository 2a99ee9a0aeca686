package graft.ext

/** CFB container: header geometry, FAT chains, mini-stream layer,
  * directory walk, family discrimination.
  */
class CfbSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("round-trip: mini and regular streams, listing order, sizes") {
    val small = "mini payload".getBytes("US-ASCII")         // < 4096: mini
    val big = Array.tabulate(9000)(k => (k % 251).toByte)   // >= 4096: FAT
    val cfb = Cfb.build(Seq(("Small", small), ("BigStream", big)))
    assert(Cfb.isCfb(cfb))
    val Some(es) = Cfb.entries(cfb)
    assert(es.map(_.path) == Vector("Small", "BigStream"))
    assert(es.map(_.size) == Vector(small.length.toLong, big.length.toLong))
    assert(java.util.Arrays.equals(Cfb.read(cfb, "Small").get, small))
    assert(java.util.Arrays.equals(Cfb.read(cfb, "BigStream").get, big))
  }

  test("mini-sector boundary sizes round-trip exactly") {
    for (n <- Seq(0, 1, 63, 64, 65, 4095)) {
      val data = Array.tabulate(n)(k => ((k * 7) % 256).toByte)
      val cfb = Cfb.build(Seq(("S", data)))
      assert(Cfb.read(cfb, "S").map(_.toSeq).contains(data.toSeq), s"size $n")
    }
  }

  test("sector boundary sizes round-trip through the FAT layer") {
    for (n <- Seq(4096, 4608, 5000)) {
      val data = Array.tabulate(n)(k => ((k * 13) % 256).toByte)
      val cfb = Cfb.build(Seq(("S", data)))
      assert(Cfb.read(cfb, "S").map(_.toSeq).contains(data.toSeq), s"size $n")
    }
  }

  test("family discrimination by signature stream") {
    assert(Cfb.family(Cfb.build(Seq(
      ("WordDocument", new Array[Byte](1024)),
      ("1Table", new Array[Byte](64))))) == "doc")
    assert(Cfb.family(Cfb.build(Seq(
      ("Workbook", new Array[Byte](1024))))) == "xls")
    assert(Cfb.family(Cfb.build(Seq(
      ("PowerPoint Document", new Array[Byte](64))))) == "ppt")
    assert(Cfb.family(Cfb.build(Seq(
      ("Other", new Array[Byte](64))))) == "cfb")
  }

  test("storages: '/' paths create nested trees the walk flattens back") {
    val cfb = Cfb.build(Seq(
      ("top", "t".getBytes),
      ("__attach_version1.0_#00000000/__substg1.0_3704001F",
        "file.txt".getBytes("UTF-16LE")),
      ("__attach_version1.0_#00000000/__substg1.0_37010102",
        Array.tabulate(20)(_.toByte)),
      ("__attach_version1.0_#00000001/__substg1.0_37010102",
        "second".getBytes)))
    val Some(es) = Cfb.entries(cfb)
    assert(es.count(_.objType == 1) == 2) // two storages
    assert(es.exists(e => e.objType == 2 &&
      e.path == "__attach_version1.0_#00000000/__substg1.0_3704001F"))
    assert(new String(Cfb.read(cfb,
      "__attach_version1.0_#00000000/__substg1.0_3704001F").get,
      "UTF-16LE") == "file.txt")
    assert(new String(Cfb.read(cfb,
      "__attach_version1.0_#00000001/__substg1.0_37010102").get) == "second")
  }

  test("broken payloads are None, not crashes") {
    assert(Cfb.entries("not cfb".getBytes).isEmpty)
    assert(Cfb.entries(new Array[Byte](600)).isEmpty)
    val ok = Cfb.build(Seq(("S", "x".getBytes)))
    assert(Cfb.read(ok, "missing").isEmpty)
    val trunc = java.util.Arrays.copyOf(ok, 700)
    assert(Cfb.read(trunc, "S").isEmpty)
  }

  test("sniff routes the D0CF11E0 magic to the CFB family") {
    assert(Multimodal.sniffFormat(Cfb.build(Seq(
      ("WordDocument", new Array[Byte](600)),
      ("1Table", new Array[Byte](64))))) == "doc")
    assert(Multimodal.sniffFormat(Cfb.build(Seq(
      ("Workbook", new Array[Byte](64))))) == "xls")
    assert(Multimodal.sniffFormat(Cfb.build(Seq(
      ("Quill", new Array[Byte](64))))) == "cfb")
  }
}
