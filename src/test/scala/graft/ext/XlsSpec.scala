package graft.ext

/** BIFF8 read path: SST (compressed/wide, CONTINUE splits), cell
  * records (LABELSST/NUMBER/RK/BOOLERR/MULRK), RK encodings, text grid.
  */
class XlsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val grid = Seq(
    Xls.Cell(0, 0, "name"), Xls.Cell(0, 1, "vælue ✓"),
    Xls.Cell(1, 0, 42.0), Xls.Cell(1, 1, -7.0),
    Xls.Cell(2, 0, 2.5), Xls.Cell(2, 1, 0.015625), // RK-double form (2^-6)
    Xls.Cell(3, 0, 3.14159), Xls.Cell(3, 1, true))

  test("round-trip: strings, RK int/double, NUMBER, BOOLERR") {
    val xls = Xls.build(grid)
    assert(Cfb.family(xls) == "xls")
    val Some(cs) = Xls.cells(xls)
    val m = cs.map(c => (c.row, c.col) -> c.value).toMap
    assert(m((0, 0)) == "name" && m((0, 1)) == "vælue ✓")
    assert(m((1, 0)) == 42.0 && m((1, 1)) == -7.0)
    assert(m((2, 0)) == 2.5 && m((2, 1)) == 0.015625)
    assert(m((3, 0)) == 3.14159 && m((3, 1)) == true)
  }

  test("SST CONTINUE split mid-string keeps the string intact") {
    val long = "alpha " * 50 + "Ω tail" // wide (Ω forces UTF-16)
    val cells = Seq(Xls.Cell(0, 0, long), Xls.Cell(0, 1, "short"),
      Xls.Cell(1, 0, "third"))
    for (split <- Seq(10, 47, 120, 200)) {
      val xls = Xls.build(cells, sstSplitAt = split)
      val Some(cs) = Xls.cells(xls)
      val m = cs.map(c => (c.row, c.col) -> c.value).toMap
      assert(m((0, 0)) == long, s"split at $split")
      assert(m((0, 1)) == "short" && m((1, 0)) == "third", s"split at $split")
    }
  }

  test("text grid: tab-separated rows, integral numbers without .0") {
    val xls = Xls.build(grid)
    val t = Xls.text(xls).get
    assert(t.startsWith("name\tvælue ✓\n42\t-7\n2.5\t0.015625\n"))
    assert(t.contains("3.14159\tTRUE"))
  }

  test("MULRK decodes a run of RK cells") {
    // hand-build: globals + sheet with one MULRK row of 3 cells
    val base = Xls.build(Seq(Xls.Cell(0, 0, 1.0)))
    // splice a MULRK record before the sheet EOF
    val wb = Cfb.read(base, "Workbook").get
    val mulrk = new java.io.ByteArrayOutputStream()
    def w16(v: Int) = { mulrk.write(v & 0xFF); mulrk.write((v >> 8) & 0xFF) }
    def w32(v: Int) = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    w16(5); w16(2) // row 5, colFirst 2
    for (v <- Seq(100, -300, 12)) { w16(0); w32((v << 2) | 0x02) }
    w16(4) // colLast
    val body = mulrk.toByteArray
    val rec = Array[Byte](0xBD.toByte, 0x00,
      (body.length & 0xFF).toByte, ((body.length >> 8) & 0xFF).toByte) ++ body
    // insert before the final EOF record (last 4 bytes of the stream)
    val spliced = wb.dropRight(4) ++ rec ++ wb.takeRight(4)
    val xls2 = Cfb.build(Seq(("Workbook", spliced)))
    val Some(cs) = Xls.cells(xls2)
    val m = cs.map(c => (c.row, c.col) -> c.value).toMap
    assert(m((5, 2)) == 100.0 && m((5, 3)) == -300.0 && m((5, 4)) == 12.0)
  }

  test("broken payloads are None, not crashes") {
    assert(Xls.cells("nope".getBytes).isEmpty)
    assert(Xls.cells(Cfb.build(Seq(("Other", new Array[Byte](64))))).isEmpty)
    val trunc = java.util.Arrays.copyOf(Xls.build(grid), 800)
    assert(Xls.cells(trunc).isEmpty)
  }
}
