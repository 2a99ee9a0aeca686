package graft.ext

/** dBase .dbf: descriptors, type decodes, deleted-record skip,
  * structural sniff.
  */
class DbfSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val fields = Seq(
    Dbf.DbfField("NAME", 'C', 12, 0),
    Dbf.DbfField("COUNT", 'N', 8, 0),
    Dbf.DbfField("RATIO", 'N', 9, 3),
    Dbf.DbfField("BORN", 'D', 8, 0),
    Dbf.DbfField("ACTIVE", 'L', 1, 0))

  private val dbf = Dbf.build(fields, Seq(
    (false, Seq("ada", 42L, 2.5, "19181209", true)),
    (true, Seq("DELETED", 1L, 1.0, "20000101", false)),
    (false, Seq("grace hoppe", -7L, 0.125, "19061209", false)),
    (false, Seq("", null, null, null, null))))

  test("read: types, padding trims, deleted skip, nulls") {
    val Some(t) = Dbf.read(dbf)
    assert(t.fields.map(_.name) ==
      Vector("NAME", "COUNT", "RATIO", "BORN", "ACTIVE"))
    assert(t.rows.length == 3) // the deleted record is gone
    assert(t.rows(0) == Vector("ada", 42L, 2.5, "19181209", true))
    assert(t.rows(1) == Vector("grace hoppe", -7L, 0.125, "19061209", false))
    assert(t.rows(2) == Vector("", null, null, null, null))
  }

  test("sniff: structural gates accept dbf, reject near-misses") {
    assert(Multimodal.sniffFormat(dbf) == "dbf")
    val bad = dbf.clone(); bad(2) = 13 // month 13: implausible date
    assert(Multimodal.sniffFormat(bad) != "dbf")
    assert(Dbf.read("garbage not a dbf at all, padded to length".getBytes).isEmpty)
  }

  test("truncated payloads are None, not crashes") {
    assert(Dbf.read(java.util.Arrays.copyOf(dbf, 70)).isEmpty)
    assert(Dbf.read(java.util.Arrays.copyOf(dbf, 40)).isEmpty)
  }
}
