package graft.ext

/** Android binary XML: chunk walk, string pools (UTF-16 and UTF-8),
  * typed attribute values, manifest envelope.
  */
class AxmlSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def doc: Seq[(Int, String, Seq[(String, Any)])] = Seq(
    (0, "manifest", Seq(
      ("package", "org.example.appé"), ("versionCode", 42),
      ("versionName", "1.2.3"))),
    (1, "uses-permission", Seq(("name", "android.permission.INTERNET"))),
    (1, "uses-permission", Seq(("name", "android.permission.CAMERA"))),
    (1, "application", Seq(("debuggable", true), ("label", "My App ✓"))),
    (2, "activity", Seq(("name", ".Main"), ("exported", false),
      ("aspect", 1.5f))))

  test("elements: depth, names, typed values (utf-16 pool)") {
    val es = Axml.elements(Axml.build(doc)).get
    assert(es.map(e => (e.depth, e.name)) == Vector(
      (0, "manifest"), (1, "uses-permission"), (1, "uses-permission"),
      (1, "application"), (2, "activity")))
    val m = es.head.attrs.toMap
    assert(m("package") == "org.example.appé")
    assert(m("versionCode") == "42")
    val app = es(3).attrs.toMap
    assert(app("debuggable") == "true" && app("label") == "My App ✓")
    val act = es(4).attrs.toMap
    assert(act("exported") == "false" && act("aspect") == "1.5")
  }

  test("utf-8 string pool decodes identically") {
    val es16 = Axml.elements(Axml.build(doc)).get
    val es8 = Axml.elements(Axml.build(doc, utf8Pool = true)).get
    assert(es16 == es8)
  }

  test("manifest envelope: package, version, permissions") {
    val Some((pkg, ver, perms)) = Axml.manifest(Axml.build(doc))
    assert(pkg == "org.example.appé" && ver == "1.2.3")
    assert(perms == Vector("android.permission.INTERNET",
      "android.permission.CAMERA"))
  }

  test("broken payloads are None, not crashes") {
    assert(Axml.elements("not axml".getBytes).isEmpty)
    val trunc = java.util.Arrays.copyOf(Axml.build(doc), 40)
    assert(Axml.elements(trunc).isEmpty)
  }

  test("sniff routes the RES_XML header") {
    assert(Multimodal.sniffFormat(Axml.build(doc)) == "axml")
  }
}
