package graft.ext

/** RTF tokenizer envelope beyond the q_rtf_extract closed form. */
class RtfSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("non-RTF payloads are None; minimal doc extracts") {
    assert(Rtf.text("plain text".getBytes).isEmpty)
    assert(Rtf.text(null).isEmpty)
    assert(Rtf.text("{\\rtf1 hello world}".getBytes).contains("hello world"))
  }

  test("destinations vanish: fonttbl/colortbl/generator, nested braces") {
    val rtf = "{\\rtf1{\\fonttbl{\\f0{\\fname Arial;}}}" +
      "{\\*\\generator graft {inner} 1.0;}visible}"
    assert(Rtf.text(rtf.getBytes).contains("visible"))
  }

  test("\\uN with \\ucN fallback skipping (escapes and hex count as one each)") {
    // uc1 default: one fallback byte swallowed
    assert(Rtf.text("{\\rtf1 a\\u233\\'3fb}".getBytes).contains("aéb"))
    // uc2: two fallback bytes, mixed raw + hex escape
    assert(Rtf.text("{\\rtf1\\uc2 a\\u233 ?\\'3fb}".getBytes).contains("aéb"))
    // uc0: nothing swallowed
    assert(Rtf.text("{\\rtf1\\uc0 a\\u10003 b}".getBytes).contains("a✓b"))
    // negative code points wrap mod 65536
    assert(Rtf.text("{\\rtf1\\uc0 \\u-4096 }".getBytes)
      .contains(""))
  }

  test("code page switches drive \\'hh decoding") {
    assert(Rtf.text("{\\rtf1\\ansicpg1252 \\'f0}".getBytes).contains("ð"))
    assert(Rtf.text("{\\rtf1\\ansicpg1250 \\'f0}".getBytes).contains("đ"))
  }

  test("\\binN swallows raw bytes that would desync a text scan") {
    val payload = "{\\rtf1 a\\bin5 }}}}{b}".getBytes
    // the 5 raw bytes after the delimiter space are '}}}}{' — skipped
    assert(Rtf.text(payload).contains("ab"))
  }

  test("control symbols and named entities") {
    val got = Rtf.text(
      "{\\rtf1 x\\~y\\emdash z\\tab t\\par p\\line q}".getBytes).get
    assert(got == "x y—z\tt\np\nq")
    // escaped \<newline> is \par; raw newlines are NOT text
    assert(Rtf.text("{\\rtf1 a\\\nb\nc}".getBytes).contains("a\nbc"))
  }

  test("builder round-trip on hazard text") {
    val body = "A {brace\\set}\n\ttabbed é✓—done"
    assert(Rtf.text(Rtf.build(body).getBytes("US-ASCII")).contains(body))
  }
}
