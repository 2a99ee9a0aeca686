package graft.ext

/** MIME mail envelope: transfer decodes, encoded words, multipart
  * nesting, mboxrd quoting — the pure-function layer under
  * q_eml_extract / q_mbox_extract.
  */
class MailSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("quoted-printable decode: escapes, soft breaks (both line conventions)") {
    assert(new String(Mail.decodeQp("a=3Db".getBytes)) == "a=b")
    assert(new String(Mail.decodeQp("long=\r\nline".getBytes)) == "longline")
    assert(new String(Mail.decodeQp("long=\nline".getBytes)) == "longline")
    assert(new String(Mail.decodeQp("caf=C3=A9".getBytes), "UTF-8") == "café")
  }

  test("qp encode/decode round-trips arbitrary text through the fixture encoder") {
    val s = "line1\nline2\twith = signs and é unicode ✓ " + ("x" * 200)
    val enc = Mail.encodeQp(s)
    assert(!enc.split("\n").exists(_.length > 73)) // soft-broken
    assert(new String(Mail.decodeQp(enc.getBytes), "UTF-8") == s)
  }

  test("RFC 2047 encoded words: B, Q, adjacency transparency, bad charset fallback") {
    assert(Mail.decodeWords("=?UTF-8?B?UsOpc3Vtw6k=?=") == "Résumé")
    assert(Mail.decodeWords("=?ISO-8859-1?Q?J=F8rgen?=") == "Jørgen")
    assert(Mail.decodeWords("=?UTF-8?Q?a_b?=") == "a b") // underscore = space
    // whitespace BETWEEN adjacent words vanishes; around plain text it stays
    assert(Mail.decodeWords("=?UTF-8?Q?ab?=   =?UTF-8?Q?cd?=") == "abcd")
    assert(Mail.decodeWords("x =?UTF-8?Q?ab?= y") == "x ab y")
    assert(Mail.decodeWords("plain subject") == "plain subject")
    assert(Mail.decodeWords("=?NO-SUCH-CS?Q?ab?=") == "ab") // charset fallback
  }

  test("header param extraction: quoted, bare, key-prefix traps") {
    assert(Mail.param("""multipart/mixed; boundary="b 1"""", "boundary")
      .contains("b 1"))
    assert(Mail.param("text/plain; charset=utf-8", "charset").contains("utf-8"))
    assert(Mail.param("attachment; xfilename=no; filename=yes.bin", "filename")
      .contains("yes.bin"))
    assert(Mail.param("text/plain", "charset").isEmpty)
  }

  test("nested multipart walk, transfer decodes, filename, html fallback body") {
    val eml =
      ("Subject: s\r\n" +
        "Content-Type: multipart/mixed; boundary=\"o\"\r\n\r\n" +
        "--o\r\n" +
        "Content-Type: text/html; charset=\"utf-8\"\r\n" +
        "Content-Transfer-Encoding: base64\r\n\r\n" +
        java.util.Base64.getEncoder.encodeToString(
          "<html><body><p>hi <b>there</b></p></body></html>".getBytes) + "\r\n" +
        "--o\r\n" +
        "Content-Type: application/pdf\r\n" +
        "Content-Disposition: attachment; filename=\"a.pdf\"\r\n\r\n" +
        "%PDF-raw\r\n" +
        "--o--\r\n").getBytes("ISO-8859-1")
    val m = Mail.parseEml(eml)
    assert(m.parts.length == 2)
    // no text/plain leaf → body falls back to extracted html
    assert(m.text == "hi there")
    assert(m.parts(1).filename.contains("a.pdf"))
    assert(new String(m.parts(1).body) == "%PDF-raw")
  }

  test("header folding unfolds; first occurrence wins on duplicates") {
    val eml = ("Subject: part one\r\n part two\r\n" +
      "X-Dup: first\r\nX-Dup: second\r\n\r\nbody").getBytes
    val m = Mail.parseEml(eml)
    assert(m.subject == "part one part two")
    assert(m.headers("x-dup") == "first")
    assert(m.text == "body")
  }

  test("mbox split on envelope lines only; mboxrd unquoting strips ONE '>'") {
    val mbox = ("From a@x Thu Jan 15 10:00:00 2026\r\n".replace("\r", "") +
      "Subject: one\n\n" +
      ">From quoted\n>>From double\nplain\n\n" +
      "From b@x Thu Jan 15 11:00:00 2026\n" +
      "Subject: two\n\nsecond body\n").getBytes
    val ms = Mail.parseMbox(mbox)
    assert(ms.length == 2)
    assert(ms(0).subject == "one")
    assert(ms(0).text == "From quoted\n>From double\nplain")
    assert(ms(1).text == "second body")
  }

  test("malformed inputs degrade, never throw") {
    assert(Mail.parseEml("no headers at all".getBytes).text.nonEmpty ||
      Mail.parseEml("no headers at all".getBytes).parts.nonEmpty)
    val m = Mail.parseEml(
      "Content-Type: multipart/mixed\r\n\r\nno boundary param".getBytes)
    assert(m.parts.length == 1) // opaque leaf, not a crash
    assert(Mail.parseMbox("not an mbox".getBytes).isEmpty)
  }
}
