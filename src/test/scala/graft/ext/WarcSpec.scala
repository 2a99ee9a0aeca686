package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private def rec(wType: String, uri: String, payload: String): String = {
    val len = payload.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: $wType\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Length: $len\r\n\r\n$payload\r\n\r\n"
  }

  test("multi-record blob parses in order with HTTP body split") {
    val http = "HTTP/1.1 301 Moved\r\nLocation: /x\r\n\r\n<html>m</html>"
    val blob = (rec("warcinfo", "", "software: test") +
      rec("response", "https://a.example/1", http) +
      rec("request", "https://a.example/1", "GET /1 HTTP/1.1\r\n\r\n"))
      .getBytes("UTF-8")
    val rs = Warc.parse(blob)
    assert(rs.map(_.warc_type) == Seq("warcinfo", "response", "request"))
    assert(rs.map(_.record_no) == Seq(0, 1, 2))
    assert(rs(1).target_uri == "https://a.example/1")
    assert(rs(1).http_status == 301)
    assert(new String(rs(1).body, "UTF-8") == "<html>m</html>")
    // warcinfo payload is not HTTP: body = full payload, status -1
    assert(rs(0).http_status == -1)
    assert(new String(rs(0).body, "UTF-8") == "software: test")
    // request payloads start with "GET", not "HTTP" → body = full payload
    assert(new String(rs(2).body, "UTF-8").startsWith("GET"))
  }

  test("malformed input is cut short, never thrown") {
    assert(Warc.parse(null) == Nil)
    assert(Warc.parse("not a warc".getBytes) == Nil)
    val good = rec("response", "u", "HTTP/1.1 200 OK\r\n\r\nbody").getBytes("UTF-8")
    // truncated mid-payload: zero records survive from the broken one
    assert(Warc.parse(good.take(good.length - 12)).isEmpty)
    // a good record followed by garbage keeps the good record
    val mixed = good ++ "garbage".getBytes
    assert(Warc.parse(mixed).map(_.warc_type) == Seq("response"))
    // Content-Length overruns the blob → rejected
    val bad = new String(good, "ISO-8859-1").replace("Content-Length: 23",
      "Content-Length: 99999").getBytes("ISO-8859-1")
    assert(Warc.parse(bad).isEmpty)
    // non-numeric Content-Length → rejected
    val nn = new String(good, "ISO-8859-1").replace("Content-Length: 23",
      "Content-Length: xx").getBytes("ISO-8859-1")
    assert(Warc.parse(nn).isEmpty)
  }

  test("binary payloads survive byte-exact") {
    val payload = Array.tabulate[Byte](64)(i => (i * 7 - 100).toByte)
    val hdr = s"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 64\r\n\r\n"
    val blob = hdr.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes
    val rs = Warc.parse(blob)
    assert(rs.length == 1)
    assert(java.util.Arrays.equals(rs.head.body, payload))
    assert(rs.head.content_length == 64L)
  }
}
