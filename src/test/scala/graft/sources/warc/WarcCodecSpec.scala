package graft.sources.warc

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contract of the WARC parser — hand-built golden inputs
  * (the SQL fixture side is covered by the q_warc_ingest gate). */
class WarcCodecSpec extends AnyFunSuite {

  private def rec(typ: String, uri: String, payload: String,
      extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      extra +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"

  test("multi-record file: types, uris, offsets, indices, payloads") {
    val r0 = rec("warcinfo", "", "software: graft\r\n")
    val r1 = rec("request", "http://x/1", "GET /1 HTTP/1.1\r\n\r\n")
    val r2 = rec("response", "http://x/1", "<html>hello</html>")
    val bytes = (r0 + r1 + r2).getBytes("UTF-8")
    val out = WarcCodec.parse(7L, bytes)
    assert(out.map(_.warc_type) == Seq("warcinfo", "request", "response"))
    assert(out.map(_.rec_idx) == Seq(0L, 1L, 2L))
    assert(out.map(_.file_id).distinct == Seq(7L))
    assert(out.map(_.target_uri) == Seq("", "http://x/1", "http://x/1"))
    assert(out.map(_.rec_offset) ==
      Seq(0L, r0.length.toLong, (r0.length + r1.length).toLong))
    assert(out.map(_.payload) ==
      Seq("software: graft\r\n", "GET /1 HTTP/1.1\r\n\r\n", "<html>hello</html>"))
    assert(out.forall(r => r.content_length == r.payload.getBytes("UTF-8").length))
  }

  test("Content-Length delimitation: embedded fake record header stays payload") {
    val trap = "a<!--\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n-->b"
    val bytes = (rec("response", "http://x/t", trap) +
      rec("response", "http://x/u", "tail")).getBytes("UTF-8")
    val out = WarcCodec.parse(1L, bytes)
    assert(out.size == 2, "separator-scanning parser would split the trap payload")
    assert(out.head.payload == trap)
    assert(out(1).payload == "tail")
  }

  test("header names are case-insensitive; unknown headers consumed") {
    val raw = "WARC/1.0\r\nwarc-type: response\r\nX-Custom: junk: with: colons\r\n" +
      "CONTENT-LENGTH: 2\r\n\r\nok\r\n\r\n"
    val out = WarcCodec.parse(0L, raw.getBytes("UTF-8"))
    assert(out.size == 1 && out.head.warc_type == "response" && out.head.payload == "ok")
  }

  test("malformations fail loudly, never resync") {
    def bad(s: String) = intercept[IllegalArgumentException] {
      WarcCodec.parse(0L, s.getBytes("UTF-8"))
    }
    assert(bad("HTTP/1.1 200\r\n\r\n").getMessage.contains("version"))
    assert(bad("WARC/1.0\r\nWARC-Type: response\r\n\r\n")
      .getMessage.contains("Content-Length"))
    // declared length runs past end of buffer
    assert(bad("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99\r\n\r\nshort")
      .getMessage.contains("past end"))
    // payload not followed by CRLFCRLF
    assert(bad("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 2\r\n\r\nokXXXX")
      .getMessage.contains("separator"))
  }

  test("empty input parses to zero records") {
    assert(WarcCodec.parse(0L, Array.emptyByteArray).isEmpty)
  }
}
