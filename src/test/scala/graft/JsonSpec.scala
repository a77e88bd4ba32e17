package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate mains (Verify, Bench) emit one-line JSON artifacts the
  * harness json-parses line-by-line; an unescaped control character
  * silently zeroes a round's artifact. Three rounds were lost to this
  * output path — it gets its own spec. */
class JsonSpec extends AnyFunSuite {

  test("quote escapes quotes, backslashes, and every control char") {
    assert(Json.quote("a\"b") == "\"a\\\"b\"")
    assert(Json.quote("a\\b") == "\"a\\\\b\"")
    assert(Json.quote("a\nb\rc\td") == "\"a\\nb\\rc\\td\"")
    assert(Json.quote("x" + 1.toChar + "y") == "\"x\\u0001y\"")
    // every char below 0x20 must be escaped somehow
    (0 until 32).foreach { c =>
      val q = Json.quote(c.toChar.toString)
      assert(!q.drop(1).dropRight(1).exists(_ < ' '), s"char $c unescaped: $q")
    }
  }

  test("quoted multi-line exception text stays one line and round-trips") {
    val msg = "Job aborted.\nCaused by:\n\tsomething [id=\"x\"]"
    val line = s"""{"errors":[${Json.quote(msg)}]}"""
    assert(!line.contains('\n'))
    // minimal JSON round-trip without a parser dependency: the quoted
    // form must be exactly recoverable by reversing the escapes
    val body = line.stripPrefix("{\"errors\":[\"").stripSuffix("\"]}")
    assert(unescape(body) == msg)
  }

  test("unescape is a true left-to-right decoder: backslash-then-n survives") {
    // "\\n" (literal backslash + letter n) must NOT decode to a newline;
    // a replace-chain that substitutes \n before \\ gets this wrong
    val msg = "a\\nb" // 4 chars: a, backslash, n, b
    assert(unescape(Json.quote(msg).drop(1).dropRight(1)) == msg)
  }

  /** Single-pass left-to-right JSON string-escape decoder (test-only). */
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n'  => sb += '\n'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case 't'  => sb += '\t'; i += 2
          case '"'  => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'u'  => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c    => sb += c; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.result()
  }
}
