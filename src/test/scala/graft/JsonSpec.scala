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
    val back = body
      .replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")
      .replace("\\\"", "\"").replace("\\\\", "\\")
    assert(back == msg)
  }
}
