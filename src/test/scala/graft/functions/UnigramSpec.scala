package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** UnigramEncode: Viterbi segmentation semantics, the pinned
  * longest-first tie-break, loud failure modes, and the SQL surface. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def enc(word: String, pieces: Seq[(String, Long)] = UnigramEncode.Pieces): String =
    UnigramEncode.encode(UTF8String.fromString(word),
      new UnigramEncode.Table(pieces)).toString

  test("default table picks the cheapest segmentation") {
    // the: |the|(11) beats th+e(19), t+he(19), t+h+e(30)
    assert(enc("the") == "|the|")
    // there: the+re(20) beats ther+e(22), th+er+e(28)
    assert(enc("there") == "|the||re|")
    // q has no multi-char pieces through it
    assert(enc("q") == "|q|")
    assert(enc("") == "")
  }

  test("TIE-BREAK: longest piece achieving the optimum wins (pinned)") {
    // x+y = 10+10 = 20 equals xy = 20 → the longer piece must win
    val tied = Seq("x" -> 10L, "y" -> 10L, "xy" -> 20L)
    assert(enc("xy", tied) == "|xy|")
    // and the tie-break applies POSITION BY POSITION during the walk,
    // not just at the start: prefix 'a' then the tie
    assert(enc("axy", tied :+ ("a" -> 7L)) == "|a||xy|")
    // sanity: when the longer piece is strictly worse it must NOT win
    assert(enc("xy", Seq("x" -> 10L, "y" -> 10L, "xy" -> 21L)) == "|x||y|")
    // default-table tie on a real shape: at+x(19) vs a+t+x(30) — and
    // 'ati' has the tri-piece (11) beating both 19-cost pair paths
    assert(enc("ati") == "|ati|")
  }

  test("tie-break agrees with the oracle's ORDER BY (cost+dp, length DESC)") {
    // three-way tie by construction: ab+c = a+bc = abc = 30
    val p = Seq("a" -> 10L, "b" -> 10L, "c" -> 10L,
      "ab" -> 20L, "bc" -> 20L, "abc" -> 30L)
    assert(enc("abc", p) == "|abc|", "longest wins the 3-way tie")
    // remove abc → ab+c vs a+bc still tie at 30; first-position
    // longest-first picks ab, then c
    assert(enc("abc", p.filterNot(_._1 == "abc")) == "|ab||c|")
  }

  test("uncoverable input and bad tables fail loudly") {
    val e = intercept[IllegalArgumentException](enc("ab", Seq("a" -> 1L)))
    assert(e.getMessage.contains("not coverable"))
    intercept[IllegalArgumentException](new UnigramEncode.Table(Nil))
    intercept[IllegalArgumentException](new UnigramEncode.Table(Seq("" -> 1L)))
    intercept[IllegalArgumentException](new UnigramEncode.Table(Seq("a|b" -> 1L)))
    intercept[IllegalArgumentException](new UnigramEncode.Table(Seq("a" -> -1L)))
  }

  test("duplicate pieces keep the cheapest cost (order-free)") {
    // a kept at 4 → a+b = 6 beats ab = 7; a kept at 10 would flip it
    assert(enc("ab", Seq("a" -> 10L, "a" -> 4L, "b" -> 2L, "ab" -> 7L)) == "|a||b|")
    assert(enc("ab", Seq("a" -> 4L, "a" -> 10L, "b" -> 2L, "ab" -> 7L)) == "|a||b|")
  }

  test("spec literal round-trip and SQL surface") {
    val spec = UnigramEncode.toSpec(Seq("x" -> 10L, "y" -> 10L, "xy" -> 20L))
    assert(UnigramEncode.parseSpec(spec) == Seq("x" -> 10L, "y" -> 10L, "xy" -> 20L))
    intercept[IllegalArgumentException](UnigramEncode.parseSpec("x"))
    intercept[IllegalArgumentException](UnigramEncode.parseSpec("x notanumber"))
    val row = spark.sql(
      s"SELECT unigram_encode('xy', '$spec') AS t, unigram_encode('there') AS d")
      .collect()(0)
    assert(row.getString(0) == "|xy|")
    assert(row.getString(1) == "|the||re|")
    // non-literal spec must be rejected at analysis
    val err = intercept[Exception] {
      spark.sql("SELECT unigram_encode('x', concat('a', ' 1')) AS t").collect()
    }
    assert(err.getMessage != null)
  }

  test("partition property on corpus-shaped words: concat(tokens) = word") {
    import spark.implicits._
    val words = Seq("information", "tokenization", "mention", "zzz", "algorithm")
    val bad = words.toDF("w")
      .selectExpr("w", "unigram_encode(w) AS toks")
      .where("replace(replace(toks, '||', ''), '|', '') != w")
      .count()
    assert(bad == 0)
  }
}
