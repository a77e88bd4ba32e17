package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** WordpieceEncode: greedy longest-match semantics, the `##`
  * continuation rule, the all-or-nothing `[UNK]` path (incl. the
  * max-input-chars bound), loud table validation, and the SQL
  * surface. */
class WordpieceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def enc(word: String, vocab: Seq[String] = WordpieceEncode.Vocab): String =
    WordpieceEncode.encode(UTF8String.fromString(word),
      new WordpieceEncode.Table(vocab)).toString

  test("greedy LONGEST match wins at every position (pinned)") {
    // 'the' is a whole-word piece — it must beat th+##e and t+##he
    assert(enc("the") == "|the|")
    // hand-traced walk: th(2) beats t; then ##in, ##k, ##ing
    assert(enc("thinking") == "|th||##in||##k||##ing|")
    // greedy applies mid-word too: after 'f' the longest continuation
    // of 'orce' is ##or... no — vocab has ##ou/##on/##or? ##or is
    // absent; ##o then ##r then ##ce: trace pinned exactly
    assert(enc("force") == "|for||##ce|")
    assert(enc("") == "")
  }

  test("position 0 uses bare pieces, later positions ## pieces — never mixed") {
    // 'ing' at position 0: bare 'ing' is not in the vocab (only
    // ##ing), so the walk uses in(2) + ##g — proof the continuation
    // set never serves position 0
    assert(enc("ing") == "|in||##g|")
    // and a custom vocab where ONLY the ## form exists at pos 0 → UNK
    assert(enc("ab", Seq("##ab", "##a", "##b", "x")) == "|[UNK]|")
  }

  test("all-or-nothing [UNK]: one uncovered position voids the whole word") {
    // q has no piece at all → fails at position 0
    assert(enc("quartz") == "|[UNK]|")
    // x fails MID-word: t+##a cover positions 0-1 fine, then dead end —
    // the already-matched prefix must NOT be emitted
    assert(enc("taxi") == "|[UNK]|")
    // same letters without the x segment fine (the failure is x, not
    // the word shape)
    assert(enc("tai") == "|t||##a||##i|")
  }

  test("max-input-chars bound: over-length words are [UNK] without a walk") {
    val ok = "a" * WordpieceEncode.MaxInputChars
    assert(enc(ok).startsWith("|a||##a|"), "at the bound the walk runs")
    val over = "a" * (WordpieceEncode.MaxInputChars + 1)
    assert(enc(over) == "|[UNK]|", "one past the bound is [UNK]")
  }

  test("table validation is loud") {
    intercept[IllegalArgumentException](new WordpieceEncode.Table(Nil))
    intercept[IllegalArgumentException](new WordpieceEncode.Table(Seq("")))
    intercept[IllegalArgumentException](new WordpieceEncode.Table(Seq("##")))
    intercept[IllegalArgumentException](new WordpieceEncode.Table(Seq("a|b")))
    intercept[IllegalArgumentException](new WordpieceEncode.Table(Seq("[UNK]")))
  }

  test("spec literal round-trip and SQL surface") {
    val spec = WordpieceEncode.toSpec(Seq("ab", "##ab", "##b", "a"))
    assert(WordpieceEncode.parseSpec(spec) == Seq("ab", "##ab", "##b", "a"))
    val row = spark.sql(
      s"SELECT wordpiece_encode('abab', '$spec') AS t, " +
        "wordpiece_encode('thinking') AS d, wordpiece_encode('quartz') AS u")
      .collect()(0)
    assert(row.getString(0) == "|ab||##ab|")
    assert(row.getString(1) == "|th||##in||##k||##ing|")
    assert(row.getString(2) == "|[UNK]|")
    // non-literal spec must be rejected at analysis (a foldable
    // concat of literals is fine — it folds to a literal; rand() is
    // the genuinely non-foldable shape)
    val err = intercept[Exception] {
      spark.sql(
        "SELECT wordpiece_encode('x', concat('a', cast(rand() as string))) AS t")
        .collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("partition property: concat(bare tokens) = word for covered words") {
    import spark.implicits._
    val words = Seq("information", "the", "and", "provide", "content", "force")
    val bad = words.toDF("w")
      .selectExpr("w", "wordpiece_encode(w) AS toks")
      .where("toks != '|[UNK]|'")
      .where("replace(replace(replace(toks, '||', ''), '|', ''), '##', '') != w")
      .count()
    assert(bad == 0)
  }
}
