package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The GPT-2 pretokenizer: hand traces of every alternative in the
  * public pattern, the partition property (pieces tile the input —
  * concat == identity), and the composed pipeline facts the
  * q_bpe_pretokenize gate rests on. */
class BpePretokenizeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def split(s: String): Seq[String] = {
    val a = BpePretokenize.split(UTF8String.fromString(s))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("hand traces: every alternative of the public pattern") {
    assert(split("The quick fox") == Seq("The", " quick", " fox"))
    // contraction suffixes split off ('s 't 're 've 'm 'll 'd)
    assert(split("it's we're I'll you've don't I'm we'd") ==
      Seq("it", "'s", " we", "'re", " I", "'ll", " you", "'ve",
        " don", "'t", " I", "'m", " we", "'d"))
    // digit runs, with and without the leading space
    assert(split("mixed123abc 42") == Seq("mixed", "123", "abc", " 42"))
    // punctuation runs via the negated class
    assert(split("hello, world!!") == Seq("hello", ",", " world", "!!"))
    // unicode letters are one run; emoji fall to the negated class,
    // which runs GREEDILY — adjacent punctuation joins the same piece
    assert(split("naïve café 日本語 😀!") ==
      Seq("naïve", " café", " 日本語", " 😀!"))
    // trailing whitespace stays its own piece (the \s+(?!\S) arm)
    assert(split("word  ") == Seq("word", "  "))
    // interior multi-space: all but the last space go to \s+(?!\S),
    // the last attaches to the next letter run — the GPT-2 behavior
    assert(split("a   b") == Seq("a", "  ", " b"))
    assert(split("") == Seq.empty)
  }

  test("pieces PARTITION the input: concat == identity on arbitrary text") {
    val piece = Gen.oneOf("word", "it's", "123", "!!", " ", "\n\t", "日本",
      "😀", "café", "-", "a1b2", "   ")
    val strs = Gen.listOf(piece).map(_.mkString)
    check(Prop.forAll(strs) { s => split(s).mkString == s })
  }

  test("BPE merges never cross a piece boundary (the Ġword property)") {
    // encode each piece independently, then whole-string: the
    // per-piece framing must be a refinement — ' the' encodes to the
    // single token 'Ġthe' inside its piece, and no token ever spans
    // 'd Ġ' across the boundary
    val t = new BpeEncode.Table(ByteBpe.Merges)
    val pieces = split("word the")
    assert(pieces == Seq("word", " the"))
    val enc = pieces.map(p =>
      BpeEncodeBytes.encodeBytes(UTF8String.fromString(p), t).toString)
    assert(enc(1) == s"|${ByteBpe.remap(" the")}|") // Ġthe — one token
    assert(enc(0).endsWith("|d|")) // 'word' ends at its own boundary
  }

  test("SQL surface: bpe_pretokenize feeds transform(bpe_encode_bytes) in-plan") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("it's the café 😀").toDF("t")
      .select(GraftFunctions.bpePretokenize($"t").as("pieces"))
      .select(concat_ws("\u001f", $"pieces").as("joined"),
        concat_ws("\u001f",
          transform($"pieces", p => GraftFunctions.bpeEncodeBytes(p))).as("encs"))
      .collect()
    assert(out.head.getString(0) == Seq("it", "'s", " the", " café", " 😀").mkString("\u001f"))
    assert(out.head.getString(1).contains(s"|${ByteBpe.remap(" the")}|"))
  }

  test("the fixture's hand-written pieces are exactly what the expression produces") {
    // the q_bpe_pretokenize oracle asserts these lists verbatim; this
    // is the JVM-side proof they match the public pattern
    graft.queries.TextOps.pretokCases.foreach { case (text, expected) =>
      assert(split(text) == expected, s"snippet '$text'")
    }
  }
}
