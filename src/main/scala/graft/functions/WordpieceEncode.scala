package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer (the BERT family) — the third production
  * tokenizer family beside BPE ([[BpeEncode]]/[[ByteBpe]]) and
  * unigram-LM ([[UnigramEncode]]), closing the set (r18 verdict
  * item 3). Where BPE merges bottom-up by rank and unigram globally
  * minimizes path cost, WordPiece is GREEDY LONGEST-MATCH-FIRST over
  * a vocabulary whose word-internal continuation pieces carry a `##`
  * prefix, with an all-or-nothing `[UNK]` fallback.
  *
  * Semantics (the single definition the expression, the spec, and the
  * DuckDB oracle all replay):
  *   - a word longer than [[WordpieceEncode.MaxInputChars]] chars maps
  *     to `[UNK]` whole (the HF/BERT `max_input_chars_per_word` rule);
  *   - at position 0 only bare pieces match, at any later position
  *     only `##`-prefixed pieces match (their bare text compared);
  *   - at each position the LONGEST matching piece is emitted — two
  *     same-length candidates at one position are the same string, so
  *     greedy-by-length is a total order (pinned in WordpieceSpec);
  *   - if NO piece matches at some position, the ENTIRE word becomes
  *     the single token `[UNK]` — WordPiece never partially covers
  *     (the property that distinguishes it from unigram's loud
  *     uncoverable-word failure: for WordPiece, OOV is a VALUE);
  *   - output is the `|tok||tok|` frame currency shared with
  *     [[BpeEncode]]/[[UnigramEncode]] (continuation pieces keep
  *     their `##`), so downstream splitting reuses the same SQL.
  *
  * The vocabulary rides the expression tree as a plan constant (the
  * [[BpeEncode]] discipline): [[WordpieceEncode.Vocab]] is the gated
  * default, and a `wordpiece_encode(word, 'piece;piece;…')` literal
  * spec serves custom vocabularies (parsed once at analysis, loudly).
  *
  * Scale shape: per-row map work inside whole-stage codegen — the
  * greedy walk is O(len · maxPieceLen) hash probes per word, state is
  * one StringBuilder; vocabulary size only affects the plan constant.
  * Same 100 TB story as the other tokenizer families. */
case class WordpieceEncode(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val table = new WordpieceEncode.Table(vocab)

  override protected def nullSafeEval(v: Any): Any =
    WordpieceEncode.encode(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("wordpieceTable", table,
      classOf[WordpieceEncode.Table].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordpieceEncode.encode($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceEncode =
    copy(child = newChild)
}

object WordpieceEncode {

  /** The all-or-nothing OOV token (framed as `|[UNK]|`). */
  val Unk = "[UNK]"

  /** HF/BERT `max_input_chars_per_word`: a longer word is `[UNK]`
    * without running the walk (a 10k-char "word" is corpus noise, and
    * the quadratic walk on it would be wasted work). Shared constant —
    * the spec pins the boundary on both sides of it. */
  val MaxInputChars = 100

  /** The gated default vocabulary. Bare singles cover a–z EXCEPT
    * q/x/z (and likewise for `##` continuations), so real words
    * containing those letters exercise the all-or-nothing `[UNK]`
    * path — the behavior that defines the family; whole-word and
    * affix pieces sit above the singles so greedy longest-match has
    * real choices on ordinary English words (`the` must win over
    * `th ##e` — pinned in WordpieceSpec). */
  val Vocab: Seq[String] = {
    val covered = ('a' to 'z').filterNot(c => c == 'q' || c == 'x' || c == 'z')
    covered.map(_.toString) ++
      covered.map(c => s"##$c") ++
      Seq("th", "the", "an", "and", "in", "is", "it", "on", "of", "or",
        "to", "he", "we", "re", "be", "by", "as", "at", "so", "no",
        "do", "if", "wh", "con", "pro", "for") ++
      Seq("##ing", "##ed", "##er", "##es", "##ly", "##tion", "##ion",
        "##ent", "##at", "##th", "##st", "##nd", "##nt", "##se",
        "##ce", "##al", "##ar", "##an", "##en", "##on", "##in",
        "##is", "##it", "##le", "##re", "##te", "##ve", "##ha",
        "##he", "##hi", "##ro", "##ri", "##ou", "##us", "##ur",
        "##ra", "##ll")
  }

  /** `'piece;piece;…'` literal-spec form (the [[BpeEncode.parseSpec]]
    * shape — no per-piece payload; membership IS the vocabulary). */
  def parseSpec(spec: String): Seq[String] =
    spec.split(";").toSeq.filter(_.nonEmpty)

  /** The vocabulary as a spec literal (round-trip with [[parseSpec]]). */
  def toSpec(vocab: Seq[String]): String = vocab.mkString(";")

  /** Vocabulary compiled for the walk: membership set + max bare
    * length (the probe bound). Duplicates collapse (membership). */
  final class Table(vocab: Seq[String]) extends Serializable {
    require(vocab.nonEmpty, "wordpiece_encode: empty vocabulary")
    vocab.foreach { p =>
      require(p.nonEmpty, "wordpiece_encode: empty piece in vocabulary")
      require(p != "##",
        "wordpiece_encode: '##' alone is not a piece (empty continuation)")
      require(p.indexOf('|') < 0,
        s"wordpiece_encode: piece '$p' contains the frame delimiter '|'")
      require(p != Unk,
        s"wordpiece_encode: '$Unk' is the reserved OOV token, not a vocabulary piece")
    }
    val pieces: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      vocab.foreach(s.add)
      s
    }
    /** Longest BARE text any piece carries (`##ing` counts 3). */
    val maxBareLen: Int = vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
  }

  /** Static seam for generated code: the greedy longest-match walk,
    * returning the framed `|tok||tok|` string ( `|[UNK]|` for an OOV
    * or over-length word, `""` for an empty one). */
  def encode(u: UTF8String, table: Table): UTF8String = {
    val s = u.toString
    val n = s.length
    if (n == 0) return UTF8String.fromString("")
    if (n > MaxInputChars) return UTF8String.fromString(s"|$Unk|")
    val sb = new java.lang.StringBuilder(n * 2)
    var pos = 0
    while (pos < n) {
      var len = math.min(table.maxBareLen, n - pos)
      var chosen = -1
      while (len >= 1 && chosen < 0) {
        val bare = s.substring(pos, pos + len)
        val probe = if (pos == 0) bare else "##" + bare
        if (table.pieces.contains(probe)) chosen = len else len -= 1
      }
      if (chosen < 0) return UTF8String.fromString(s"|$Unk|") // all-or-nothing
      sb.append('|')
      if (pos > 0) sb.append("##")
      sb.append(s, pos, pos + chosen).append('|')
      pos += chosen
    }
    UTF8String.fromString(sb.toString)
  }

  /** DuckDB replay of the ENTIRE definition as generated layered SQL
    * (the [[UnigramEncode.oracleSql]] precedent, applied to the
    * greedy walk): `maxWordLen` forward layers, each advancing every
    * still-walking word by its longest matching piece (row_number
    * under `ORDER BY bare length DESC` — the pinned greedy rule, via
    * a LEFT JOIN so a position with NO match surfaces as the NULL row
    * that turns the whole word into `[UNK]`). Position-0 vs
    * continuation matching is the `cont` flag equality. Convergence
    * within `maxWordLen` layers is a theorem (every piece is ≥1
    * char); every layer is `AS MATERIALIZED` — each references its
    * predecessor, and DuckDB's default CTE inlining would expand the
    * chain exponentially (the observed too-many-open-files crash).
    * No graft code evaluates on the oracle side; `wordSql` must
    * already be lowercase-a-z and capped at `maxWordLen` chars
    * (≤ [[MaxInputChars]], so the over-length rule never fires here —
    * it is pinned in WordpieceSpec instead). */
  def oracleSql(wordSql: String, maxWordLen: Int): String = {
    require(maxWordLen <= MaxInputChars,
      s"oracleSql replays the walk only (maxWordLen $maxWordLen must be <= $MaxInputChars)")
    val vocabValues = Vocab.map(p => s"('$p')").mkString(", ")
    val walk = (1 to maxWordLen).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT doc_id, pos, toks, n, failed FROM (
         |    SELECT r.doc_id,
         |      CASE WHEN v.p IS NULL THEN length(w.word) ELSE r.pos + v.blen END AS pos,
         |      CASE WHEN v.p IS NULL THEN '|[UNK]|'
         |           ELSE r.toks || '|' || v.p || '|' END AS toks,
         |      CASE WHEN v.p IS NULL THEN 1 ELSE r.n + 1 END AS n,
         |      CASE WHEN v.p IS NULL THEN 1 ELSE 0 END AS failed,
         |      row_number() OVER (PARTITION BY r.doc_id
         |        ORDER BY v.blen DESC NULLS LAST, v.p) AS rn
         |    FROM $prev r
         |    JOIN w USING (doc_id)
         |    LEFT JOIN vocab v
         |      ON v.cont = CASE WHEN r.pos = 0 THEN 0 ELSE 1 END
         |     AND substr(w.word, r.pos + 1, v.blen) = v.bare
         |    WHERE r.pos < length(w.word) AND r.failed = 0
         |  ) WHERE rn = 1
         |  UNION ALL
         |  SELECT r.doc_id, r.pos, r.toks, r.n, r.failed
         |  FROM $prev r JOIN w USING (doc_id)
         |  WHERE r.pos >= length(w.word) OR r.failed = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH rawvocab(p) AS (SELECT * FROM (VALUES $vocabValues) AS t(p)),
       |vocab AS MATERIALIZED (
       |  SELECT p,
       |    CASE WHEN p LIKE '##%' THEN substr(p, 3) ELSE p END AS bare,
       |    length(CASE WHEN p LIKE '##%' THEN substr(p, 3) ELSE p END) AS blen,
       |    CASE WHEN p LIKE '##%' THEN 1 ELSE 0 END AS cont
       |  FROM rawvocab),
       |w AS MATERIALIZED (SELECT * FROM (SELECT doc_id, $wordSql AS word FROM documents)
       |      WHERE length(word) > 0),
       |r0 AS MATERIALIZED (SELECT doc_id, 0 AS pos, '' AS toks, 0 AS n, 0 AS failed FROM w),
       |$walk
       |SELECT w.doc_id, w.word, r.toks, CAST(r.n AS BIGINT) AS n_toks,
       |  CAST(r.failed AS BIGINT) AS is_unk
       |FROM w JOIN r$maxWordLen r USING (doc_id)
       |ORDER BY w.doc_id""".stripMargin
  }
}
