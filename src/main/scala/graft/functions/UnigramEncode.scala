package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family) tokenizer: Viterbi segmentation
  * over a piece table — the OTHER production tokenizer family beside
  * BPE (r17 verdict item 3). Where BPE builds tokens bottom-up by
  * merge rank, a unigram model picks, among ALL segmentations of the
  * word into vocabulary pieces, the one of maximal likelihood — here
  * the minimal total COST, with integer cost surrogates standing in
  * for `-log p` exactly like the BM25 integer surrogates keep
  * `q_bm25_topk` transcendental-free and hash-gateable.
  *
  * Semantics (the single definition both the expression and the
  * DuckDB oracle replay):
  *   - suffix DP: `dp(n) = 0`; `dp(i) = min over pieces p matching at
  *     i of cost(p) + dp(i + |p|)` — O(len · maxPieceLen) lookups;
  *   - left-to-right reconstruction: at position i emit the piece
  *     achieving `dp(i)`, TIE-BREAK: the LONGEST such piece (two
  *     same-length candidates at one position are the same string, so
  *     (total, length desc) is a total order — pinned in UnigramSpec);
  *   - output is the `|tok||tok|` frame currency shared with
  *     [[BpeEncode]], so downstream splitting/cost accounting reuses
  *     the same SQL shapes.
  *
  * The piece table rides the expression tree as a plan constant (the
  * [[BpeEncode]] discipline): [[Pieces]] is the gated default, and a
  * `unigram_encode(word, 'piece cost;…' )` literal-spec form serves
  * custom vocabularies (parsed once at analysis, loudly).
  *
  * Scale shape: per-row map work inside whole-stage codegen; the DP
  * array is O(len) per row with a small constant, table lookups hash
  * a bounded-length substring; vocabulary size only affects the
  * broadcast-free plan constant. Same 100 TB story as the BPE family.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "unigram_encode"

  @transient private lazy val table = new UnigramEncode.Table(pieces)

  override protected def nullSafeEval(v: Any): Any =
    UnigramEncode.encode(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramEncode.Table].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramEncode.encode($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  /** The gated default piece table — integer `-log p` surrogates.
    * Singles a–z make every lowercase word coverable (the byte-
    * fallback role in a real SentencePiece vocab); frequent bigrams
    * cost LESS than one single (a common pair really is likelier than
    * two independent rares), so multi-char pieces win where they
    * apply; selected tri/quad pieces sit where two pieces would total
    * 19–20, creating real competition and — by design — exact ties
    * (e.g. `at`+`i` = `a`+`ti` = 19) that exercise the pinned
    * longest-first tie-break on ordinary English words. */
  val Pieces: Seq[(String, Long)] =
    ('a' to 'z').map(c => c.toString -> 10L) ++
      Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
        "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
        "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
        "ve", "co", "me", "de", "hi", "ri", "ro", "ic")
        .map(_ -> 9L) ++
      Seq("the", "ing", "and", "ion", "ent", "for", "tio", "ati",
        "ter", "ate", "ers", "res", "con", "ver", "all")
        .map(_ -> 11L) ++
      Seq("tion", "atio", "ment", "ther", "ight", "ould")
        .map(_ -> 12L)

  /** `'piece cost;piece cost;…'` — the [[BpeEncode.parseSpec]] shape
    * for the literal-spec SQL form. */
  def parseSpec(spec: String): Seq[(String, Long)] =
    spec.split(";").toSeq.filter(_.nonEmpty).map { entry =>
      entry.split(" ") match {
        case Array(p, c) if p.nonEmpty =>
          p -> (try c.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"unigram_encode: bad cost '$c' in spec entry '$entry'")
          })
        case _ => throw new IllegalArgumentException(
          s"unigram_encode: bad spec entry '$entry' (want 'piece cost')")
      }
    }

  /** The same table as a spec literal (round-trip with [[parseSpec]]). */
  def toSpec(pieces: Seq[(String, Long)]): String =
    pieces.map { case (p, c) => s"$p $c" }.mkString(";")

  /** Piece table compiled for the DP: cost map + max piece length.
    * Duplicate pieces keep the CHEAPEST cost (a vocabulary listing a
    * piece twice means the better estimate wins — deterministic and
    * order-free). */
  final class Table(pieces: Seq[(String, Long)]) extends Serializable {
    require(pieces.nonEmpty, "unigram_encode: empty piece table")
    pieces.foreach { case (p, c) =>
      require(p.nonEmpty, "unigram_encode: empty piece in table")
      require(p.indexOf('|') < 0,
        s"unigram_encode: piece '$p' contains the frame delimiter '|'")
      require(c >= 0, s"unigram_encode: negative cost for piece '$p'")
    }
    // boxed values ON PURPOSE: a scala.Long-valued java.util.HashMap
    // silently unboxes a missing key's null to 0 — the exact bug class
    // the null-checks in encode() exist to avoid
    val cost: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      pieces.foreach { case (p, c) =>
        val prev = m.get(p)
        if (prev == null || c < prev.longValue) m.put(p, java.lang.Long.valueOf(c))
      }
      m
    }
    val maxLen: Int = pieces.iterator.map(_._1.length).max
  }

  private val Inf = Long.MaxValue / 4

  /** The default table as a SQL `map(...)` literal — the Spark gate
    * sums emitted-token costs through it, so the cost ledger and the
    * piece table can never drift (shared-constant discipline). */
  def sqlCostMap: String =
    "map(" + Pieces.map { case (p, c) => s"'$p', ${c}L" }.mkString(", ") + ")"

  /** DuckDB replay of the ENTIRE definition — suffix DP by bounded
    * min-plus relaxation plus longest-first path reconstruction — as
    * GENERATED layered SQL (the [[ByteBpe.oracleEncodeSql]] replace-
    * chain precedent, applied to a DP): `maxWordLen` relaxation CTEs
    * compute `dp(pos)` exactly (each layer extends coverage by at
    * least one piece, pieces are ≥1 char, so convergence within word
    * length is a theorem, not a hope), then `maxWordLen` forward
    * steps rebuild the token string choosing, at each position, the
    * row_number()-1 piece under `ORDER BY cost + dp ASC, length DESC`
    * — the pinned tie-break. No graft code evaluates on the oracle
    * side; `wordSql` must already be lowercase-a-z and capped at
    * `maxWordLen` chars. Every layer is `AS MATERIALIZED`: each
    * references its predecessor twice, so DuckDB's default CTE
    * inlining would expand the chain exponentially (2^12 scans of the
    * documents parquet = a too-many-open-files crash, observed). */
  def oracleSql(wordSql: String, maxWordLen: Int): String = {
    val piecesValues = Pieces.map { case (p, c) => s"('$p', $c)" }.mkString(", ")
    val relax = (1 to maxWordLen).map { k =>
      val prev = s"d${k - 1}"
      s"""d$k AS MATERIALIZED (
         |  SELECT doc_id, pos, min(cost) AS cost FROM (
         |    SELECT doc_id, pos, cost FROM $prev
         |    UNION ALL
         |    SELECT d.doc_id, d.pos - length(p.p) AS pos, d.cost + p.c AS cost
         |    FROM $prev d JOIN w USING (doc_id) JOIN pieces p
         |      ON d.pos >= length(p.p)
         |     AND substr(w.word, d.pos - length(p.p) + 1, length(p.p)) = p.p
         |  ) GROUP BY doc_id, pos)""".stripMargin
    }.mkString(",\n")
    val walk = (1 to maxWordLen).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT doc_id, pos, toks, n FROM (
         |    SELECT r.doc_id, r.pos + length(p.p) AS pos,
         |      r.toks || '|' || p.p || '|' AS toks, r.n + 1 AS n,
         |      row_number() OVER (PARTITION BY r.doc_id
         |        ORDER BY p.c + d.cost ASC, length(p.p) DESC) AS rn
         |    FROM $prev r
         |    JOIN w USING (doc_id)
         |    JOIN pieces p ON substr(w.word, r.pos + 1, length(p.p)) = p.p
         |    JOIN d$maxWordLen d ON d.doc_id = r.doc_id
         |     AND d.pos = r.pos + length(p.p)
         |    WHERE r.pos < length(w.word)
         |  ) WHERE rn = 1
         |  UNION ALL
         |  SELECT r.doc_id, r.pos, r.toks, r.n FROM $prev r JOIN w USING (doc_id)
         |  WHERE r.pos = length(w.word))""".stripMargin
    }.mkString(",\n")
    s"""WITH pieces(p, c) AS (SELECT * FROM (VALUES $piecesValues) AS t(p, c)),
       |w AS MATERIALIZED (SELECT * FROM (SELECT doc_id, $wordSql AS word FROM documents)
       |      WHERE length(word) > 0),
       |d0 AS MATERIALIZED (SELECT doc_id, length(word) AS pos, CAST(0 AS BIGINT) AS cost FROM w),
       |$relax,
       |r0 AS MATERIALIZED (SELECT doc_id, 0 AS pos, '' AS toks, 0 AS n FROM w),
       |$walk
       |SELECT w.doc_id, w.word, r.toks, CAST(r.n AS BIGINT) AS n_toks,
       |  CAST(d.cost AS BIGINT) AS total_cost
       |FROM w JOIN r$maxWordLen r USING (doc_id)
       |JOIN d$maxWordLen d ON d.doc_id = w.doc_id AND d.pos = 0
       |ORDER BY w.doc_id""".stripMargin
  }

  /** Static seam for generated code: suffix DP + longest-first
    * reconstruction, returning the framed `|tok||tok|` string. Fails
    * loudly on an uncoverable word (a char outside the vocabulary) —
    * silent dropping would corrupt every downstream count. */
  def encode(u: UTF8String, table: Table): UTF8String = {
    val s = u.toString
    val n = s.length
    if (n == 0) return UTF8String.fromString("")
    val dp = new Array[Long](n + 1)
    dp(n) = 0L
    var i = n - 1
    while (i >= 0) {
      var best = Inf
      var len = 1
      val lim = math.min(table.maxLen, n - i)
      while (len <= lim) {
        val c = table.cost.get(s.substring(i, i + len))
        if (c != null && dp(i + len) < Inf) {
          val cand = c.longValue + dp(i + len)
          if (cand < best) best = cand
        }
        len += 1
      }
      dp(i) = best
      i -= 1
    }
    require(dp(0) < Inf,
      s"unigram_encode: word '$s' is not coverable by the piece table")
    val sb = new java.lang.StringBuilder(n * 2)
    var pos = 0
    while (pos < n) {
      // longest piece achieving dp(pos): scan lengths DESCENDING and
      // take the first exact achiever — the pinned tie-break
      var len = math.min(table.maxLen, n - pos)
      var chosen = -1
      while (len >= 1 && chosen < 0) {
        val c = table.cost.get(s.substring(pos, pos + len))
        if (c != null && dp(pos + len) < Inf && c.longValue + dp(pos + len) == dp(pos))
          chosen = len
        else len -= 1
      }
      // dp(pos) was built from exactly these candidates, so one matches
      sb.append('|').append(s, pos, pos + chosen).append('|')
      pos += chosen
    }
    UTF8String.fromString(sb.toString)
  }
}
