package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MathUtils}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product of two BIGINT arrays.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0L,
  * (acc,v) -> acc+v)` — is semantically identical but runs through the
  * higher-order-function machinery: per element it binds lambda
  * variables and walks an expression tree, and it materializes the
  * zipped array. This is the one hot spot in the similarity-search
  * path where built-ins can't express the tight loop, so it gets a
  * real Catalyst `Expression` with `doGenCode` (preference order per
  * SURVEY §7.3: compose built-ins, then a native expression — never a
  * Scala UDF). Generated code is a single fused long-multiply-
  * accumulate loop over the two `ArrayData`, no allocation.
  *
  * Public-API constraints (Spark 4.1.2): `AbstractDataType` and
  * `ExpressionUtils` are private[sql], so input typing is enforced via
  * `checkInputDataTypes()` (not `ExpectsInputTypes`) and the Column
  * API goes through `functions.call_function` against the function
  * registered by [[GraftExtensions]] — not through private expression
  * wrapping.
  *
  * Semantics are EXACTLY the composed form's — that equivalence is
  * what licenses [[graft.plans.QuantizedDotRule]] substituting this
  * expression for the built-in pattern in the optimizer:
  *
  *  - null if either array is null; null if the lengths differ
  *    (`zip_with` pads the shorter side with nulls and a null product
  *    nulls the whole `aggregate` fold); null if any element is null.
  *  - `failOnError` mirrors the arithmetic mode of the tree it stands
  *    in for. `true` = ANSI (Spark 4's default): every non-null
  *    product of the common prefix is computed with Spark's
  *    overflow-checked `MathUtils.multiplyExact` — even products PAST
  *    a null element or in a ragged-length pair, because `zip_with`
  *    materializes the whole product array before the fold ever sees
  *    a null — and the running sum uses `addExact` exactly until the
  *    fold's accumulator would have gone null. `false` = LEGACY:
  *    wrapping long arithmetic, where a null or ragged input can
  *    return null immediately since un-thrown multiplies are
  *    unobservable. The function-registry route picks the session's
  *    ANSI setting at analysis time, matching what `*` / `+` would do
  *    in the same query.
  */
case class QuantizedDot(left: Expression, right: Expression,
                        failOnError: Boolean = SQLConf.get.ansiEnabled)
  extends BinaryExpression {

  // Can return null even for non-null inputs (ragged lengths / null
  // elements), and the nullable codegen path is what makes the
  // conditional `isNull = true` assignments in doGenCode legal.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "quantized_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    if (failOnError) {
      // ANSI: overflow must surface from every product the composed
      // form would have materialized, so no early exit on nulls.
      val n = math.min(na, nb)
      var nullSeen = false
      var s = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) nullSeen = true
        else {
          val p = MathUtils.multiplyExact(x.getLong(i), y.getLong(i))
          if (!nullSeen) s = MathUtils.addExact(s, p)
        }
        i += 1
      }
      if (nullSeen || na != nb) null else s
    } else {
      if (na != nb) return null
      var s = 0L
      var i = 0
      while (i < na) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getLong(i) * y.getLong(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val s = ctx.freshName("s")
      if (failOnError) {
        val n = ctx.freshName("n")
        val nullSeen = ctx.freshName("nullSeen")
        val p = ctx.freshName("p")
        // MathUtils is a Scala object; its compiled class carries
        // static forwarders the generated Java calls directly
        val mu = "org.apache.spark.sql.catalyst.util.MathUtils"
        s"""
           |final int $na = $a.numElements();
           |final int $nb = $b.numElements();
           |final int $n = java.lang.Math.min($na, $nb);
           |boolean $nullSeen = false;
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    $nullSeen = true;
           |  } else {
           |    final long $p = $mu.multiplyExact($a.getLong($i), $b.getLong($i));
           |    if (!$nullSeen) {
           |      $s = $mu.addExact($s, $p);
           |    }
           |  }
           |}
           |if ($nullSeen || $na != $nb) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      } else {
        s"""
           |final int $na = $a.numElements();
           |if ($na != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $s = 0L;
           |  for (int $i = 0; $i < $na; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += $a.getLong($i) * $b.getLong($i);
           |  }
           |  if (!${ev.isNull}) {
           |    ${ev.value} = $s;
           |  }
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Engine extensions: registers graft's native functions so they are
  * callable from SQL (`SELECT quantized_dot(a, b)`) and through
  * [[GraftFunctions]], and injects the optimizer rule that fuses the
  * equivalent composed built-in pattern ([[graft.plans
  * .QuantizedDotRule]]) so plans written against stock Spark get the
  * native loop too. Enable per session with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * globally with `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "quantized_dot expects exactly 2 arguments")
        // analysis-time conf read: the function's arithmetic mode
        // matches what `*` / `+` would compile to in the same query
        QuantizedDot(children.head, children(1), SQLConf.get.ansiEnabled)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot expects exactly 2 arguments")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_gather"),
      new ExpressionInfo(classOf[PqGather].getName, "pq_gather"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "pq_gather expects exactly 2 arguments")
        PqGather(children.head, children(1), SQLConf.get.ansiEnabled)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize expects exactly 1 argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "strip_accents expects exactly 1 argument")
        StripAccents(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "bpe_encode expects bpe_encode(word) or bpe_encode(word, 'l r;l r;…' spec literal)")
        val merges = if (children.size == 1) BpeTokenizer.Merges else {
          // the vocabulary is DATA shipped as a plan constant — must
          // fold at analysis so the table builds once, loudly, here
          require(children(1).foldable,
            "bpe_encode: the merge-table spec must be a literal")
          BpeEncode.parseSpec(String.valueOf(children(1).eval(null)))
        }
        BpeEncode(children.head, merges)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode_bytes"),
      new ExpressionInfo(classOf[BpeEncodeBytes].getName, "bpe_encode_bytes"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "bpe_encode_bytes expects bpe_encode_bytes(word) or " +
            "bpe_encode_bytes(word, 'l r;l r;…' spec literal)")
        val merges = if (children.size == 1) ByteBpe.Merges else {
          require(children(1).foldable,
            "bpe_encode_bytes: the merge-table spec must be a literal")
          // Byte-level sides must live in remap space or they are
          // dead rules against the remapped input (advice r17).
          ByteBpe.requireAlphabetSpec(
            BpeEncode.parseSpec(String.valueOf(children(1).eval(null))))
        }
        BpeEncodeBytes(children.head, merges)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_pretokenize"),
      new ExpressionInfo(classOf[BpePretokenize].getName, "bpe_pretokenize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "bpe_pretokenize expects exactly 1 argument")
        BpePretokenize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("unigram_encode"),
      new ExpressionInfo(classOf[UnigramEncode].getName, "unigram_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "unigram_encode expects unigram_encode(word) or " +
            "unigram_encode(word, 'piece cost;…' spec literal)")
        val pieces = if (children.size == 1) UnigramEncode.Pieces else {
          require(children(1).foldable,
            "unigram_encode: the piece-table spec must be a literal")
          UnigramEncode.parseSpec(String.valueOf(children(1).eval(null)))
        }
        UnigramEncode(children.head, pieces)
      }))
    ext.injectFunction((
      new FunctionIdentifier("wordpiece_encode"),
      new ExpressionInfo(classOf[WordpieceEncode].getName, "wordpiece_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "wordpiece_encode expects wordpiece_encode(word) or " +
            "wordpiece_encode(word, 'piece;piece;…' spec literal)")
        val vocab = if (children.size == 1) WordpieceEncode.Vocab else {
          require(children(1).foldable,
            "wordpiece_encode: the vocabulary spec must be a literal")
          WordpieceEncode.parseSpec(String.valueOf(children(1).eval(null)))
        }
        WordpieceEncode(children.head, vocab)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_decode_bytes"),
      new ExpressionInfo(classOf[BpeDecodeBytes].getName, "bpe_decode_bytes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "bpe_decode_bytes expects exactly 1 argument")
        BpeDecodeBytes(children.head)
      }))
    ext.injectOptimizerRule(_ => graft.plans.QuantizedDotRule)
    // Collapse V2 FunctionCatalog invocations (graft.fn.*) onto the
    // same native expression nodes the bare-name registrations above
    // build — plan-identity between the two surfaces (q_fn_catalog).
    ext.injectOptimizerRule(_ => V2NativeFunctionRule)
    // ... and the aggregate shape (V2Aggregator → ScalaAggregator),
    // making graft.fn.top_k/min_k/bitset_agg plan-identical to the
    // functions.udaf twins (GraftAggCatalog.scala).
    ext.injectOptimizerRule(_ => V2NativeAggRule)
  }
}

/** Column-API entry points for the native functions. Resolution goes
  * through the session's function registry, so the session must have
  * [[GraftExtensions]] installed; [[isRegistered]] lets callers choose
  * the composed built-in fallback on a foreign session. */
object GraftFunctions {
  def quantizedDot(a: Column, b: Column): Column =
    call_function("quantized_dot", a, b)

  def vectorDot(a: Column, b: Column): Column =
    call_function("vector_dot", a, b)

  def pqGather(lut: Column, code: Column): Column =
    call_function("pq_gather", lut, code)

  def nfcNormalize(s: Column): Column =
    call_function("nfc_normalize", s)

  def stripAccents(s: Column): Column =
    call_function("strip_accents", s)

  def bpeEncode(w: Column): Column =
    call_function("bpe_encode", w)

  /** Encode against a custom vocabulary shipped as a spec literal
    * ([[BpeEncode.toSpec]]) — the production-size path. */
  def bpeEncode(w: Column, spec: String): Column =
    call_function("bpe_encode", w, org.apache.spark.sql.functions.lit(spec))

  /** BYTE-level encode over the GPT-2 remap alphabet ([[ByteBpe]]) —
    * total on any UTF-8 input, zero OOV. */
  def bpeEncodeBytes(w: Column): Column =
    call_function("bpe_encode_bytes", w)

  def bpeEncodeBytes(w: Column, spec: String): Column =
    call_function("bpe_encode_bytes", w, org.apache.spark.sql.functions.lit(spec))

  /** Inverse of [[bpeEncodeBytes]] — frames off, bytes back, UTF-8. */
  def bpeDecodeBytes(enc: Column): Column =
    call_function("bpe_decode_bytes", enc)

  /** Unigram-LM Viterbi segmentation over the gated default piece
    * table ([[UnigramEncode.Pieces]]) — framed `|tok||tok|` output. */
  def unigramEncode(w: Column): Column =
    call_function("unigram_encode", w)

  def unigramEncode(w: Column, spec: String): Column =
    call_function("unigram_encode", w, org.apache.spark.sql.functions.lit(spec))

  /** WordPiece greedy longest-match segmentation over the gated
    * default vocabulary ([[WordpieceEncode.Vocab]]) — framed
    * `|tok||##tok|` output, `|[UNK]|` for OOV words. */
  def wordpieceEncode(w: Column): Column =
    call_function("wordpiece_encode", w)

  def wordpieceEncode(w: Column, spec: String): Column =
    call_function("wordpiece_encode", w, org.apache.spark.sql.functions.lit(spec))

  /** The GPT-2 pretokenizer split ([[BpePretokenize]]) — pieces that
    * partition the text, each then byte-level encoded independently. */
  def bpePretokenize(text: Column): Column =
    call_function("bpe_pretokenize", text)

  def isRegistered(spark: SparkSession): Boolean =
    spark.catalog.functionExists("quantized_dot")

  /** Checked separately from [[isRegistered]]: a session can carry
    * quantized_dot from an older extensions build without pq_gather,
    * and gating the ADC fallback on the wrong function would fail
    * analysis instead of falling back. */
  def pqGatherRegistered(spark: SparkSession): Boolean =
    spark.catalog.functionExists("pq_gather")
}
