package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_pretokenize(text)` — the GPT-2 PRETOKENIZER: the public regex
  * production tokenizers run BEFORE byte-level BPE, splitting text
  * into contraction suffixes, space-prefixed letter runs, digit runs,
  * punctuation runs, and whitespace:
  *
  *   `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`
  *
  * Every character matches exactly one alternative, so the pieces
  * PARTITION the input — `concat(pieces) == text` for any string
  * (property-swept in BpePretokenizeSpec), which is what makes
  * pretokenize → encode → decode → join lossless end to end. BPE
  * merges then run per piece and can never cross a piece boundary —
  * the reason GPT-family vocabularies contain `Ġword` tokens but
  * never `wordĠnext` (the leading-space attachment is THIS regex's
  * ` ?\p{L}+` alternative, not a BPE property).
  *
  * Unicode semantics: `\p{L}`/`\p{N}` are code-point category classes
  * (supplementary-plane aware); `UNICODE_CHARACTER_CLASS` lifts `\s`
  * to Unicode whitespace, matching the Python-regex behavior of the
  * reference implementation.
  *
  * Scale shape: per-row codegen'd map work like the encoders; the
  * compiled pattern is a JVM-static singleton (zero per-row compile),
  * output rides as an in-row array feeding `transform(...,
  * bpe_encode_bytes)` HOFs — no explode, no shuffle. */
case class BpePretokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pretokenize"

  override protected def nullSafeEval(v: Any): Any =
    BpePretokenize.split(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpePretokenize.split($c)")

  override protected def withNewChildInternal(newChild: Expression): BpePretokenize =
    copy(child = newChild)
}

object BpePretokenize {

  /** The public GPT-2 pattern, verbatim. */
  val PatternString: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  private val pattern = java.util.regex.Pattern.compile(
    PatternString, java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Static seam for generated code. */
  def split(u: UTF8String): ArrayData = {
    val s = u.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val m = pattern.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var last = 0
    while (m.find()) {
      // the alternation is total (whitespace + the negated class cover
      // everything), so matches must tile the string; a gap would mean
      // the pattern drifted — fail loudly, never drop bytes
      require(m.start() == last,
        s"bpe_pretokenize: pattern gap at char $last in '${s.take(80)}'")
      out += UTF8String.fromString(m.group())
      last = m.end()
    }
    require(last == s.length,
      s"bpe_pretokenize: pattern left a tail at char $last in '${s.take(80)}'")
    new GenericArrayData(out.toArray)
  }
}
