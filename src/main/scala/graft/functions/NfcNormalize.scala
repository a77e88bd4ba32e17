package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Spark ships no normalization function, but a text pipeline MUST
  * normalize before any equality-shaped operation — "café" with a
  * precomposed é and "café" with e + COMBINING ACUTE are different
  * byte strings that dedup, group, join, and fingerprint apart while
  * rendering identically. Canonical composition (NFC) is the web/W3C
  * interchange form, so it is the right default for corpus keys.
  *
  * The JDK's `java.text.Normalizer` (ICU-derived, pure JVM) does the
  * composition; the expression stays inside whole-stage codegen via a
  * static call, and the overwhelmingly common already-normalized case
  * (all ASCII, or NFC-composed input) returns the INPUT UTF8String —
  * `Normalizer.isNormalized` is a cheap scan with an ASCII fast path,
  * so the hot loop allocates nothing for clean data.
  *
  * Registered as SQL function `nfc_normalize` via [[GraftExtensions]]
  * (same surface as `vector_dot`/`pq_gather`), Column API in
  * [[GraftFunctions.nfcNormalize]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static seam for the generated code (the companion class carries
    * a static forwarder, so `graft.functions.NfcNormalize.normalize`
    * resolves from generated Java). Returns the input object when it
    * is already NFC — no allocation on clean data. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Diacritic stripping — the aggressive sibling of [[NfcNormalize]]
  * for search keys and fuzzy dedup: canonical-decompose (NFD), drop
  * every non-spacing combining mark, keep the bases. Handles
  * precomposed input (é → e) and raw mark sequences alike, because
  * the decomposition runs first. ASCII input returns the input
  * object — no allocation on clean data. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(v: Any): Any =
    StripAccents.strip(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  def strip(u: UTF8String): UTF8String = {
    val s = u.toString
    var ascii = true
    var i = 0
    while (ascii && i < s.length) {
      if (s.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return u
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val cp = d.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
