package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MathUtils}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native PQ-ADC gather: `pq_gather(lut, code)` = Σₘ lut[m][code[m]]
  * over an ARRAY<ARRAY<BIGINT>> lookup table and an ARRAY<BIGINT> code
  * word (0-based codes).
  *
  * This is the inner loop of every ADC scan (`q_pq_ann`,
  * `q_ivfpq_ann`): per candidate it replaces the composed
  * `aggregate(zip_with(lut, code, (l, c) -> element_at(l, CAST(c + 1
  * AS INT))), 0, (acc, x) -> acc + x)` — which walks the HOF lambda
  * machinery per element and materializes the zipped array — with M
  * array reads and adds in generated code. Same preference order as
  * [[QuantizedDot]]: built-ins can't express the tight loop, so it is
  * a real Catalyst `Expression` with `doGenCode`, never a UDF.
  *
  * Semantics (both eval paths, interpreted and generated, and the
  * composed fallback agree on the whole VALID domain — codes within
  * row bounds, no nulls): null if either input is null, the outer
  * lengths differ, any code or LUT row is null, or a selected element
  * is null. An out-of-range code (c < 0 or ≥ its row's length) yields
  * null in BOTH arithmetic modes — defensive, since a PQ code that
  * escapes its codebook is data corruption, not arithmetic (the
  * composed form would instead raise in ANSI mode; PqOps only uses
  * the composed fallback on foreign sessions, and PqGatherSpec pins
  * the two paths' agreement on the valid domain). `failOnError`
  * mirrors the session's arithmetic mode for the running sum, like
  * [[QuantizedDot]]. */
case class PqGather(left: Expression, right: Expression,
                    failOnError: Boolean = SQLConf.get.ansiEnabled)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val lutOk = left.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    val codeOk = right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (lutOk && codeOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<ARRAY<BIGINT>>, ARRAY<BIGINT>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "pq_gather"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    val n = lut.numElements()
    if (n != code.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (lut.isNullAt(i) || code.isNullAt(i)) return null
      val row = lut.getArray(i)
      val c = code.getLong(i)
      if (c < 0L || c >= row.numElements()) return null
      val ci = c.toInt
      if (row.isNullAt(ci)) return null
      if (failOnError) s = MathUtils.addExact(s, row.getLong(ci))
      else s += row.getLong(ci)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val ci = ctx.freshName("ci")
      val add =
        if (failOnError)
          s"$s = org.apache.spark.sql.catalyst.util.MathUtils.addExact($s, $row.getLong($ci));"
        else s"$s += $row.getLong($ci);"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final org.apache.spark.sql.catalyst.util.ArrayData $row = $a.getArray($i);
         |    final long $c = $b.getLong($i);
         |    if ($c < 0L || $c >= $row.numElements()) { ${ev.isNull} = true; break; }
         |    final int $ci = (int) $c;
         |    if ($row.isNullAt($ci)) { ${ev.isNull} = true; break; }
         |    $add
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
