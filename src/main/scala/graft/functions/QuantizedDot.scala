package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
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
  * Semantics: null if either array is null; elements are assumed
  * non-null (the quantization step produces them); arrays of unequal
  * length dot over the common prefix.
  */
case class QuantizedDot(left: Expression, right: Expression)
  extends BinaryExpression {

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
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Engine extensions: registers graft's native functions so they are
  * callable from SQL (`SELECT quantized_dot(a, b)`) and through
  * [[GraftFunctions]]. Enable per session with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * globally with `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "quantized_dot expects exactly 2 arguments")
        QuantizedDot(children.head, children(1))
      }))
  }
}

/** Column-API entry points for the native functions. Resolution goes
  * through the session's function registry, so the session must have
  * [[GraftExtensions]] installed; [[isRegistered]] lets callers choose
  * the composed built-in fallback on a foreign session. */
object GraftFunctions {
  def quantizedDot(a: Column, b: Column): Column =
    call_function("quantized_dot", a, b)

  def isRegistered(spark: SparkSession): Boolean =
    spark.catalog.functionExists("quantized_dot")
}
