package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native integer dot product of two BIGINT arrays.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0L,
  * (acc,v) -> acc+v)` — is semantically identical but runs through the
  * interpreted higher-order-function machinery: per element it
  * allocates lambda variables and evaluates an expression tree, and it
  * materializes the zipped array. This is the one hot spot in the
  * similarity-search path where built-ins can't express the tight
  * loop, so it gets a real Catalyst `Expression` with `doGenCode`
  * (preference order per the design notes: compose built-ins, then a
  * native expression — never a Scala UDF). Generated code is a single
  * fused long-multiply-accumulate loop over the two `ArrayData`.
  *
  * Semantics: null if either array is null; elements are assumed
  * non-null (the quantization step produces them); arrays of unequal
  * length dot over the common prefix.
  */
case class QuantizedDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

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
  * callable from SQL (`SELECT quantized_dot(a, b)`). Enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions`. The
  * DataFrame API path (`GraftFunctions.quantizedDot`) works without
  * any configuration. */
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

/** Column-API entry points for the native functions. */
object GraftFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def quantizedDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      QuantizedDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
