package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, EvalMode, ZipWith, Expression, LambdaFunction, Literal, Multiply, NamedExpression, NamedLambdaVariable, NumericEvalContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.{QuantizedDot, VectorDot}

/** Optimizer rule: fuse the composed higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.QuantizedDot]] (BIGINT
  * arrays; a DOUBLE-array form with `0.0D` zero fuses to
  * [[graft.functions.VectorDot]] under the same bare-pattern guards —
  * the shape a user writes for cosine over un-quantized embeddings). The
  * composed form is what a user writes with nothing but built-ins (and
  * what [[graft.queries.EmbeddingOps]] falls back to on a session
  * without graft's extensions); it is semantically exact but executes
  * through the HOF machinery — per element it binds two lambda
  * frames and walks an expression tree, and `zip_with` materializes
  * the intermediate struct array. The native expression is one fused
  * multiply-accumulate loop over the two `ArrayData`, so the rewrite
  * turns every similarity-search inner loop in a plan into the fast
  * path without the query author opting in.
  *
  * The rewrite is observationally EXACT, which is what licenses doing
  * it in the optimizer (injected by [[graft.functions.GraftExtensions]]
  * via `injectOptimizerRule`, so it participates in the fixed-point
  * operator-optimization batch after constant folding has reduced
  * `CAST(0 AS BIGINT)` to `Literal(0L)`):
  *
  *  - [[QuantizedDot]] reproduces the composed form's null semantics
  *    bit-for-bit: null array, ragged lengths (zip_with null-padding),
  *    or any null element all yield null.
  *  - Only ARRAY<BIGINT> / ARRAY<DOUBLE> element types match, so the
  *    arithmetic is the same on both paths (the double fold is
  *    sequential left-to-right in both, so results are bit-identical
  *    including NaN/Infinity and signed zero; a `-0.0` zero literal
  *    declines — see [[plusZeroD]]).
  *  - The arithmetic mode carries over: ANSI-mode Multiply/Add
  *    (Spark 4's default) rewrite to `failOnError = true`, where the
  *    native loop raises the same ARITHMETIC_OVERFLOW the built-ins
  *    would — including for products past a null element, which
  *    `zip_with` materializes before the fold goes null. LEGACY
  *    rewrites to the wrapping loop. TRY — overflow becomes null
  *    mid-fold — has no native counterpart and declines.
  *  - The `aggregate` finish lambda must be the identity (the 3-arg
  *    SQL form), the merge a bare `acc + v`, and the zip lambda a bare
  *    `x * y` — commuted operand orders accepted, anything else (extra
  *    arithmetic, reused variables) declines.
  *
  * Matching is by lambda-variable `exprId`, not name, so shadowed or
  * renamed variables can't fool the pattern.
  */
object QuantizedDotRule extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  /** body is `p * q` (either order) over exactly the two lambda vars. */
  private def isBareBinary(l: Expression, r: Expression,
                           x: NamedExpression, y: NamedExpression): Boolean =
    (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))

  /** ANSI and LEGACY both rewrite ([[QuantizedDot]] reproduces each
    * mode's overflow behavior via `failOnError`); TRY — overflow
    * becomes null mid-fold — has no native counterpart and declines. */
  private def modeOf(m: NumericEvalContext, a: NumericEvalContext): Option[Boolean] =
    (m.evalMode, a.evalMode) match {
      case (EvalMode.ANSI, EvalMode.ANSI) => Some(true)
      case (EvalMode.LEGACY, EvalMode.LEGACY) => Some(false)
      case _ => None
    }

  private def longArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** 0.0 as a double literal, minus-zero excluded: the fold's first
    * step is `zero + p0`, and +0.0 + p ≡ p ≡ [[VectorDot]]'s running
    * sum while -0.0 + (-0.0) differs in sign. */
  private def plusZeroD(e: Expression): Boolean = e match {
    case Literal(d: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(ml, mr, mctx), Seq(x, y), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(al, ar, actx), Seq(acc, v), _),
            LambdaFunction(fin, Seq(facc), _))
          if longArray(a) && longArray(b) &&
            modeOf(mctx, actx).isDefined &&
            isBareBinary(ml, mr, x, y) &&
            isBareBinary(al, ar, acc, v) &&
            sameVar(fin, facc) =>
        QuantizedDot(a, b, failOnError = modeOf(mctx, actx).get)

      // DOUBLE twin: IEEE multiply/add behave identically under ANSI
      // and LEGACY (no overflow error), so only TRY is declined —
      // for symmetry with the BIGINT case, not necessity.
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(ml, mr, mctx), Seq(x, y), _)),
            zero,
            LambdaFunction(Add(al, ar, actx), Seq(acc, v), _),
            LambdaFunction(fin, Seq(facc), _))
          if doubleArray(a) && doubleArray(b) && plusZeroD(zero) &&
            modeOf(mctx, actx).isDefined &&
            isBareBinary(ml, mr, x, y) &&
            isBareBinary(al, ar, acc, v) &&
            sameVar(fin, facc) =>
        VectorDot(a, b)
    }
}
