package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException}
import org.apache.spark.sql.catalyst.expressions.{ApplyFunctionExpression, BoundReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.Invoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 `FunctionCatalog` exposing the native functions on the
  * idiomatic Spark 4 catalog surface (r17 verdict item 2):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.functions.GraftFunctionCatalog")
  *   spark.sql("SELECT graft.fn.nfc_normalize(text) FROM docs")
  * }}}
  *
  * [[GraftExtensions]] registers the same functions session-wide by
  * bare name; the catalog form is what a multi-catalog deployment
  * (or a `USE graft.fn` session) resolves, and the two surfaces must
  * be indistinguishable in both plan and result. That is enforced
  * structurally: every catalog function is a [[GraftV2Function]]
  * carrying `toNative`, and [[V2NativeFunctionRule]] (injected by the
  * same extensions) rewrites the analyzer's V2 invocation — either
  * shape — into the SAME native codegen'd expression node the
  * extension registration builds, so the optimized plans are
  * IDENTICAL (asserted in FunctionCatalogSpec, hash-gated by
  * `q_fn_catalog`).
  *
  * Why the magic-method (`invoke`) path is present but not the
  * endgame: a V2 `ScalarFunction` with a magic method resolves to an
  * `Invoke` of the function object — codegen-friendly, but still an
  * opaque virtual call per row, and plan-distinct from the extension
  * twin. The rewrite subsumes it: `Invoke` (magic path, the 1-string-
  * arg functions) and `ApplyFunctionExpression` (no matching magic
  * signature — `quantized_dot`) alike become the native node with its
  * own `doGenCode`. The magic method and `produceResult` remain as
  * correct fallbacks for a session WITHOUT the extensions (both
  * evaluate the identical native expression over bound references —
  * no second implementation to drift).
  */
class GraftFunctionCatalog extends FunctionCatalog {
  import GraftFunctionCatalog._

  private var catalogName: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    Functions.keys.map(n => Identifier.of(Namespace, n)).toArray
  }

  override def loadFunction(ident: Identifier): UnboundFunction = {
    if (!ident.namespace.sameElements(Namespace))
      throw new NoSuchFunctionException(ident)
    Functions.getOrElse(ident.name,
      throw new NoSuchFunctionException(ident))
  }
}

object GraftFunctionCatalog {
  val Namespace: Array[String] = Array("fn")

  /** The catalog surface: the native expressions that take plain
    * (non-literal) arguments. The literal-spec `bpe_*` overloads stay
    * extension-only — a V2 `bind` sees argument TYPES, never the
    * literal value the merge-table fold needs at analysis. */
  val Functions: Map[String, UnboundFunction] = Seq(
    GraftScalarFn("nfc_normalize", Array(StringType), StringType,
      cs => NfcNormalize(cs.head)),
    GraftScalarFn("strip_accents", Array(StringType), StringType,
      cs => StripAccents(cs.head)),
    GraftScalarFn("bpe_encode", Array(StringType), StringType,
      cs => BpeEncode(cs.head, BpeTokenizer.Merges)),
    GraftScalarFn("bpe_encode_bytes", Array(StringType), StringType,
      cs => BpeEncodeBytes(cs.head, ByteBpe.Merges)),
    GraftScalarFn("bpe_decode_bytes", Array(StringType), StringType,
      cs => BpeDecodeBytes(cs.head)),
    GraftScalarFn("bpe_pretokenize", Array(StringType),
      ArrayType(StringType, containsNull = false),
      cs => BpePretokenize(cs.head)),
    GraftScalarFn("unigram_encode", Array(StringType), StringType,
      cs => UnigramEncode(cs.head, UnigramEncode.Pieces)),
    GraftScalarFn("wordpiece_encode", Array(StringType), StringType,
      cs => WordpieceEncode(cs.head, WordpieceEncode.Vocab)),
    GraftScalarFn("quantized_dot",
      Array(ArrayType(LongType), ArrayType(LongType)), LongType,
      // ANSI read at rewrite time — the same moment the extension
      // registration reads it for the bare-name form.
      cs => QuantizedDot(cs.head, cs(1), SQLConf.get.ansiEnabled)),
  ).map(f => f.fnName -> (f: UnboundFunction)).toMap ++
    // the V2 AggregateFunction surface (GraftAggCatalog.scala):
    // top_k / min_k / bitset_agg — the typed Aggregators' catalog form
    GraftAggFns.Functions
}

/** One catalog function: unbound + bound in one object (the arity and
  * types are fixed, so bind only validates). `toNative` is the single
  * source of semantics — the rewrite rule plants it in the plan, and
  * the no-extensions fallbacks (`produceResult`, magic `invoke`)
  * evaluate the very same expression over bound references, so the
  * three call paths cannot diverge. */
final case class GraftScalarFn(fnName: String, argTypes: Array[DataType],
                               out: DataType, toNative: Seq[Expression] => Expression)
  extends UnboundFunction with ScalarFunction[Any] {

  override def name(): String = fnName
  override def description(): String =
    s"graft native function $fnName (catalog form of the extension-registered twin)"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.length != argTypes.length)
      throw new UnsupportedOperationException(
        s"$fnName expects ${argTypes.length} argument(s), got ${inputType.length}")
    this
  }

  override def inputTypes(): Array[DataType] = argTypes
  override def resultType(): DataType = out
  override def isResultNullable: Boolean = true
  override def canonicalName(): String = s"graft.fn.$fnName"

  /** Fallback expression cache, keyed by the session conf fingerprint
    * the native builders read (today: ANSI mode, which decides
    * `quantized_dot`'s ragged-array semantics). A single frozen lazy
    * val would capture whichever conf happened to be active when THIS
    * singleton first evaluated — possibly an executor's defaults — and
    * then serve that choice to every later session for the JVM's
    * lifetime (advice r18). Re-reading per invocation and caching per
    * flag keeps the fallback as cheap as the lazy val on a steady
    * session while honoring a session that flips ANSI. */
  @transient private var cachedFallback: (Boolean, Expression) = _
  private def fallbackExpr: Expression = {
    val ansi = SQLConf.get.ansiEnabled
    var c = cachedFallback
    if (c == null || c._1 != ansi) {
      // toNative reads SQLConf.get itself where relevant — invoked
      // here, under the caller's conf, never frozen at class init.
      c = (ansi, toNative(argTypes.toSeq.zipWithIndex.map {
        case (t, i) => BoundReference(i, t, nullable = true)
      }))
      cachedFallback = c
    }
    c._2
  }

  /** Row-boxed fallback for sessions without [[GraftExtensions]]. */
  override def produceResult(input: InternalRow): Any = fallbackExpr.eval(input)

  /** Magic-method codegen path for the single-string-argument
    * functions (the analyzer looks this up by `inputTypes` classes, so
    * `quantized_dot`'s two-array shape never binds here and resolves
    * as `ApplyFunctionExpression` instead — both shapes are rewritten
    * to the native node anyway). Evaluates the SAME expression as
    * `produceResult` — no second implementation to drift; the `Any`
    * return is cast by `Invoke` to `resultType`, which is how the
    * array-returning `bpe_pretokenize` shares it. */
  def invoke(s: org.apache.spark.unsafe.types.UTF8String): Any =
    fallbackExpr.eval(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s)))
}

/** Optimizer rule (injected by [[GraftExtensions]]): collapse the V2
  * catalog invocation shapes onto the native expression node, making
  * `graft.fn.x(...)` plan-identical to the extension-registered `x(...)`.
  * Matches both resolution shapes — `ApplyFunctionExpression` (no
  * magic method) and `Invoke` of the function object (magic method) —
  * so the rule stays correct whichever path the analyzer picked. */
object V2NativeFunctionRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ApplyFunctionExpression(f: GraftScalarFn, children) =>
        f.toNative(children)
      case inv: Invoke if isGraftInvoke(inv) =>
        invokeTarget(inv).toNative(inv.arguments)
    }

  private def isGraftInvoke(i: Invoke): Boolean =
    i.targetObject.isInstanceOf[Literal] &&
      i.targetObject.asInstanceOf[Literal].value.isInstanceOf[GraftScalarFn]

  private def invokeTarget(i: Invoke): GraftScalarFn =
    i.targetObject.asInstanceOf[Literal].value.asInstanceOf[GraftScalarFn]
}
