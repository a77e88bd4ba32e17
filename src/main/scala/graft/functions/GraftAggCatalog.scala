package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.V2Aggregator
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction => V2AggregateFunction, BoundFunction, UnboundFunction}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** V2 `AggregateFunction` surface for the typed Aggregators (r18
  * verdict item 2): [[TopKAgg]] / [[MinKAgg]] / [[BitSetAgg]] exposed
  * through [[GraftFunctionCatalog]] so `SELECT graft.fn.top_k(id,
  * score, 3)` resolves — the catalog form of the `functions.udaf`
  * registration the typed call sites use.
  *
  * Same collapse-to-native discipline as the scalar surface
  * ([[V2NativeFunctionRule]]): the analyzer resolves a catalog
  * aggregate to Catalyst's [[V2Aggregator]] wrapper (a boxed
  * per-row `update` with no map-side story of its own beyond
  * serialize/merge), and [[V2NativeAggRule]] rewrites it — when the
  * size parameter is a literal, which a sane call always is — onto
  * the SAME [[ScalaAggregator]] node the `udaf(new TopKAgg(k))` twin
  * plans, so the two surfaces are plan-identical and keep partial
  * aggregation (map-side combine through TypedImperativeAggregate's
  * serialize/merge — the property that makes the aggregation scale)
  * on the identical code path. Plan- and value-identity asserted in
  * AggCatalogSpec; hash-gated by `q_fn_agg_catalog`.
  *
  * The size argument (k / numBits) is an ordinary trailing INT
  * column because V2 `bind` sees only TYPES — a non-literal size
  * falls back to the [[V2Aggregator]] path, whose `update` reads the
  * size from each row and REQUIRES it constant (loudly), evaluating
  * the very same Aggregator logic — no second implementation to
  * drift. */
object GraftAggFns {

  /** The three catalog aggregates, keyed for [[GraftFunctionCatalog]]. */
  val Functions: Map[String, UnboundFunction] = Map(
    "top_k" -> TopKFn,
    "min_k" -> MinKFn,
    "bitset_agg" -> BitSetFn)

  private[functions] val pairEnc: ExpressionEncoder[(Long, Long)] =
    ExpressionEncoder[(Long, Long)]()
  private[functions] val pairSeqEnc: ExpressionEncoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  private[functions] val longEnc: ExpressionEncoder[Long] =
    ExpressionEncoder[Long]()
  private[functions] val longSeqEnc: ExpressionEncoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  private[functions] val longArrEnc: ExpressionEncoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  val PairArrayType: DataType = ArrayType(StructType(Seq(
    StructField("_1", LongType, nullable = false),
    StructField("_2", LongType, nullable = false))), containsNull = false)
  val LongArrayType: DataType = ArrayType(LongType, containsNull = false)

  /** Marker + the rewrite hook each function implements: build the
    * ScalaAggregator twin for these children, or None when the size
    * argument is not a literal (the V2 fallback then runs). Encoders
    * are resolved HERE because the rewrite fires in the optimizer —
    * after ResolveEncodersInScalaAgg has already run for the analysis
    * phase and will not run again. */
  trait GraftV2AggFn {
    def toScalaAggregator(children: Seq[Expression]): Option[ScalaAggregator[_, _, _]]
    protected def literalInt(e: Expression): Option[Int] =
      if (e.foldable) e.eval(null) match {
        case i: java.lang.Integer => Some(i.intValue)
        case _ => None
      } else None
  }

  /** Serializable V2 aggregation state carrying the size parameter
    * observed from the rows (0 = not yet seen). */
  final case class SizedState[B](size: Int, buf: B)

  /** arg-top-k: `top_k(id BIGINT, score BIGINT, k INT)` →
    * `array<struct<_1 id, _2 score>>`, best-first — the catalog form
    * of [[TopKAgg]]. */
  object TopKFn extends UnboundFunction
    with V2AggregateFunction[SizedState[Seq[(Long, Long)]], Any] with GraftV2AggFn {

    override def name(): String = "top_k"
    override def description(): String =
      "graft top-k (id, score) pairs per group, score DESC / id ASC (catalog form of TopKAgg)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 3)
        throw new UnsupportedOperationException(
          "top_k expects (id BIGINT, score BIGINT, k INT)")
      this
    }
    override def inputTypes(): Array[DataType] = Array(LongType, LongType, IntegerType)
    override def resultType(): DataType = PairArrayType
    override def isResultNullable: Boolean = true
    override def canonicalName(): String = "graft.fn.top_k"

    private def agg(k: Int) = new TopKAgg(k)(pairSeqEnc)

    override def newAggregationState(): SizedState[Seq[(Long, Long)]] =
      SizedState(0, Vector.empty)
    override def update(s: SizedState[Seq[(Long, Long)]],
        row: InternalRow): SizedState[Seq[(Long, Long)]] = {
      val k = row.getInt(2)
      require(k > 0, s"top_k: k must be positive, got $k")
      require(s.size == 0 || s.size == k,
        s"top_k: k must be constant within a group (saw ${s.size} then $k)")
      SizedState(k, agg(k).reduce(s.buf, (row.getLong(0), row.getLong(1))))
    }
    override def merge(a: SizedState[Seq[(Long, Long)]],
        b: SizedState[Seq[(Long, Long)]]): SizedState[Seq[(Long, Long)]] = {
      require(a.size == 0 || b.size == 0 || a.size == b.size,
        s"top_k: k must be constant within a group (saw ${a.size} and ${b.size})")
      val k = math.max(a.size, b.size)
      if (k == 0) a else SizedState(k, agg(k).merge(a.buf, b.buf))
    }
    override def produceResult(s: SizedState[Seq[(Long, Long)]]): Any =
      new GenericArrayData(s.buf.map(p =>
        InternalRow(p._1, p._2): Any).toArray)

    override def toScalaAggregator(children: Seq[Expression]): Option[ScalaAggregator[_, _, _]] =
      literalInt(children(2)).map { k =>
        ScalaAggregator(children.take(2), agg(k),
          pairEnc.resolveAndBind(), pairSeqEnc.resolveAndBind())
      }
  }

  /** k smallest values: `min_k(v BIGINT, k INT)` → `array<bigint>`
    * ascending, duplicates kept — the catalog form of [[MinKAgg]]. */
  object MinKFn extends UnboundFunction
    with V2AggregateFunction[SizedState[Seq[Long]], Any] with GraftV2AggFn {

    override def name(): String = "min_k"
    override def description(): String =
      "graft k smallest values per group, ascending (catalog form of MinKAgg)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 2)
        throw new UnsupportedOperationException("min_k expects (v BIGINT, k INT)")
      this
    }
    override def inputTypes(): Array[DataType] = Array(LongType, IntegerType)
    override def resultType(): DataType = LongArrayType
    override def isResultNullable: Boolean = true
    override def canonicalName(): String = "graft.fn.min_k"

    private def agg(k: Int) = new MinKAgg(k)(longSeqEnc)

    override def newAggregationState(): SizedState[Seq[Long]] =
      SizedState(0, Vector.empty)
    override def update(s: SizedState[Seq[Long]],
        row: InternalRow): SizedState[Seq[Long]] = {
      val k = row.getInt(1)
      require(k > 0, s"min_k: k must be positive, got $k")
      require(s.size == 0 || s.size == k,
        s"min_k: k must be constant within a group (saw ${s.size} then $k)")
      SizedState(k, agg(k).reduce(s.buf, row.getLong(0)))
    }
    override def merge(a: SizedState[Seq[Long]],
        b: SizedState[Seq[Long]]): SizedState[Seq[Long]] = {
      require(a.size == 0 || b.size == 0 || a.size == b.size,
        s"min_k: k must be constant within a group (saw ${a.size} and ${b.size})")
      val k = math.max(a.size, b.size)
      if (k == 0) a else SizedState(k, agg(k).merge(a.buf, b.buf))
    }
    override def produceResult(s: SizedState[Seq[Long]]): Any =
      new GenericArrayData(s.buf.toArray)

    override def toScalaAggregator(children: Seq[Expression]): Option[ScalaAggregator[_, _, _]] =
      literalInt(children(1)).map { k =>
        ScalaAggregator(children.take(1), agg(k),
          longEnc.resolveAndBind(), longSeqEnc.resolveAndBind())
      }
  }

  /** Fixed-width bitset OR-union: `bitset_agg(pos BIGINT, numBits INT)`
    * → `array<bigint>` of numBits/64 words — the catalog form of
    * [[BitSetAgg]] (the mergeable Bloom-filter core). */
  object BitSetFn extends UnboundFunction
    with V2AggregateFunction[SizedState[Array[Long]], Any] with GraftV2AggFn {

    override def name(): String = "bitset_agg"
    override def description(): String =
      "graft fixed-width bitset OR-union over bit positions (catalog form of BitSetAgg)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 2)
        throw new UnsupportedOperationException(
          "bitset_agg expects (pos BIGINT, numBits INT)")
      this
    }
    override def inputTypes(): Array[DataType] = Array(LongType, IntegerType)
    override def resultType(): DataType = LongArrayType
    override def isResultNullable: Boolean = true
    override def canonicalName(): String = "graft.fn.bitset_agg"

    private def agg(n: Int) = new BitSetAgg(n)(longArrEnc)

    override def newAggregationState(): SizedState[Array[Long]] =
      SizedState(0, Array.empty[Long])
    override def update(s: SizedState[Array[Long]],
        row: InternalRow): SizedState[Array[Long]] = {
      val n = row.getInt(1)
      require(s.size == 0 || s.size == n,
        s"bitset_agg: numBits must be constant within a group (saw ${s.size} then $n)")
      val a = agg(n)
      val buf = if (s.size == 0) a.zero else s.buf
      SizedState(n, a.reduce(buf, row.getLong(0)))
    }
    override def merge(a: SizedState[Array[Long]],
        b: SizedState[Array[Long]]): SizedState[Array[Long]] = {
      require(a.size == 0 || b.size == 0 || a.size == b.size,
        s"bitset_agg: numBits must be constant within a group (saw ${a.size} and ${b.size})")
      if (a.size == 0) b
      else if (b.size == 0) a
      else SizedState(a.size, agg(a.size).merge(a.buf, b.buf))
    }
    override def produceResult(s: SizedState[Array[Long]]): Any =
      new GenericArrayData(
        if (s.size == 0) Array.empty[Long] else s.buf)

    override def toScalaAggregator(children: Seq[Expression]): Option[ScalaAggregator[_, _, _]] =
      literalInt(children(1)).map { n =>
        ScalaAggregator(children.take(1), agg(n),
          longEnc.resolveAndBind(), longArrEnc.resolveAndBind())
      }
  }
}

/** Optimizer rule (injected by [[GraftExtensions]], the aggregate
  * sibling of [[V2NativeFunctionRule]]): collapse the analyzer's
  * [[V2Aggregator]] wrapper around a graft catalog aggregate onto the
  * SAME [[ScalaAggregator]] node the `functions.udaf` twin plans —
  * plan identity between the catalog and typed surfaces, partial
  * aggregation preserved (both are TypedImperativeAggregates; modes
  * plan-asserted in AggCatalogSpec). A non-literal size argument
  * leaves the V2 form in place — its per-row update enforces
  * constancy loudly and computes through the identical Aggregator. */
object V2NativeAggRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case v2: V2Aggregator[_, _] => v2.aggrFunc match {
        case fn: GraftAggFns.GraftV2AggFn =>
          fn.toScalaAggregator(v2.children).getOrElse(v2)
        case _ => v2
      }
    }
}
