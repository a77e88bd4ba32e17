package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The V2 AggregateFunction catalog surface (GraftAggCatalog.scala):
  * catalog resolution, plan-identity with the functions.udaf twins
  * via V2NativeAggRule, partial-agg legality, and the non-literal
  * size fallback (V2Aggregator path, loud on inconsistency). */
class AggCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft",
      classOf[GraftFunctionCatalog].getName)
    s
  }

  private def df = {
    import spark.implicits._
    Seq((1L, 10L, "a"), (2L, 30L, "a"), (3L, 20L, "a"), (4L, 30L, "a"),
      (5L, 5L, "b"), (6L, 7L, "b"))
      .toDF("id", "score", "g")
  }

  /** Plan string with the per-frame noise (expr ids, object identity
    * hashes) normalized away — what's left is the node structure:
    * function node names, children, encoder shapes, flags. */
  private def planShape(frame: org.apache.spark.sql.DataFrame): String =
    frame.queryExecution.optimizedPlan.toString
      .replaceAll("#\\d+", "#").replaceAll("@[0-9a-f]+", "@")

  private def aggFns(frame: org.apache.spark.sql.DataFrame) =
    frame.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect {
          case e: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
            e.aggregateFunction
        })
    }.flatten

  test("top_k resolves via the catalog and is plan- and row-identical to the udaf twin") {
    import spark.implicits._
    val viaCatalog = df.groupBy($"g")
      .agg(expr("graft.fn.top_k(id, score, 3)").as("tops"))
    val top3 = udaf(new TopKAgg(3))
    val viaUdaf = df.groupBy($"g").agg(top3($"id", $"score").as("tops"))
    // plan identity: the V2 wrapper must have collapsed to the SAME
    // ScalaAggregator node the udaf twin plans
    assert(planShape(viaCatalog) == planShape(viaUdaf),
      s"plans differ:\n${planShape(viaCatalog)}\nvs\n${planShape(viaUdaf)}")
    val fns = aggFns(viaCatalog)
    assert(fns.nonEmpty &&
      fns.forall(_.isInstanceOf[org.apache.spark.sql.execution.aggregate.ScalaAggregator[_, _, _]]),
      s"V2Aggregator survived optimization: $fns")
    // rows: score DESC, id ASC tie-break (ids 2 and 4 tie at 30)
    val rows = viaCatalog.orderBy($"g").collect()
      .map(r => (r.getString(0), r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1))).toList)).toList
    assert(rows == List(
      ("a", List((2L, 30L), (4L, 30L), (3L, 20L))),
      ("b", List((6L, 7L), (5L, 5L)))), rows.toString)
  }

  test("partial aggregation survives the rewrite (map-side combine legality)") {
    import spark.implicits._
    val frame = df.groupBy($"g").agg(expr("graft.fn.top_k(id, score, 2)").as("t"))
    frame.collect() // finalize AQE so the audited plan is the real one
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(nodes)
    }
    val modes = nodes(frame.queryExecution.executedPlan).collect {
      case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        h.aggregateExpressions.map(_.mode.toString)
    }.flatten
    assert(modes.exists(_.contains("Partial")) && modes.exists(_.contains("Final")),
      s"expected a partial/final split, got $modes")
  }

  test("min_k and bitset_agg match their typed twins row-for-row") {
    import spark.implicits._
    val viaCatalog = df.groupBy($"g").agg(
      expr("graft.fn.min_k(score, 2)").as("mins"),
      expr("graft.fn.bitset_agg(CAST(id % 64 AS BIGINT), 64)").as("bits"))
    val mink = udaf(new MinKAgg(2))
    val bitset = udaf(new BitSetAgg(64))
    val viaUdaf = df.groupBy($"g").agg(
      mink($"score").as("mins"),
      bitset(expr("CAST(id % 64 AS BIGINT)")).as("bits"))
    assert(planShape(viaCatalog) == planShape(viaUdaf),
      s"plans differ:\n${planShape(viaCatalog)}\nvs\n${planShape(viaUdaf)}")
    val a = viaCatalog.orderBy($"g").collect().toSeq.map(_.toString)
    val b = viaUdaf.orderBy($"g").collect().toSeq.map(_.toString)
    assert(a == b, s"$a vs $b")
    assert(a.head.contains("WrappedArray(10, 20)") || a.head.contains("ArraySeq(10, 20)"),
      a.head) // min-2 of group a's scores
  }

  test("non-literal size: V2 fallback path runs, same rows, loud on inconsistency") {
    import spark.implicits._
    // constant-valued but NOT foldable → the rewrite declines, the
    // V2Aggregator fallback evaluates the same Aggregator logic
    val frame = df.groupBy($"g")
      .agg(expr("graft.fn.min_k(score, CAST(id - id + 2 AS INT))").as("mins"))
    val fns = aggFns(frame)
    assert(fns.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.aggregate.V2Aggregator[_, _]]),
      s"expected the V2 fallback to remain: $fns")
    val rows = frame.orderBy($"g").collect()
      .map(r => r.getSeq[Long](1).toList).toList
    assert(rows == List(List(10L, 20L), List(5L, 7L)), rows.toString)
    // a size that VARIES within a group must fail loudly
    val bad = df.groupBy($"g")
      .agg(expr("graft.fn.min_k(score, CAST(id % 2 + 2 AS INT))").as("mins"))
    val e = intercept[Exception](bad.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("constant within a group")),
      messages(e).mkString("|"))
  }

  test("catalog listing includes the aggregate functions") {
    val cat = new GraftFunctionCatalog
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of()))
    val names = cat.listFunctions(Array("fn")).map(_.name).toSet
    assert(Set("top_k", "min_k", "bitset_agg").subsetOf(names), names.toString)
  }
}
