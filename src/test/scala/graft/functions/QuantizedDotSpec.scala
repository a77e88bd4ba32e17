package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** The native quantized_dot expression: equivalence with the composed
  * built-in form, null/length edge semantics, SQL + Column routes, and
  * codegen participation. */
class QuantizedDotSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def composed = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")

  test("registered in the session (extensions installed)") {
    assert(GraftFunctions.isRegistered(spark))
  }

  test("SQL route matches hand arithmetic") {
    val r = spark.sql(
      "SELECT quantized_dot(array(1L, 2L, 3L), array(4L, 5L, -6L)) AS d").head()
    assert(r.getLong(0) == 4L + 10L - 18L)
  }

  test("Column route, nulls, ragged lengths, null elements (= composed form)") {
    import spark.implicits._
    // Null semantics must be EXACTLY the composed HOF form's (that is
    // what licenses QuantizedDotRule): null array -> null, ragged
    // lengths -> null (zip_with null-padding), null element -> null.
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),
      (null, Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](5L, 7L, 9L), Seq[java.lang.Long](2L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L))).toDF("a", "b")
    def vals(c: org.apache.spark.sql.Column): Seq[Option[Long]] =
      df.select(c.as("d")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val expected = Seq(Some(11L), None, None, None)
    assert(vals(GraftFunctions.quantizedDot($"a", $"b")) == expected)
    // The genuine (un-rewritten) composed form is compared against the
    // same inputs in QuantizedDotRuleSpec — here `composed` would be
    // rewritten to the native expression by the injected rule.
  }

  test("type mismatch is an analysis error, not a runtime misread") {
    import spark.implicits._
    val df = Seq((Seq("x"), Seq(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.quantizedDot($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"), e.getMessage)
  }

  test("participates in whole-stage codegen (not an interpreted island)") {
    import spark.implicits._
    // range (not a literal Seq) so ConvertToLocalRelation can't fold
    // the expression away before execution
    val df = spark.range(100)
      .select(array($"id", $"id" + 1).as("a"), array($"id" + 2, $"id" + 3).as("b"))
      .select(GraftFunctions.quantizedDot($"a", $"b").as("d"))
    assert(df.collect().head.getLong(0) == 0L * 2L + 1L * 3L)
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' prefix is how toString marks a WholeStageCodegen stage;
    // the expression must sit INSIDE one, not in an interpreted Project
    assert(plan.linesIterator.exists(l =>
      l.contains("quantized_dot") && l.trim.startsWith("*(")), plan)
  }

  test("property: equals the composed HOF form and a BigInt reference") {
    import spark.implicits._
    val genVec = Gen.listOfN(16, Gen.choose(-1000000L, 1000000L))
    val p = Prop.forAll(Gen.listOfN(8, Gen.zip(genVec, genVec))) { rows =>
      val df = rows.map { case (a, b) => (a, b) }.toDF("a", "b")
      val got = df.select(
        GraftFunctions.quantizedDot($"a", $"b").as("native"),
        composed.as("composed")).collect()
      val expected = rows.map { case (a, b) =>
        a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toLong
      }
      got.map(_.getLong(0)).toSeq == expected &&
        got.forall(r => r.getLong(0) == r.getLong(1))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }
}
