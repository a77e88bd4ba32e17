package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native ADC gather vs the composed HOF form it replaces, and the
  * defensive null contracts of the expression itself. */
class PqGatherSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.spark

  private val composed =
    "aggregate(zip_with(lut, code, (l, c) -> element_at(l, CAST(c + 1 AS INT))), " +
      "CAST(0 AS BIGINT), (acc, x) -> acc + x)"

  test("agrees with the composed HOF form on the valid domain (random LUTs/codes)") {
    import s.implicits._
    // range-backed so constant folding can't bypass execution; codes
    // derived from id so every row differs
    val df = s.range(2000).selectExpr(
      "transform(sequence(0, 7), m -> transform(sequence(0, 15), " +
        "  c -> CAST(id * 31 + m * 7 + c * 3 AS BIGINT))) AS lut",
      "transform(sequence(0, 7), m -> CAST((id + m) % 16 AS BIGINT)) AS code")
    val both = df.select(
      GraftFunctions.pqGather($"lut", $"code").as("native"),
      expr(composed).as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() == 0L)
  }

  test("null contracts: null inputs, ragged lengths, null rows/codes/elements") {
    import s.implicits._
    // each case built range-backed so the generated code path runs
    def one(lutSql: String, codeSql: String): Option[Long] = {
      val r = s.range(1).selectExpr(s"$lutSql AS lut", s"$codeSql AS code")
        .select(GraftFunctions.pqGather($"lut", $"code").as("g")).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    val lut8 = "transform(sequence(0, 7), m -> transform(sequence(0, 15), c -> c * 1L))"
    val code8 = "transform(sequence(0, 7), m -> CAST(3 AS BIGINT))"
    assert(one(lut8, code8) == Some(24L)) // 8 × lut[m][3] = 8 × 3
    assert(one("CAST(NULL AS ARRAY<ARRAY<BIGINT>>)", code8).isEmpty)
    assert(one(lut8, "CAST(NULL AS ARRAY<BIGINT>)").isEmpty)
    // ragged: 7 codes for 8 LUT rows
    assert(one(lut8, "transform(sequence(0, 6), m -> CAST(3 AS BIGINT))").isEmpty)
    // null code element
    assert(one(lut8,
      "transform(sequence(0, 7), m -> IF(m = 4, CAST(NULL AS BIGINT), 3L))").isEmpty)
    // null LUT row
    assert(one(
      "transform(sequence(0, 7), m -> IF(m = 2, CAST(NULL AS ARRAY<BIGINT>), " +
        "transform(sequence(0, 15), c -> c * 1L)))", code8).isEmpty)
    // out-of-range code: negative and past-the-end both null (defensive)
    assert(one(lut8, "transform(sequence(0, 7), m -> CAST(-1 AS BIGINT))").isEmpty)
    assert(one(lut8, "transform(sequence(0, 7), m -> CAST(16 AS BIGINT))").isEmpty)
    // null element at the selected position
    assert(one(
      "transform(sequence(0, 7), m -> transform(sequence(0, 15), " +
        "c -> IF(c = 3 AND m = 5, CAST(NULL AS BIGINT), c * 1L)))", code8).isEmpty)
  }

  test("SQL-callable and interpreted eval agrees with codegen") {
    // SQL registry route (constant inputs fold through the interpreted
    // eval) must agree with the range-backed codegen result.
    val viaSql = s.sql(
      "SELECT pq_gather(array(array(10L, 20L), array(30L, 40L)), array(1L, 0L)) AS g")
      .collect()(0).getLong(0)
    assert(viaSql == 50L) // 20 + 30
    val viaCodegen = s.range(1).selectExpr(
      "pq_gather(array(array(id + 10L, 20L), array(30L, 40L)), array(1L, 0L)) AS g")
      .collect()(0).getLong(0)
    assert(viaCodegen == 50L)
  }
}
