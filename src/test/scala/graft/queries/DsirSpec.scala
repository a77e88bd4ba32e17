package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The behavior the q_dsir_weights gate CANNOT show: the synthetic
  * corpus draws every language from one shared vocabulary, so the
  * gated weights collapse to ≈10000 (DSIR's correct null answer —
  * pinned here too). On a corpus with a genuinely SHIFTED domain the
  * same body must separate: target-vocabulary documents weigh far
  * above 10000, off-domain documents far below. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("shifted-domain corpus: target-domain docs weigh high, off-domain low") {
    import spark.implicits._
    // domain A (the target) speaks alpha/beta/gamma; domain B speaks
    // delta/epsilon/zeta; 'shared' appears everywhere.
    val docs = Seq(
      (1L, "A", "alpha beta gamma alpha shared beta"),
      (2L, "A", "beta alpha alpha gamma shared gamma"),
      (3L, "A", "gamma gamma alpha beta shared alpha"),
      (4L, "B", "delta epsilon zeta delta shared epsilon"),
      (5L, "B", "epsilon delta zeta zeta shared delta"),
      (6L, "B", "zeta epsilon delta epsilon shared zeta")
    ).toDF("doc_id", "lang", "text")
    val wA = TextOps.dsirWeightsOf(spark, docs, $"lang" === "A")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // target docs: their words are ~2x as frequent in-domain as in the
    // raw corpus => weight well above 10000; off-domain well below
    assert(Seq(1L, 2L, 3L).forall(wA(_) > 13000L), wA)
    assert(Seq(4L, 5L, 6L).forall(wA(_) < 7000L), wA)
  }

  test("the gated corpus is the null case: weights concentrate at 10000") {
    val rows = TextOps.qDsirWeights(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getLong(3)
      assert(w > 9000L && w < 11000L,
        s"doc ${r.getLong(0)}: weight $w outside the shared-vocabulary null band")
    }
  }
}
