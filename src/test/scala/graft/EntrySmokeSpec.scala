package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the driver's t1 smoke check: entry() at sf0.001 has rows. */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }

  test("every query returns rows at sf0.001 (no vacuous entries)") {
    // threshold/dup-detection ops; legitimately sparse at tiny SF
    val allowEmpty = Set("q_ngram_jaccard", "q_embed_neardup")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(SparkTestSession.spark, "/root/testdata/sf0.001").count()
      if (!allowEmpty(name)) assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("oracleSql covers every query key") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
