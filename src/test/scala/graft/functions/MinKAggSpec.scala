package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The min-k Aggregator must behave identically no matter how Spark
  * splits and orders the input across partitions — the property that
  * makes map-side partial aggregation legal. */
class MinKAggSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def agg(k: Int) = {
    import spark.implicits._
    new MinKAgg(k)
  }

  test("property: any partitioning + ordering reduces/merges to sorted take-k") {
    val genInput = Gen.listOf(Gen.choose(-1000L, 1000L))
    check(Prop.forAll(genInput, Gen.choose(1, 8), Gen.long) { (xs, k, seed) =>
      val a = agg(k)
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      // split into random partitions, reduce each, merge in shuffled order
      val parts = if (shuffled.isEmpty) Seq(Seq.empty[Long])
        else shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
      val merged = parts.map(_.foldLeft(a.zero)(a.reduce)).foldLeft(a.zero)(a.merge)
      a.finish(merged) == xs.sorted.take(k)
    })
  }

  test("udaf end-to-end: grouped min-k equals the naive computation") {
    import spark.implicits._
    val df = spark.range(1000).select(
      ($"id" % 7).as("g"),
      // a value sequence that is NOT monotone in id
      (($"id" * 37) % 101).as("v"))
    val mink = org.apache.spark.sql.functions.udaf(agg(3))
    val got = df.groupBy($"g").agg(mink($"v").as("mins"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.take(3).toSeq }
    assert(got == expected)
  }
}
