package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The arg-top-k Aggregator must behave identically no matter how
  * Spark splits and orders the input across partitions — the property
  * that makes map-side partial aggregation legal — and must rank
  * exactly like the window form it replaces (score DESC, id ASC). */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def agg(k: Int) = {
    import spark.implicits._
    new TopKAgg(k)
  }

  private def truth(xs: List[(Long, Long)], k: Int): Seq[(Long, Long)] =
    xs.sortBy(t => (-t._2, t._1)).take(k)

  test("property: any partitioning + ordering reduces/merges to the window ranking") {
    val genPair = for {
      id <- Gen.choose(0L, 500L)
      score <- Gen.choose(-100L, 100L)
    } yield (id, score)
    check(Prop.forAll(Gen.listOf(genPair), Gen.choose(1, 6), Gen.long) { (xs, k, seed) =>
      val a = agg(k)
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val parts = if (shuffled.isEmpty) Seq(Seq.empty[(Long, Long)])
        else shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
      val merged = parts.map(_.foldLeft(a.zero)(a.reduce)).foldLeft(a.zero)(a.merge)
      a.finish(merged) == truth(xs, k)
    })
  }

  test("property: every intermediate buffer is sorted best-first with size <= k " +
      "(the invariant reduce's b.last skip depends on)") {
    val genPair = for {
      id <- Gen.choose(0L, 500L)
      score <- Gen.choose(-100L, 100L)
    } yield (id, score)
    def sortedBestFirst(b: Seq[(Long, Long)]): Boolean =
      b.sliding(2).forall {
        case Seq((i1, s1), (i2, s2)) => s1 > s2 || (s1 == s2 && i1 <= i2)
        case _ => true
      }
    check(Prop.forAll(Gen.listOf(genPair), Gen.choose(1, 6)) { (xs, k) =>
      val a = agg(k)
      val afterReduces = xs.scanLeft(a.zero)(a.reduce)
      val merged = a.merge(afterReduces.last, xs.reverse.foldLeft(a.zero)(a.reduce))
      (afterReduces :+ merged).forall(b => b.size <= k && sortedBestFirst(b))
    })
  }

  test("udaf end-to-end: grouped arg-top-k equals the naive computation") {
    import spark.implicits._
    val df = spark.range(1000).select(
      ($"id" % 7).as("g"), $"id".as("pid"),
      (($"id" * 37) % 101).as("v"))
    val top = org.apache.spark.sql.functions.udaf(agg(3))
    val got = df.groupBy($"g").agg(top($"pid", $"v").as("tops"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getLong(0), t.getLong(1)))).toMap
    val expected = df.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (g, vs) => g -> truth(vs.map(_._2).toList, 3) }
    assert(got == expected)
  }
}
