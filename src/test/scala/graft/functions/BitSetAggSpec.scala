package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The bitset Aggregator is the correctness core of the Bloom gate:
  * no false negatives (every inserted position reads back set), and
  * partition/order-independence (merge = OR), which is what makes both
  * map-side partial aggregation and incremental day-over-day OR-merge
  * legal. */
class BitSetAggSpec extends AnyFunSuite {
  private val Bits = 1 << 10

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def agg = {
    import graft.SparkTestSession.spark.implicits._
    new BitSetAgg(Bits)
  }

  private def isSet(bits: Array[Long], pos: Long): Boolean =
    (bits((pos >> 6).toInt) & (1L << (pos & 63))) != 0

  test("property: any partitioning/order sets exactly the inserted bits") {
    val genInput = Gen.listOf(Gen.choose(0L, Bits - 1L))
    check(Prop.forAll(genInput, Gen.long) { (xs, seed) =>
      val a = agg
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val parts = if (shuffled.isEmpty) Seq(Seq.empty[Long])
        else shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
      val merged = parts.map(_.foldLeft(a.zero)(a.reduce)).foldLeft(a.zero)(a.merge)
      val out = a.finish(merged)
      // no false negatives, no stray bits
      xs.forall(isSet(out, _)) &&
        (0L until Bits).forall(p => isSet(out, p) == xs.contains(p))
    })
  }

  test("merge is idempotent: re-ORing the same filter changes nothing") {
    val a = agg
    val built = Seq(1L, 63L, 64L, 900L).foldLeft(a.zero)(a.reduce)
    val twice = a.merge(built.clone(), built)
    assert(twice.toSeq == built.toSeq)
  }

  test("out-of-range position fails fast (false-negative guard)") {
    val a = agg
    intercept[IllegalArgumentException](a.reduce(a.zero, Bits.toLong))
    intercept[IllegalArgumentException](a.reduce(a.zero, -1L))
  }
}
