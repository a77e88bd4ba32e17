package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE merge-LEARNING semantics (q_bpe_learn) on the hazard
  * vocabularies the natural corpus never makes the argmax — hand-traced
  * against reference BPE (Sennrich et al. 2016: count adjacent pairs
  * weighted by word freq, merge the best pair greedy-leftmost, repeat).
  * The run cases matter because greedy application on `z z z z` merges
  * positions 1 and 3 only (floor(run/2) merges), and overlapping pair
  * COUNTING still counts all 3 adjacent positions — two different
  * numbers a wrong implementation conflates. */
class BpeLearnSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def learn(vocab: Seq[(String, Long)], k: Int): Seq[(Long, String, String, String, Long, Long)] = {
    import spark.implicits._
    TextOps.learnBpeMerges(spark, vocab.toDF("w", "freq"), k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
  }

  test("run hazards: overlapping pairs count fully, greedy apply merges floor(run/2)") {
    // 'zzzz'×3: (z,z) at 3 positions ×3 = 9; 'zzz'×2: ×2 = 4; total 13.
    // Apply: zzzz -> [zz,zz] (positions 1,3), zzz -> [zz,z]; ab untouched.
    // Rank 2: (a,b)=5 beats (zz,zz)=3 and (zz,z)=2.
    // Rank 3: (zz,zz)=3 -> zzzz — a merged symbol on BOTH sides.
    val got = learn(Seq(("zzzz", 3L), ("zzz", 2L), ("ab", 5L)), 3)
    assert(got == Seq(
      (1L, "z", "z", "zz", 13L, 20L),
      (2L, "a", "b", "ab", 5L, 15L),
      (3L, "zz", "zz", "zzzz", 3L, 12L)))
  }

  test("odd run of five: two merges, one survivor symbol") {
    // zzzzz: (z,z) counted at 4 positions; greedy -> [zz,zz,z].
    val got = learn(Seq(("zzzzz", 1L)), 1)
    assert(got == Seq((1L, "z", "z", "zz", 4L, 3L)))
  }

  test("count ties break to the lexicographically smallest pair") {
    val got = learn(Seq(("ba", 2L), ("bc", 2L)), 1)
    assert(got == Seq((1L, "b", "a", "ba", 2L, 6L)))
  }

  test("a merged symbol never re-matches as the left side in its own round") {
    // 'abb'×4: pairs (a,b)=4, (b,b)=4 -> tie, (a,b) wins lexicographically.
    // Greedy: abb -> [ab, b] — the merged 'ab' must NOT then consume the
    // trailing 'b' in the same round (that would need pair (ab, b)).
    val got = learn(Seq(("abb", 4L)), 2)
    assert(got(0) == (1L, "a", "b", "ab", 4L, 8L))
    // Round 2's best pair is exactly (ab, b), proving round 1 left it.
    assert(got(1) == (2L, "ab", "b", "abb", 4L, 4L))
  }
}
