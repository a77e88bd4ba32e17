package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The edit metric's reason to exist, pinned on a constructed corpus:
  * token-level Levenshtein counts the number of word-slot operations,
  * so it separates "same template, two slots changed" (ed = 2, kept)
  * from "same template, three slots changed" (ed = 3, dropped) — a
  * hard threshold no set-overlap screen expresses (Jaccard sees 28/32
  * vs 27/33 shared tokens, both far above any sane near-dup cut).
  *
  * The fixture also pins the PassJoin candidate window's boundary
  * case: a partner SHORTER by exactly k = 2 (two deletions inside the
  * first third), where the surviving segments land shifted by −2 —
  * the extreme of the ±k probe window. All tokens are seed-pinned
  * strings; md5 is engine-stable, so the 94-char encoding (and any
  * collision inside it) is deterministic everywhere. */
class TokenEditSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = (0 until 30).map(i => s"tok$i")

  private def text(words: Seq[String]): String = words.mkString(" ")

  private lazy val dir: String = {
    val root = java.nio.file.Files.createTempDirectory("tokenedit-fixture")
    val subst2 = base.updated(3, "sub3").updated(20, "sub20")
    val del2 = base.patch(2, Nil, 1).patch(4, Nil, 1) // drop idx 2 and 5
    val subst3 = base.updated(1, "x1").updated(10, "x10").updated(25, "x25")
    val other = (0 until 30).map(i => s"zzq$i")
    val rows = Seq(
      (1L, text(base), "en", "srcA", text(base).length.toLong),
      (2L, text(subst2), "en", "srcA", text(subst2).length.toLong),
      (3L, text(del2), "en", "srcA", text(del2).length.toLong),
      (4L, text(subst3), "en", "srcA", text(subst3).length.toLong),
      (5L, text(other), "en", "srcB", text(other).length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    root.toString
  }

  test("ed<=2 pairs: substitutions and boundary-shift deletions in, ed=3 out") {
    val rows = TextOps.qTokenEditPairs(spark, dir).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Long]("ed"), r.getAs[Long]("tokens_a"), r.getAs[Long]("tokens_b"))))
      .toMap
    // doc 2 = two word slots substituted -> ed 2
    assert(rows.get((1L, 2L)).contains((2L, 30L, 30L)), s"missing 1-2: $rows")
    // doc 3 = two words deleted from the first third: partner is
    // shorter by exactly k, surviving segments shifted by -2
    assert(rows.get((1L, 3L)).contains((2L, 30L, 28L)), s"missing 1-3: $rows")
    // subst2 vs del2: 2 subs + 2 dels = ed 4 -> absent
    assert(!rows.contains((2L, 3L)), s"2-3 leaked: $rows")
    // three substitutions is past the threshold -> absent
    assert(!rows.contains((1L, 4L)), s"1-4 leaked: $rows")
    // the unrelated doc pairs with nothing
    assert(!rows.keys.exists { case (a, b) => a == 5L || b == 5L }, s"5 leaked: $rows")
    assert(rows.size == 2, s"exactly the two ed<=2 pairs: $rows")
  }
}
