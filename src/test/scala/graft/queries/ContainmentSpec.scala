package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The containment screen's reason to exist, pinned on a constructed
  * corpus: a short document embedded VERBATIM in a long one (length
  * ratio past 2×) has containment 1.0 but Jaccard < 0.5 — the Jaccard
  * screen structurally misses it, the containment screen keeps it.
  * The gate corpus can't show this (its injected near-dups are
  * truncations within the 2× ratio, so both screens find the same 25
  * pairs — q_containment's cont/jaccard columns pin that coincidence);
  * this spec is the divergence case.
  *
  * The fixture is seed-pinned: doc 2 is the first 30 words of doc 1's
  * 90, and with this word alphabet the subset pair lands in a shared
  * minhash band (both band-2 chunk minima fall in the prefix) — so
  * candidate generation, not just verification, is exercised. md5 is
  * engine-stable, so the collision is deterministic everywhere. */
class ContainmentSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val root = java.nio.file.Files.createTempDirectory("containment-fixture")
    val w1 = (0 until 90).map(i => s"s0w$i")
    val rows = Seq(
      (1L, w1.mkString(" "), "en", "srcA", w1.mkString(" ").length.toLong),
      (2L, w1.take(30).mkString(" "), "en", "srcA", w1.take(30).mkString(" ").length.toLong),
      // an unrelated doc that must pair with neither
      (3L, (0 until 40).map(i => s"z9x$i").mkString(" "), "en", "srcB", 300L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    root.toString
  }

  test("a 3x-length verbatim subset: containment finds it, the Jaccard screen cannot") {
    val cont = TextOps.qContainment(spark, dir).collect()
    assert(cont.length == 1, cont.mkString("\n"))
    val r = cont.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("n_a") == 88L && r.getAs[Long]("n_b") == 28L)
    assert(r.getAs[Long]("inter") == 28L)
    assert(r.getAs[Long]("cont_bp") == 10000L, s"cont_bp=${r.getAs[Long]("cont_bp")}")
    // jaccard = 28 / 88 — under the 0.5 keep by a wide margin
    assert(r.getAs[Long]("jaccard_bp") == 3181L, s"jaccard_bp=${r.getAs[Long]("jaccard_bp")}")
    val jac = TextOps.qMinhashPairs(spark, dir).collect()
    assert(jac.isEmpty, s"the Jaccard screen should miss the subset pair: ${jac.mkString("\n")}")
  }
}
