package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The leak this operator exists to close, pinned on a constructed
  * corpus: docs 1 and 22 are near-duplicates (two word slots changed
  * in 90), and their id hashes land on OPPOSITE sides of the split
  * die (id 1 → bucket 78 = train, id 22 → bucket 7 = test) — so the
  * naive doc-hash rule trains on doc 1 and evaluates on its twin.
  * The rep rule assigns both by cluster representative (min id = 1)
  * and the pair lands whole in train; doc 3 is an unrelated singleton
  * whose own hash (bucket 19 = val) keeps governing its split —
  * proving rep assignment degrades to the naive rule exactly on
  * singletons. All ids/buckets are md5-pinned, engine-stable. */
class LeakSafeSplitSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val root = java.nio.file.Files.createTempDirectory("leaksplit-fixture")
    val w1 = (0 until 90).map(i => s"s0w$i")
    val w22 = w1.updated(40, "editA").updated(41, "editB")
    val w3 = (0 until 60).map(i => s"z9x$i")
    val rows = Seq(
      (1L, w1.mkString(" "), "en", "srcA", 500L),
      (22L, w22.mkString(" "), "en", "srcA", 500L),
      (3L, w3.mkString(" "), "en", "srcB", 300L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    root.toString
  }

  test("a train/test-straddling near-dup pair: naive leaks, rep rule does not") {
    // Precondition: the pair IS a minhash near-dup on this fixture
    // (else the leak assertions would pass vacuously).
    val pairs = TextOps.nearDupPairs(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 22L)), pairs.mkString(","))
    val row = TextOps.qLeakSafeSplit(spark, dir).collect().head
    val r = row.schema.fieldNames.map(f => f -> row.getAs[Long](f)).toMap
    assert(r("n_docs") == 3L && r("n_clusters") == 2L, r.toString)
    assert(r("n_multidoc_clusters") == 1L, r.toString)
    assert(r("leaky_clusters_naive") == 1L, s"the fixture must leak naively: $r")
    assert(r("leaky_clusters_safe") == 0L, r.toString)
    // rep 1 hashes to train -> both pair docs train; singleton 3 stays val
    assert(r("train_docs") == 2L && r("val_docs") == 1L && r("test_docs") == 0L, r.toString)
  }
}
