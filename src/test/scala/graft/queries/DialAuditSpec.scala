package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The sizing-dial audit helpers (`graft.tools.Dial` backends) feed
  * SCALE.md's re-derivation tables; these invariants keep their
  * accounting honest: every corpus vector is counted exactly once at
  * any dial setting, cell/bucket counts respect the dial, and the
  * trained-centroid audit agrees with the untrained one on totals (the
  * two differ only in WHERE vectors land, never in how many there are). */
class DialAuditSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val nVecs =
    Tables.t(spark, dir, "embeddings").count()

  test("bandOccupancyAt: each band table accounts for every vector once") {
    val rows = EmbeddingOps.bandOccupancyAt(spark, dir, bits = 6).collect()
    assert(rows.length === 4) // NumBands tables
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vectors") === nVecs)
      assert(r.getAs[Long]("n_buckets") <= (1L << 6))
      assert(r.getAs[Long]("dropped") >= 0L)
    }
  }

  test("annRecallSummaryAt: recall_bp bounded, degenerate bits rejected") {
    // the Dial recall backend: one summary row, basis points in range
    val r = EmbeddingOps.annRecallSummaryAt(spark, dir,
      bits = 4, cap = EmbeddingOps.BucketCap).collect().head
    assert(r.getAs[Long]("n_queries") > 0L)
    val mean = r.getAs[Long]("mean_recall_bp")
    val min = r.getAs[Long]("min_recall_bp")
    assert(min >= 0L && min <= mean && mean <= 10000L)
    // bits = 0 must fail loudly at the dial, not deep in an expression
    val e = intercept[IllegalArgumentException] {
      EmbeddingOps.annRecallSummaryAt(spark, dir, bits = 0,
        cap = EmbeddingOps.BucketCap).collect()
    }
    assert(e.getMessage.contains("bits-per-band"))
  }

  test("ivfOccupancyAt and ivfOccupancyTrainedAt: totals match the corpus, cells <= nlist") {
    for (df <- Seq(EmbeddingOps.ivfOccupancyAt(spark, dir, nlist = 4),
                   EmbeddingOps.ivfOccupancyTrainedAt(spark, dir, nlist = 4))) {
      val r = df.collect().head
      assert(r.getAs[Long]("n_vectors") === nVecs)
      assert(r.getAs[Long]("n_cells") <= 4L)
      assert(r.getAs[Long]("max_occupancy") >= r.getAs[Long]("n_vectors") / 4)
    }
  }
}
