package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The property the per-doc accounting implies: the stride-48 chunk
  * grid COVERS every word (stride < window, so no gaps), and the
  * overlap tax is exactly the double-covered words. Recomputed from
  * the chunk geometry, independently of qChunkOverlap's frames. */
class ChunkOverlapSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("every word is covered; overlap equals total minus distinct coverage") {
    val rows = PipelineOps.qChunkOverlap(s, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nw = r.getAs[Long]("nw")
      val nChunks = r.getAs[Long]("n_chunks")
      val total = r.getAs[Long]("total_chunk_words")
      val overlap = r.getAs[Long]("overlap_words")
      // geometry recompute: chunk c covers [c*48, min(c*48+64, nw))
      val cmax = (math.max(nw - 64, 0) + 47) / 48
      assert(nChunks == cmax + 1, s"doc ${r.get(0)}: chunk count")
      val covered = Array.fill(nw.toInt)(0)
      (0L to cmax).foreach { c =>
        (c * 48 until math.min(c * 48 + 64, nw)).foreach(i => covered(i.toInt) += 1)
      }
      assert(covered.forall(_ >= 1), s"doc ${r.get(0)}: uncovered word")
      assert(covered.sum == total, s"doc ${r.get(0)}: total words")
      assert(covered.count(_ > 1) <= overlap && overlap == covered.sum - nw,
        s"doc ${r.get(0)}: overlap accounting")
    }
  }
}
