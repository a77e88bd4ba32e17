package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** q_compression_ratio's gate can only carry the BAND (DuckDB cannot
  * deflate); this spec pins the exact JDK-deflate basis points the
  * band claim rests on — every planted doc must land ≥ 200 bp INSIDE
  * its band, so the gated classification has real margin, on the live
  * JDK zlib rather than the python measurement that chose the edges. */
class DeflateRatioSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def deflateBp(d: java.util.zip.Deflater, body: Array[Byte]): Long = {
    d.reset(); d.setInput(body); d.finish()
    val buf = new Array[Byte](body.length + 64)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    10000L * out / body.length
  }

  test("every planted doc deflates >=200bp inside its gated band (sf0.001)") {
    import spark.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(docs.nonEmpty)
    val d = new java.util.zip.Deflater(6)
    val margin = 200L
    docs.foreach { case (id, text) =>
      val k = TextOps.repK(id) // the SAME planted factor the key uses
      val bp = deflateBp(d, (text.take(200) * k).getBytes("UTF-8"))
      k match {
        case 16 => assert(bp < TextOps.DeflateBandLowBp - margin,
          s"doc $id k=16 bp=$bp too close to the low edge")
        case 4 => assert(bp > TextOps.DeflateBandLowBp + margin &&
          bp < TextOps.DeflateBandMidBp - margin,
          s"doc $id k=4 bp=$bp too close to a band edge")
        case _ => assert(bp > TextOps.DeflateBandMidBp + margin,
          s"doc $id k=1 bp=$bp too close to the mid edge")
      }
    }
    d.end()
  }

  test("ratio strictly decreases with repetition on a fixed base") {
    val base = "the quick brown fox jumps over the lazy dog zero one two "
    val d = new java.util.zip.Deflater(6)
    val bps = Seq(1, 4, 16, 64).map(k => deflateBp(d, (base * k).getBytes("UTF-8")))
    d.end()
    assert(bps == bps.sorted.reverse && bps.distinct == bps,
      s"expected strictly decreasing ratios, got $bps")
  }
}
