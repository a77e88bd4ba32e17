package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min properties the per-key oracle can't state: the
  * never-undercount guarantee holds for EVERY token (the gate only
  * sees the top-20), and the sketch is linear — cell-wise sum of two
  * half-corpus sketches equals the whole-corpus sketch, which is the
  * fact that makes partial aggregation, streaming accumulation, and
  * cross-day merges legal. */
class CmsSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def toks(where: String = "TRUE") = {
    s.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("cms_docs")
    s.sql(
      s"""SELECT token FROM (
         |  SELECT explode(split(text, '\\\\s+')) AS token FROM cms_docs WHERE $where)
         |WHERE token <> ''""".stripMargin)
  }

  test("never undercounts: estimate >= exact for EVERY token in the vocab") {
    import s.implicits._
    toks().createOrReplaceTempView("cms_all")
    val bad = s.sql(
      """WITH rws AS (SELECT token, j,
        |    CAST(conv(substring(md5(token), j * 8 + 1, 8), 16, 10) AS BIGINT) % 1024 AS bucket
        |  FROM cms_all LATERAL VIEW explode(sequence(0, 3)) t AS j),
        |sketch AS (SELECT j, bucket, count(*) AS cell FROM rws GROUP BY 1, 2),
        |exact AS (SELECT token, count(*) AS true_count FROM cms_all GROUP BY 1),
        |cand AS (SELECT DISTINCT e.token, e.true_count, j.j AS j,
        |    CAST(conv(substring(md5(e.token), j.j * 8 + 1, 8), 16, 10) AS BIGINT) % 1024 AS bucket
        |  FROM exact e LATERAL VIEW explode(sequence(0, 3)) j AS j),
        |est AS (SELECT c.token, c.true_count, min(sk.cell) AS est
        |  FROM cand c JOIN sketch sk ON sk.j = c.j AND sk.bucket = c.bucket
        |  GROUP BY 1, 2)
        |SELECT * FROM est WHERE est < true_count""".stripMargin)
    assert(bad.count() == 0L, "count-min undercounted a token")
  }

  test("linearity: half-corpus sketches sum cell-wise to the whole-corpus sketch") {
    import s.implicits._
    toks("doc_id % 2 = 0").createOrReplaceTempView("cms_even")
    toks("doc_id % 2 = 1").createOrReplaceTempView("cms_odd")
    toks().createOrReplaceTempView("cms_whole")
    def sk(view: String) = s.sql(
      s"""SELECT j, bucket, count(*) AS cell FROM (
         |  SELECT token, j,
         |    CAST(conv(substring(md5(token), j * 8 + 1, 8), 16, 10) AS BIGINT) % 1024 AS bucket
         |  FROM $view LATERAL VIEW explode(sequence(0, 3)) t AS j)
         |GROUP BY 1, 2""".stripMargin)
    val merged = sk("cms_even").union(sk("cms_odd"))
      .groupBy($"j", $"bucket").agg(sum($"cell").as("cell"))
    val whole = sk("cms_whole")
    val diff = merged.join(whole.select($"j", $"bucket", $"cell".as("wcell")),
        Seq("j", "bucket"), "full_outer")
      .filter(coalesce($"cell", lit(0L)) =!= coalesce($"wcell", lit(0L)))
    assert(diff.count() == 0L, "sketch merge is not cell-wise linear")
  }

  test("gate output invariants: overcount >= 0, bound flag matches its arithmetic") {
    import s.implicits._
    val out = PipelineOps.qCmsHeavyHitters(s, dir).collect()
    assert(out.length == 20)
    val nTokens = toks().count()
    out.foreach { r =>
      val over = r.getAs[Long]("overcount")
      assert(over >= 0L, "CMS undercounted a heavy hitter")
      assert(r.getAs[Long]("est_count") - r.getAs[Long]("true_count") == over)
      assert(r.getAs[Boolean]("within_bound") == (over <= 3 * nTokens / 1024))
    }
  }
}
