package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the budget-selection rule on a constructed corpus where the
  * arithmetic is checkable by hand: selection is LEVEL-granular — a
  * quality level is kept only if the running token total through it
  * fits the 60% budget — so a level that would straddle the budget is
  * dropped whole (srcA: fill lands at 6666 bp, not 10000) while a
  * level landing exactly on the budget is kept in full (srcB: fill
  * 10000). That rule is what makes the result partition-invariant:
  * no per-document tie-splitting that depends on row order. */
class BudgetSelectSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** `nw` words of which `nstop` are stopwords (distinct fillers). */
  private def doc(tag: String, nw: Int, nstop: Int): String =
    (Seq.tabulate(nstop)(i => stops(i % stops.size)) ++
      Seq.tabulate(nw - nstop)(i => s"$tag$i")).mkString(" ")

  private lazy val dir: String = {
    val root = java.nio.file.Files.createTempDirectory("budget-fixture")
    val rows = Seq(
      // srcA: levels 5000bp/40tok, 2500bp/40tok, 0bp/20tok; budget 60
      (1L, doc("a1w", 20, 10), "en", "srcA", 100L),
      (2L, doc("a2w", 20, 10), "en", "srcA", 100L),
      (3L, doc("a3w", 40, 10), "en", "srcA", 200L),
      (4L, doc("a4w", 20, 0), "en", "srcA", 100L),
      // srcB: levels 5000bp/60tok, 0bp/40tok; budget 60 — exact fit
      (5L, doc("b5w", 60, 30), "en", "srcB", 300L),
      (6L, doc("b6w", 40, 0), "en", "srcB", 200L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    root.toString
  }

  test("level-granular cutoff: straddling level dropped whole, exact fit kept whole") {
    val rows = PipelineOps.qBudgetSelect(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("budget"), r.getAs[Long]("q_threshold_bp"),
          r.getAs[Long]("n_docs_kept"), r.getAs[Long]("tokens_kept"),
          r.getAs[Long]("fill_bp"))).toMap
    // srcA: 100 tokens -> budget 60; the 5000bp level (40 tokens, 2
    // docs) fits, adding the 2500bp level (40 more) would overshoot
    assert(rows("srcA") == ((60L, 5000L, 2L, 40L, 6666L)), rows.toString)
    // srcB: 100 tokens -> budget 60; the 5000bp level is exactly 60
    assert(rows("srcB") == ((60L, 5000L, 1L, 60L, 10000L)), rows.toString)
    assert(rows.size == 2)
  }
}
