package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior of the shared connected-components loop: multi-round
  * convergence on long paths, and the reliable checkpoint(dir)
  * durability mode — the cluster swap for localCheckpoint (lost
  * executors invalidate local checkpoint blocks; a reliable dir
  * survives churn) — which must be result-identical. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  /** `blocks` disjoint paths over vertices 0..n-1 (edges v→v+1 with a
    * cut between consecutive blocks), diameter n/blocks − 1. */
  private def pathPairs(n: Int, blocks: Int) = {
    spark.range(n - 1).toDF("a")
      .filter((col("a") + 1) % (n / blocks) =!= 0)
      .select(col("a"), (col("a") + 1).as("b"))
  }

  test("multi-round convergence on long paths; labels are component minima") {
    import spark.implicits._
    val (labels, rounds) = TextOps.connectedComponents(spark, pathPairs(80, 2))
    assert(rounds > 1, s"40-vertex paths must need several rounds, took $rounds")
    val got = labels.select($"v", $"l").as[(Long, Long)].collect().toMap
    assert(got.size == 80)
    (0 until 80).foreach { v =>
      assert(got(v.toLong) == (if (v < 40) 0L else 40L), s"vertex $v")
    }
  }

  test("reliable checkpoint(dir) mode is result-identical to localCheckpoint") {
    import spark.implicits._
    val pairs = pathPairs(60, 3)
    val ckDir = Scratch.fresh("cc_reliable", "spec")
    val (local, r1) = TextOps.connectedComponents(spark, pairs)
    val (reliable, r2) = TextOps.connectedComponents(spark, pairs, Some(ckDir))
    assert(r1 == r2, s"round counts diverged: $r1 vs $r2")
    val a = local.select($"v", $"l").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = reliable.select($"v", $"l").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
