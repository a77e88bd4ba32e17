package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** AQE is the FIRST line of skew defense (SaltedJoin is the explicit
  * second, for keys beyond a single executor — SCALE.md "Skew"). This
  * spec proves the first line actually fires: a join with one hot key
  * must come out of adaptive execution with its skewed partition SPLIT
  * (isSkewJoin on the sort-merge join), not as one straggler task.
  * Thresholds are lowered to make a test-sized hot key cross the same
  * code path a 100 GB hot partition crosses in production.
  *
  * Version-pin note: these assertions reach into Spark INTERNALS
  * (AdaptiveSparkPlanExec, QueryStageExec, SortMergeJoinExec.isSkewJoin)
  * and hand-tuned byte thresholds, all validated against Spark 4.1.x.
  * If this spec breaks after a Spark upgrade or an executor-memory
  * change, triage as TEST BRITTLENESS (internal API / threshold drift)
  * before suspecting a planner regression. */
class AqeSkewSpec extends AnyFunSuite {

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    (p +: kids.flatMap(collectNodes)) ++ p.subqueries.flatMap(collectNodes)
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // Own session: skew thresholds shrunk to test scale, broadcast off
    // so the join stays sort-merge (the skew-split target).
    val s = graft.SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // coalescing can merge away the contrast; keep partitions as-is
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import s.implicits._

    // fact: 200k rows on ONE key (with a fat payload so bytes, not just
    // rows, are skewed), 99 keys with 100 rows each
    val hot = s.range(200000).select(lit(0L).as("k"),
      concat(lit("x" * 64), $"id".cast("string")).as("payload"))
    val rest = s.range(9900).select((($"id" % 99) + 1).as("k"),
      $"id".cast("string").as("payload"))
    val fact = hot.unionByName(rest)
    val dim = s.range(100).select($"id".as("k"), ($"id" * 7).as("w"))

    // Aggregate GLOBALLY, not by the join key: a groupBy(k) above the
    // join would require the join's hash partitioning, and AQE refuses
    // to split a skewed partition whose output partitioning a parent
    // depends on (splitting would break the required distribution) —
    // the same reason production skew splits appear on join→write or
    // join→re-key stages, not join→same-key-agg. max(payload) keeps
    // the fat column alive through the join so the bytes are skewed.
    val joined = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), max(length($"payload")).as("w"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val smjs = collectNodes(plan).collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
    assert(smjs.exists(_.isSkewJoin),
      s"AQE did not mark the skewed join for splitting:\n$plan")
  }
}
