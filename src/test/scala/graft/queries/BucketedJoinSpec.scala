package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = co-located joins: when both sides are bucketed by the
  * join key into the same bucket count, the join reads matching buckets
  * directly — no exchange on either side. At 100 TB this is THE tool
  * for repeated fact-to-fact joins (pay the shuffle once at write time,
  * never again at read time). */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed-by-orderkey join plans with zero shuffle exchanges") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.t(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderdate")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey").count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // co-location: the join itself introduces no shuffle on either side
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)

    // and the result matches the unbucketed join
    val expected = Tables.t(spark, dir, "lineitem")
      .join(Tables.t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey").count()
    assert(joined.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(joined).count() == 0)

    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }

  test("q_bucketed_join gate key: join side is exchange-free and matches the raw rollup") {
    import spark.implicits._
    // force the sort-merge path: with broadcast allowed, tiny SF tables
    // plan BHJ and the auto-bucketed-scan logic may skip the bucketed
    // read entirely (the gate query is correct either way; this test
    // pins the layout's scale shape)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val (rows, plan) =
      try {
        val d = Storage.qBucketedJoin(spark, dir)
        val r = d.collect()
        (r, d.queryExecution.executedPlan.toString)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
      }
    // the staged bucketed layout serves the join: bucket-pruned scans,
    // no exchange keyed on either join key (the rollup's status
    // exchange is the only one left)
    assert(plan.contains("SelectedBucketsCount"), plan)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    // layout is result-invisible: identical to the raw-table rollup
    val expected = Tables.t(spark, dir, "lineitem")
      .join(Tables.t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_items"),
        org.apache.spark.sql.functions.sum($"l_quantity".cast("long")).as("sum_qty"))
      .orderBy($"o_orderstatus").collect()
    assert(rows.toSeq == expected.toSeq)
  }
}
