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
}
