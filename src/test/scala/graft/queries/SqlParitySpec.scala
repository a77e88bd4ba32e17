package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface parity: the engine is equally drivable through
  * `spark.sql` — the DataFrame queries and their SQL twins must return
  * identical rows, and SQL-only constructs (IN / EXISTS / scalar
  * subqueries) must plan to the same scale-safe shapes (semi joins,
  * broadcast scalar), never a cartesian. */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def view(name: String): Unit =
    Tables.t(spark, dir, name).createOrReplaceTempView(name)

  private lazy val views: Unit =
    Seq("lineitem", "orders", "customer", "events").foreach(view)

  test("q1 via spark.sql equals the DataFrame plan") {
    views
    // The q1 oracle is plain ANSI — the same text runs on Spark SQL.
    val sql = spark.sql(graft.SparkEntry.oracleSql("q1_pricing_summary"))
    val df = Relational.q1PricingSummary(spark, dir)
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("the CDC merge oracle runs verbatim on Spark SQL and matches the DataFrame plan") {
    views
    // The merge is CTE-heavy ANSI (windows, FULL OUTER JOIN USING,
    // CASE classification) — the exact oracle text must execute on
    // Spark SQL and reproduce the DataFrame result row-for-row,
    // decimal-exact doubles included.
    val sql = spark.sql(graft.SparkEntry.oracleSql("q_cdc_apply"))
    val df = Relational.qCdcApply(spark, dir)
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("survivorship is SQL-drivable: max_by FILTER through spark.sql matches the DataFrame plan") {
    views
    // The golden-record merge's whole surface — per-field max_by with a
    // FILTER clause and a struct tiebreak — must be reachable from SQL
    // text, not just the DataFrame API (the oracle itself is DuckDB
    // dialect, so this is the Spark-SQL twin rather than the verbatim
    // oracle).
    val sql = spark.sql(
      """SELECT user_id, count(1) AS n_events,
        |  max(ts_ns div 1000) AS last_seen_micros,
        |  max_by(k, struct(ts_ns, event_id)) FILTER (WHERE event_type = 'click') AS click_k,
        |  max_by(k, struct(ts_ns, event_id)) FILTER (WHERE event_type = 'view') AS view_k,
        |  max_by(cents, struct(ts_ns, event_id))
        |    FILTER (WHERE event_type = 'purchase' AND cents >= 20000) AS big_purchase_cents
        |FROM (
        |  SELECT user_id, event_type, ts_ns, event_id,
        |    CAST(get_json_object(props, '$.k') AS BIGINT) AS k,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
    val df = Relational.qSurvivorship(spark, dir)
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("IN subquery plans as a semi join, not a cartesian") {
    views
    val q = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_custkey IN (SELECT user_id FROM events)")
    val n = q.collect()(0).getLong(0)
    val expected = Tables.t(spark, dir, "orders")
      .join(Tables.t(spark, dir, "events").select(org.apache.spark.sql.functions.col("user_id")),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("user_id"), "left_semi")
      .count()
    assert(n == expected)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SemiJoin") || plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("EXISTS and scalar subqueries execute without cartesian plans") {
    views
    val q = spark.sql(
      """SELECT count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)""".stripMargin)
    assert(q.collect()(0).getLong(0) > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
