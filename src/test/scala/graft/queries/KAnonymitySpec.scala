package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The property the audit's accounting implies but never states: after
  * local recoding, EVERY released equivalence class — fine-released
  * and kept-coarse alike — has size ≥ k. Recomputed independently
  * from the raw tables, not via qKAnonymity's own frames. */
class KAnonymitySpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("released rows are k-anonymous under their released QI; all branches bite") {
    s.read.parquet(s"$dir/customer.parquet").createOrReplaceTempView("ka_cust")
    s.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("ka_nat")
    // Released QI per row: (nation, seg) if its fine class holds k,
    // else (region, seg) if the generalized class holds k, else the
    // row is suppressed. Classes are per released-QI VALUE (fine and
    // coarse QIs are distinguishable), the local-recoding rule.
    val bad = s.sql(
      """WITH fine AS (SELECT c_nationkey, c_mktsegment, count(*) AS fsz
        |  FROM ka_cust GROUP BY 1, 2),
        |r AS (SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment, n.n_regionkey, f.fsz
        |  FROM ka_cust c
        |  JOIN fine f ON f.c_nationkey = c.c_nationkey AND f.c_mktsegment = c.c_mktsegment
        |  JOIN ka_nat n ON n.n_nationkey = c.c_nationkey),
        |coarse AS (SELECT n_regionkey, c_mktsegment, count(*) AS csz
        |  FROM r WHERE fsz < 8 GROUP BY 1, 2),
        |released AS (
        |  SELECT concat('N', c_nationkey, '|', c_mktsegment) AS qi FROM r WHERE fsz >= 8
        |  UNION ALL
        |  SELECT concat('R', r.n_regionkey, '|', r.c_mktsegment) AS qi
        |  FROM r JOIN coarse co
        |    ON co.n_regionkey = r.n_regionkey AND co.c_mktsegment = r.c_mktsegment
        |  WHERE r.fsz < 8 AND co.csz >= 8)
        |SELECT qi, count(*) AS sz FROM released GROUP BY qi HAVING count(*) < 8
        |""".stripMargin)
    assert(bad.count() == 0L, "a released equivalence class is below k")

    val out = Relational.qKAnonymity(s, dir).collect()
    assert(out.nonEmpty)
    // the demo must exercise all three outcomes at this SF
    assert(out.map(_.getAs[Long]("n_fine_violations")).sum > 0)
    assert(out.map(_.getAs[Long]("n_generalized")).sum > 0)
    assert(out.map(_.getAs[Long]("n_suppressed")).sum > 0)
    out.foreach { row =>
      assert(row.getAs[Long]("n_released") ==
        row.getAs[Long]("n_rows") - row.getAs[Long]("n_suppressed"))
      assert(row.getAs[Long]("n_suppressed") <= row.getAs[Long]("n_generalized"))
    }
  }

  test("the certificate and the audit agree on the released population") {
    // q_k_anonymity counts released rows by subtraction; q_l_diversity
    // re-derives the released set constructively and rolls it up per
    // class. The two paths must name the same population, and the
    // certificate's min class size must prove k on its own.
    val ka = Relational.qKAnonymity(s, dir).collect()
      .map(r => r.getAs[String]("mktsegment") -> r.getAs[Long]("n_released")).toMap
    val ld = Relational.qLDiversity(s, dir).collect()
    ld.foreach { r =>
      val seg = r.getAs[String]("mktsegment")
      assert(r.getAs[Long]("n_released_rows") == ka(seg),
        s"$seg: certificate released ${r.getAs[Long]("n_released_rows")} vs audit ${ka(seg)}")
      assert(r.getAs[Long]("min_class_size") >= 8L)
      assert(r.getAs[Long]("min_l_diversity") >= 1L)
    }
    // segments absent from the certificate released nothing
    val missing = ka.keySet -- ld.map(_.getAs[String]("mktsegment")).toSet
    missing.foreach(seg => assert(ka(seg) == 0L, s"$seg absent but audit says ${ka(seg)} released"))
  }
}
