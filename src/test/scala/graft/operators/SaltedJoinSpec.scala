package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("salted join returns exactly the plain join's result on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = spark.range(10000).select(
      when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L)).as("k"),
      ($"id" * 3).as("v"))
    val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("name"))

    val plain = fact.join(dim, "k").select($"k", $"v", $"name")
    val salted = SaltedJoin.inner(fact, dim, "k", salts = 8).select($"k", $"v", $"name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("join key spreads across salt sub-keys (no single hot partition)") {
    import spark.implicits._
    val fact = spark.range(1000).select(lit(1L).as("k"), $"id".as("v"))
    // all keys identical: without salting one reducer would see 1000 rows
    val salts = 8
    val spread = fact
      .withColumn("salt", pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy($"salt").count().collect()
    assert(spread.length > salts / 2, spread.mkString(","))
    assert(spread.map(_.getLong(1)).max < 1000, "salting failed to split the hot key")
  }

  test("salt is deterministic under re-computation (retry-safe)") {
    import spark.implicits._
    val fact = spark.range(100).select($"id".as("k"), $"id".as("v"))
    val saltOf = (df: org.apache.spark.sql.DataFrame) => df
      .withColumn("salt", pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(4)))
      .orderBy($"k").collect().map(_.getLong(2)).toSeq
    assert(saltOf(fact) == saltOf(fact))
  }
}
