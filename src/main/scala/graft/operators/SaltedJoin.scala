package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join sends every row with the same key to one reducer; a
  * hot key therefore turns into one straggler task no matter how many
  * executors exist. Salting splits each hot key into `salts` synthetic
  * sub-keys: the skewed side scatters uniformly across them, the other
  * side is replicated `salts` ways, and the join key becomes
  * (key, salt) — the hot partition shrinks by the salt factor at the
  * cost of replicating the small side.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) solves most of this at runtime by splitting
  * oversized partitions; explicit salting remains the tool when one
  * key alone exceeds an executor, when the join is sort-merge over
  * pre-shuffled data AQE won't re-plan, or when deterministic layout
  * matters. Use AQE first, salt the extremes.
  *
  * The salt is derived by hashing the skewed side's whole row (pmod of
  * xxhash64), not rand(): re-computation under task retry yields the
  * same salt, keeping the join deterministic under failure — required
  * for exactly-once sinks downstream.
  */
object SaltedJoin {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join of `skewed` with `other` on `key`, spreading each
    * key of the skewed side over `salts` sub-keys. */
  def inner(skewed: DataFrame, other: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1: $salts")
    val saltExpr: Column =
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(salts))
    val left = skewed.withColumn(SaltCol, saltExpr)
    val right = other.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    left.join(right,
        left(key) === right(key) && left(SaltCol) === right(SaltCol))
      .drop(right(key)).drop(left(SaltCol)).drop(right(SaltCol))
  }
}
