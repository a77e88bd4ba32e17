package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Table loading + cross-engine-deterministic aggregation helpers.
  *
  * The driver compares every query result against DuckDB running the
  * `oracleSql` on the same parquet files, hashing values. Floating-point
  * sums are association-order dependent, so every SUM/AVG over a double
  * column goes through an exact decimal accumulator and is cast back to
  * double at the end — bit-identical regardless of partitioning.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a nanos-since-epoch long, then expose
    * both `ts` (µs timestamp, for date_trunc etc.) and `ts_ns` (exact
    * long, for orderings that must match DuckDB's ns-precision sort).
    * `div` not `/`: ns-since-epoch ≈ 1.7e18 exceeds double's 2^53
    * integer range, so float division would corrupt timestamps. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Verify/Bench/tests set this at session build; the guarded set here
    // only covers driver-owned sessions that call a query directly.
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_ns", col("ts").cast("long"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Exact sum of a 2-decimal-place double column, returned as double. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a derived expression with up to 6 decimal places. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Exact average of a 2-decimal double column (decimal sum / count). */
  def davg2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))
}
