package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

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

  /** events.ts is a LOGICAL timestamp whose PHYSICAL parquet type has
    * varied across testdata generations — TIMESTAMP(NANOS) (surfaces as
    * a nanos-since-epoch long under `nanosAsLong`), naive timestamp[us]
    * (surfaces as TIMESTAMP_NTZ in Spark 4), or a tz-adjusted µs
    * timestamp. An engine aimed at 100 TB of third-party parquet cannot
    * hard-code one physical flavor, so this loader branches on the
    * OBSERVED type and normalizes every flavor to the same two columns:
    * `ts` (TimestampType, for date_trunc/windows) and `ts_ns` (exact
    * ns-since-epoch long, for orderings that must match the oracle's
    * highest-precision sort). Naive wall-clock values are interpreted
    * as UTC — Verify/Bench/tests all pin spark.sql.session.timeZone to
    * UTC, which is also what DuckDB does with naive parquet timestamps.
    * In the NANOS branch, `div` not `/`: ns-since-epoch ≈ 1.7e18
    * exceeds double's 2^53 integer range, so float division would
    * corrupt timestamps. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Lets a TIMESTAMP(NANOS)-generation file load at all (read as
    // long); a no-op for µs files. Guarded so driver-owned sessions
    // that call a query directly also get it.
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw ns-since-epoch
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // naive µs wall-clock ⇒ UTC instant
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType => // already a µs instant
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other — extend Tables.events")
    }
  }

  /** Exact sum of a 2-decimal-place double column, returned as double. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a derived expression with up to 6 decimal places. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Exact average of a 2-decimal double column (decimal sum / count). */
  def davg2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))
}
