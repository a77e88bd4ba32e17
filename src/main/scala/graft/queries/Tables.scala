package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

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
    * varied across testdata generations — TIMESTAMP(NANOS), naive
    * timestamp[us] (TIMESTAMP_NTZ), a tz-adjusted µs timestamp, or a
    * raw INT64 carrying ns-since-epoch. An engine aimed at 100 TB of
    * third-party parquet cannot hard-code one physical flavor, so this
    * loader inspects the parquet FOOTER ([[tsFlavor]]) and reads with
    * an explicit per-flavor schema, normalizing every flavor to the
    * same two columns: `ts` (TimestampType, for date_trunc/windows)
    * and `ts_ns` (exact ns-since-epoch long, for orderings that must
    * match the oracle's highest-precision sort).
    *
    * The explicit-schema read is what makes this loader free of
    * observable session effects: a NANOS/INT64 file is read under a
    * declared LongType (no `spark.sql.legacy.parquet.nanosAsLong`
    * mutation on the caller's session), and a naive µs file is read
    * under a declared TimestampType, which takes the RAW µs value as a
    * UTC instant regardless of `spark.sql.session.timeZone` (verified:
    * identical output under a non-UTC session zone — no wall-clock
    * shift against the DuckDB oracle, which also reads naive parquet
    * timestamps as-written). Downstream wall-clock bucketing
    * (date_trunc/window) follows the session zone as in any Spark app;
    * Verify/Bench/tests pin UTC. In the NANOS branch, `div` not `/`:
    * ns-since-epoch ≈ 1.7e18 exceeds double's 2^53 integer range, so
    * float division would corrupt timestamps. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    def sch(ts: DataType) = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", ts),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    tsFlavor(spark, path) match {
      case LongType => // ns-since-epoch, read as raw long
        spark.read.schema(sch(LongType)).parquet(path)
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => // µs flavors (naive or tz-adjusted): raw µs ⇒ UTC instant
        spark.read.schema(sch(TimestampType)).parquet(path)
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }

  /** Physical flavor of a parquet `ts` column, decided from the file
    * FOOTER (first part file of a glob/dir/file path) so loaders can
    * choose an explicit read schema instead of mutating session confs:
    * LongType = ns-since-epoch (TIMESTAMP(NANOS) or a raw INT64 —
    * the two legacy testdata layouts), TimestampNTZType = naive µs/ms,
    * TimestampType = tz-adjusted. The read path only distinguishes
    * LongType vs the rest; the NTZ/LTZ split is kept for contract
    * messages. */
  private[graft] def tsFlavor(spark: SparkSession, pathStr: String): DataType = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val fs = p.getFileSystem(conf)
    val matched = fs.globStatus(p)
    require(matched != null && matched.nonEmpty, s"no parquet at $pathStr")
    val file =
      if (matched.head.isDirectory)
        fs.listStatus(matched.head.getPath)
          .find(_.getPath.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"no part file under ${matched.head.getPath}")).getPath
      else matched.head.getPath
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      val prim = msg.getFields.get(msg.getFieldIndex("ts")).asPrimitiveType()
      prim.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == TimeUnit.NANOS => LongType
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if !t.isAdjustedToUTC => TimestampNTZType
        case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => TimestampType
        case null if prim.getPrimitiveTypeName == PrimitiveTypeName.INT64 => LongType
        case null if prim.getPrimitiveTypeName == PrimitiveTypeName.INT96 =>
          TimestampType // legacy Impala/Spark INT96 µs instant
        case other => throw new IllegalStateException(
          s"events.ts has unsupported physical type $other (${prim.getPrimitiveTypeName}) — extend Tables.events")
      }
    } finally reader.close()
  }

  /** Exact sum of a 2-decimal-place double column, returned as double. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a derived expression with up to 6 decimal places. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Exact average of a 2-decimal double column (decimal sum / count). */
  def davg2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))
}
