package graft.tools

import org.apache.spark.sql.SparkSession

/** Print row counts of named SparkEntry queries against a SF dir —
  * the output-volume side of the scale tables (SCALE.md): wall time
  * without "how many rows is that" invites misreading linear output
  * growth as a plan problem. Usage:
  *   runMain graft.tools.Count <sfDir> <query> [query...]
  */
object Count {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // recognize the dns scan's KeyGroupedPartitioning (storage-partitioned joins)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(s"COUNT $name rows=$n")
    }
    spark.stop()
  }
}
