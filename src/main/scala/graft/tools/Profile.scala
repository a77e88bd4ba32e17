package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: run named SparkEntry queries against a SF
  * dir, print warm timings (min of 3; SPARK_GRAFT_RUNS overrides the
  * repeat count for multi-minute keys) and optionally the executed
  * plan or the result rows. Usage:
  *   runMain graft.tools.Profile <sfDir> [-explain] [-show] <query> [query...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("-explain")
    val show = args.contains("-show")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val names = args.drop(1).filterNot(_.startsWith("-"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup
      spark.catalog.clearCache()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-24s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      if (explain) println(fn(spark, sfDir).queryExecution.executedPlan.toString)
      if (show) fn(spark, sfDir).show(200, truncate = false)
    }
    spark.stop()
  }
}
