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

    // -jobs: per-run Spark job/stage/task counts (bisects fixed
    // scheduler overhead from data cost in iterative keys)
    val countJobs = args.contains("-jobs")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    if (countJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
        }
      })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup
      spark.catalog.clearCache()
      if (countJobs) { Thread.sleep(500); jobs.set(0); stages.set(0); tasks.set(0) }
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val jc = if (countJobs) {
        Thread.sleep(500)
        f" perRun: jobs=${jobs.get / runs} stages=${stages.get / runs} tasks=${tasks.get / runs}"
      } else ""
      println(f"PROFILE $name%-24s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}$jc")
      if (explain) println(fn(spark, sfDir).queryExecution.executedPlan.toString)
      if (show) fn(spark, sfDir).show(200, truncate = false)
    }
    spark.stop()
  }
}
