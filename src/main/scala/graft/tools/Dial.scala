package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure the LSH/IVF sizing dials at an arbitrary corpus scale: runs
  * [[graft.queries.EmbeddingOps.bandOccupancyAt]] /
  * [[graft.queries.EmbeddingOps.ivfOccupancyAt]] for each requested
  * setting and prints the audit rows, so "re-derive bits ∝ log₂ n,
  * nlist ∝ √n (or n/cap)" are measured numbers, not prose (SCALE.md
  * 100× stress). Usage:
  *   runMain graft.tools.Dial <sfDir> band <bits> [bits...]
  *   runMain graft.tools.Dial <sfDir> ivf <nlist> [nlist...]
  *   runMain graft.tools.Dial <sfDir> ivft <nlist> [nlist...]   (trained centroids)
  */
object Dial {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val vals = args.drop(2).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    vals.foreach { v =>
      val df = mode match {
        case "band" => graft.queries.EmbeddingOps.bandOccupancyAt(spark, sfDir, v)
        case "ivf"  => graft.queries.EmbeddingOps.ivfOccupancyAt(spark, sfDir, v)
        case "ivft" => graft.queries.EmbeddingOps.ivfOccupancyTrainedAt(spark, sfDir, v)
        case other  => throw new IllegalArgumentException(s"mode $other: band|ivf")
      }
      df.collect().foreach(r => println(s"DIAL $mode=$v $r"))
    }
    spark.stop()
  }
}
