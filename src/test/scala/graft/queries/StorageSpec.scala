package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Storage-layout behaviors that are file-level rather than
  * result-level — file counts and merged schemas — which the DuckDB
  * oracle (value-only) cannot see. */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(path))
  }

  test("compaction: coalesce-rewrite collapses a fragmented table without changing it") {
    // The small-file problem: a 64-task write of a small table leaves
    // 64 fragment files whose per-file open/footer cost dominates reads
    // at scale (100 TB pipelines compact landing zones continuously).
    // Compaction = read + coalesce + rewrite: file count drops to the
    // target, bytes stay identical. coalesce (not repartition) because
    // compaction must not shuffle — it only narrows partitions.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_compact_test"
    val src = Tables.t(spark, dir, "orders")
    src.repartition(64).write.mode("overwrite").parquet(s"$base/fragmented")
    val frag = spark.read.parquet(s"$base/fragmented")
    assert(parquetFiles(s"$base/fragmented").size >= 32) // 64 minus empty splits
    frag.coalesce(4).write.mode("overwrite").parquet(s"$base/compacted")
    assert(parquetFiles(s"$base/compacted").size <= 4)
    val compacted = spark.read.parquet(s"$base/compacted")
    assert(compacted.count() == src.count())
    assert(compacted.exceptAll(src).isEmpty && src.exceptAll(compacted).isEmpty)
  }

  test("schema evolution: merged read surfaces the new column, old rows NULL") {
    val df = Storage.qSchemaEvolution(spark, dir)
    // the reconciliation must see BOTH generations and real backfill debt
    val row = df.agg(sum("n"), sum("n_with_priority"), sum("n_backfill_debt")).head()
    assert(row.getLong(0) == Tables.t(spark, dir, "orders").count())
    assert(row.getLong(1) > 0, "generation 2 rows missing")
    assert(row.getLong(2) > 0, "generation 1 rows missing (no backfill debt)")
  }

  test("partitioned layout writes exactly one directory per partition value") {
    Storage.qPartitionedPrune(spark, dir).collect()
    val layout = new java.io.File(Scratch.dir("part_layout", dir))
    val valueDirs = layout.listFiles().filter(_.getName.startsWith("l_returnflag="))
    assert(valueDirs.map(_.getName).sorted.toSeq ==
      Seq("l_returnflag=A", "l_returnflag=N", "l_returnflag=R"))
    // repartition(col) before partitionBy: each value dir holds ONE
    // file, not one per task
    valueDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1, d.getName)
    }
  }
}
