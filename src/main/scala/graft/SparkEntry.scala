package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module query maps; every entry with
  * a DuckDB-expressible equivalent also appears in `oracleSql` (same
  * key, same output column names — the driver hash-compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q3ShippingPriority(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Connector.queries ++
      graft.queries.TextOps.queries ++ graft.queries.EmbeddingOps.queries ++
      graft.queries.PipelineOps.queries ++ graft.functions.Multimodal.queries ++
      graft.queries.Storage.queries ++ graft.streaming.StreamingOps.queries ++
      graft.queries.PqOps.queries ++ graft.queries.CurationOps.queries

  /** Keys whose timed bench pass reads a staged replay artifact
    * instead of re-running a streaming-query lifecycle — tagged in the
    * bench output so BENCH_OFFICIAL minima for them are read as
    * artifact read-back, not streaming throughput. */
  def stagedReadbackKeys: Set[String] =
    graft.streaming.StreamingOps.stagedReadbackKeys ++
      graft.queries.Connector.stagedReadbackKeys

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Connector.oracles ++
      graft.queries.TextOps.oracles ++ graft.queries.EmbeddingOps.oracles ++
      graft.queries.PipelineOps.oracles ++ graft.functions.Multimodal.oracles ++
      graft.queries.Storage.oracles ++ graft.streaming.StreamingOps.oracles ++
      graft.queries.PqOps.oracles ++ graft.queries.CurationOps.oracles
}
