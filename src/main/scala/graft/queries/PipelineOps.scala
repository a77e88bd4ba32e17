package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Dataset-assembly operators over `documents` — the selection /
  * splitting / weighting steps between "corpus" and "training run".
  * Everything is DETERMINISTIC by construction (content/id hashes, no
  * `rand()`): the same corpus always yields the same split, the same
  * sample, the same chunks — reproducibility is a pipeline requirement,
  * and it is what makes every operator DuckDB-oracle-checkable.
  *
  * Scale shapes: splits and samples are one map + one bounded
  * aggregation or window (no shuffle whose volume exceeds the output);
  * TF-IDF is two partial-agg rollups and a broadcast-friendly join;
  * chunking is a per-row `sequence` explode — rows out ∝ tokens in,
  * never corpus². */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")

  /** Hash bucket 0-99 from the doc id — the split die. md5 (not
    * `hash()`) so DuckDB reproduces it bit-for-bit. */
  private val bucket =
    (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 100)

  /** Deterministic train/val/test split (80/10/10 by id-hash bucket)
    * with per-(split, lang) volume accounting. A pipeline must be able
    * to re-derive the exact membership of every split at any time —
    * hence hashing the stable id, never `rand()`. Pure map + partial
    * agg on a low-cardinality key: the canonical 100 TB-safe shape. */
  def qDatasetSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", $"lang",
        size(split($"text", "\\s+")).cast("long").as("nw"),
        when(bucket < 10, "test").when(bucket < 20, "val").otherwise("train").as("split"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"nw").as("n_words"))
      .orderBy($"split", $"lang")
  }

  /** Deterministic stratified sample: per (lang, source) stratum keep
    * the K=5 docs that rank first by (id-hash, id) — a reservoir
    * sample whose "random" order is a hash, so it is stable across
    * runs and engines. The window sorts only within strata and keeps
    * K rows of state per stratum. */
  def qStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang", $"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    docs(s, dir)
      .select($"lang", $"source", $"doc_id")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"lang", $"source", $"rnk".cast("long").as("rnk"), $"doc_id")
      .orderBy($"lang", $"source", $"rnk")
  }

  /** Top-5 terms per source by tf/df: tf = occurrences within the
    * source, df = number of distinct docs containing the term
    * (corpus-wide). The idf log is monotone in 1/df, so ranking by the
    * exact double tf/df (IEEE division of exact integers — bit-stable)
    * orders identically to tf·idf without a transcendental whose
    * rounding differs across engines. Two partial-agg rollups over the
    * exploded words; the tf←df join keys on the term. */
  def qTfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = docs(s, dir)
      .select($"doc_id", $"source", explode(split($"text", "\\s+")).as("w"))
    val tf = words.groupBy($"source", $"w").agg(count(lit(1)).as("tf"))
    val df = words.select($"w", $"doc_id").distinct()
      .groupBy($"w").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("w"))
      .withColumn("score", $"tf".cast("double") / $"df")
    val win = Window.partitionBy($"source").orderBy($"score".desc, $"w")
    scored.withColumn("rnk", row_number().over(win))
      .filter($"rnk" <= 5)
      .select($"source", $"rnk".cast("long").as("rnk"), $"w".as("term"), $"tf", $"df")
      .orderBy($"source", $"rnk")
  }

  /** Fixed-size sequence chunking (64-token windows, last chunk
    * ragged): the boundary table a packing/tokenization stage consumes.
    * Demonstrated on the deterministic doc_id % 25 sample so the
    * output stays result-sized; rows out = ceil(tokens/64) per doc
    * regardless of corpus size. */
  def qDocChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 25 === 0)
      .select($"doc_id", size(split($"text", "\\s+")).cast("long").as("nw"))
      .select($"doc_id", $"nw",
        explode(expr("sequence(CAST(0 AS BIGINT), (nw + 63) DIV 64 - 1)")).as("chunk_id"))
      .select($"doc_id", $"chunk_id",
        ($"chunk_id" * 64).as("start_word"),
        least(($"chunk_id" + 1) * 64, $"nw").as("end_word"))
      .orderBy($"doc_id", $"chunk_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dataset_split" -> qDatasetSplit,
    "q_stratified_sample" -> qStratifiedSample,
    "q_tfidf_top_terms" -> qTfidfTopTerms,
    "q_doc_chunks" -> qDocChunks,
  )

  private val bucketSql =
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"

  val oracles: Map[String, String] = Map(
    "q_dataset_split" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, len(string_split_regex(text, '\\s+')) AS nw,
         |    CASE WHEN $bucketSql < 10 THEN 'test'
         |         WHEN $bucketSql < 20 THEN 'val'
         |         ELSE 'train' END AS split
         |  FROM documents)
         |SELECT split, lang, count(*) AS n_docs, sum(nw) AS n_words
         |FROM d GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, source, rnk, doc_id FROM (
        |  SELECT lang, source, doc_id,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents)
        |WHERE rnk <= 5 ORDER BY lang, source, rnk""".stripMargin,
    "q_tfidf_top_terms" ->
      """WITH words AS (
        |  SELECT doc_id, source, unnest(string_split_regex(text, '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT source, w, count(*) AS tf FROM words GROUP BY source, w),
        |df AS (SELECT w, count(*) AS df FROM (SELECT DISTINCT w, doc_id FROM words) GROUP BY w),
        |scored AS (
        |  SELECT tf.source, tf.w, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) / df.df AS score
        |  FROM tf JOIN df ON df.w = tf.w),
        |ranked AS (
        |  SELECT source, w, tf, df,
        |    row_number() OVER (PARTITION BY source ORDER BY score DESC, w) AS rnk
        |  FROM scored)
        |SELECT source, rnk, w AS term, tf, df FROM ranked WHERE rnk <= 5
        |ORDER BY source, rnk""".stripMargin,
    "q_doc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS nw
        |  FROM documents WHERE doc_id % 25 = 0)
        |SELECT doc_id, i AS chunk_id, i * 64 AS start_word,
        |  least((i + 1) * 64, nw) AS end_word
        |FROM d, (SELECT unnest(generate_series(0, 100)) AS i) t
        |WHERE i <= (nw + 63) // 64 - 1
        |ORDER BY doc_id, chunk_id""".stripMargin,
  )
}
