package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Similarity-search operators over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT> dim 64, label INT).
  *
  * Determinism across engines: every float element is quantized
  * `floor(x * 1000)` to BIGINT up front, so dot products and squared
  * norms are exact integer arithmetic; the only floating point is the
  * final `dot / sqrt(nq * nc)` ranking value, computed from identical
  * integers in both engines (IEEE sqrt/divide are correctly rounded →
  * bit-identical). All vector math uses codegen-friendly higher-order
  * functions (`zip_with` + `aggregate`), no UDFs.
  *
  * Scale design: the brute-force path broadcasts the (tiny) query set
  * against a full scan — linear in corpus size, the right baseline.
  * The ANN path buckets by sign-LSH FIRST and joins bucket-to-bucket,
  * so candidate pairs — and the shuffle — scale with bucket occupancy,
  * not corpus². */
object EmbeddingOps {

  /** Quantized integer vector. */
  private val qvec: Column =
    expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")

  /** vec_id, quantized vector `q`, exact squared norm `nsq`. */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"vec_id", $"label", qvec.as("q"), size($"embedding").as("dim"))
      .withColumn("nsq", expr("aggregate(q, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"))
  }

  /** Per-label corpus stats over the quantized vectors — proves the
    * vector column handles like any other (pruned scan, partial agg). */
  def qEmbedStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    vecs(s, dir)
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vectors"),
        sum($"nsq").as("sum_sq_norm"),
        min($"nsq").as("min_sq_norm"),
        max($"nsq").as("max_sq_norm"),
        max($"dim").as("dim"))
      .orderBy($"label")
  }

  /** Brute-force cosine top-10: every vec_id % 100 == 0 is a query;
    * the query set is broadcast (~corpus/100) and each partition scores
    * its local candidates — one pass over the corpus. */
  def qKnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vecs(s, dir).select($"vec_id", $"q", $"nsq")
    val queries = v.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"q".as("qv"), $"nsq".as("nq"))
    val scored = v.join(broadcast(queries), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("cid"),
        dot("qv", "q").as("dot"), $"nq", $"nsq".as("nc"))
      .withColumn("cosine", $"dot" / sqrt(($"nq" * $"nc").cast("double")))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid")
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 10)
      .select($"qid", $"rnk", $"cid", $"dot", $"nq", $"nc")
      .orderBy($"qid", $"rnk")
  }

  /** 8-bit sign-LSH bucket: bit i set iff quantized dim i is >= 0
    * (axis-aligned random hyperplanes). */
  private def bucketCol(qCol: String): Column =
    (0 until 8).map { i =>
      when(expr(s"$qCol[$i]") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: same-bucket candidates only, exact cosine re-rank,
    * top-5 per query. Both sides shuffle once on the bucket key;
    * candidate volume scales with bucket occupancy — the 100 TB path
    * (vs the brute-force full scan per query). */
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vecs(s, dir).select($"vec_id", $"q", $"nsq")
      .withColumn("bucket", bucketCol("q"))
    val queries = v.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"q".as("qv"), $"nsq".as("nq"), $"bucket")
    val scored = v.join(queries, Seq("bucket"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"bucket", $"vec_id".as("cid"),
        dot("qv", "q").as("dot"), $"nq", $"nsq".as("nc"))
      .withColumn("cosine", $"dot" / sqrt(($"nq" * $"nc").cast("double")))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid")
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"qid", $"bucket", $"rnk", $"cid", $"dot")
      .orderBy($"qid", $"rnk")
  }

  /** Embedding-cosine near-duplicate pairs: ALL within-bucket pairs
    * (not just query-anchored ones) with cosine >= 0.4 — the
    * embedding-space analogue of MinHash dedup. The LSH bucket is the
    * candidate generator, so pairwise work scales with bucket occupancy;
    * the threshold is calibrated to this corpus (max pairwise cosine
    * ~0.51 — no injected duplicates, so "near-dup" here means the
    * closest natural pairs). */
  def qEmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = vecs(s, dir).select($"vec_id", $"q", $"nsq")
      .withColumn("bucket", bucketCol("q"))
    val pairs = v.as("a").join(v.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"),
        dot("a.q", "b.q").as("dot"), $"a.nsq".as("na"), $"b.nsq".as("nb"))
      .withColumn("cosine", $"dot" / sqrt(($"na" * $"nb").cast("double")))
    pairs.filter($"cosine" >= 0.4)
      .select($"va", $"vb", $"dot", $"na", $"nb")
      .orderBy($"va", $"vb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_stats" -> qEmbedStats,
    "q_knn_brute" -> qKnnBrute,
    "q_ann_lsh" -> qAnnLsh,
    "q_embed_neardup" -> qEmbedNearDup,
  )

  private val qvecSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** DuckDB 1-based: bucket bit i ⟷ q[i+1]. */
  private val bucketSql = (0 until 8)
    .map(i => s"(CASE WHEN q[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
    .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q_embed_stats" ->
      s"""WITH per AS (
         |  SELECT label, len(embedding) AS dim,
         |    list_sum(list_transform($qvecSql, v -> v * v)) AS nsq
         |  FROM embeddings)
         |SELECT label, count(*) AS n_vectors, sum(nsq) AS sum_sq_norm,
         |  min(nsq) AS min_sq_norm, max(nsq) AS max_sq_norm, max(dim) AS dim
         |FROM per GROUP BY label ORDER BY label""".stripMargin,
    // DuckDB zips parallel unnests in one SELECT, giving exact integer
    // dot products; ranking mirrors the Spark window exactly.
    "q_knn_brute" ->
      s"""WITH v AS (SELECT vec_id, $qvecSql AS q FROM embeddings),
         |n AS (SELECT vec_id, list_sum(list_transform(q, x -> x * x)) AS nsq FROM v),
         |terms AS (
         |  SELECT qv.vec_id AS qid, cv.vec_id AS cid,
         |         unnest(qv.q) AS a, unnest(cv.q) AS b
         |  FROM v qv JOIN v cv ON cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id % 100 = 0),
         |dots AS (SELECT qid, cid, sum(a * b) AS dot FROM terms GROUP BY qid, cid),
         |scored AS (
         |  SELECT qid, cid, dot, nq.nsq AS nq, nc.nsq AS nc,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(nq.nsq * nc.nsq AS DOUBLE)) AS cosine
         |  FROM dots JOIN n nq ON nq.vec_id = qid JOIN n nc ON nc.vec_id = cid),
         |ranked AS (SELECT qid, cid, dot, nq, nc,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rnk
         |  FROM scored)
         |SELECT qid, rnk, cid, dot, nq, nc FROM ranked WHERE rnk <= 10
         |ORDER BY qid, rnk""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH v AS (SELECT vec_id, $qvecSql AS q FROM embeddings),
         |n AS (SELECT vec_id, list_sum(list_transform(q, x -> x * x)) AS nsq FROM v),
         |b AS (SELECT vec_id, $bucketSql AS bucket FROM v),
         |terms AS (
         |  SELECT qv.vec_id AS qid, bq.bucket, cv.vec_id AS cid,
         |         unnest(qv.q) AS a, unnest(cv.q) AS b
         |  FROM v qv JOIN b bq ON bq.vec_id = qv.vec_id
         |  JOIN b bc ON bc.bucket = bq.bucket
         |  JOIN v cv ON cv.vec_id = bc.vec_id AND cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id % 100 = 0),
         |dots AS (SELECT qid, bucket, cid, sum(a * b) AS dot
         |         FROM terms GROUP BY qid, bucket, cid),
         |scored AS (
         |  SELECT qid, bucket, cid, dot,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(nq.nsq * nc.nsq AS DOUBLE)) AS cosine
         |  FROM dots JOIN n nq ON nq.vec_id = qid JOIN n nc ON nc.vec_id = cid),
         |ranked AS (SELECT qid, bucket, cid, dot,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rnk
         |  FROM scored)
         |SELECT qid, bucket, rnk, cid, dot FROM ranked WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    "q_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, $qvecSql AS q FROM embeddings),
         |n AS (SELECT vec_id, list_sum(list_transform(q, x -> x * x)) AS nsq FROM v),
         |b AS (SELECT vec_id, $bucketSql AS bucket FROM v),
         |terms AS (
         |  SELECT av.vec_id AS va, bv.vec_id AS vb,
         |         unnest(av.q) AS x, unnest(bv.q) AS y
         |  FROM v av JOIN b ba ON ba.vec_id = av.vec_id
         |  JOIN b bb ON bb.bucket = ba.bucket AND bb.vec_id > av.vec_id
         |  JOIN v bv ON bv.vec_id = bb.vec_id),
         |dots AS (SELECT va, vb, sum(x * y) AS dot FROM terms GROUP BY va, vb),
         |scored AS (
         |  SELECT va, vb, dot, na.nsq AS na, nb.nsq AS nb,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq * nb.nsq AS DOUBLE)) AS cosine
         |  FROM dots JOIN n na ON na.vec_id = va JOIN n nb ON nb.vec_id = vb)
         |SELECT va, vb, dot, na, nb FROM scored WHERE cosine >= 0.4
         |ORDER BY va, vb""".stripMargin,
  )
}
