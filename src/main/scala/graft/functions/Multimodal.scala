package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine
  * as opaque `binary` columns with a typed metadata struct, and
  * decode / feature-extract / frame-sample run as a batch-shaped
  * iterator-to-iterator `mapPartitions` over a typed Dataset — the
  * Scala analogue of `mapInPandas` (one decoder init per partition,
  * streaming through rows, no collect, no per-row UDF dispatch).
  *
  * ==== STUB BOUNDARY ====
  * This container has no image/audio codecs, so [[MediaDecoder.decode]]
  * is a clearly-marked deterministic fake: "decoding" hashes the bytes
  * and "frame sampling" is arithmetic on the byte length. Swapping in a
  * real codec changes ONLY the body of `decode`; the engine-side
  * contract — schema, encoders, partition batching, aggregation — is
  * real and tested, and every stub output is integer-exact so the
  * DuckDB oracle can replay it.
  */
object Multimodal {

  /** One media payload: opaque bytes + typed metadata. */
  final case class MediaBlob(doc_id: Long, media_type: String, bytes: Array[Byte])

  /** Extracted features (all integer-exact for oracle replay). */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, checksum: Long, n_frames: Long)

  object MediaDecoder {
    /** STUB decode: real implementation would decompress/decode the
      * payload (??? in a codec-less container). Deterministic fake:
      * checksum = first 8 hex digits of md5(bytes); frame sampling =
      * one frame per started KiB-ish block (len/1000 + 1). */
    def decode(b: MediaBlob): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(b.bytes).take(4).map(x => f"${x & 0xff}%02x").mkString
      MediaFeatures(b.doc_id, b.media_type,
        n_bytes = b.bytes.length.toLong,
        checksum = java.lang.Long.parseLong(hex, 16),
        n_frames = b.bytes.length.toLong / 1000L + 1L)
    }
  }

  /** Batch feature extraction: the decoder is instantiated per
    * partition (cheap here, expensive for a real codec — which is why
    * mapPartitions, not map) and rows stream through it. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec ctx)
      it.map(MediaDecoder.decode)
    }
  }

  /** Documents as synthetic media blobs: payload = utf8 bytes of the
    * text, media type assigned round-robin. Stands in for reading real
    * image/audio/video binary columns from parquet. */
  def blobsFromDocuments(s: SparkSession, dir: String): Dataset[MediaBlob] = {
    import s.implicits._
    graft.queries.Tables.t(s, dir, "documents")
      .select($"doc_id",
        when($"doc_id" % 3 === 0, "image")
          .when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        $"text".cast("binary").as("bytes"))
      .as[MediaBlob]
  }

  /** CORRECTNESS query: blob → mapPartitions decode → per-type rollup. */
  def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(blobsFromDocuments(s, dir)).toDF()
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("total_bytes"),
        sum($"checksum").as("sum_checksum"),
        sum($"n_frames").as("total_frames"))
      .orderBy($"media_type")
  }

  /** Frame sampling as a query: every 3rd frame index of each decoded
    * payload (deterministic doc_id % 50 sample keeps the output
    * result-sized). The frame table a downstream vision encoder would
    * consume; rows out ∝ frames in, per row — never corpus². The real
    * codec swap point is the same [[MediaDecoder]] boundary (a true
    * implementation emits actual frame offsets; resize rides the same
    * seam). */
  def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Sample BEFORE decoding: the typed mapPartitions is an optimizer
    // barrier, so a post-decode filter would run every payload through
    // the (expensive, for a real codec) decoder and drop 49/50 of it.
    extractFeatures(blobsFromDocuments(s, dir).filter($"doc_id" % 50 === 0)).toDF()
      .select($"doc_id", $"media_type", $"n_frames",
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 3)")).as("frame_idx"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_frame_sample" -> qFrameSample,
  )

  val oracles: Map[String, String] = Map(
    // Replays the stub decode in SQL: md5 prefix as the checksum,
    // octet_length as the byte count (payload = utf8 text bytes).
    "q_multimodal_features" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    octet_length(encode(text)) AS n_bytes,
        |    CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) AS checksum,
        |    octet_length(encode(text)) // 1000 + 1 AS n_frames
        |  FROM documents)
        |SELECT media_type, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(checksum) AS BIGINT) AS sum_checksum, CAST(sum(n_frames) AS BIGINT) AS total_frames
        |FROM feat GROUP BY media_type ORDER BY media_type""".stripMargin,
    "q_frame_sample" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    octet_length(encode(text)) // 1000 + 1 AS n_frames
        |  FROM documents WHERE doc_id % 50 = 0)
        |SELECT doc_id, media_type, n_frames, unnest(generate_series(0, n_frames - 1, 3)) AS frame_idx
        |FROM feat
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
