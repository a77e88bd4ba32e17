package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming operator surface over the `events` stream:
  * watermarked event-time windows and custom keyed state — the two
  * primitives the reference's connector never needed (its source reads
  * "now" each trigger, late data impossible) but a general engine must
  * provide. Everything is readStream→transform→writeStream; state is
  * bounded per key, so the plan shards across executors by group key at
  * any scale.
  */
object StreamingOps {

  /** File-stream schema for events.parquet: `ts` arrives as raw
    * TIMESTAMP(NANOS) (read as long via nanosAsLong). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a directory of events parquet files as a file stream (the
    * file source tails a directory; new files become new micro-batch
    * input — the standard landing-zone ingestion pattern). */
  def eventsStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(eventsSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Hourly event counts per type with a 2h watermark: hash-shuffled on
    * (window, event_type), partial-aggregated map-side; state per open
    * window only — the canonical streaming aggregation. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))

  /** Streaming exact-dedup on the event identity with watermark-bounded
    * state: duplicates arriving within the 2h watermark horizon are
    * dropped; state for ids older than the watermark is evicted, so
    * per-executor dedup state is bounded by (event rate × horizon), not
    * by stream lifetime — the property that keeps this runnable forever
    * at any scale. At-least-once upstream delivery (file landing zones,
    * replayed kafka ranges) is the motivating case. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the same
    * user's errors in the hour AFTER it. Both sides carry watermarks
    * and the join predicate bounds the event-time distance, so each
    * side's buffered state is (rate × [watermark + interval]) — the
    * condition Spark needs to ever evict state from a stream-stream
    * join; an unbounded-interval join would grow state forever. */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "2 hours")
    purchases.join(errors,
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("error_id"),
        col("p_ts"), col("e_ts"))
  }

  final case class Ev(event_id: Long, user_id: Long, event_type: String, tsMicros: Long)
  final case class FirstSeen(user_id: Long, event_type: String,
                             first_event_id: Long, first_ts_micros: Long)

  /** Custom keyed state: emit only the FIRST event per
    * (user_id, event_type) — streaming exact-dedup with O(1) state per
    * key via flatMapGroupsWithState (the state is one boolean+record,
    * not the event history). */
  def firstSeen(s: SparkSession, events: DataFrame): Dataset[FirstSeen] = {
    import s.implicits._
    val typed = events.select(
      $"event_id", $"user_id", $"event_type",
      unix_micros($"ts").as("tsMicros")).as[Ev]
    typed
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), rows: Iterator[Ev], state: GroupState[FirstSeen]) =>
          if (state.exists) Iterator.empty
          else {
            // Batches may deliver rows unordered within the group; the
            // earliest (ts, event_id) is "first".
            val first = rows.minBy(e => (e.tsMicros, e.event_id))
            val fs = FirstSeen(key._1, key._2, first.event_id, first.tsMicros)
            state.update(fs)
            Iterator.single(fs)
          }
      }
  }

  /** Oracle-gated streaming query: the events table replayed through
    * the file-stream source into [[hourlyCounts]], collected via a
    * complete-mode memory sink under Trigger.AvailableNow. The input is
    * a single file ⇒ one micro-batch ⇒ the watermark never advances
    * mid-run, so the streaming result equals the batch hourly rollup
    * exactly — which is precisely what the DuckDB oracle checks. The
    * memory sink is the harness-side collect point only and holds the
    * BOUNDED aggregate (hours × event types); a deployment writes the
    * same plan to a file/Kafka sink partitioned by window, and the
    * multi-batch/late-data paths are exercised in StreamingOpsSpec. */
  def qStreamingHourly(s: SparkSession, dir: String): DataFrame = {
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file-stream source wants a directory or glob (a bare file
    // path fails basePath validation); the glob pins it to events.
    val q = hourlyCounts(eventsStream(s, s"$dir/events.parque[t]"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n"), col("total_value"))
      .writeStream.outputMode(OutputMode.Complete()).format("memory")
      .queryName("graft_stream_hourly").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_stream_hourly").orderBy(col("hour_ts"), col("event_type"))
  }

  /** Sliding 2h-window / 1h-slide event counts: each event lands in
    * exactly two open windows, so state is 2× the tumbling case but
    * still bounded by (open windows × type cardinality) under the
    * watermark. Oracle-gated like [[qStreamingHourly]]: a single-file
    * replay's result must equal the batch computation, which the
    * DuckDB side expresses by unnesting each event into its two
    * hourly-aligned window starts. */
  def qStreamingSliding(s: SparkSession, dir: String): DataFrame = {
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val counts = eventsStream(s, s"$dir/events.parque[t]")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .writeStream.outputMode(OutputMode.Complete()).format("memory")
      .queryName("graft_stream_sliding").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_stream_sliding").orderBy(col("win_start"), col("event_type"))
  }

  /** Oracle-gated keyed streaming dedup: [[firstSeen]]'s
    * flatMapGroupsWithState run over the single-file replay — each
    * (user_id, event_type) emits exactly its earliest (ts, event_id)
    * event. One micro-batch means the iterator holds the key's whole
    * history, so "first in state order" equals "first in event-time
    * order" and the result matches the batch window oracle exactly;
    * the multi-batch path (where state, not the iterator, carries
    * first-ness) is exercised in StreamingOpsSpec. State per key is one
    * record — the O(1) property that lets this run forever. */
  def qStreamingDedup(s: SparkSession, dir: String): DataFrame = {
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val q = firstSeen(s, eventsStream(s, s"$dir/events.parque[t]")).toDF()
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("graft_stream_dedup").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_stream_dedup").orderBy(col("user_id"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_streaming_hourly" -> qStreamingHourly,
    "q_streaming_sliding" -> qStreamingSliding,
    "q_streaming_dedup" -> qStreamingDedup)

  /** The oracle is the BATCH hourly rollup — tumbling 1h windows are
    * epoch-aligned, so window.start ≡ date_trunc('hour'). */
  val oracles: Map[String, String] = Map(
    "q_streaming_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin,
    // A (2h, 1h-slide) window with hourly-aligned starts contains event
    // t iff start ∈ {trunc_hour(t), trunc_hour(t) − 1h}.
    "q_streaming_sliding" ->
      """WITH w AS (SELECT event_type,
        |    unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start
        |  FROM events)
        |SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // Batch truth for first-per-key: earliest (ts, event_id) window.
    "q_streaming_dedup" ->
      """SELECT user_id, event_type, event_id AS first_event_id,
        |  epoch_us(ts) AS first_ts_micros
        |FROM (SELECT user_id, event_type, event_id, ts,
        |        row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |      FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin)
}
