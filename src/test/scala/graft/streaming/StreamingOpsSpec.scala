package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming results must equal their batch equivalents on the same
  * data — the file stream replays events.parquet as a stream. */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** The file stream source tails a directory; stage the single events
    * file into one. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("watermarked hourly window counts match the batch aggregation") {
    import spark.implicits._
    val q = StreamingOps.hourlyCounts(StreamingOps.eventsStream(spark, streamDir))
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream")
      .select($"window.start".as("h"), $"event_type", $"n", $"total_value")
    val batch = graft.queries.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("dropDuplicatesWithinWatermark removes replayed duplicates exactly") {
    import spark.implicits._
    // at-least-once landing zone: the same file delivered twice
    val d = java.nio.file.Files.createTempDirectory("events-dup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), d.resolve("b.parquet"))

    val q = StreamingOps.dedupStream(StreamingOps.eventsStream(spark, d.toString))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("dedup_stream")
    val expected = graft.queries.Tables.events(spark, dir).count()
    assert(streamed.count() == expected) // 2x input, 1x output
    assert(streamed.groupBy($"event_id").count().filter($"count" > 1).count() == 0)
  }

  test("stream-stream interval join matches the batch join") {
    import spark.implicits._
    val src = StreamingOps.eventsStream(spark, streamDir)
    val q = StreamingOps.purchaseErrorJoin(src)
      .writeStream.format("memory").queryName("ssjoin_stream")
      .outputMode("append").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("ssjoin_stream")
    val ev = graft.queries.Tables.events(spark, dir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("u"), $"event_id".as("purchase_id"), $"ts".as("p_ts"))
    val e = ev.filter($"event_type" === "error")
      .select($"user_id".as("eu"), $"event_id".as("error_id"), $"ts".as("e_ts"))
    val batch = p.join(e, $"u" === $"eu" &&
        $"e_ts" >= $"p_ts" && $"e_ts" <= $"p_ts" + expr("INTERVAL 1 HOUR"))
      .select($"u".as("user_id"), $"purchase_id", $"error_id", $"p_ts", $"e_ts")
    assert(streamed.count() > 0, "interval join produced nothing — fixture too sparse")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("streaming session_window equals the batch session windows") {
    import spark.implicits._
    // The same session_window expression that drives q_session_window,
    // under a watermark in a real stream. Session-window aggregations
    // support complete/append only (update would emit partially-merged
    // sessions); complete's snapshot after the single-batch replay
    // must equal the batch computation row-for-row.
    val q = StreamingOps.eventsStream(spark, streamDir)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("sess_start"), $"sw.end".as("sess_end"),
        $"n_events")
      .writeStream.format("memory").queryName("session_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("session_stream")
    val batch = graft.queries.Relational.qSessionWindow(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("flatMapGroupsWithState first-seen dedup matches batch window dedup") {
    import spark.implicits._
    val q = StreamingOps.firstSeen(spark, StreamingOps.eventsStream(spark, streamDir))
      .toDF()
      .writeStream.format("memory").queryName("firstseen_stream")
      .outputMode("append").trigger(Trigger.Once()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("firstseen_stream")
    val batch = graft.queries.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"event_type")
          .orderBy($"ts_ns", $"event_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type",
        $"event_id".as("first_event_id"),
        expr("ts_ns div 1000").as("first_ts_micros"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }
}
