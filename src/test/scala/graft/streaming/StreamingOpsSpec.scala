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
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

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

  test("RocksDB state store provider is result-identical to the default") {
    // At 100 TB, streaming state (open windows × keys) outgrows
    // executor heaps; the RocksDB provider keeps state on local disk
    // with only a working set in memory. rocksdbjni ships with the
    // Spark distribution, so the swap is ONE conf — and it must be
    // result-invisible, which is exactly what this proves on the same
    // watermark-windowed aggregation the gate pins to its oracle.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val default = StreamingOps.qStreamingHourly(spark, dir).collect().toSeq
    assert(default.nonEmpty)
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = StreamingOps.qStreamingHourly(spark, dir).collect().toSeq
      assert(rocks == default)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
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
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

    val streamed = spark.table("dedup_stream")
    val expected = graft.queries.Tables.events(spark, dir).count()
    assert(streamed.count() == expected) // 2x input, 1x output
    assert(streamed.groupBy($"event_id").count().filter($"count" > 1).count() == 0)
  }

  test("dropDuplicatesWithinWatermark: beyond-horizon redelivery re-emits (eviction edge)") {
    import spark.implicits._
    // The gate (q_streaming_dedup_wm) plants every duplicate INSIDE
    // the watermark horizon, so all are dropped; this pins the other
    // side of the contract — state is evicted once the watermark
    // passes its expiry, after which a redelivery of the same key is
    // indistinguishable from a new event and MUST re-emit (the
    // operator guarantees dedup only within the horizon), while a
    // redelivery below the watermark is dropped as late.
    val d = java.nio.file.Files.createTempDirectory("events-dedupwm-evict")
    val t0 = 1704067200L * 1000000L // 2024-01-01T00:00Z
    val h = 3600L * 1000000L
    def stage(rows: Seq[(Long, Long, Long, String, Double)],
        name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("dedupwm-slice")
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .select($"event_id", expr("timestamp_micros(ts_us)").as("ts"), $"user_id",
          $"event_type", $"value", lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(d.toFile, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(mtime): Unit
    }
    stage(Seq((1L, t0, 10L, "a", 1.0), (2L, t0, 11L, "a", 1.0)),
      "f1.parquet", 1700000000000L)
    // watermark advancer: after this batch wm = t0+8h > the t0+2h
    // expiry of ids 1/2
    stage(Seq((3L, t0 + 10 * h, 12L, "a", 1.0)), "f2.parquet", 1700000060000L)
    // a second advancer batch: eviction trails the watermark by a
    // batch (the operator may over-dedup PAST the horizon — the
    // guarantee is one-way), so give the evictor one batch at
    // wm = t0+8h before the redelivery arrives
    stage(Seq((4L, t0 + 10 * h + 60000000L, 12L, "a", 1.0)),
      "f3.parquet", 1700000120000L)
    // id 1 redelivered ABOVE the watermark with no state → re-emits;
    // id 2 redelivered at its original (now-late) time → dropped late
    stage(Seq((1L, t0 + 10 * h, 10L, "dup", 2.0), (2L, t0, 11L, "dup", 2.0)),
      "f4.parquet", 1700000180000L)
    val q = spark.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"event_type")
      .writeStream.format("memory").queryName("dedupwm_evict")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "eviction-edge stream did not terminate")
    val out = spark.table("dedupwm_evict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, t0, "a"), (2L, t0, "a"), (3L, t0 + 10 * h, "a"),
      (4L, t0 + 10 * h + 60000000L, "a"),
      (1L, t0 + 10 * h, "dup")),
      s"eviction edge mis-played: $out")
  }

  test("stream-stream join under RocksDB: result-identical, state watermark-bounded") {
    import spark.implicits._
    // The stream-stream join is the operator with the LARGEST state
    // (both sides buffered for watermark + interval), so it is the one
    // that actually needs the disk-backed provider at scale — prove
    // the swap is result-invisible on it, not just on the hourly
    // aggregation. Two time-ordered files (maxFilesPerTrigger=1) make
    // the watermark ADVANCE between data batches, so eviction fires
    // and the final state size can be checked against the
    // rate × (watermark + interval) bound instead of "everything".
    val d = java.nio.file.Files.createTempDirectory("events-ssjoin-rocks")
    val raw = StreamingOps.eventsBatch(spark, dir) // ts as TimestampType
    val splitUs = 1705708800L * 1000000L // 2024-01-20T00:00Z
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("ssjoin-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    stage(raw.filter(unix_micros($"ts") < splitUs), "f1_early.parquet", 1700000000000L)
    stage(raw.filter(unix_micros($"ts") >= splitUs), "f2_late.parquet", 1700000060000L)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.purchaseErrorJoin(
          spark.readStream.schema(StreamingOps.eventsSchema)
            .option("maxFilesPerTrigger", 1).parquet(d.toString))
        .writeStream.format("memory").queryName("ssjoin_rocks")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not terminate within 120s")

      val progress = q.recentProgress.toSeq
      val stateOps = progress.flatMap(_.stateOperators)
      // The provider swap actually took: RocksDB surfaces its own
      // custom metrics (absent from the HDFS-backed provider).
      assert(stateOps.exists(_.customMetrics.keySet().stream()
          .anyMatch(_.startsWith("rocksdb"))),
        "no rocksdb custom metrics — provider swap did not take")
      // Eviction fired once the watermark advanced past early rows.
      assert(stateOps.map(_.numRowsRemoved).sum > 0, "no state was ever evicted")
      // Final state obeys the eviction contract: buffered rows sit
      // within (watermark delay + join interval) of the final
      // watermark — the bound that makes the join runnable forever.
      // (2h watermark + 1h interval; computed from the DATA.)
      val wm = java.time.Instant.parse(
        progress.last.eventTime.get("watermark")).toEpochMilli * 1000L
      val horizon = wm - (2L + 1L) * 3600L * 1000000L
      val bound = graft.queries.Tables.events(spark, dir)
        .filter($"event_type".isin("purchase", "error") &&
          unix_micros($"ts") >= horizon)
        .count()
      val finalState = progress.last.stateOperators.head.numRowsTotal
      assert(finalState <= bound,
        s"state $finalState exceeds watermark+interval bound $bound")

      // Result-identical to the batch interval join.
      val streamed = spark.table("ssjoin_rocks")
      val ev = graft.queries.Tables.events(spark, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("u"), $"event_id".as("purchase_id"), $"ts".as("p_ts"))
      val e = ev.filter($"event_type" === "error")
        .select($"user_id".as("eu"), $"event_id".as("error_id"), $"ts".as("e_ts"))
      val batch = p.join(e, $"u" === $"eu" &&
          $"e_ts" >= $"p_ts" && $"e_ts" <= $"p_ts" + expr("INTERVAL 1 HOUR"))
        .select($"u".as("user_id"), $"purchase_id", $"error_id", $"p_ts", $"e_ts")
      assert(streamed.count() > 0, "join produced nothing — fixture too sparse")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("LEFT OUTER interval join: outer rows flush on watermark advance, frontier exact") {
    import spark.implicits._
    // Two time-ordered files so the watermark ADVANCES between data
    // batches: early unmatched purchases must flush as null-extended
    // rows in a LATER batch (eviction), and purchases inside the final
    // watermark horizon must terminate buffered and unemitted.
    val d = java.nio.file.Files.createTempDirectory("events-ssjoin-outer")
    val raw = StreamingOps.eventsBatch(spark, dir)
    val splitUs = 1705708800L * 1000000L // 2024-01-20T00:00Z
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("ssjoin-outer-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    stage(raw.filter(unix_micros($"ts") < splitUs), "f1_early.parquet", 1700000000000L)
    stage(raw.filter(unix_micros($"ts") >= splitUs), "f2_late.parquet", 1700000060000L)

    val events = spark.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val errors = events.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("error_id"), $"ts".as("e_ts"))
      .withWatermark("e_ts", "2 hours")
    val q = purchases.join(errors,
        $"p_user" === $"e_user" && $"e_ts" >= $"p_ts" &&
          $"e_ts" <= $"p_ts" + expr("INTERVAL 1 HOUR"), "left_outer")
      .select($"p_user".as("user_id"), $"purchase_id",
        coalesce($"error_id", lit(-1L)).as("error_id"),
        unix_micros($"p_ts").as("p_ts_us"),
        coalesce(unix_micros($"e_ts"), lit(-1L)).as("e_ts_us"))
      .writeStream.format("memory").queryName("ssjoin_outer")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

    val progress = q.recentProgress.toSeq
    assert(progress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum > 0,
      "no state eviction — the outer semantics were never exercised")
    val streamed = spark.table("ssjoin_outer").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed.exists(_._3 == -1L), "no null-extended row ever flushed")

    // Exact expectation from the batch side + the eviction frontier:
    // global watermark = min(per-stream max) - 2h, ms-truncated.
    val ev = graft.queries.Tables.events(spark, dir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("u"), $"event_id".as("purchase_id"), $"ts".as("p_ts"))
    val e = ev.filter($"event_type" === "error")
      .select($"user_id".as("eu"), $"event_id".as("error_id"), $"ts".as("e_ts"))
    val maxP = p.agg(max(unix_micros($"p_ts"))).head.getLong(0)
    val maxE = e.agg(max(unix_micros($"e_ts"))).head.getLong(0)
    val wmUs = (math.min(maxP, maxE) / 1000L - 2L * 3600 * 1000L) * 1000L
    val matched = p.join(e, $"u" === $"eu" && $"e_ts" >= $"p_ts" &&
        $"e_ts" <= $"p_ts" + expr("INTERVAL 1 HOUR"))
      .select($"u", $"purchase_id", $"error_id",
        unix_micros($"p_ts").as("pus"), unix_micros($"e_ts").as("eus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val matchedIds = matched.map(_._2).toSet
    val unmatched = p.select($"u", $"purchase_id", unix_micros($"p_ts").as("pus"))
      .collect()
      .filter(r => !matchedIds.contains(r.getLong(1)))
      .filter(_.getLong(2) + 3600000000L < wmUs)
      .map(r => (r.getLong(0), r.getLong(1), -1L, r.getLong(2), -1L))
    assert(streamed == (matched ++ unmatched).toSet,
      s"streamed=${streamed.size} expected=${matched.length + unmatched.length}")
  }

  test("stream-stream interval join matches the batch join") {
    import spark.implicits._
    val src = StreamingOps.eventsStream(spark, streamDir)
    val q = StreamingOps.purchaseErrorJoin(src)
      .writeStream.format("memory").queryName("ssjoin_stream")
      .outputMode("append").trigger(Trigger.Once()).start()
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

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
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

    val streamed = spark.table("session_stream")
    val batch = graft.queries.Relational.qSessionWindow(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("foreachBatch incremental CDC merge equals the batch LWW compaction") {
    import spark.implicits._
    // The streaming form of the CDC apply (q_cdc_apply): the change
    // log arrives in micro-batches and foreachBatch MERGEs each one
    // into a keyed state table — compact the batch to one change per
    // key first (max_by), then last-write-wins against existing state.
    // After replaying the log split across two batches, the state must
    // equal the single-shot batch compaction; batch-boundary placement
    // must be invisible. (The driver-side map is the test's stand-in
    // upsert sink; a deployment merges into a keyed store/table.)
    val d = java.nio.file.Files.createTempDirectory("events-cdc-stream")
    val ev = graft.queries.Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value",
        expr("ts_ns div 1000").as("ts_us"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("cdc-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, d.resolve(name))
    }
    stage(ev.filter($"event_id" % 2 === 0), "a.parquet")
    stage(ev.filter($"event_id" % 2 === 1), "b.parquet")

    val state = scala.collection.mutable.Map[Long, (Long, Long, String, Double)]()
    var batches = 0
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        batch.groupBy($"user_id")
          .agg(max_by(struct($"ts_us", $"event_id", $"event_type", $"value"),
            struct($"ts_us", $"event_id")).as("ch"))
          .select($"user_id", $"ch.ts_us", $"ch.event_id", $"ch.event_type", $"ch.value")
          .collect().foreach { r =>
            val (u, ts, eid) = (r.getLong(0), r.getLong(1), r.getLong(2))
            val newer = state.get(u).forall(s =>
              Ordering.Tuple2[Long, Long].gt((ts, eid), (s._1, s._2)))
            if (newer) state(u) = (ts, eid, r.getString(3), r.getDouble(4))
          }
      }
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    val expected = ev.groupBy($"user_id")
      .agg(max_by(struct($"ts_us", $"event_id", $"event_type", $"value"),
        struct($"ts_us", $"event_id")).as("ch"))
      .select($"user_id", $"ch.ts_us", $"ch.event_id", $"ch.event_type", $"ch.value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    assert(state.toMap == expected)
  }

  test("transformWithState profile: per-batch emissions accumulate, final equals batch truth") {
    import spark.implicits._
    // Two-batch replay split by event_id parity — every user appears in
    // both batches at this SF, so state continuity across batches (not
    // the single-batch iterator) carries the profile. Collect ALL
    // emissions, not just the final pick: upd_seq must count the
    // batches a key appeared in, counts must be strictly increasing,
    // and the last emission must equal the one-shot batch aggregation.
    val d = java.nio.file.Files.createTempDirectory("events-tws")
    val raw = StreamingOps.eventsBatch(spark, dir)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tws-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    stage(raw.filter($"event_id" % 2 === 0), "f0.parquet", 1700000000000L)
    stage(raw.filter($"event_id" % 2 === 1), "f1.parquet", 1700000060000L)

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // NB: encoders come from the outer spark.implicits._ import — a
    // second implicits._ import here would make $ ambiguous.
    val typed = s2.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
      .as[StreamingOps.TwsEvent]
    val q = typed.groupByKey(_.user_id)
      .transformWithState(new StreamingOps.ProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_spec").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

    val emissions = s2.table("tws_spec").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("upd_seq"),
        r.getAs[Long]("n_events"), r.getAs[Long]("total_cents")))
      .groupBy(_._1)
    val batchTruth = raw.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("cents"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("cents"))).toMap
    assert(emissions.keySet == batchTruth.keySet)
    emissions.foreach { case (user, rows) =>
      val ordered = rows.sortBy(_._2)
      // one emission per batch the key appeared in, sequenced 1..k
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq, s"user $user seqs")
      assert(ordered.length == 2, s"user $user should appear in both batches")
      // running count strictly increases; the final emission is the truth
      assert(ordered.map(_._3).toSeq == ordered.map(_._3).sorted.toSeq)
      val (n, cents) = batchTruth(user)
      assert(ordered.last._3 == n && ordered.last._4 == cents, s"user $user final")
    }
  }

  test("transformWithState state survives a checkpointed query restart") {
    import spark.implicits._
    // The restart path a deployment lives on: query 1 processes the
    // first half of the log into RocksDB state under a checkpoint and
    // STOPS; a brand-new query over the SAME checkpoint processes the
    // second half. If state restore worked, run 2's emissions continue
    // each key's upd_seq (2, not 1) and fold ON TOP of run 1's counts;
    // a fresh-state bug would emit seq 1 with second-half-only counts.
    val landing = java.nio.file.Files.createTempDirectory("events-tws-restart")
    val ckpt = java.nio.file.Files.createTempDirectory("tws-restart-ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("tws-restart-out")
    val raw = StreamingOps.eventsBatch(spark, dir)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tws-restart-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = landing.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def runOnce(): Unit = {
      val q = s2.readStream.schema(StreamingOps.eventsSchema).parquet(landing.toString)
        .select($"user_id", $"event_id", $"event_type", $"value",
          unix_micros($"ts").as("ts_us"))
        .as[StreamingOps.TwsEvent]
        .groupByKey(_.user_id)
        .transformWithState(new StreamingOps.ProfileProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "restart-stream run did not terminate")
    }
    stage(raw.filter($"event_id" % 2 === 0), "f0.parquet", 1700000000000L)
    runOnce()
    stage(raw.filter($"event_id" % 2 === 1), "f1.parquet", 1700000060000L)
    runOnce()

    val emissions = spark.read.parquet(outDir.toString).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("upd_seq"),
        r.getAs[Long]("n_events"), r.getAs[Long]("total_cents")))
      .groupBy(_._1)
    val truth = raw.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("cents"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("cents"))).toMap
    assert(emissions.keySet == truth.keySet)
    emissions.foreach { case (user, rows) =>
      val ordered = rows.sortBy(_._2).toList
      assert(ordered.map(_._2) == List(1L, 2L),
        s"user $user seqs ${ordered.map(_._2)} — state did not survive the restart")
      val (n, cents) = truth(user)
      assert(ordered.last._3 == n && ordered.last._4 == cents, s"user $user final")
      assert(ordered.head._3 < n, s"user $user run-1 emission should be partial")
    }
  }

  test("state-schema evolution: avro decodes V1 state under the V2 schema; unsaferow refuses") {
    import spark.implicits._
    // The q_tws_evolve deployment event in miniature, plus the negative
    // control the gate can't carry: under the DEFAULT unsaferow
    // encoding the same restart must be REJECTED at query start (bytes
    // are not evolvable), which proves the avro conf is load-bearing
    // and the positive half isn't passing vacuously.
    val raw = StreamingOps.eventsBatch(spark, dir)
    def evolveRun(encoding: String): Either[Throwable, Seq[(Long, Long, Long, Option[Long])]] = {
      val landing = java.nio.file.Files.createTempDirectory(s"tws-evolve-$encoding")
      val ckpt = java.nio.file.Files.createTempDirectory(s"tws-evolve-ck-$encoding")
      val outDir = java.nio.file.Files.createTempDirectory(s"tws-evolve-out-$encoding")
      def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("tws-evolve-slice")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = landing.resolve(name)
        java.nio.file.Files.copy(part.toPath, dest)
        dest.toFile.setLastModified(mtime): Unit
      }
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "4")
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s2.conf.set("spark.sql.streaming.stateStore.encodingFormat", encoding)
      def runOnce(v2: Boolean): Unit = {
        val src = s2.readStream.schema(StreamingOps.eventsSchema).parquet(landing.toString)
          .select($"user_id", $"event_id", $"event_type", $"value",
            unix_micros($"ts").as("ts_us"))
          .as[StreamingOps.TwsEvent]
          .groupByKey(_.user_id)
        val out =
          if (v2) src.transformWithState(new StreamingOps.EvoProfileV2,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          else src.transformWithState(new StreamingOps.EvoProfileV1,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        val q = out.toDF()
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir.toString)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000), "evolve run did not terminate")
      }
      stage(raw.filter($"event_id" % 2 === 0), "f0.parquet", 1700000000000L)
      runOnce(v2 = false)
      stage(raw.filter($"event_id" % 2 === 1), "f1.parquet", 1700000060000L)
      try {
        runOnce(v2 = true)
        Right(spark.read.parquet(outDir.toString).collect().toSeq
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("upd_seq"),
            r.getAs[Long]("total_cents"),
            Option(r.getAs[java.lang.Long]("v2_cents")).map(_.longValue()))))
      } catch { case e: Throwable => Left(e) }
    }

    // Positive half: avro — run 2 continues every key's fold on top of
    // restored V1 state, v2_cents counts only run-2 events.
    val rows = evolveRun("avro").fold(e => fail(s"avro evolution failed: $e"), identity)
    val truth = raw.groupBy($"user_id")
      .agg(sum(round($"value" * 100).cast("long")).as("cents"),
        sum(when($"event_id" % 2 === 1, round($"value" * 100).cast("long"))
          .otherwise(0L)).as("cents2"),
        sum(($"event_id" % 2 === 1).cast("long")).as("n2"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("cents"), r.getAs[Long]("cents2"), r.getAs[Long]("n2"))).toMap
    val finals = rows.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    assert(finals.keySet == truth.keySet)
    finals.foreach { case (u, (_, _, cents, v2)) =>
      val (tc, tc2, n2) = truth(u)
      assert(cents == tc, s"user $u total_cents $cents != $tc — V1 state not restored")
      if (n2 > 0) assert(v2.contains(tc2), s"user $u v2_cents $v2 != Some($tc2)")
      else assert(v2.isEmpty, s"user $u v2_cents should be null, got $v2")
    }

    // Negative half: unsaferow — the evolved restart must be refused,
    // not silently misread.
    evolveRun("unsaferow") match {
      case Left(e) =>
        val msg = Option(e.getMessage).getOrElse("") +
          Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
        assert(msg.toLowerCase.contains("schema") || msg.toLowerCase.contains("compat"),
          s"unexpected failure shape: $e")
      case Right(_) => fail("unsaferow encoding accepted an evolved state schema")
    }
  }

  test("transformWithState TTL expires idle state across a restart gap") {
    import spark.implicits._
    // The inverse of the restart test: same two-run checkpointed
    // replay, but the processor declares a 1 ms TTL on its ValueState.
    // Run 2 starts seconds of processing time later, so every key's
    // state has EXPIRED — upd_seq restarts at 1 and counts cover only
    // the second half. This is the age-out knob deployments use to keep
    // state ∝ ACTIVE keys instead of all keys ever seen; TTL is
    // processing-time by definition, so it is specced (deterministic
    // across a restart gap), never oracle-gated.
    val landing = java.nio.file.Files.createTempDirectory("events-tws-ttl")
    val ckpt = java.nio.file.Files.createTempDirectory("tws-ttl-ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("tws-ttl-out")
    val raw = StreamingOps.eventsBatch(spark, dir)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tws-ttl-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = landing.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // a 1 ms TTL leaves something expirable after every batch; the
    // trailing no-data batch would keep finding cleanup work and the
    // AvailableNow run would never drain — skip it (no timers here)
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    def runOnce(): Unit = {
      val q = s2.readStream.schema(StreamingOps.eventsSchema).parquet(landing.toString)
        .select($"user_id", $"event_id", $"event_type", $"value",
          unix_micros($"ts").as("ts_us"))
        .as[StreamingOps.TwsEvent]
        .groupByKey(_.user_id)
        .transformWithState(new StreamingOps.TtlProfileProcessor(ttlMs = 1L),
          org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "ttl-stream run did not terminate")
    }
    stage(raw.filter($"event_id" % 2 === 0), "f0.parquet", 1700000000000L)
    runOnce()
    Thread.sleep(300) // >> 1 ms TTL: every key's state is now stale
    stage(raw.filter($"event_id" % 2 === 1), "f1.parquet", 1700000060000L)
    runOnce()

    val emissions = spark.read.parquet(outDir.toString).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("upd_seq"),
        r.getAs[Long]("n_events")))
      .groupBy(_._1)
    val halves = Seq(0, 1).map(par => raw.filter($"event_id" % 2 === par)
      .groupBy($"user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap)
    assert(emissions.keySet == (halves(0).keySet ++ halves(1).keySet))
    emissions.foreach { case (user, rows) =>
      // every run emits seq 1: run 2 saw NO surviving state
      assert(rows.forall(_._2 == 1L),
        s"user $user seqs ${rows.map(_._2).toList} — TTL did not expire state")
      // and each run's count covers exactly its own half
      val counts = rows.map(_._3).sorted.toList
      val expected = Seq(halves(0).get(user), halves(1).get(user)).flatten.sorted.toList
      assert(counts == expected, s"user $user counts $counts != $expected")
    }
  }

  test("ListState last-K and MapState counts accumulate across batches to batch truth") {
    import spark.implicits._
    // Same 2-batch parity split as the profile test: every user appears
    // in both batches, so the cross-batch LIST merge / MAP update — not
    // the single-batch iterator — must carry the result.
    val d = java.nio.file.Files.createTempDirectory("events-tws-lm")
    val raw = StreamingOps.eventsBatch(spark, dir)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tws-lm-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    stage(raw.filter($"event_id" % 2 === 0), "f0.parquet", 1700000000000L)
    stage(raw.filter($"event_id" % 2 === 1), "f1.parquet", 1700000060000L)

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val typed = s2.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
      .as[StreamingOps.TwsEvent]
    val q = typed.groupByKey(_.user_id)
      .transformWithState(new StreamingOps.LastKProcessor(3),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_lastk_spec").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "lastk stream did not terminate")

    val perUser = s2.table("tws_lastk_spec").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("upd_seq"),
        r.getAs[scala.collection.Seq[Long]]("ids").toList))
      .groupBy(_._1)
    val top3 = raw
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts").desc, $"event_id".desc)))
      .filter($"rn" <= 3)
      .orderBy($"rn")
      .groupBy($"user_id").agg(collect_list($"event_id").as("ids"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[scala.collection.Seq[Long]]("ids").toList).toMap
    assert(perUser.keySet == top3.keySet)
    perUser.foreach { case (user, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.length == 2, s"user $user should emit in both batches")
      assert(ordered.last._3 == top3(user), s"user $user final list != batch top-3")
    }
    // The merge was load-bearing: with an even/odd split some user's
    // batch-1 list must differ from the final (an odd id in the top-3).
    assert(perUser.exists { case (_, rows) =>
      val o = rows.sortBy(_._2); o.head._3 != o.last._3
    }, "parity split never changed a list — merge untested")

    // MapState: same staging, per-(user, type) counts.
    val q2 = typed.groupByKey(_.user_id)
      .transformWithState(new StreamingOps.TypeCountsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_counts_spec").trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000), "counts stream did not terminate")
    val emissions = s2.table("tws_counts_spec").collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[String]("event_type")),
        (r.getAs[Long]("upd_seq"), r.getAs[Long]("n"), r.getAs[Long]("cents"))))
      .groupBy(_._1)
    val truth = raw.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), sum(round($"value" * 100).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("cents"))).toMap
    assert(emissions.keySet == truth.keySet)
    emissions.foreach { case (k, rows) =>
      val ordered = rows.map(_._2).sortBy(_._1).toList
      // upd_seq per map ENTRY counts the batches that touched it; n is
      // strictly increasing across them; the final value is the truth
      assert(ordered.map(_._1) == (1L to ordered.length).toList, s"$k seqs")
      assert(ordered.map(_._2) == ordered.map(_._2).sorted, s"$k counts not increasing")
      assert((ordered.last._2, ordered.last._3) == truth(k), s"$k final")
    }
  }

  test("transformWithState event-time timers close quiet sessions exactly once") {
    import spark.implicits._
    val gapMin = 30L
    val gapUs = gapMin * 60L * 1000000L
    // Two time-ordered slices so the watermark ADVANCES between
    // batches: sessions that went quiet in slice 1 must be closed by
    // their event-time TIMER during batch 2 (or the trailing no-data
    // batch), while sessions superseded by a later event close inline —
    // both paths must fire, and no session may emit twice.
    val d = java.nio.file.Files.createTempDirectory("events-tws-sess")
    val raw = StreamingOps.eventsBatch(spark, dir)
    val splitUs = 1705276800L * 1000000L // 2024-01-15T00:00Z
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tws-sess-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    stage(raw.filter(unix_micros($"ts") < splitUs), "f0.parquet", 1700000000000L)
    stage(raw.filter(unix_micros($"ts") >= splitUs), "f1.parquet", 1700000060000L)

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = s2.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .select($"user_id", $"event_id", $"ts")
      .withWatermark("ts", "2 hours")
      .as[StreamingOps.SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new StreamingOps.SessionTimerProcessor(gapMin),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_sessions").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

    val emitted = s2.table("tws_sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("last_us"), r.getAs[Long]("n"), r.getAs[Boolean]("by_timer")))
    // no session emitted twice
    assert(emitted.map(t => (t._1, t._2)).distinct.length == emitted.length)
    // both close paths exercised
    assert(emitted.exists(_._5) && emitted.exists(!_._5),
      "expected both timer-closed and inline-closed sessions")

    // Batch truth: gap-sessionize the whole table, then keep every
    // non-final session plus each user's final session iff the FINAL
    // watermark (global max − 2h) passed its gap.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us", $"event_id")
    val sess = raw.select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("prev", lag($"us", 1).over(w))
      .withColumn("new_sess",
        when($"prev".isNull || $"us" - $"prev" > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg(min($"us").as("start_us"), max($"us").as("last_us"),
        count(lit(1)).as("n"), max($"sid").as("s"))
    val maxUs = raw.agg(max(unix_micros($"ts"))).first().getLong(0)
    val wmMs = maxUs / 1000L - 2L * 3600L * 1000L
    val lastSid = sess.groupBy($"user_id").agg(max($"sid").as("last_sid"))
    val expected = sess.join(lastSid, Seq("user_id"))
      .filter($"sid" < $"last_sid" ||
        ($"last_us" / 1000L + gapMin * 60L * 1000L) <= wmMs)
      .select($"user_id", $"start_us", $"last_us", $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val emittedSet = emitted.map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(emittedSet == expected,
      s"sizes emitted=${emittedSet.size} expected=${expected.size} " +
        s"missing=${(expected -- emittedSet).take(3)} extra=${(emittedSet -- expected).take(3)}")
  }

  test("flatMapGroupsWithState first-seen dedup matches batch window dedup") {
    import spark.implicits._
    val q = StreamingOps.firstSeen(spark, StreamingOps.eventsStream(spark, streamDir))
      .toDF()
      .writeStream.format("memory").queryName("firstseen_stream")
      .outputMode("append").trigger(Trigger.Once()).start()
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

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

  test("state data source: store read-back equals emissions, metadata names the variable") {
    import spark.implicits._
    // qTwsState reads RocksDB back through format("statestore"); every
    // persisted record must equal the final EMISSION qTwsProfile
    // derives for the same key — store and output are the same truth.
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, String)] =
      df.select($"user_id", $"n_events", $"total_cents", $"last_event_id",
        $"last_event_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
    val store = rows(StreamingOps.qTwsState(spark, dir))
    val emitted = rows(StreamingOps.qTwsProfile(spark, dir))
    assert(store.nonEmpty && store == emitted,
      s"store diverges from emissions: ${(store diff emitted).take(3)} / ${(emitted diff store).take(3)}")

    // the state-metadata source documents the operator and its state
    // variable — the discovery half of the introspection surface
    // (gated as q_tws_metadata; asserted here against the typed row)
    val meta = StreamingOps.qTwsMetadata(spark, dir).collect()
    assert(meta.exists(r =>
      r.getAs[String]("operator_name") == "transformWithStateExec" &&
        r.getAs[Boolean]("has_profile_var")),
      meta.map(_.toString).mkString("\n"))
  }

  test("state change feed under changelog checkpointing replays to the final store") {
    import spark.implicits._
    // Changelog checkpointing ships per-batch deltas instead of full
    // RocksDB snapshots — the commit-latency mode a deployment runs —
    // and is what makes the state source's CHANGE FEED readable: every
    // per-key update between two batches, as a batch DataFrame. The
    // feed's last update per key must reconstruct the store exactly.
    val d = java.nio.file.Files.createTempDirectory("events-tws-cf")
    val raw = StreamingOps.eventsBatch(spark, dir)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tws-cf-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    stage(raw.filter($"event_id" % 2 === 0), "f0.parquet", 1700000000000L)
    stage(raw.filter($"event_id" % 2 === 1), "f1.parquet", 1700000060000L)

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    val ck = java.nio.file.Files.createTempDirectory("tws-cf-ckpt").toString
    val typed = s2.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
      .as[StreamingOps.TwsEvent]
    val q = typed.groupByKey(_.user_id)
      .transformWithState(new StreamingOps.ProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_cf_spec").option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate within 120s")

    def reader = s2.read.format("statestore")
      .option("path", ck).option("stateVarName", "profile")
    val store = reader.load()
      .select($"key.value".as("u"), $"value.n".as("n"), $"value.cents".as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cf = reader
      .option("readChangeFeed", "true").option("changeStartBatchId", "0").load()
    assert(Set("batch_id", "change_type").subsetOf(cf.schema.fieldNames.toSet),
      cf.schema.treeString)
    val changes = cf
      .select($"batch_id", $"change_type",
        $"key.value".as("u"), $"value.n".as("n"), $"value.cents".as("c"))
      .collect()
    // every change in this workload is an update (nothing deletes state)
    assert(changes.nonEmpty && changes.forall(_.getAs[String]("change_type") == "update"),
      changes.take(3).mkString("\n"))
    // each key was written in both batches — the feed carries the
    // intermediate version too, not just the final image
    val byKey = changes.groupBy(_.getAs[Long]("u"))
    assert(byKey.values.forall(_.map(_.getAs[Long]("batch_id")).toSet == Set(0L, 1L)),
      "expected one change per key per batch")
    val replayed = byKey.map { case (u, rows) =>
      val last = rows.maxBy(_.getAs[Long]("batch_id"))
      u -> (last.getAs[Long]("n"), last.getAs[Long]("c"))
    }
    assert(replayed == store, "change-feed replay diverges from the store image")

    // time travel: batchId=0 reads the store AS OF the first batch —
    // each key's profile must count only the even-id half staged there
    val asOf0 = reader.option("batchId", "0").load()
      .select($"key.value".as("u"), $"value.n".as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val firstHalf = raw.filter($"event_id" % 2 === 0).groupBy($"user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(asOf0 == firstHalf, "batchId=0 snapshot diverges from first-batch truth")
  }

  test("state source reads ListState and MapState variables back") {
    import spark.implicits._
    // Introspection symmetry: the read-back surface must cover every
    // state primitive the engine gates, not just ValueState. ListState
    // flattens to one row per element; MapState to one row per entry
    // with the user map key alongside the grouping key.
    val d = java.nio.file.Files.createTempDirectory("events-tws-lmstate")
    val raw = StreamingOps.eventsBatch(spark, dir)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tws-lmstate-half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(mtime): Unit
    }
    stage(raw.filter($"event_id" % 2 === 0), "f0.parquet", 1700000000000L)
    stage(raw.filter($"event_id" % 2 === 1), "f1.parquet", 1700000060000L)

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def typed = s2.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
      .as[StreamingOps.TwsEvent]
    def run(name: String, ck: String,
            f: org.apache.spark.sql.KeyValueGroupedDataset[Long, StreamingOps.TwsEvent] =>
              org.apache.spark.sql.DataFrame): Unit = {
      val q = f(typed.groupByKey(_.user_id))
        .writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), s"$name did not terminate")
    }
    val ckL = java.nio.file.Files.createTempDirectory("tws-lstate-ckpt").toString
    val ckM = java.nio.file.Files.createTempDirectory("tws-mstate-ckpt").toString
    run("lm_lastk", ckL, _.transformWithState(new StreamingOps.LastKProcessor(3),
      org.apache.spark.sql.streaming.TimeMode.None(),
      org.apache.spark.sql.streaming.OutputMode.Append()).toDF())
    run("lm_counts", ckM, _.transformWithState(new StreamingOps.TypeCountsProcessor,
      org.apache.spark.sql.streaming.TimeMode.None(),
      org.apache.spark.sql.streaming.OutputMode.Append()).toDF())

    // ListState: element rows must reassemble each key's final top-K set
    val listDf = s2.read.format("statestore")
      .option("path", ckL).option("stateVarName", "lastk").load()
    val elemCol = listDf.schema.fieldNames
      .find(n => n != "key" && n != "partition_id")
      .getOrElse(fail(listDf.schema.treeString))
    val listBack = listDf
      .select($"key.value".as("u"), col(s"$elemCol.event_id").as("eid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val listTruth = s2.table("lm_lastk")
      .groupBy($"user_id").agg(max_by($"ids", $"upd_seq").as("ids"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Seq[Long]]("ids").toSet).toMap
    assert(listBack.nonEmpty && listBack == listTruth,
      s"ListState read-back diverges; schema was ${listDf.schema.treeString}")

    // MapState: entry rows must equal each (user, type)'s final counts
    val mapDf = s2.read.format("statestore")
      .option("path", ckM).option("stateVarName", "perType").load()
    assert(mapDf.schema.fieldNames.contains("user_map_key"), mapDf.schema.treeString)
    val mapBack = mapDf
      .select($"key.value".as("u"), $"user_map_key.value".as("t"),
        $"user_map_value.n".as("n"), $"user_map_value.cents".as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val mapTruth = s2.table("lm_counts")
      .groupBy($"user_id", $"event_type")
      .agg(max_by(struct($"n", $"cents"), $"upd_seq").as("f"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[org.apache.spark.sql.Row]("f").getAs[Long]("n"),
          r.getAs[org.apache.spark.sql.Row]("f").getAs[Long]("cents")))
      .toMap
    assert(mapBack.nonEmpty && mapBack == mapTruth,
      s"MapState read-back diverges; schema was ${mapDf.schema.treeString}")
  }
}
