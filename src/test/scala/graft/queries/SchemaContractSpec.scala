package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver owns /root/testdata and has regenerated it mid-build once
  * already (r10: events.ts flipped from TIMESTAMP(NANOS) to naive
  * timestamp[us], silently breaking 28 gate keys). This spec is the
  * tripwire for the next drift: it pins every table's LOADED schema to
  * the type set the query layer actually supports, so a future
  * regeneration fails loudly in ONE place with a message naming the
  * adaptive seam to extend — not as two dozen scattered analysis
  * errors.
  *
  * Timestamp-bearing columns accept the three physical flavors the
  * engine normalizes (legacy nanos-as-long, naive µs / TIMESTAMP_NTZ,
  * tz-adjusted µs); everything else is exact. The second half proves
  * the events seam end-to-end: the SAME rows materialized in all three
  * flavors must produce identical normalized output from Tables.events
  * and identical results from a gated events query.
  */
class SchemaContractSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Flavors a logical timestamp may arrive in; the seam that widens
    * this set is Tables.events (and StreamingOps.eventsSchema for the
    * file-stream path). */
  private val TimestampFlavors: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  private def exact(dt: DataType): Set[DataType] = Set(dt)

  // Logical contract per table: column name -> acceptable loaded types,
  // in order. A name/type/order drift fails with the seam to extend.
  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> exact(IntegerType), "r_name" -> exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> exact(IntegerType), "n_name" -> exact(StringType),
      "n_regionkey" -> exact(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> exact(LongType), "c_name" -> exact(StringType),
      "c_nationkey" -> exact(IntegerType), "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> exact(LongType), "s_name" -> exact(StringType),
      "s_nationkey" -> exact(IntegerType), "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> exact(LongType), "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> exact(IntegerType), "p_retailprice" -> exact(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> exact(LongType), "o_custkey" -> exact(LongType),
      "o_orderstatus" -> exact(StringType), "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> TimestampFlavors, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> exact(LongType), "l_partkey" -> exact(LongType),
      "l_suppkey" -> exact(LongType), "l_linenumber" -> exact(IntegerType),
      "l_quantity" -> exact(DoubleType), "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType), "l_linestatus" -> exact(StringType),
      "l_shipdate" -> TimestampFlavors),
    "events" -> Seq(
      "event_id" -> exact(LongType), "ts" -> TimestampFlavors,
      "user_id" -> exact(LongType), "event_type" -> exact(StringType),
      "value" -> exact(DoubleType), "props" -> exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> exact(LongType), "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> exact(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> exact(LongType),
      "embedding" -> exact(ArrayType(FloatType, containsNull = true)),
      "label" -> exact(IntegerType)))

  test("every testdata table loads with a schema the query layer supports") {
    // nanosAsLong is set at builder level in tests so the raw
    // inference read here can see a legacy-nanos file at all; the
    // query layer itself reads events under explicit footer-derived
    // schemas (Tables.tsFlavor) and needs no session conf.
    contract.foreach { case (table, cols) =>
      val loaded = spark.read.parquet(s"$dir/$table.parquet").schema
      assert(loaded.fields.length == cols.length,
        s"$table: driver regenerated testdata with ${loaded.fields.length} columns, " +
          s"contract has ${cols.length} — update SchemaContractSpec AND audit the " +
          s"queries over $table")
      loaded.fields.zip(cols).foreach { case (f, (name, allowed)) =>
        assert(f.name == name,
          s"$table.$name: loaded column is named ${f.name} — testdata drifted; " +
            s"update the contract and the queries reading it")
        assert(allowed.contains(f.dataType),
          s"$table.$name loads as ${f.dataType}, supported: ${allowed.mkString(", ")} — " +
            s"extend the adaptive seam (Tables.events / StreamingOps.eventsSchema " +
            s"for timestamps; the reading queries otherwise) before trusting the gate")
      }
    }
  }

  /** Normalized events view, collected in a canonical order/shape. */
  private def canon(path: String): Seq[(Long, Long, Long, Long, String, Double)] = {
    import spark.implicits._
    Tables.events(spark, path)
      .select($"event_id", unix_micros($"ts").as("us"), $"ts_ns", $"user_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, Long, String, Double)]
      .collect().sortBy(_._1).toSeq
  }

  test("Tables.events yields identical output across all three physical ts flavors") {
    import spark.implicits._
    val base = Tables.events(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("events-flavors")
    val flavors = Map(
      // tz-adjusted µs instant (what our own staging writes)
      "ltz" -> base.drop("ts_ns"),
      // naive µs wall-clock — the r10 driver-generated layout
      "ntz" -> base.withColumn("ts", $"ts".cast(TimestampNTZType)).drop("ts_ns"),
      // raw ns-since-epoch INT64 — the legacy nanos layout as the
      // LongType branch sees it after nanosAsLong
      "ns_long" -> base.withColumn("ts", $"ts_ns").drop("ts_ns"))
    val outs = flavors.map { case (name, df) =>
      val d = root.resolve(name).toString
      df.write.mode("overwrite").parquet(s"$d/events.parquet")
      name -> canon(d)
    }
    val ltz = outs("ltz")
    assert(ltz.nonEmpty)
    outs.foreach { case (name, rows) =>
      assert(rows == ltz, s"flavor $name diverges from ltz after normalization")
    }

    // And through a real gated query: the hourly rollup must not care
    // which physical flavor the lake delivered.
    val perFlavor = flavors.keys.map { name =>
      val d = root.resolve(name).toString
      name -> Relational.qHourlyEvents(spark, d).collect().toSeq
    }.toMap
    val ref = perFlavor("ltz")
    assert(ref.nonEmpty)
    perFlavor.foreach { case (name, rows) =>
      assert(rows == ref, s"q_hourly_events under flavor $name diverges")
    }

    // And through the STREAMING file source: eventsStream declares its
    // schema from the same footer inspection, so each flavor must
    // replay to the identical (event_id, µs) set — this is the cell
    // that catches a testdata regeneration breaking the streaming keys
    // while the batch seam silently adapts (r11 advice).
    val streamed = flavors.keys.map { name =>
      val d = root.resolve(name).resolve("events.parquet").toString
      val q = graft.streaming.StreamingOps.eventsStream(spark, d)
        .select($"event_id", unix_micros($"ts").as("us"))
        .writeStream.format("memory").queryName(s"flavor_$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), s"flavor $name stream did not terminate")
      name -> spark.table(s"flavor_$name").as[(Long, Long)].collect().sortBy(_._1).toSeq
    }.toMap
    val streamRef = streamed("ltz")
    assert(streamRef.nonEmpty &&
      streamRef == ltz.map(r => (r._1, r._2)), "streamed ltz diverges from batch canon")
    streamed.foreach { case (name, rows) =>
      assert(rows == streamRef, s"eventsStream under flavor $name diverges")
    }
  }

  test("Tables.events output is independent of the session time zone") {
    // The loader reads every flavor under an explicit schema that takes
    // the raw µs/ns value as a UTC instant — a driver-owned session in
    // a non-UTC zone must see the SAME instants (no silent wall-clock
    // shift against the oracle), and the loader must not mutate any
    // session conf to achieve it.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val before = s2.conf.getAll
    import s2.implicits._
    val shifted = Tables.events(s2, dir)
      .select($"event_id", unix_micros($"ts").as("us"), $"ts_ns")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(s2.conf.getAll == before, "Tables.events mutated the caller's session conf")
    val utc = canon(dir).map(r => (r._1, r._2, r._3))
    assert(shifted == utc, "event instants shift with the session time zone")
  }

  test("epoch-day bucketing floors (never truncates) across the 1970 boundary") {
    // q_user_retention's day bucket is integer floor division of the
    // µs instant: DIV minus one when the remainder is negative. The
    // oracle's `//` floors, so a truncating Spark twin would diverge
    // by one day for every pre-1970 instant — the fixture is all
    // post-epoch, so only this test exercises the sign branch.
    val expr = "CAST(us AS BIGINT) DIV 86400000000 + " +
      "(CASE WHEN CAST(us AS BIGINT) % 86400000000 < 0 THEN -1 ELSE 0 END)"
    import spark.implicits._
    val us = Seq(-86400000001L, -86400000000L, -1L, 0L, 1L,
      86399999999L, 86400000000L, 86400000001L)
    val got = us.toDF("us").selectExpr(s"$expr AS d").as[Long].collect().toSeq
    val want = us.map(x => Math.floorDiv(x, 86400000000L))
    assert(got == want, s"floor-div mismatch: $got vs $want")
  }
}
