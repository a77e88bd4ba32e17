package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import Tables._

/** Relational query surface over the driver testdata.
  *
  * Covers the Spark operator surface the reference exercises (SURVEY.md
  * §2.2: scans, projection, filter, hash aggregation, window dedup,
  * string/math/cast/date functions, JSON round-trip, union, limit) plus
  * joins to prove the engine surface. Scale notes per query:
  * small dimensions are broadcast explicitly; aggregations are
  * partial-aggregate friendly (plain groupBy on low-cardinality keys);
  * windows partition on high-cardinality keys so state stays bounded.
  */
object Relational {

  /** TPC-H Q1 flavored pricing summary: hash aggregate with map-side
    * partial aggregation; 4 output groups. Scales linearly, no skew. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("long")).as("sum_qty"),
        dsum2($"l_extendedprice").as("sum_base_price"),
        dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        (sum($"l_quantity".cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
        davg2($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3 flavored: two joins + agg + top-k. customer scales with
    * SF (3M+ BUILDING rows at sf100) so no broadcast hint — AQE picks
    * broadcast when the runtime size is under threshold and a shuffle
    * hash join otherwise; orders⋈lineitem shuffles on orderkey. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val o = t(s, dir, "orders").filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = t(s, dir, "lineitem").filter($"l_shipdate" > cutoff)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 flavored: revenue per nation within one region. Only the
    * fixed-size dimensions (region: 5 rows, nation: 25) carry broadcast
    * hints — customer/supplier/orders/lineitem all scale with SF, so
    * their joins are left to AQE (shuffle hash join on the keyed
    * columns at 100 TB; a forced broadcast there would OOM the driver
    * at sf100+). */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1999-01-01").cast("timestamp")
    val r = t(s, dir, "region").filter($"r_name" === "ASIA")
    val n = t(s, dir, "nation")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val c = t(s, dir, "customer").join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey", $"n_name")
    val o = t(s, dir, "orders")
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
      .select($"o_orderkey", $"o_custkey")
    val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val l = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** when/otherwise conditional tagging (ref uses when(col<5,...) in its
    * sink tests — DnsSinkRelationProviderTest.java:201). */
  def qPriceBucketWhen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .withColumn("bucket",
        when($"o_totalprice" >= 300000.0, "high")
          .when($"o_totalprice" >= 100000.0, "mid")
          .otherwise("low"))
      .groupBy($"o_orderstatus", $"bucket")
      .agg(count(lit(1)).as("n"), dsum2($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus", $"bucket")
  }

  /** Ranking window: top-3 parts per brand. Partition key (brand) is
    * low-cardinality here but bounded state per group at scale. */
  def qWindowTopkParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    t(s, dir, "part")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"p_brand", $"rn".cast("long").as("rn"), $"p_partkey", $"p_retailprice")
      .orderBy($"p_brand", $"rn")
  }

  /** Arg-top-k WITHOUT a window — the scale twin of
    * [[qWindowTopkParts]]: top-3 parts per brand by retail price,
    * computed by the typed [[graft.functions.TopKAgg]] aggregator
    * instead of `row_number` over a partition. The window form sorts
    * every brand's full row set (and a skewed brand sorts in ONE
    * task); the aggregator's buffer is ≤ k pairs per group and
    * partial-aggregates map-side, so shuffle volume is brands × k —
    * independent of row count. Measured honestly at sf0.1 the window
    * form is FASTER (0.23 vs 0.43 s: every group fits one task and
    * the udaf pays typed-encoder dispatch), so the window stays the
    * small-data default; the aggregator is the shape that survives a
    * group too large or too skewed for one task's sort. Same rows out
    * (same score, same id tie-break), which is the gate: the oracle
    * is the window query. */
  def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top3 = udaf(new graft.functions.TopKAgg(3))
    t(s, dir, "part")
      .groupBy($"p_brand")
      .agg(top3($"p_partkey",
        round($"p_retailprice" * 100).cast("long")).as("tops"))
      .select($"p_brand", posexplode($"tops"))
      .select($"p_brand", ($"pos" + 1).cast("long").as("rn"),
        $"col._1".as("p_partkey"), $"col._2".as("price_cents"))
      .orderBy($"p_brand", $"rn")
  }

  /** Last-write-wins dedup — the reference's only true aggregation
    * (DnsUpdate.java:46-54: group by record identity, keep max
    * timestamp). Window row_number over (key ORDER BY ts DESC) with an
    * id tiebreak; partitions on high-cardinality (user_id, event_type)
    * so it scales via hash shuffle. */
  def qLwwDedupEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts_ns".desc, $"event_id".desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"value")
      .orderBy($"user_id", $"event_type")
  }

  /** Field-level survivorship merge (MDM "golden record"): one profile
    * row per user whose fields each carry the LATEST value from the
    * event type that feeds them — click/view props and purchase cents
    * merge independently, null where the user never emitted that type.
    * This is NOT [[qLwwMaxBy]] (one whole-row winner per (key, type)):
    * survivorship resolves each FIELD separately via
    * `max_by(...) FILTER (WHERE type = ...)`, so ONE aggregation pass
    * holds ≤ 1 value per field per key — map-side partial (plans as
    * SortAggregate: the struct-ordered max_by buffer is not
    * fixed-width, so each partition sorts by user_id first — the
    * partial/final split is unchanged), no window, no self-join of
    * per-type extracts. The 100 TB shape for
    * building a profile store from an event log: one shuffle at user
    * cardinality regardless of history length. Same struct(ts_ns,
    * event_id) tiebreak as the LWW keys; cents via round-then-cast
    * (double→long truncation diverges between engines). */
  def qSurvivorship(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"user_id", $"event_type", $"ts_ns", $"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr("max(ts_ns div 1000)").as("last_seen_micros"),
        expr("max_by(k, struct(ts_ns, event_id)) FILTER (WHERE event_type = 'click')").as("click_k"),
        expr("max_by(k, struct(ts_ns, event_id)) FILTER (WHERE event_type = 'view')").as("view_k"),
        // conditional field: latest BIG purchase (>= $200) — null for
        // most users at gate SF, so the merge's null-preservation is
        // exercised by the oracle compare, not just claimed
        expr("max_by(cents, struct(ts_ns, event_id)) FILTER (WHERE event_type = 'purchase' AND cents >= 20000)").as("big_purchase_cents"))
      .orderBy($"user_id")
  }

  /** LWW dedup in aggregation form — same contract as
    * [[qLwwDedupEvents]] but via `max_by` (reference's
    * groupingBy+maxBy shape, DnsUpdate.java:46-54): one aggregation
    * with map-side partial `max_by`. The struct-typed buffer (payload
    * struct + struct tiebreak) is not mutable-width, so it plans as a
    * SortAggregate — each partition sorts by the GROUP key first (r20
    * sweep; the q_tws_counts primitive-split trick does not apply
    * because the tiebreak itself must be a struct: ts_ns collides and
    * no bounded packing of (ts_ns, event_id) into one long is safe at
    * scale). The claim that survives is the state/shuffle one: ≤ 1
    * record per key partial-aggregated map-side, so at 100 TB this
    * still beats the window form whenever per-key history is long —
    * shuffle is keys, not history, and the map-side sort is by group
    * key, not a per-key history sort. */
  def qLwwMaxBy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Tiebreak: max_by alone has no defined winner on equal ts_ns, and
    // the oracle's two arg_max calls could each pick a different tied
    // row. Ordering by struct(ts_ns, event_id) — unique since event_id
    // is — makes the winner deterministic and identical cross-engine.
    t(s, dir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(max_by(struct($"event_id", $"value"), struct($"ts_ns", $"event_id")).as("w"))
      .select($"user_id", $"event_type", $"w.event_id".as("event_id"), $"w.value".as("value"))
      .orderBy($"user_id", $"event_type")
  }

  /** Union with deletes-before-adds ordering (ref emits IXFR deletes
    * before adds — Xfr.java:55-66); the `ord` column makes the
    * semantic order explicit. NOTE on the final orderBy: the output is
    * input-sized, so a global range-sort of it is NOT the 100 TB plan —
    * it exists solely because the driver's hash-compare is row-order
    * sensitive. The scale deliverable is the unsorted union (consumers
    * that need order use `ord` per partition via sortWithinPartitions). */
  def qUnionChanges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val deletes = ev.filter($"event_type" === "error")
      .select(lit("IXFR_DELETE").as("action"), lit(0).as("ord"), $"user_id", $"event_id")
    val adds = ev.filter($"event_type" === "purchase")
      .select(lit("IXFR_ADD").as("action"), lit(1).as("ord"), $"user_id", $"event_id")
    deletes.unionByName(adds).orderBy($"ord", $"event_id")
  }

  /** String pipeline mirroring the reference's fqdn handling: build an
    * fqdn (concat/lower — DnsChangeFactory.java:20), normalize to
    * absolute form (DnsPartitionHandler.java:85-94), derive the zone by
    * stripping the first label (DnsPartitionHandler.java:52-62). */
  def qZoneDerive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .withColumn("host", lower(regexp_replace($"c_name", "[^A-Za-z0-9]", "-")))
      .withColumn("fqdn_raw", concat($"host", lit("."), lower($"n_name"), lit(".acme")))
      .withColumn("fqdn",
        when($"fqdn_raw".endsWith("."), $"fqdn_raw")
          .otherwise(concat($"fqdn_raw", lit("."))))
      .withColumn("zone", expr("substring(fqdn, instr(fqdn, '.') + 1)"))
      .groupBy($"zone").agg(count(lit(1)).as("n_hosts"))
      .orderBy($"zone")
  }

  /** JSON round-trip (ref packs rows via to_json(struct(*)) and decodes
    * per partition — DnsSinkRelationProvider.java:25-27): re-encode the
    * events row to JSON, extract a field back out, aggregate. */
  def qJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .withColumn("packed", to_json(struct($"event_id", $"k")))
      .withColumn("k2", get_json_object($"packed", "$.k").cast("long"))
      .groupBy(($"k2" % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum($"k2").as("sum_k"))
      .orderBy($"k_mod")
  }

  /** Semi-structured ingest through Spark 4's native VariantType —
    * the modern replacement for string-JSON probing (`q_json_roundtrip`
    * is the legacy `get_json_object` form): `parse_json` once into the
    * binary variant encoding, then typed path extraction
    * (`variant_get`), schema-on-read tolerance (`try_variant_get` of a
    * path only SOME rows carry → null, not error), and schema
    * inference (`schema_of_variant`) — the exact shape of reading a
    * heterogeneous event lake where producers add fields over time.
    *
    * The fixture document is built closed-form from the row (nested
    * `who` object, the props `k`, and an `extra` field planted only on
    * event_id % 7 == 0 — two live schemas per event type), so the
    * DuckDB oracle rebuilds every aggregate from the RAW COLUMNS
    * without parsing anything: a wrong build, parse, extraction, cast,
    * or null-vs-error decision anywhere moves a gated cell.
    *
    * Scale shape: pure per-row map work (build → parse → extract all
    * codegen-adjacent, no UDF) into one bounded event-type rollup —
    * and the variant encoding is the part that matters at 100 TB:
    * parse once, probe many paths in binary, instead of re-parsing the
    * JSON string per `get_json_object` call. */
  def qVariantExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", expr(
        // the fixture contract says every props carries $.k; concat is
        // null-propagating, so a missing $.k would otherwise yield a
        // silent NULL variant that only surfaces as an aggregate
        // mismatch (r15 advice) — fail loudly at the source instead
        """parse_json(concat(
          |  '{"who":{"id":', user_id, ',"t":"', event_type, '"},',
          |  '"k":', coalesce(get_json_object(props, '$.k'),
          |            raise_error('q_variant_extract: events row missing $.k in props — fixture contract violated')),
          |  IF(event_id % 7 = 0, concat(',"extra":', event_id % 100), ''),
          |  '}'))""".stripMargin).as("v"))
      .select($"event_type",
        expr("variant_get(v, '$.who.id', 'bigint')").as("uid"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.extra', 'bigint')").as("extra"),
        expr("schema_of_variant(v)").as("sch"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"uid").as("sum_uid"),
        sum($"k").as("sum_k"),
        count($"extra").as("n_extra"),
        sum(coalesce($"extra", lit(0L))).as("sum_extra"),
        countDistinct($"sch").as("n_schemas"))
      .orderBy($"event_type")
  }

  /** Aggregation stats: count / count distinct / min / max / exact avg. */
  def qAggStatsOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"),
        davg2($"o_totalprice").as("avg_price"))
      .orderBy($"o_orderstatus")
  }

  /** Semi/anti joins (EXISTS / NOT EXISTS): customers with vs without
    * orders, per market segment. Both sides scale with SF, so this is a
    * plain shuffle semi/anti join on the key column. */
  def qSemiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val keys = t(s, dir, "orders").select($"o_custkey")
    val withO = c.join(keys, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("with_orders"))
    val without = c.join(keys, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("without_orders"))
    withO.unionByName(without)
      .select($"c_mktsegment", $"kind", $"n")
      .orderBy($"c_mktsegment", $"kind")
  }

  /** Time-bucketed aggregation — the batch equivalent of the streaming
    * windowed count (graft.streaming). Hour truncation keeps ns-precision
    * parquet timestamps comparable across engines. */
  def qHourlyEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum2($"value").as("total_value"))
      .orderBy($"hour_ts", $"event_type")
  }

  /** Cohort retention over the event log: cohort = a user's first
    * active day; output = distinct active users per (cohort day,
    * day offset) — the classic product-analytics rollup, covering the
    * first-touch + join-back + time-offset shape. One partial-agg min
    * per user, one hash join back on the high-cardinality user_id,
    * one partial-agg rollup on the bounded (cohort, offset) key.
    * Day arithmetic is date-exact (UTC session tz both engines). */
  def qUserRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Day bucketing is ARITHMETIC on the µs instant (UTC epoch days),
    // never date_trunc/to_date — those interpret the instant in the
    // SESSION zone, and a non-UTC driver session would silently shift
    // cohort boundaries against the oracle (caught by the timezone
    // verification cell). The calendar type reappears only in the
    // final projection, built from the zone-free day number.
    // FLOOR division, not DIV: Spark's DIV truncates toward zero while
    // the oracle's // floors — divergent by one day for pre-1970
    // instants. Integer-only correction (DIV minus one when the
    // remainder is negative — remainder sign follows the dividend)
    // keeps the whole path in long arithmetic; the branch never fires
    // on post-epoch data but stays sign-correct before it.
    val ev = t(s, dir, "events")
      .select($"user_id",
        expr("unix_micros(ts) DIV 86400000000 + " +
          "(CASE WHEN unix_micros(ts) % 86400000000 < 0 THEN -1 ELSE 0 END)").as("d"))
    val first = ev.groupBy($"user_id").agg(min($"d").as("cd"))
    ev.join(first, Seq("user_id"))
      .groupBy($"cd", ($"d" - $"cd").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .select(date_add(lit(java.sql.Date.valueOf("1970-01-01")), $"cd".cast("int"))
        .as("cohort_day"), $"day_offset", $"n_users")
      .orderBy($"cohort_day", $"day_offset")
  }

  /** Ordered event funnel: users who viewed, then clicked strictly
    * after their first view, then purchased strictly after their first
    * click — conversion counting with ORDER, not mere co-occurrence.
    * One conditional-min aggregation per user (partial-agg friendly,
    * 3 timestamps of state per user), then a single global count row.
    * Timestamp comparisons are µs-exact in both engines; NULL step
    * times drop out of the strict comparisons identically. */
  def qEventFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firsts = t(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("t_view"),
        min(when($"event_type" === "click", $"ts")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts")).as("t_buy"))
    firsts.agg(
      count($"t_view").as("n_view"),
      count(when($"t_click" > $"t_view", 1)).as("n_view_click"),
      count(when($"t_click" > $"t_view" && $"t_buy" > $"t_click", 1))
        .as("n_view_click_buy"))
  }

  /** Gap-based sessionization: a 30-minute silence starts a new session
    * per user. lag + running sum over (user, time) windows — the
    * cumulative-frame window class (ROWS UNBOUNDED PRECEDING), distinct
    * from the ranking windows elsewhere. One hash exchange on user_id;
    * per-user state is a sorted run, bounded by per-user history.
    * Arithmetic is µs-exact: `ts_ns div 1000` truncates exactly like
    * DuckDB's nanos-parquet reader (verified: the reader truncates, it
    * does not round), so the engines see identical integers. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val cum = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select($"user_id", $"event_id", expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_ts", lag($"ts_us", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ts".isNull || $"ts_us" - $"prev_ts" > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_seq", sum($"new_sess").over(cum))
      .groupBy($"user_id", $"sess_seq")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_us").as("start_us"),
        max($"ts_us").as("end_us"))
      .select($"user_id", $"sess_seq", $"n_events",
        ($"end_us" - $"start_us").as("span_us"))
      .orderBy($"user_id", $"sess_seq")
  }

  /** ROLLUP over (status, priority): per-group, per-status subtotal and
    * grand total in one pass — Spark expands grouping sets into one
    * aggregation with a grouping id, still partial-aggregated map-side.
    * Null grouping keys are disambiguated via grouping() so the oracle
    * comparison never depends on engine null-ordering. */
  def qRollupOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(
        // grouping() is only resolvable inside the rollup's agg list
        (grouping($"o_orderstatus") * 2 + grouping($"o_orderpriority")).cast("long").as("gid"),
        count(lit(1)).as("n_orders"), dsum2($"o_totalprice").as("revenue"))
      .select($"gid",
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"revenue")
      .orderBy($"gid", $"status", $"priority")
  }

  /** As-of join without a join: for each purchase, the most recent
    * click at-or-before it by the same user. Implemented in the
    * union-window ("piggyback") form: tag both streams, union them, and
    * take last(click_ts, ignoreNulls) over (user ORDER BY ts, tag) —
    * ONE hash exchange plus a sort, no range join, no per-key quadratic
    * probing. At 100 TB this is the shape that wins: a generic
    * range/ASOF join needs an interval index or per-key buffering,
    * while the union window is the TeraSort-shaped window Spark
    * already scales linearly. Clicks order before purchases at equal
    * timestamps (ord 0 < 1), giving the ASOF `>=` tie contract; a
    * purchase with no prior click reports gap_us = -1 (left-join
    * semantics, kept integer to avoid cross-engine NULL/NaN hazards). */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"user_id", $"event_id", expr("ts_ns div 1000").as("ts_us"), $"event_type")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", lit(0).as("ord"),
        lit(null).cast("long").as("p_event"), $"ts_us".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us", lit(1).as("ord"),
        $"event_id".as("p_event"), lit(null).cast("long").as("click_ts"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click", last($"click_ts", ignoreNulls = true).over(w))
      .filter($"ord" === 1)
      .select($"user_id", $"p_event".as("event_id"),
        coalesce($"ts_us" - $"last_click", lit(-1L)).as("gap_us"))
      .orderBy($"user_id", $"event_id")
  }

  /** SCD-2 point-in-time dimension lookup — the warehouse shape for
    * "which tier was this user in WHEN the event happened": a
    * versioned dimension (user × validity window × tier) joined to
    * facts on the key PLUS a timestamp-in-window predicate. The dim
    * is constructed formulaically (three versions per user at the
    * global time-range thirds, tier = (user + version) % 5) so the
    * oracle replays it exactly.
    *
    * Scale shape: the join is EQUI on the key with the range check as
    * a residual filter — a BroadcastHashJoin here (SCD-2 dims are
    * dimension-sized), a bucketed-by-key join when the dim outgrows
    * broadcast; never a range join (no interval index needed when the
    * key carries the join). Validity windows partition time, so each
    * fact matches exactly one version — row counts are gate-checked,
    * a gap or overlap in the window arithmetic double-counts or drops
    * and breaks n_events. */
  def qScd2Lookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id",
      expr("ts_ns div 1000").as("ts_us"),
      round($"value" * 100).cast("long").as("cents"))
    val bounds = ev.agg(min($"ts_us").as("lo"), max($"ts_us").as("hi"))
      .localCheckpoint()
    val dim = ev.select($"user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select($"user_id", explode(expr("array(0L, 1L, 2L)")).as("v"),
        $"lo", $"hi")
      .select($"user_id".as("d_user"), $"v",
        expr("lo + ((hi - lo + 1) * v) DIV 3").as("vfrom"),
        expr("lo + ((hi - lo + 1) * (v + 1)) DIV 3 - 1").as("vto"),
        (($"user_id" + $"v") % 5).as("tier"))
    ev.join(broadcast(dim),
        $"user_id" === $"d_user" &&
          $"ts_us" >= $"vfrom" && $"ts_us" <= $"vto")
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("sum_cents"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"tier")
  }

  /** Range-join attribution via time-bucketing: clicks in the hour
    * before each purchase, per purchase. A naive range join is
    * O(clicks × purchases) per user; bucketing time by the window width
    * makes it an equi-join on (user, bucket) where each purchase probes
    * exactly two buckets — candidate volume is bounded by per-bucket
    * event rate, never by history length, and no (click, purchase)
    * pair can match through both buckets, so there is no dedup stage.
    * Zero-click purchases re-enter via a left join on the purchase set. */
  def qClickAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val winUs = 3600L * 1000000L
    val ev = t(s, dir, "events")
      .select($"user_id", $"event_id", expr("ts_ns div 1000").as("ts_us"), $"event_type")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_us".as("c_ts"))
      .withColumn("bucket", expr("c_ts div 3600000000"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_us".as("p_ts"))
    val counts = purchases
      .withColumn("bucket", explode(array(expr("p_ts div 3600000000"),
        expr("p_ts div 3600000000 - 1"))))
      .join(clicks, Seq("user_id", "bucket"))
      .filter($"c_ts" > $"p_ts" - winUs && $"c_ts" <= $"p_ts")
      .groupBy($"event_id").agg(count(lit(1)).as("cnt"))
    purchases.join(counts, Seq("event_id"), "left")
      .select($"event_id", $"user_id", coalesce($"cnt", lit(0L)).as("n_clicks"))
      .orderBy($"event_id")
  }

  /** RANGE-frame rolling window: each user's peak events-per-trailing-
    * hour. A RANGE frame bounds window state by TIME, not row count —
    * the frame buffer holds one hour of a user's events no matter how
    * long the history, the property that keeps window memory flat at
    * 100 TB. (The ROWS-frame classes are covered by q_sessionize and
    * q_window_topk_parts; this is the third, value-bounded class.) */
  def qRollingPeak(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-3600000000L, 0L)
    t(s, dir, "events")
      .select($"user_id", expr("ts_ns div 1000").as("ts_us"))
      .withColumn("c1h", count(lit(1)).over(w))
      .groupBy($"user_id")
      .agg(max($"c1h").as("peak_1h"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** Two-phase salted aggregation for skewed group keys: phase 1
    * aggregates on (key, salt) — a 16-way fan-out of every hot key —
    * phase 2 combines the partials on the key alone. A single-phase
    * groupBy on a 5-value key funnels each value through one reducer;
    * the salt caps any reducer's input at 1/16 of a key. Spark's
    * map-side partial aggregation usually makes this moot for algebraic
    * aggregates (documented in SCALE.md); the two-phase form is THE fix
    * when partial agg is off or per-group state is large (collect_set,
    * exact distincts). The salt is hash-derived (retry-deterministic,
    * never rand()), and sums stay decimal-exact across both phases, so
    * the result is bit-identical to the plain groupBy the oracle runs. */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(16)))
      .groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("n_part"),
        sum($"value".cast(DecimalType(18, 2))).as("v_part"))
      .groupBy($"event_type")
      .agg(sum($"n_part").as("n"), sum($"v_part").cast("double").as("total_value"))
      .orderBy($"event_type")
  }

  /** Salted skewed join through [[graft.operators.SaltedJoin]]: the
    * event log (skewed fact) joins the customer dim on (key, salt),
    * the dim replicated salts-ways — each hot user's rows spread over
    * 8 reducers instead of one straggler. The oracle runs the plain
    * join: salting must be result-invisible. */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id", $"value")
    val cust = t(s, dir, "customer")
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    graft.operators.SaltedJoin.inner(ev, cust, "user_id", 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum2($"value").as("total_value"))
      .orderBy($"c_mktsegment")
  }

  /** Pivot: order counts per status × priority, priorities as columns.
    * The EXPLICIT value list matters at scale: with it, pivot is one
    * aggregation pass (map-side partials, 5 conditional counts per
    * group); without it Spark first runs a distinct-values job over the
    * pivot column — an extra full pass that's never acceptable on a
    * scaling column. Missing cells coalesce to 0. */
  def qPivotPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prio = Seq("1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
      "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_not_specified",
      "5-LOW" -> "p5_low")
    val pivoted = t(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority", prio.map(_._1))
      .agg(count(lit(1)))
    prio.foldLeft(pivoted) { case (df, (v, alias)) =>
        df.withColumn(alias, coalesce(col(s"`$v`"), lit(0L)))
      }
      .select($"o_orderstatus" +: prio.map(p => col(p._2)): _*)
      .orderBy($"o_orderstatus")
  }

  /** CUBE over (lang, source): all four grouping sets — per-pair,
    * per-lang, per-source, grand total — in ONE partial-aggregated
    * pass (Spark expands the sets with a grouping id and still
    * combines map-side). grouping() disambiguates real NULLs from
    * subtotal rows, same contract as [[qRollupOrders]]. */
  def qCubeDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .cube($"lang", $"source")
      .agg(
        (grouping($"lang") * 2 + grouping($"source")).cast("long").as("gid"),
        count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .select($"gid", coalesce($"lang", lit("ALL")).as("lang"),
        coalesce($"source", lit("ALL")).as("source"), $"n_docs", $"total_chars")
      .orderBy($"gid", $"lang", $"source")
  }

  /** FULL OUTER join reconciliation: per-user order activity vs event
    * activity, classified both/orders_only/events_only — the audit
    * shape for "which ids exist on which side". Both inputs are
    * pre-aggregated to one row per key BEFORE the join (partial-agg
    * map-side), so the full-outer shuffle carries key-cardinality rows,
    * not raw fact rows, and the rollup output is 3 rows. */
  def qFullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .groupBy($"o_custkey".as("o_uid")).agg(count(lit(1)).as("n_orders"))
    val e = t(s, dir, "events")
      .groupBy($"user_id".as("e_uid")).agg(count(lit(1)).as("n_events"))
    o.join(e, $"o_uid" === $"e_uid", "full_outer")
      .select(
        when($"o_uid".isNull, "events_only")
          .when($"e_uid".isNull, "orders_only").otherwise("both").as("side"),
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_events", lit(0L)).as("n_events"))
      .groupBy($"side")
      .agg(count(lit(1)).as("n_users"), sum($"n_orders").as("total_orders"),
        sum($"n_events").as("total_events"))
      .orderBy($"side")
  }

  /** INTERSECT / EXCEPT set reconciliation between the event-user and
    * customer id sets, as one row of counts. Spark plans INTERSECT and
    * EXCEPT as hash semi/anti joins over distinct inputs — same scale
    * shape as [[qSemiAntiJoin]]; the three 1-row counts combine by
    * broadcast crossJoin (never a shuffle). */
  /** One-pass column profiling (the Deequ/ingest-audit shape): per
    * column of `orders` — row/null/distinct counts and min/max — from
    * a single unpivot. Every value is first rendered to an
    * engine-exact fixed-width decimal string (cents via the
    * DECIMAL(18,2) money convention, timestamps as epoch micros,
    * 20-digit zero-pad), so lexicographic MIN/MAX ≡ numeric min/max
    * and both engines hash identical bytes — never float formatting.
    * Scale shape: the unpivot is a codegen'd constant-factor explode
    * (rows × 6), the rollup is two partial-aggregated phases keyed by
    * (column, value) whose shuffle is bounded by per-column DISTINCT
    * counts, not row count. The profile a data lead reads before
    * admitting a new drop into the corpus. */
  def qColumnProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pad = (c: String) => s"lpad(CAST($c AS STRING), 20, '0')"
    val repr = t(s, dir, "orders").selectExpr(
      s"${pad("o_orderkey")} AS o_orderkey",
      s"${pad("o_custkey")} AS o_custkey",
      "o_orderstatus",
      s"${pad("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")} AS o_totalprice",
      // o_orderdate arrives NTZ; timestampdiff between two NTZ values
      // is pure local arithmetic — zone-free, unlike a cast to LTZ
      // (session-zone dependent, would fail the timezone matrix cell).
      s"${pad("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)")} AS o_orderdate",
      "o_orderpriority")
    // Two-level on purpose: min/max over STRING columns have immutable
    // agg buffers, which forces SortAggregate — as one flat agg, Spark
    // SORTED the full 6×N stacked value stream at the partial level
    // (r19 executed plan: 4 SortAggregates, the innermost over every
    // stacked row). Level 1 below is a plain count by (column, value)
    // — string GROUP KEYS hash fine — so the only SortAggregate left
    // runs over the distinct (column, value) pairs, and every rollup
    // (rows, nulls, distinct, min, max) is algebra over that table.
    repr.select(expr(
      """stack(6,
        |  'o_orderkey', o_orderkey, 'o_custkey', o_custkey,
        |  'o_orderstatus', o_orderstatus, 'o_totalprice', o_totalprice,
        |  'o_orderdate', o_orderdate, 'o_orderpriority', o_orderpriority)
        |AS (column_name, v)""".stripMargin))
      .groupBy($"column_name", $"v").agg(count(lit(1)).as("cnt"))
      .groupBy($"column_name")
      .agg(sum($"cnt").as("n_rows"),
        coalesce(sum(when($"v".isNull, $"cnt")), lit(0L)).as("n_null"),
        count(when($"v".isNotNull, 1)).as("n_distinct"),
        min($"v").as("min_repr"),
        max($"v").as("max_repr"))
      .orderBy($"column_name")
  }

  /** Robust outlier fence (median / MAD): the data-quality filter
    * that survives the heavy tails a mean/stddev fence is destroyed
    * by — one contaminated batch shifts a mean arbitrarily but moves
    * the median not at all. The corpus is tail-free by construction,
    * so a formulaic 1% heavy tail (25× inflation on the
    * l_orderkey % 97 == 0 slice, same closed form in both engines)
    * is planted; the gate then proves the fence flags it — an over-
    * or under-counting fence breaks the hash.
    *
    * Scale shape: the exact lower-median is found in TWO scan passes
    * per statistic (the classic two-phase exact quantile). Pass 1
    * aggregates a coarse bucket histogram — shuffle volume is bucket
    * count, not rows, and the partial agg compresses map-side; the
    * cumulative-frequency window that locates the rank-(n+1)/2 bucket
    * runs over that TINY histogram. Pass 2 refines the located bucket
    * one more level, down to width 1: an exact per-value histogram of
    * the bucket's rows (≤ 65536 entries per group, the bucket width),
    * so the same cumulative-frequency pick reads the value off a
    * BOUNDED frame — no task ever sorts raw rows, however many rows
    * the bucket holds or however clustered the values are.
    * A single `Window.partitionBy(group)` over raw rows would instead
    * sort each group in ONE task — the measured 3.4 s version of this
    * key, vs 2.2 s two-phase (the residue is the 5-sequential-pass
    * dependency chain, not sort volume), and a straight non-starter
    * at 100 TB where a group does not fit one task.
    * The same machinery repeats on the absolute-deviation pass for
    * the MAD; fences broadcast back and outliers count map-side. The
    * sketch twin for arbitrary-precision quantiles is
    * q_quantile_sketch; this is the exact variant an oracle replays
    * bit-for-bit (the oracle computes the same medians its own way —
    * medians are algorithm-independent). Cents-integer end to end. */
  /** The heavy-tailed cents column qMadOutliers runs on — shared with
    * PlanAuditSpec so the phase audit sees the real input. */
  private[queries] def madCents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").select($"l_returnflag".as("grp"),
      (round($"l_extendedprice" * 100).cast("long") *
        when($"l_orderkey" % 97 === 0, 25L).otherwise(1L)).as("cents"))
  }

  /** Two-phase exact lower-median per group, PRE-checkpoint (the plan
    * PlanAuditSpec audits — qMadOutliers checkpoints it, which
    * truncates the lineage to an RDD scan).
    *
    * Pass 1: coarse 65536-wide bucket histogram — shuffle volume is
    * bucket count, never rows; the cumulative-frequency window that
    * locates the rank-(n+1)/2 bucket runs over that tiny frame. Group
    * row counts come from the HISTOGRAM itself, never a second scan.
    * Pass 2: one more refinement level, down to width 1 — an EXACT
    * per-value histogram of the located bucket's rows. The groupBy
    * compresses map-side to ≤ 65536 (grp, value) keys per group (the
    * bucket width), so the shuffle and the rank-pick window both see
    * bounded frames no matter how many raw rows the bucket holds —
    * the row_number-over-raw-rows alternative sorts the whole bucket
    * in ONE task per group (hundreds of GB at 100 TB on clustered
    * distributions; r14 verdict's one weak plan). Selecting by
    * cumulative frequency over distinct values is bit-identical to
    * ranking rows: equal values collapse into one histogram entry
    * whose cf range covers the target rank. */
  private[queries] def histMedianPlan(vals: DataFrame, c: String, as: String): DataFrame = {
    val bucketed = vals.withColumn("bucket", expr(s"$c DIV 65536"))
    val hist = bucketed.groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("f")).localCheckpoint()
    val counts = hist.groupBy(col("grp")).agg(sum(col("f")).as("n"))
    val target = hist.withColumn("cf", sum(col("f")).over(
        Window.partitionBy(col("grp")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(counts), "grp")
      .filter(col("cf") >= expr("(n + 1) DIV 2") &&
        col("cf") - col("f") < expr("(n + 1) DIV 2"))
      .select(col("grp"), col("bucket"), (col("cf") - col("f")).as("cum_before"),
        expr("(n + 1) DIV 2").as("rank"))
    bucketed.join(broadcast(target), Seq("grp", "bucket"))
      .groupBy(col("grp"), bucketed(c).as("v"))
      .agg(count(lit(1)).as("vf"),
        max(col("rank")).as("rank"), max(col("cum_before")).as("cum_before"))
      .withColumn("vcf", sum(col("vf")).over(
        Window.partitionBy(col("grp")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_before") + col("vcf") >= col("rank") &&
        col("cum_before") + col("vcf") - col("vf") < col("rank"))
      .select(col("grp"), col("v").as(as))
  }

  def qMadOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = madCents(s, dir)
    // two-phase exact lower-median (rank (n+1)/2) of `col` per group;
    // the ≤ #groups-row fence result is localCheckpoint-pinned so its
    // 2-3 downstream consumers don't replay the scan lineage
    // (histMedianPlan holds the phase shapes, pre-checkpoint, so
    // PlanAuditSpec can see past the lineage truncation).
    def histMedian(vals: DataFrame, col: String, as: String): DataFrame =
      histMedianPlan(vals, col, as).localCheckpoint()
    val med = histMedian(li, "cents", "median_cents")
    val dev = li.join(broadcast(med), "grp")
      .select($"grp", abs($"cents" - $"median_cents").as("adev"))
    val mad = histMedian(dev, "adev", "mad_cents")
    li.join(broadcast(med), "grp").join(broadcast(mad), "grp")
      .groupBy($"grp")
      .agg(count(lit(1)).as("n_rows"),
        max($"median_cents").as("median_cents"),
        max($"mad_cents").as("mad_cents"),
        sum(when(abs($"cents" - $"median_cents") > $"mad_cents" * 5, 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy($"grp")
  }

  /** Constraint gate (the other Deequ half): assertions AS DATA, one
    * row per rule with the violation count and a PASS/FAIL verdict —
    * what an ingest pipeline evaluates before a drop is admitted.
    * Uniqueness and domain rules are conditional aggregates;
    * referential integrity is a LEFT ANTI join at key cardinality.
    * The `orderstatus_legacy_domain` rule FAILS deliberately (the
    * fixture's 'P' pending status sits outside the legacy {O, F}
    * domain) — the gate must prove it reports failure honestly, not
    * only that green rows stay green. */
  def qDataConstraints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    def verdict(df: DataFrame): DataFrame =
      df.select($"constraint", $"violations",
        when($"violations" === 0L, "PASS").otherwise("FAIL").as("status"))
    // The three non-distinct scan-local rules share ONE aggregation
    // pass (r19: the union-of-single-rule-aggs shape scanned orders
    // five times — two full scans more than the arithmetic needs at
    // 100 TB); stack() unpivots the 1-row result back into the
    // per-rule rows. The uniqueness rule is the duplicate count
    // Σ_key (cnt − 1) over its own keyed partial agg — same value as
    // count(1) − countDistinct(key) without either a second rollup
    // input or the mixed distinct/non-distinct Expand rewrite (2× the
    // scan rows through the aggregate). Referential integrity keeps
    // its LEFT ANTI join — the one rule that genuinely needs a second
    // input.
    val scanRules = orders.agg(
      sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("custkey_complete"),
      sum(when($"o_totalprice" <= 0.0, 1L).otherwise(0L)).as("totalprice_positive"),
      sum(when(!$"o_orderstatus".isin("O", "F"), 1L).otherwise(0L))
        .as("orderstatus_legacy_domain"))
      .select(expr(
        """stack(3,
          |  'custkey_complete', custkey_complete,
          |  'totalprice_positive', totalprice_positive,
          |  'orderstatus_legacy_domain', orderstatus_legacy_domain
          |) AS (constraint, violations)""".stripMargin))
    // NOT NULL assumption (r19 advice): Σ_key (cnt − 1) counts a NULL
    // key group as n − 1 violations, while the pinned oracle's
    // count(*) − count(DISTINCT key) counts every NULL row as one.
    // o_orderkey is never null in this schema, so the two agree here —
    // but reusing this rule on a NULLABLE key requires an explicit
    // null-key count term to stay oracle-equivalent.
    val unique = orders.groupBy($"o_orderkey")
      .agg((count(lit(1)) - 1L).as("dups"))
      .agg(coalesce(sum($"dups"), lit(0L)).as("violations"))
      .select(lit("orderkey_unique").as("constraint"), $"violations")
    val referential = orders
      .join(t(s, dir, "customer").select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("custkey_referential").as("constraint"), $"violations")
    verdict(scanRules.unionAll(unique).unionAll(referential))
      .orderBy($"constraint")
  }

  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // INTERSECT/EXCEPT/EXCEPT as three separate set ops scanned each
    // input three times and shuffled three joins (r19 plan: 6
    // FileScans). All three counts come out of ONE full-outer join
    // over the two distinct id sets — presence flags classify every
    // id into shared / left-only / right-only in a single pass. The
    // <=> join key preserves set-op NULL semantics (INTERSECT matches
    // NULL with NULL; an equi full-outer would not).
    val e = t(s, dir, "events").select($"user_id").distinct()
    val c = t(s, dir, "customer").select($"c_custkey".as("user_id")).distinct()
    e.select($"user_id".as("eid"), lit(1).as("in_e"))
      .join(c.select($"user_id".as("cid"), lit(1).as("in_c")),
        $"eid" <=> $"cid", "full_outer")
      .agg(count(when($"in_e" === 1 && $"in_c" === 1, 1)).as("n_shared"),
        count(when($"in_c".isNull, 1)).as("n_events_only"),
        count(when($"in_e".isNull, 1)).as("n_customers_only"))
  }

  /** CDC changelog apply (the MERGE INTO / upsert shape, and the batch
    * twin of the connector's IXFR change-log semantics): compact the
    * change stream to ONE change per key, then apply it to a snapshot.
    *
    * Compaction is last-write-wins max_by — one record of state per
    * key, partial-aggregatable, exactly the sink-side dedup the DNS
    * connector runs per zone (SURVEY §2.1 #18). The apply is a single
    * full-outer join on the key: snapshot-only keys are retained,
    * matched keys take the change (tombstone ⇒ deleted, else updated),
    * change-only keys insert (tombstone ⇒ no-op). At 100 TB both sides
    * hash-shuffle once on the key and every downstream MERGE engine
    * (Delta/Iceberg/Hudi) bottoms out in this exact plan; the output
    * rolls the per-key outcomes up to a 5-row reconciliation audit. */
  def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Change log: every event upserts `value` onto the user's record;
    // 'error' is a tombstone. Latest (ts, event_id) per user wins.
    val change = t(s, dir, "events")
      .groupBy($"user_id")
      .agg(max_by(struct($"event_type", $"value"), struct($"ts", $"event_id")).as("ch"))
      .select($"user_id",
        when($"ch.event_type" === "error", "DELETE").otherwise("UPSERT").as("action"),
        $"ch.value".as("new_value"))
    // The snapshot deliberately covers only part of the key space
    // (MACHINERY customers are absent, as after a partial backfill):
    // changes to uncovered keys drive the insert and delete-no-op
    // outcomes, so all five MERGE classes are exercised, not three.
    val snap = t(s, dir, "customer")
      .filter($"c_mktsegment" =!= "MACHINERY")
      .select($"c_custkey".as("user_id"), $"c_acctbal".as("balance"),
        lit(1).as("in_snap"))
    val outcome = when($"action".isNull, "retained")
      .when($"action" === "DELETE" && $"in_snap".isNotNull, "deleted")
      .when($"action" === "DELETE", "delete_noop")
      .when($"in_snap".isNotNull, "updated")
      .otherwise("inserted")
    snap.join(change, Seq("user_id"), "full_outer")
      .select(outcome.as("outcome"),
        when($"action" === "DELETE", lit(null))
          .otherwise(coalesce($"new_value", $"balance")).as("fv"))
      .groupBy($"outcome")
      .agg(count(lit(1)).as("n_keys"), dsum2(coalesce($"fv", lit(0.0))).as("total_value"))
      .orderBy($"outcome")
  }

  /** Native session windows: Spark's `session_window` (gap-merged
    * event-time windows) over each user's events — the built-in
    * operator form of what [[qSessionize]] assembles by hand from
    * lag + running sum. Same 30-minute gap, so the two queries
    * cross-check each other's session boundaries through their
    * independent oracles. session_window aggregates like any groupBy
    * (hash exchange on user_id, merge-able window state), and the same
    * expression drives streaming session windows with a watermark —
    * one more reason the native form is the deployment choice while
    * the lag/cumsum form remains the explainable fallback. A session
    * ends `gap` after its LAST event, and an event exactly `gap` after
    * the previous one starts a NEW session — the oracle replicates
    * both conventions (`>=` on the gap test, max(ts)+gap as the end). */
  def qSessionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("sess_start"), $"sw.end".as("sess_end"),
        $"n_events")
      .orderBy($"user_id", $"sess_start")
  }

  /** Equi-depth histogram via ntile: per event type, 10 equal-count
    * value deciles with their boundaries — the distribution profile a
    * data-quality dashboard shows per slice. ntile needs a total order
    * within each partition (ties broken by event_id so both engines
    * agree), which makes this the third member of the full-sort family:
    * like q_length_percentiles it sorts each type's rows in one window
    * partition, honest but skew-prone when type cardinality is low —
    * at 100 TB the documented alternative is q_quantile_sketch's capped
    * per-group sample (SCALE.md). The rollup above the window is
    * partial-aggregated and 10×|types| rows. */
  def qNtileDeciles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    t(s, dir, "events")
      .select($"event_type", $"value", $"event_id")
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy($"event_type", $"decile")
      .agg(count(lit(1)).as("n"), min($"value").as("min_v"), max($"value").as("max_v"))
      .orderBy($"event_type", $"decile")
  }

  /** k-anonymity audit with LOCAL RECODING over the nation → region
    * generalization hierarchy — the privacy gate a training-data
    * release runs before quasi-identifiers ship. Equivalence classes
    * on the fine QI (nation, mktsegment); rows in classes below k=8
    * GENERALIZE one hierarchy level (region, mktsegment); generalized
    * rows forming a coarse class still below k are SUPPRESSED. The
    * anonymity accounting is per released QI value: fine-released and
    * generalized rows are distinguishable (their QIs differ), so each
    * population counts only against its own class — the local-recoding
    * rule. Output per segment: rows, fine classes, fine violations,
    * generalized rows, suppressed rows, released rows (k-anonymous by
    * construction). Scale shape: class-size tables are QI-cardinality
    * (≤ nations × segments) and broadcast back onto the rows — two
    * tiny aggs, three broadcast joins, one bounded rollup; the row
    * table is scanned, never shuffled at data size. k=8 is calibrated
    * so all three outcomes occur at the gate SFs. */
  def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 8
    val cust = t(s, dir, "customer").select($"c_custkey", $"c_nationkey", $"c_mktsegment")
    val nat = t(s, dir, "nation").select($"n_nationkey", $"n_regionkey")
    // Every output number is CLASS-cardinality algebra over the fine
    // class-size table: per-segment rows = Σ fsz, generalized rows =
    // Σ fsz over sub-k classes, the coarse class sizes = the same sums
    // re-keyed by region, suppressed rows = Σ csz over sub-k coarse
    // classes. The r19 rewrite derives them all from ONE customer scan
    // (the fine agg, checkpointed at ≤ nations×segments rows) — the
    // previous row-level formulation re-joined the class sizes back
    // onto the row table and re-scanned customer per consumer (6
    // FileScans in the r19 executed plan) to count what the class
    // sizes already knew.
    val fine = cust.groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("fsz")).localCheckpoint()
    val coarse = fine.filter($"fsz" < k)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey", $"c_mktsegment")
      .agg(sum($"fsz").as("csz"))
    val seg = fine.groupBy($"c_mktsegment").agg(sum($"fsz").as("n_rows"))
    val fstats = fine.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_fine_classes"),
        sum(when($"fsz" < k, 1L).otherwise(0L)).as("n_fine_violations"))
    val gstats = coarse.groupBy($"c_mktsegment")
      .agg(sum($"csz").as("n_generalized"),
        sum(when($"csz" < k, $"csz").otherwise(0L)).as("n_suppressed"))
    seg.join(fstats, Seq("c_mktsegment"))
      .join(gstats, Seq("c_mktsegment"), "left")
      .select($"c_mktsegment".as("mktsegment"), $"n_rows",
        $"n_fine_classes", $"n_fine_violations",
        coalesce($"n_generalized", lit(0L)).as("n_generalized"),
        coalesce($"n_suppressed", lit(0L)).as("n_suppressed"),
        ($"n_rows" - coalesce($"n_suppressed", lit(0L))).as("n_released"))
      .orderBy($"mktsegment")
  }

  /** The release CERTIFICATE for the [[qKAnonymity]] recoding:
    * k-anonymity alone still leaks when a class's SENSITIVE attribute
    * is homogeneous (everyone in the class shares the value — finding
    * the class IS the disclosure), so the certificate checks
    * l-diversity too. Replays the same local recoding, then per
    * RELEASED class (fine-kept and coarse-kept carry distinguishable
    * QIs, so they certify separately): size and distinct-sensitive
    * count (acctbal bucket as the sensitive attribute). Per segment:
    * released rows/classes, min class size (≥ k proves the recoding),
    * min l, and l<3 violations with rows at risk — zero on this
    * corpus's uniform balances, which is the certificate PASSING, not
    * the check being vacuous (min_l is oracle-pinned). Same
    * QI-cardinality broadcast shapes as the k-anonymity audit. */
  def qLDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (k, l) = (8, 3)
    val cust = t(s, dir, "customer")
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 500).cast("long").as("sens"))
    val nat = t(s, dir, "nation").select($"n_nationkey", $"n_regionkey")
    // The class-size tables come out of ONE customer scan (fine,
    // checkpointed at QI cardinality; coarse = the same sums re-keyed
    // by region — no row-level pass, same algebra as [[qKAnonymity]]'s
    // r19 rewrite); the ONE genuinely row-level pass (sens values per
    // released class) then classifies every row in a single scan with
    // both tiny tables broadcast. The previous shape re-scanned
    // customer per branch (9 FileScans in the r19 executed plan).
    val fine = cust.groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("fsz")).localCheckpoint()
    val coarse = fine.filter($"fsz" < k)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey", $"c_mktsegment").agg(sum($"fsz").as("csz"))
    val released = cust
      .join(broadcast(fine), Seq("c_nationkey", "c_mktsegment"))
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(coarse), Seq("n_regionkey", "c_mktsegment"), "left")
      .filter($"fsz" >= k || coalesce($"csz", lit(0L)) >= k)
      .select(
        when($"fsz" >= k,
          concat(lit("N"), $"c_nationkey".cast("string"), lit("|"), $"c_mktsegment"))
          .otherwise(
            concat(lit("R"), $"n_regionkey".cast("string"), lit("|"), $"c_mktsegment"))
          .as("qi"),
        $"c_mktsegment", $"sens")
    released.groupBy($"qi", $"c_mktsegment")
      .agg(count(lit(1)).as("sz"), countDistinct($"sens").as("ldiv"))
      .groupBy($"c_mktsegment".as("mktsegment"))
      .agg(sum($"sz").as("n_released_rows"),
        count(lit(1)).as("n_released_classes"),
        min($"sz").as("min_class_size"),
        min($"ldiv").as("min_l_diversity"),
        sum(when($"ldiv" < l, 1L).otherwise(0L)).as("n_l_violations"),
        sum(when($"ldiv" < l, $"sz").otherwise(0L)).as("n_rows_at_risk"))
      .orderBy($"mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_l_diversity" -> qLDiversity,
    "q_k_anonymity" -> qKAnonymity,
    "q_cdc_apply" -> qCdcApply,
    "q_session_window" -> qSessionWindow,
    "q_ntile_deciles" -> qNtileDeciles,
    "q_full_outer_join" -> qFullOuterJoin,
    "q_set_ops" -> qSetOps,
    "q_column_profile" -> qColumnProfile,
    "q_mad_outliers" -> qMadOutliers,
    "q_data_constraints" -> qDataConstraints,
    "q_sessionize" -> qSessionize,
    "q_rollup_orders" -> qRollupOrders,
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_region_revenue" -> q5RegionRevenue,
    "q_price_bucket_when" -> qPriceBucketWhen,
    "q_window_topk_parts" -> qWindowTopkParts,
    "q_topk_per_group" -> qTopkPerGroup,
    "q_scd2_lookup" -> qScd2Lookup,
    "q_lww_dedup_events" -> qLwwDedupEvents,
    "q_lww_maxby" -> qLwwMaxBy,
    "q_survivorship" -> qSurvivorship,
    "q_union_changes" -> qUnionChanges,
    "q_zone_derive" -> qZoneDerive,
    "q_json_roundtrip" -> qJsonRoundtrip,
    "q_variant_extract" -> qVariantExtract,
    "q_agg_stats_orders" -> qAggStatsOrders,
    "q_semi_anti_join" -> qSemiAntiJoin,
    "q_hourly_events" -> qHourlyEvents,
    "q_user_retention" -> qUserRetention,
    "q_event_funnel" -> qEventFunnel,
    "q_asof_join" -> qAsofJoin,
    "q_click_attribution" -> qClickAttribution,
    "q_rolling_peak" -> qRollingPeak,
    "q_salted_agg" -> qSaltedAgg,
    "q_salted_join" -> qSaltedJoin,
    "q_pivot_priority" -> qPivotPriority,
    "q_cube_docs" -> qCubeDocs,
  )

  val oracles: Map[String, String] = Map(
    // The same recoding, then per-released-class size + distinct
    // sensitive buckets — the certificate's oracle.
    "q_l_diversity" ->
      """WITH fine AS (SELECT c_nationkey, c_mktsegment, count(*) AS fsz
        |  FROM customer GROUP BY 1,2),
        |r AS (SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
        |        CAST(floor(c.c_acctbal / 500) AS BIGINT) AS sens, n.n_regionkey, f.fsz
        |  FROM customer c
        |  JOIN fine f ON f.c_nationkey = c.c_nationkey AND f.c_mktsegment = c.c_mktsegment
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey),
        |coarse AS (SELECT n_regionkey, c_mktsegment, count(*) AS csz
        |  FROM r WHERE fsz < 8 GROUP BY 1,2),
        |released AS (
        |  SELECT concat('N', c_nationkey, '|', c_mktsegment) AS qi, c_mktsegment, sens
        |  FROM r WHERE fsz >= 8
        |  UNION ALL
        |  SELECT concat('R', r.n_regionkey, '|', r.c_mktsegment) AS qi, r.c_mktsegment, r.sens
        |  FROM r JOIN coarse co
        |    ON co.n_regionkey = r.n_regionkey AND co.c_mktsegment = r.c_mktsegment
        |  WHERE r.fsz < 8 AND co.csz >= 8),
        |cls AS (SELECT qi, c_mktsegment, count(*) AS sz, count(DISTINCT sens) AS l
        |  FROM released GROUP BY 1,2)
        |SELECT c_mktsegment AS mktsegment, CAST(sum(sz) AS BIGINT) AS n_released_rows,
        |  count(*) AS n_released_classes, min(sz) AS min_class_size,
        |  min(l) AS min_l_diversity,
        |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_l_violations,
        |  CAST(sum(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    // Local-recoding replay: fine classes, one-level generalization of
    // violators, suppression of still-small coarse classes.
    "q_k_anonymity" ->
      """WITH fine AS (SELECT c_nationkey, c_mktsegment, count(*) AS fsz
        |  FROM customer GROUP BY 1,2),
        |rows_ AS (SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment, f.fsz
        |  FROM customer c JOIN fine f
        |    ON f.c_nationkey = c.c_nationkey AND f.c_mktsegment = c.c_mktsegment),
        |gen AS (SELECT r.*, n.n_regionkey FROM rows_ r
        |  JOIN nation n ON n.n_nationkey = r.c_nationkey WHERE r.fsz < 8),
        |coarse AS (SELECT n_regionkey, c_mktsegment, count(*) AS csz FROM gen GROUP BY 1,2),
        |gen2 AS (SELECT g.*, co.csz FROM gen g JOIN coarse co
        |  ON co.n_regionkey = g.n_regionkey AND co.c_mktsegment = g.c_mktsegment),
        |seg AS (SELECT c_mktsegment, count(*) AS n_rows FROM customer GROUP BY 1),
        |fstats AS (SELECT c_mktsegment, count(*) AS n_fine_classes,
        |    CAST(sum(CASE WHEN fsz < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_fine_violations
        |  FROM fine GROUP BY 1),
        |gstats AS (SELECT c_mktsegment, count(*) AS n_generalized,
        |    CAST(sum(CASE WHEN csz < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed
        |  FROM gen2 GROUP BY 1)
        |SELECT s.c_mktsegment AS mktsegment, s.n_rows, f.n_fine_classes,
        |  f.n_fine_violations,
        |  coalesce(g.n_generalized, 0) AS n_generalized,
        |  coalesce(g.n_suppressed, 0) AS n_suppressed,
        |  s.n_rows - coalesce(g.n_suppressed, 0) AS n_released
        |FROM seg s JOIN fstats f ON f.c_mktsegment = s.c_mktsegment
        |LEFT JOIN gstats g ON g.c_mktsegment = s.c_mktsegment
        |ORDER BY 1""".stripMargin,
    // The LWW compaction mirrors q_lww_* (ts DESC, event_id DESC
    // window); the apply is the same full-outer + CASE classification.
    "q_cdc_apply" ->
      """WITH ch AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS action,
        |    value AS new_value
        |  FROM (SELECT user_id, event_type, value,
        |          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events) WHERE rn = 1),
        |s AS (SELECT c_custkey AS user_id, c_acctbal AS balance, 1 AS in_snap
        |      FROM customer WHERE c_mktsegment <> 'MACHINERY'),
        |f AS (
        |  SELECT CASE WHEN action IS NULL THEN 'retained'
        |              WHEN action = 'DELETE' AND in_snap IS NOT NULL THEN 'deleted'
        |              WHEN action = 'DELETE' THEN 'delete_noop'
        |              WHEN in_snap IS NOT NULL THEN 'updated'
        |              ELSE 'inserted' END AS outcome,
        |         CASE WHEN action = 'DELETE' THEN NULL
        |              ELSE coalesce(new_value, balance) END AS fv
        |  FROM s FULL OUTER JOIN ch USING (user_id))
        |SELECT outcome, count(*) AS n_keys,
        |  CAST(sum(CAST(coalesce(fv, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // Replays session_window's conventions by hand: a gap of exactly
    // 30 min starts a new session (>=), and a session ends 30 min
    // after its last event.
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT user_id, event_id, ts, ts_us,
        |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM e),
        |n AS (SELECT user_id, event_id, ts, ts_us,
        |    CASE WHEN prev IS NULL OR ts_us - prev >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM l),
        |c AS (SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM n)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS sess_start,
        |  CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS sess_end,
        |  count(*) AS n_events
        |FROM c GROUP BY user_id, sess ORDER BY user_id, sess_start""".stripMargin,
    "q_ntile_deciles" ->
      """SELECT event_type, CAST(decile AS BIGINT) AS decile, count(*) AS n,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM (SELECT event_type, value,
        |        ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
        |      FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_full_outer_join" ->
      """WITH o AS (SELECT o_custkey AS uid, count(*) AS n_orders FROM orders GROUP BY 1),
        |e AS (SELECT user_id AS uid, count(*) AS n_events FROM events GROUP BY 1),
        |j AS (SELECT CASE WHEN o.uid IS NULL THEN 'events_only'
        |         WHEN e.uid IS NULL THEN 'orders_only' ELSE 'both' END AS side,
        |    coalesce(o.n_orders, 0) AS n_orders, coalesce(e.n_events, 0) AS n_events
        |  FROM o FULL OUTER JOIN e ON o.uid = e.uid)
        |SELECT side, count(*) AS n_users, CAST(sum(n_orders) AS BIGINT) AS total_orders,
        |  CAST(sum(n_events) AS BIGINT) AS total_events
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same fixed-width decimal renderings, so lexicographic min/max
    // and distinct counts agree byte-for-byte.
    "q_column_profile" ->
      """WITH r AS (
        |  SELECT lpad(CAST(o_orderkey AS VARCHAR), 20, '0') AS o_orderkey,
        |         lpad(CAST(o_custkey AS VARCHAR), 20, '0') AS o_custkey,
        |         o_orderstatus,
        |         lpad(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 20, '0') AS o_totalprice,
        |         lpad(CAST(epoch_us(o_orderdate) AS VARCHAR), 20, '0') AS o_orderdate,
        |         o_orderpriority
        |  FROM orders),
        |u AS (
        |  SELECT 'o_orderkey' AS column_name, o_orderkey AS v FROM r UNION ALL
        |  SELECT 'o_custkey', o_custkey FROM r UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus FROM r UNION ALL
        |  SELECT 'o_totalprice', o_totalprice FROM r UNION ALL
        |  SELECT 'o_orderdate', o_orderdate FROM r UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM r)
        |SELECT column_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT v) AS n_distinct,
        |  min(v) AS min_repr, max(v) AS max_repr
        |FROM u GROUP BY column_name ORDER BY column_name""".stripMargin,
    // Replays the planted-tail view, the two cumulative-histogram
    // exact medians, and the 5-MAD fence count.
    "q_mad_outliers" ->
      """WITH li AS (SELECT l_returnflag AS grp,
        |    CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (CASE WHEN l_orderkey % 97 = 0 THEN 25 ELSE 1 END) AS cents
        |  FROM lineitem),
        |nn AS (SELECT grp, count(*) AS n FROM li GROUP BY 1),
        |f1 AS (SELECT grp, cents, count(*) AS f FROM li GROUP BY 1, 2),
        |c1 AS (SELECT grp, cents, f,
        |    sum(f) OVER (PARTITION BY grp ORDER BY cents) AS cf FROM f1),
        |med AS (SELECT c1.grp, cents AS median_cents
        |  FROM c1 JOIN nn ON c1.grp = nn.grp
        |  WHERE cf >= (n + 1) // 2 AND cf - f < (n + 1) // 2),
        |d AS (SELECT li.grp, abs(cents - median_cents) AS adev
        |  FROM li JOIN med ON li.grp = med.grp),
        |f2 AS (SELECT grp, adev, count(*) AS f FROM d GROUP BY 1, 2),
        |c2 AS (SELECT grp, adev, f,
        |    sum(f) OVER (PARTITION BY grp ORDER BY adev) AS cf FROM f2),
        |mad AS (SELECT c2.grp, adev AS mad_cents
        |  FROM c2 JOIN nn ON c2.grp = nn.grp
        |  WHERE cf >= (n + 1) // 2 AND cf - f < (n + 1) // 2)
        |SELECT li.grp, count(*) AS n_rows, max(median_cents) AS median_cents,
        |  CAST(max(mad_cents) AS BIGINT) AS mad_cents,
        |  CAST(sum(CASE WHEN abs(cents - median_cents) > 5 * mad_cents
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM li JOIN med ON li.grp = med.grp JOIN mad ON li.grp = mad.grp
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_data_constraints" ->
      """WITH c AS (
        |  SELECT 'orderkey_unique' AS "constraint",
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations FROM orders
        |  UNION ALL SELECT 'custkey_complete',
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'custkey_referential',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c2 WHERE c2.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'totalprice_positive',
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'orderstatus_legacy_domain',
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        |SELECT "constraint", violations,
        |  CASE WHEN violations = 0 THEN 'PASS' ELSE 'FAIL' END AS status
        |FROM c ORDER BY "constraint"""".stripMargin,
    "q_set_ops" ->
      """WITH e AS (SELECT DISTINCT user_id FROM events),
        |c AS (SELECT DISTINCT c_custkey AS user_id FROM customer),
        |i AS (SELECT count(*) AS n_shared FROM (SELECT user_id FROM e INTERSECT SELECT user_id FROM c)),
        |xe AS (SELECT count(*) AS n_events_only FROM (SELECT user_id FROM e EXCEPT SELECT user_id FROM c)),
        |xc AS (SELECT count(*) AS n_customers_only FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM e))
        |SELECT n_shared, n_events_only, n_customers_only FROM i, xe, xc""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT user_id, event_id, ts_us,
        |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
        |  FROM e),
        |n AS (SELECT user_id, event_id, ts_us,
        |    CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM l),
        |c AS (SELECT user_id, event_id, ts_us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        |  FROM n)
        |SELECT user_id, sess_seq, count(*) AS n_events,
        |  max(ts_us) - min(ts_us) AS span_us
        |FROM c GROUP BY user_id, sess_seq ORDER BY user_id, sess_seq""".stripMargin,
    "q_rollup_orders" ->
      """SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_region_revenue" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_price_bucket_when" ->
      """SELECT o_orderstatus,
         CASE WHEN o_totalprice >= 300000.0 THEN 'high'
              WHEN o_totalprice >= 100000.0 THEN 'mid'
              ELSE 'low' END AS bucket,
         count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, bucket""",
    "q_window_topk_parts" ->
      """SELECT p_brand, rn, p_partkey, p_retailprice FROM (
           SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
           FROM part) WHERE rn <= 3 ORDER BY p_brand, rn""",
    // the same formulaic dim replayed: thirds of the global time
    // range, tier = (user + version) % 5; windows partition time so
    // each event matches exactly one version.
    "q_scd2_lookup" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM ev),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |dim AS (
        |  SELECT user_id, v,
        |    lo + ((hi - lo + 1) * v) // 3 AS vfrom,
        |    lo + ((hi - lo + 1) * (v + 1)) // 3 - 1 AS vto,
        |    (user_id + v) % 5 AS tier
        |  FROM u, b, (SELECT unnest([0, 1, 2]) AS v))
        |SELECT tier, count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN dim ON ev.user_id = dim.user_id
        |  AND ev.ts_us BETWEEN vfrom AND vto
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the WINDOW form answers for the aggregator: identical ranking
    // (cents score, id tie-break) proves arg-top-k ≡ row_number top-k.
    "q_topk_per_group" ->
      """SELECT p_brand, rn, p_partkey, price_cents FROM (
           SELECT p_brand, p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             row_number() OVER (PARTITION BY p_brand
               ORDER BY CAST(round(p_retailprice * 100) AS BIGINT) DESC,
                        p_partkey) AS rn
           FROM part) WHERE rn <= 3 ORDER BY p_brand, rn""",
    "q_lww_dedup_events" ->
      """SELECT user_id, event_type, event_id, value FROM (
           SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id, event_type""",
    // DuckDB arg_max has no composite-key overload, so the oracle pins
    // the same (ts DESC, event_id DESC) winner with a window — the
    // contract is row-identical to the Spark max_by(struct, struct).
    "q_survivorship" ->
      """WITH base AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM base) WHERE rn = 1),
        |prof AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN k END) AS click_k,
        |    max(CASE WHEN event_type = 'view' THEN k END) AS view_k
        |  FROM latest GROUP BY user_id),
        |bigp AS (
        |  SELECT user_id, cents AS big_purchase_cents FROM (
        |    SELECT user_id, cents, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM base WHERE event_type = 'purchase' AND cents >= 20000)
        |  WHERE rn = 1),
        |tot AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS last_seen_micros
        |  FROM events GROUP BY user_id)
        |SELECT t.user_id, t.n_events, t.last_seen_micros,
        |  p.click_k, p.view_k, b.big_purchase_cents
        |FROM tot t LEFT JOIN prof p USING (user_id)
        |LEFT JOIN bigp b USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q_lww_maxby" ->
      """SELECT user_id, event_type, event_id, value FROM (
           SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_union_changes" ->
      """SELECT 'IXFR_DELETE' AS action, 0 AS ord, user_id, event_id FROM events WHERE event_type = 'error'
         UNION ALL
         SELECT 'IXFR_ADD' AS action, 1 AS ord, user_id, event_id FROM events WHERE event_type = 'purchase'
         ORDER BY ord, event_id""",
    "q_zone_derive" ->
      """WITH f AS (
           SELECT lower(regexp_replace(c_name, '[^A-Za-z0-9]', '-', 'g')) || '.' || lower(n_name) || '.acme' AS fqdn_raw
           FROM customer JOIN nation ON c_nationkey = n_nationkey),
         g AS (SELECT CASE WHEN fqdn_raw LIKE '%.' THEN fqdn_raw ELSE fqdn_raw || '.' END AS fqdn FROM f)
         SELECT substring(fqdn, instr(fqdn, '.') + 1) AS zone, count(*) AS n_hosts
         FROM g GROUP BY 1 ORDER BY zone""",
    "q_json_roundtrip" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
         count(*) AS n, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1 ORDER BY k_mod""",
    // The oracle never touches JSON for the planted fields: every
    // aggregate is rebuilt from the raw columns (the `extra` field and
    // the two-schemas count are arithmetic in event_id), so the whole
    // build→parse_json→variant_get chain is what's being gated. Only
    // `k` goes through DuckDB's independent JSON reader (it originates
    // in the props string).
    "q_variant_extract" ->
      """SELECT event_type,
        |  count(*) AS n_events,
        |  CAST(sum(user_id) AS BIGINT) AS sum_uid,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) FILTER (WHERE event_id % 7 = 0) AS n_extra,
        |  CAST(sum(CASE WHEN event_id % 7 = 0 THEN event_id % 100 ELSE 0 END) AS BIGINT) AS sum_extra,
        |  count(DISTINCT event_id % 7 = 0) AS n_schemas
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_stats_orders" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
         count(DISTINCT o_custkey) AS n_customers,
         min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_semi_anti_join" ->
      """SELECT c_mktsegment, 'with_orders' AS kind, count(*) AS n FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           GROUP BY c_mktsegment
         UNION ALL
         SELECT c_mktsegment, 'without_orders' AS kind, count(*) AS n FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           GROUP BY c_mktsegment
         ORDER BY c_mktsegment, kind""",
    "q_hourly_events" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
         count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""",
    "q_user_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cd FROM e GROUP BY user_id)
        |SELECT DATE '1970-01-01' + CAST(f.cd AS INTEGER) AS cohort_day,
        |  CAST(e.d - f.cd AS BIGINT) AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f ON f.user_id = e.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // DuckDB's native ASOF LEFT JOIN is the truth spec for the Spark
    // union-window implementation: >= tie semantics, NULL → -1.
    "q_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.event_id, coalesce(p.ts_us - c.ts_us, -1) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    // The oracle runs the naive range join — the bucketed equi-join
    // must be result-identical to it.
    "q_click_attribution" ->
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, count(c.ts_us) AS n_clicks
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.ts_us > p.ts_us - 3600000000 AND c.ts_us <= p.ts_us
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_rolling_peak" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |r AS (SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY ts_us
        |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS c1h
        |  FROM e)
        |SELECT user_id, CAST(max(c1h) AS BIGINT) AS peak_1h, count(*) AS n_events
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Salting must be result-invisible: both salted ops are checked
    // against the PLAIN aggregation / join.
    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pivot_priority" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
        |  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cube_docs" ->
      """SELECT CAST(grouping(lang) * 2 + grouping(source) AS BIGINT) AS gid,
        |  coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY gid, lang, source""".stripMargin,
    "q_event_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT count(t_view) AS n_view,
        |  count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
        |  count(CASE WHEN t_click > t_view AND t_buy > t_click THEN 1 END) AS n_view_click_buy
        |FROM f""".stripMargin,
  )
}
