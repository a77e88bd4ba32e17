package graft.sources.dns.read

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.dns._

/** DataSource V2 read path for `format("dns")`.
  *
  * Re-expresses the reference's V1 connector (DnsSourceRelationProvider
  * .java:36-88, DnsSourceRelation.java:17-45, DnsZoneRDD.java:40-103) on
  * public Spark 4 interfaces: registry → Table → ScanBuilder → Batch with
  * one InputPartition per zone → PartitionReader running the zone
  * transfer on the executor.
  *
  * Scale design: parallelism = number of zones, because a single zone
  * transfer is serial by protocol (reference README.md:4-6) — on a real
  * cluster each zone's TCP transfer lands on its own executor core, and
  * everything above the scan (joins, aggregation) is stock Catalyst and
  * scales independently.
  */
final class DnsTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dns"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DnsSchemas.read

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // Fixed-schema contract: a user-supplied schema that differs from the
    // connector's constant is an error, not a silent no-op (the reference
    // ignores it — DnsSourceRelationProvider.java:51-53; we fail fast).
    if (schema != null && schema != DnsSchemas.read)
      throw new IllegalArgumentException(
        s"the dns source has a fixed schema ${DnsSchemas.read.simpleString}; " +
          s"user-supplied schema ${schema.simpleString} is not supported")
    new DnsTable(DnsOptions.source(properties))
  }
}

final class DnsTable(opts: DnsSourceOptions) extends Table with SupportsRead
  with SupportsMetadataColumns {
  override def name(): String =
    s"dns(${opts.common.server}:${opts.common.port})[${opts.zones.mkString(",")}]"

  override def schema(): StructType = DnsSchemas.read

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
      .asJava // streaming: DnsMicroBatchStream (DnsStreamConnector.scala)

  /** Per-transfer facts as queryable `_serial` / `_xfr_kind` columns
    * (see [[DnsSchemas.metadata]]) — present in a scan only when a
    * query names them, like the file sources' `_metadata`. */
  override def metadataColumns(): Array[MetadataColumn] =
    DnsSchemas.metadata.fields.map { f =>
      new MetadataColumn {
        override def name(): String = f.name
        override def dataType() = f.dataType
        override def isNullable(): Boolean = f.nullable
        override def comment(): String = f.name match {
          case "_serial" => "final SOA serial the zone transfer reported"
          case _ => "transfer kind that actually ran (AXFR, or IXFR downgraded on journal gap)"
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DnsScanBuilder(opts)
}

/** Zone-predicate algebra shared by the static (`SupportsPushDownV2Filters`)
  * and runtime (`SupportsRuntimeV2Filtering`) pruning paths. V2
  * `Predicate`s are Spark 4's forward-facing pushdown currency (the V1
  * `Filter` translation is the legacy path); both prune the same way:
  * exact string match against the normalized zone names rows carry. */
private[read] object ZonePredicates {
  private def isZoneRef(e: V2Expression): Boolean = e match {
    case n: NamedReference => n.fieldNames.sameElements(Array("zone"))
    case _ => false
  }

  private def strLit(e: V2Expression): Option[String] = e match {
    case l: V2Literal[_] if l.dataType == StringType && l.value != null =>
      Some(l.value.toString)
    case _ => None
  }

  /** Some(prunedZones) iff the predicate is a supported zone shape
    * (`zone = 'x.'`, `zone IN (...)`, `zone IS NOT NULL`); None means
    * "can't consume — Spark keeps it above the scan". The null check
    * Spark adds around a zone equality/grouping is a no-op (every
    * emitted row carries a zone) — accepting it matters because a
    * residual filter node between scan and aggregate would veto
    * COUNT(*) pushdown. */
  def prune(zones: Seq[String], p: Predicate): Option[Seq[String]] = p.name() match {
    case "=" => p.children() match {
      case Array(a, b) if isZoneRef(a) => strLit(b).map(v => zones.filter(_ == v))
      case Array(a, b) if isZoneRef(b) => strLit(a).map(v => zones.filter(_ == v))
      case _ => None
    }
    case "IN" =>
      val cs = p.children()
      if (cs.nonEmpty && isZoneRef(cs(0))) {
        val vs = cs.tail.map(strLit)
        if (vs.forall(_.isDefined)) {
          val wanted = vs.flatten.toSet
          Some(zones.filter(wanted.contains))
        } else None
      } else None
    case "IS_NOT_NULL" =>
      if (p.children().length == 1 && isZoneRef(p.children()(0))) Some(zones)
      else None
    case _ => None
  }
}

/** One column of a pushed ORDER BY: name + direction (`nullsFirst`
  * recorded for the description; no dns column is nullable). */
final case class SortSpec(field: String, ascending: Boolean, nullsFirst: Boolean) {
  def describe: String = s"$field ${if (ascending) "ASC" else "DESC"}"
}

/** Marker for a pushed ORDER BY ... LIMIT: per-partition sort + take.
  * Complete (single-zone) pushdown may carry a `PushedOffset` too. */
final case class PushedTopN(orders: Seq[SortSpec], limit: Int)

/** Pushdown upgrades over the reference's plain TableScan (SURVEY §4):
  *
  *  - zone-equality predicates (`zone = 'x.'`, `zone IN (...)`) prune
  *    the zone list BEFORE partition planning — a pruned zone is a
  *    whole zone transfer (network round-trip + full zone payload)
  *    that never happens. Exact because the `zone` column of every row
  *    in a partition IS the partition's zone name. Spark 4's V2
  *    `Predicate` surface (`SupportsPushDownV2Filters`) — the V1
  *    `Filter` translation this replaces is the legacy path Catalyst
  *    may stop producing.
  *  - column pruning narrows the rows the reader materializes; a
  *    `select(fqdn, ip)` no longer builds 6-field rows.
  *  - COUNT(*) / LIMIT / ORDER-BY-LIMIT / OFFSET pushdowns below.
  *
  * The `serial` option remains a further pushdown: a source-level
  * "changes since" predicate evaluated by the DNS server itself during
  * IXFR (reference DnsZoneRDD.java:76-80).
  */
final class DnsScanBuilder(opts: DnsSourceOptions) extends ScanBuilder
  with SupportsPushDownV2Filters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates with SupportsPushDownLimit
  with SupportsPushDownTopN with SupportsPushDownOffset {

  private var zones: Seq[String] = opts.zones
  private var pushed: Array[Predicate] = Array.empty
  private var required: StructType = DnsSchemas.read
  private var pushedAgg: Option[PushedCountAgg] = None
  private var limit: Option[Int] = None
  private var topN: Option[PushedTopN] = None
  private var offset: Option[Int] = None

  /** LIMIT pushdown — partial on a multi-zone scan (each partition's
    * reader stops materializing after `n` rows; Spark keeps the global
    * limit), COMPLETE on a single-zone scan (one partition IS the
    * global row order, so the scan's `n` rows are the answer and the
    * plan drops its limit node). The zone transfer itself still runs
    * (the protocol has no partial-transfer form) — the saving is row
    * materialization and scan→limit traffic on wide zones. Composes
    * with aggregate pushdown by refusing: a LIMIT under a pushed COUNT
    * would change the count. */
  override def pushLimit(n: Int): Boolean =
    if (pushedAgg.isDefined) false
    else { limit = Some(n); true }

  /** ORDER BY ... LIMIT pushdown (`SupportsPushDownTopN`): the reader
    * sorts its zone's records in memory (a zone is bounded by message
    * size — it's already a materialized Seq) and emits the top n.
    * Multi-zone: partial — Spark merges the per-partition top-n's.
    * Single zone: complete — the scan output IS the query result
    * (partition-ordered for free under the one-partition-per-zone
    * contract), and OFFSET composes ([[pushOffset]]). Sort columns may
    * be outside the projected schema (a complete pushdown removes the
    * Sort node, so nothing upstream keeps them alive) — the reader
    * materializes them for the comparison and projects them away. */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    if (pushedAgg.isDefined || orders.isEmpty) false
    else {
      val specs = orders.toSeq.map(parseOrder)
      if (specs.exists(_.isEmpty)) false
      else { topN = Some(PushedTopN(specs.flatten, n)); true }
    }
  }

  private def parseOrder(o: SortOrder): Option[SortSpec] = o.expression() match {
    case n: NamedReference if n.fieldNames.length == 1 &&
        (DnsSchemas.read.fieldNames.contains(n.fieldNames()(0)) ||
          DnsSchemas.metadata.fieldNames.contains(n.fieldNames()(0))) =>
      Some(SortSpec(n.fieldNames()(0),
        o.direction() == SortDirection.ASCENDING,
        o.nullOrdering() == NullOrdering.NULLS_FIRST))
    case _ => None
  }

  /** Complete pushdown needs the scan's row order to BE the global
    * order — true exactly when one zone survives static pruning (one
    * partition). Spark consults this for both LIMIT and TopN; on a
    * complete push it drops its own sort/limit nodes and, for
    * `LIMIT k OFFSET m`, goes on to offer the offset. */
  override def isPartiallyPushed(): Boolean = zones.length != 1

  /** OFFSET pushdown — single-zone scans only (skipping `m` rows per
    * PARTITION is only the global skip when there is one partition).
    * Spark offers it after a COMPLETE limit/TopN push (as
    * `pushTopN(orders, k + m)` + `pushOffset(m)`) or standalone for a
    * bare `.offset(m)`. */
  override def pushOffset(n: Int): Boolean =
    if (pushedAgg.isDefined || zones.length != 1) false
    else { offset = Some(n); true }

  /** COUNT(*) pushdown (`SupportsPushDownAggregates`): a zone-level
    * record census — the monitoring query a DNS estate runs all day —
    * ships ONE row per zone instead of every record. The transfer
    * itself still runs (the protocol has no server-side count), but
    * row materialization, the scan→agg exchange, and the aggregate
    * hash table all disappear. Accepted shapes: COUNT(*) grouped by
    * `zone`, or globally. Grouping by `zone` is COMPLETE pushdown —
    * an InputPartition IS one zone, so per-partition counts are final
    * group rows (guarded on the zone list being duplicate-free);
    * the global form stays PARTIAL (Spark sums the per-partition
    * counts), and every partition emits a row — count 0 included, the
    * ignore-failures "empty zone" semantic — so the final sum is
    * never null. An empty static zone list refuses pushdown (zero
    * partitions would sum to NULL where COUNT must return 0). */
  private def acceptableAgg(agg: Aggregation): Boolean = {
    val countsOnly = agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    val groupOk = agg.groupByExpressions.isEmpty ||
      (agg.groupByExpressions.length == 1 && (agg.groupByExpressions()(0) match {
        case n: NamedReference => n.fieldNames.sameElements(Array("zone"))
        case _ => false
      }))
    countsOnly && groupOk && zones.nonEmpty
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    acceptableAgg(agg) && agg.groupByExpressions.nonEmpty &&
      zones.distinct.lengthCompare(zones.length) == 0

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!acceptableAgg(agg)) false
    else {
      val byZone = agg.groupByExpressions.nonEmpty
      pushedAgg = Some(PushedCountAgg(byZone))
      required = StructType(
        (if (byZone) Seq(StructField("zone", StringType, nullable = false)) else Nil) ++
          agg.aggregateExpressions.indices
            .map(i => StructField(s"count$i", LongType, nullable = false)))
      true
    }
  }

  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    // Exact-match semantics: values compare verbatim against the
    // normalized zone names rows carry (a predicate on an
    // un-normalized name matches no rows either way).
    val (zonePreds, rest) = predicates.partition(
      p => ZonePredicates.prune(zones, p).isDefined)
    zonePreds.foreach(p => zones = ZonePredicates.prune(zones, p).get)
    pushed = zonePreds
    rest // everything else is evaluated by Spark above the scan
  }

  override def pushedPredicates(): Array[Predicate] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // After aggregate pushdown the scan's output IS the aggregation
    // schema (set in pushAggregation); column pruning no longer
    // applies to it.
    if (pushedAgg.isDefined) return
    // Preserve the connector's canonical column order; a referenced
    // metadata column (`_serial`/`_xfr_kind`) arrives appended to the
    // required schema and stays appended, in its own canonical order.
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(
      DnsSchemas.read.fields.filter(f => keep.contains(f.name)) ++
        DnsSchemas.metadata.fields.filter(f => keep.contains(f.name)))
  }

  override def build(): Scan =
    new DnsScan(opts, zones, required, pushedAgg, limit, pushed, topN, offset)
}

/** Marker for a pushed-down COUNT(*): `byZone` = grouped by `zone`
  * (complete pushdown — one final row per zone) vs global (partial —
  * Spark sums the per-partition counts). */
final case class PushedCountAgg(byZone: Boolean)

final class DnsScan(opts: DnsSourceOptions, zones: Seq[String], schema: StructType,
                    pushedAgg: Option[PushedCountAgg] = None,
                    pushedLimit: Option[Int] = None,
                    pushedPreds: Array[Predicate] = Array.empty,
                    pushedTopN: Option[PushedTopN] = None,
                    pushedOffset: Option[Int] = None)
  extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics
  with SupportsReportPartitioning with SupportsReportOrdering {

  /** Zones surviving RUNTIME filtering ([[filter]]). Static pushdown
    * already pruned `zones` at ScanBuilder time; this second stage
    * prunes against values that only exist at execution time — a
    * dynamic-partition-pruning subquery over the join's other side.
    * The reference has no pushdown at all (DnsSourceRelation.java:17);
    * here a zone pruned EITHER way is a whole zone transfer (network
    * round-trip + full zone payload) that never happens. */
  @volatile private var runtimeZones: Seq[String] = zones

  override def readSchema(): StructType = schema

  /** DSv2 custom metrics (DnsMetrics.scala): records / payload bytes /
    * IXFR→AXFR fallbacks per scan, summed across zone transfers and
    * shown in the SQL UI — batch AND streaming (the micro-batch reader
    * factory shares [[DnsPartitionReader]], whose
    * `currentMetricsValues` reports them). */
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new DnsRecordsMetric, new DnsBytesMetric, new DnsFallbacksMetric)

  override def description(): String =
    s"DnsScan(server=${opts.common.server}, zones=${runtimeZones.mkString(",")}, " +
      s"xfr=${opts.xfr}, columns=[${schema.fieldNames.mkString(",")}]" +
      (if (pushedPreds.nonEmpty)
        s", PushedPredicates=[${pushedPreds.map(_.describe()).mkString(", ")}]" else "") +
      pushedAgg.map(a => s", PushedAggregation=[COUNT(*)${if (a.byZone) " GROUP BY zone" else ""}]")
        .getOrElse("") +
      pushedTopN.map(t => s", PushedTopN=[ORDER BY ${t.orders.map(_.describe).mkString(", ")} " +
        s"LIMIT ${t.limit}]").getOrElse("") +
      pushedLimit.map(n => s", PushedLimit=LIMIT $n").getOrElse("") +
      pushedOffset.map(n => s", PushedOffset=OFFSET $n").getOrElse("") + ")"

  /** DPP handshake: declare `zone` runtime-filterable. Spark's
    * PartitionPruning rule then plants a DynamicPruningSubquery on any
    * equi-join over `zone` whose other side carries a selective filter;
    * at execution BatchScanExec evaluates it, calls [[filter]] with the
    * surviving values, and re-plans partitions — so the transfers for
    * runtime-eliminated zones never start. */
  /** Planner statistics (`SupportsReportStatistics`), reported AFTER
    * static pushdown so a pruned zone shrinks the estimate:
    * size = surviving zones × the `estimated-zone-bytes` bound,
    * rows = surviving zones × `estimated-zone-rows`, and per-COLUMN
    * statistics for `zone` — the one column whose statistics the
    * connector knows EXACTLY before any transfer runs (the zone list
    * is configuration: ndv = surviving zones, zero nulls, real name
    * lengths). Two payoffs: a handful of zones lands far under
    * `spark.sql.autoBroadcastJoinThreshold`, so Catalyst broadcasts
    * the DNS side of an equi-join with no hint — without the estimate
    * a DSv2 relation defaults to `spark.sql.defaultSizeInBytes`
    * (Long.MaxValue) and the join sort-merges a 4-zone table; and
    * under CBO the row count + zone ndv let CostBasedJoinReorder
    * order a multi-way join so the smallest estates join first
    * (plan-asserted in PlanAuditSpec). The reference reports no
    * statistics at all (DnsSourceRelation.java:17 — V1 TableScan has
    * no such surface). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val nZones = runtimeZones.length.toLong
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(nZones * opts.estimatedZoneBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(nZones * opts.estimatedZoneRows)
    override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val m = new java.util.HashMap[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (runtimeZones.nonEmpty && schema.fieldNames.contains("zone")) {
        val lens = runtimeZones.map(_.length.toLong)
        m.put(org.apache.spark.sql.connector.expressions.Expressions.column("zone"),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(nZones)
            override def nullCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(0L)
            override def avgLen(): java.util.OptionalLong =
              java.util.OptionalLong.of(lens.sum / nZones)
            override def maxLen(): java.util.OptionalLong =
              java.util.OptionalLong.of(lens.max)
          })
      }
      m
    }
  }

  /** Output partitioning (`SupportsReportPartitioning`): the scan IS
    * key-grouped by `zone` — an InputPartition is exactly one zone and
    * every row it emits carries that zone (the pushed-COUNT-by-zone
    * form included: its group rows are per-partition too). Reporting
    * it (each partition exposes its zone via [[DnsZoneInputPartition]]
    * `HasPartitionKey`) lets Catalyst drop the exchanges a zone-keyed
    * join or aggregation would otherwise plan: two dns scans joined on
    * `zone` become a storage-partitioned join — at estate scale, the
    * difference between shuffling every record of every zone and
    * joining transfer-local. Recognized when
    * `spark.sql.sources.v2.bucketing.enabled` is true (set in the
    * session builders); inert otherwise — results never change, only
    * the exchanges. Guarded on `zone` surviving projection: a scan
    * that pruned `zone` away has nothing to key-group on. */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, UnknownPartitioning}
    if (runtimeZones.nonEmpty && schema.fieldNames.contains("zone"))
      new KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("zone")),
        runtimeZones.length)
    else new UnknownPartitioning(runtimeZones.length)
  }

  /** Output ordering (`SupportsReportOrdering`): every partition is
    * exactly one zone, so within a partition the `zone` column is
    * CONSTANT — which means the scan's output is `zone ASC`-ordered
    * for free, no reader-side sort, no change to the observable
    * emission order (the IXFR deletes-before-adds contract, §2.3.4,
    * stays byte-identical). Reporting it is what deletes the Sort
    * nodes a zone-keyed sort-merge join would otherwise plan under
    * each scan: combined with [[outputPartitioning]], two dns estates
    * merge-join with NO exchange and NO sort (asserted in
    * PlanAuditSpec) — at estate scale the difference between
    * re-sorting every transferred record and streaming the join.
    * Same projection guard as the partitioning report. */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    if (runtimeZones.nonEmpty && schema.fieldNames.contains("zone"))
      Array(Expressions.sort(Expressions.column("zone"), SortDirection.ASCENDING))
    else Array.empty
  }

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("zone"))

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      // Same exact-match contract (and the same V2 Predicate algebra)
      // as the static pushdown; an unsupported shape keeps the
      // superset — Spark still applies the predicate above the scan.
      ZonePredicates.prune(runtimeZones, p).foreach(runtimeZones = _)
    }

  // Registered ONCE per scan (lazy), over the statically-pruned zone
  // list: with runtime filtering Spark calls toBatch a second time
  // after [[filter]], and re-registering would double-count. A
  // runtime-pruned zone simply never updates its accumulator.
  private lazy val accs: Map[String, ZoneVersion] = {
    // One named max-serial accumulator per zone, registered on the
    // driver at planning time (reference DnsSourceRelationProvider
    // .java:73-88); values surface in the Spark UI and feed streaming.
    val sc = SparkSession.active.sparkContext
    zones.map { z =>
      val acc = new ZoneVersion
      sc.register(acc, s"dns.zone.version.$z")
      z -> acc
    }.toMap
  }

  override def toBatch: Batch =
    new DnsBatch(opts, runtimeZones, schema,
      runtimeZones.map(z => z -> opts.serial).toMap, accs, pushedAgg, pushedLimit,
      pushedTopN, pushedOffset)

  override def toMicroBatchStream(checkpointLocation: String) =
    new DnsMicroBatchStream(opts, zones, schema, checkpointLocation)
}

/** Batch at a fixed per-zone serial snapshot. */
final class DnsBatch(opts: DnsSourceOptions, zones: Seq[String], schema: StructType,
                     serials: Map[String, Long],
                     accs: Map[String, ZoneVersion],
                     pushedAgg: Option[PushedCountAgg] = None,
                     pushedLimit: Option[Int] = None,
                     pushedTopN: Option[PushedTopN] = None,
                     pushedOffset: Option[Int] = None) extends Batch {

  override def planInputPartitions(): Array[InputPartition] =
    zones.zipWithIndex.map { case (zone, i) =>
      DnsZoneInputPartition(i, zone, serials.getOrElse(zone, opts.serial))
        .asInstanceOf[InputPartition]
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DnsReaderFactory(opts, schema, accs, pushedAgg, pushedLimit,
      pushedTopN, pushedOffset)
}

/** One partition per zone (reference DnsZonePartition.java:11-19).
  * `HasPartitionKey` exposes that zone as the partition's key-grouped
  * identity — the row-level half of the scan's
  * [[DnsScan.outputPartitioning]] contract. */
final case class DnsZoneInputPartition(index: Int, zone: String, serial: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(zone)))
}

final class DnsReaderFactory(opts: DnsSourceOptions, schema: StructType,
                             accs: Map[String, ZoneVersion],
                             pushedAgg: Option[PushedCountAgg] = None,
                             pushedLimit: Option[Int] = None,
                             pushedTopN: Option[PushedTopN] = None,
                             pushedOffset: Option[Int] = None,
                             counters: Option[DnsStreamCounters] = None)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DnsZoneInputPartition]
    new DnsPartitionReader(opts, schema, p, accs.get(p.zone), pushedAgg, pushedLimit,
      pushedTopN, pushedOffset, counters)
  }
}

/** Executor-side reader: runs the zone transfer, filters to A records
  * (done inside the client), tags actions, stamps one timestamp per
  * partition (reference DnsZoneRDD.java:63-97). IXFR deltas flatten as
  * ALL deletes then ALL adds — the global order is part of the
  * observable output (reference Xfr.java:52-74, SURVEY §2.3.4).
  */
final class DnsPartitionReader(opts: DnsSourceOptions, schema: StructType,
                               p: DnsZoneInputPartition,
                               acc: Option[ZoneVersion],
                               pushedAgg: Option[PushedCountAgg] = None,
                               pushedLimit: Option[Int] = None,
                               pushedTopN: Option[PushedTopN] = None,
                               pushedOffset: Option[Int] = None,
                               counters: Option[DnsStreamCounters] = None)
  extends PartitionReader[InternalRow] {

  // Configuration errors (unknown client name) must always propagate;
  // only the transfer itself is subject to the ignore-failures policy
  // (reference swallows transfer errors only — DnsZoneRDD.java:83-92).
  private val client = DnsClients.transferClient(opts.common)

  // Custom-metric counters, captured while the transfer materializes
  // below (reported via currentMetricsValues — DnsMetrics.scala).
  private var metricRecords = 0L
  private var metricBytes = 0L
  private var metricFallbacks = 0L

  private val rows: Iterator[InternalRow] = {
    val tsMicros = opts.fixedTimestampMicros
      .getOrElse(System.currentTimeMillis() * 1000L)
    // Per-transfer metadata-column values (`_serial`/`_xfr_kind`) —
    // runtime facts captured from the transfer result; only read when
    // the pruned schema asked for them, and a swallowed-failure zone
    // emits no rows, so the defaults are never observable.
    var xferSerial = 0L
    var xferKind = ""
    // Materialize the change list inside the guard: a lazy networked
    // client would otherwise throw during next(), outside the catch.
    val changes: Seq[(String, ARecord)] =
      try {
        val result = client.transfer(p.zone, p.serial, opts.xfr, opts.common.timeoutSec)
        acc.foreach(_.add(result.serial))
        xferSerial = result.serial
        val out = result match {
          case AxfrResult(_, records) =>
            xferKind = "AXFR"
            // RFC 1995 §4: an IXFR request answered with a full zone is
            // the server falling back — surfaced as a metric (a delta
            // request from serial 0 legitimately snapshots; not a fallback)
            if (opts.xfr == XfrType.IXFR && p.serial > 0L) metricFallbacks += 1
            records.map(r => (DnsAction.Axfr, r))
          case IxfrResult(_, deltas) =>
            xferKind = "IXFR"
            deltas.flatMap(_.deletes).map(r => (DnsAction.IxfrDelete, r)) ++
              deltas.flatMap(_.adds).map(r => (DnsAction.IxfrAdd, r))
        }
        metricRecords = out.length.toLong
        metricBytes = out.iterator.map { case (_, r) =>
          (r.fqdn.getBytes(java.nio.charset.StandardCharsets.UTF_8).length +
            r.ip.getBytes(java.nio.charset.StandardCharsets.UTF_8).length).toLong
        }.sum
        out
      } catch {
        case _: Exception if opts.ignoreFailures => Nil // swallow → empty zone (DnsZoneRDD.java:83-92)
      }
    // Streaming per-progress counters ride accumulators to the driver
    // (ReportsSourceMetrics) — same numbers as the task metrics; a
    // swallowed-failure zone contributes zeros.
    counters.foreach { c =>
      c.records.add(metricRecords)
      c.bytes.add(metricBytes)
      c.fallbacks.add(metricFallbacks)
    }
    // Pushed COUNT(*): the transfer ran above; ship count rows, not
    // record rows. Grouped-by-zone (complete pushdown) emits a group
    // row only when records exist — matching the row path, where an
    // empty or swallowed-failure zone contributes no group. The global
    // (partial) form always emits, count 0 included, so Spark's final
    // sum is never null.
    pushedAgg match {
      case Some(PushedCountAgg(byZone)) =>
        val n = changes.length.toLong
        if (byZone && n == 0L) Iterator.empty
        else {
          val row = new GenericInternalRow(schema.length)
          var i = 0
          if (byZone) { row.update(0, UTF8String.fromString(p.zone)); i = 1 }
          while (i < schema.length) { row.setLong(i, n); i += 1 }
          Iterator.single(row.asInstanceOf[InternalRow])
        }
      case None =>
        // A pushed ORDER BY may name columns the projection pruned
        // away (a COMPLETE TopN push removes the Sort node, so nothing
        // upstream keeps them alive): materialize them for the
        // comparison, project them away after.
        val sortOnly: Seq[String] = pushedTopN
          .map(_.orders.map(_.field).distinct.filterNot(schema.fieldNames.contains))
          .getOrElse(Seq.empty)
        val buildSchema = StructType(schema.fields ++ sortOnly.map(f =>
          (DnsSchemas.read.fields ++ DnsSchemas.metadata.fields).find(_.name == f)
            .getOrElse(throw new IllegalStateException(s"unknown dns sort column '$f'"))))
        // Only the pruned columns are materialized (SupportsPushDownRequiredColumns).
        val fieldWriters: Array[(InternalRow, Int, String, ARecord) => Unit] =
          buildSchema.fieldNames.map[(InternalRow, Int, String, ARecord) => Unit] {
            case "action" => (row, i, action, _) => row.update(i, UTF8String.fromString(action))
            case "fqdn" => (row, i, _, rec) => row.update(i, UTF8String.fromString(rec.fqdn.toLowerCase(java.util.Locale.ROOT)))
            case "ip" => (row, i, _, rec) => row.update(i, UTF8String.fromString(rec.ip))
            case "organization" => (row, i, _, _) => row.update(i, UTF8String.fromString(opts.organization))
            case "timestamp" => (row, i, _, _) => row.setLong(i, tsMicros)
            case "zone" => (row, i, _, _) => row.update(i, UTF8String.fromString(p.zone))
            case "_serial" => (row, i, _, _) => row.setLong(i, xferSerial)
            case "_xfr_kind" => (row, i, _, _) => row.update(i, UTF8String.fromString(xferKind))
            case other => throw new IllegalStateException(s"unknown dns column '$other'")
          }
        def build(action: String, rec: ARecord): InternalRow = {
          val row = new GenericInternalRow(fieldWriters.length)
          var i = 0
          while (i < fieldWriters.length) { fieldWriters(i)(row, i, action, rec); i += 1 }
          row
        }
        val selected: Iterator[InternalRow] = pushedTopN match {
          case Some(t) =>
            // Pushed ORDER BY ... LIMIT: in-memory sort of the zone's
            // already-materialized record list (bounded by the DNS
            // message size), stable so ties keep serve order. Take
            // BEFORE drop: a complete push arrives as
            // pushTopN(orders, k + m) + pushOffset(m).
            val cmp = topNOrdering(t, buildSchema)
            changes.map { case (a, r) => build(a, r) }.sorted(cmp)
              .iterator.take(t.limit).drop(pushedOffset.getOrElse(0))
          case None =>
            // Partial limit: stop materializing past the pushed bound —
            // Spark's global limit above the scan finishes the job (a
            // single-zone complete push takes exactly the answer).
            val limited = pushedLimit.foldLeft(
              changes.iterator.map { case (a, r) => build(a, r) })((it, n) => it.take(n))
            limited.drop(pushedOffset.getOrElse(0))
        }
        // project away sort-only columns (they sit appended, so the
        // output row is the first schema.length fields)
        if (sortOnly.isEmpty) selected
        else selected.map { r =>
          val out = new GenericInternalRow(schema.length)
          var i = 0
          while (i < schema.length) {
            schema(i).dataType match {
              case StringType => out.update(i, r.getUTF8String(i))
              case LongType | TimestampType => out.setLong(i, r.getLong(i))
              case other => throw new IllegalStateException(s"unexpected dns column type $other")
            }
            i += 1
          }
          out.asInstanceOf[InternalRow]
        }
    }
  }

  /** Row ordering for a pushed TopN: column-by-column comparison over
    * the build schema (strings and long-backed timestamps are the only
    * dns column kinds; nothing is nullable). */
  private def topNOrdering(t: PushedTopN, buildSchema: StructType): Ordering[InternalRow] = {
    val keys: Seq[(Int, DataType, Boolean)] = t.orders.map(o =>
      (buildSchema.fieldIndex(o.field), buildSchema(o.field).dataType, o.ascending))
    (a: InternalRow, b: InternalRow) => {
      var res = 0
      val it = keys.iterator
      while (res == 0 && it.hasNext) {
        val (i, dt, asc) = it.next()
        val c = dt match {
          case StringType => a.getUTF8String(i).compareTo(b.getUTF8String(i))
          case LongType | TimestampType => java.lang.Long.compare(a.getLong(i), b.getLong(i))
          case other => throw new IllegalStateException(s"unexpected dns sort column type $other")
        }
        res = if (asc) c else -c
      }
      res
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow = current

  /** Per-task custom metrics — Spark polls these as the task runs and
    * folds the final values into the scan node's SQL-UI metrics. */
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      new DnsTaskMetric(DnsMetrics.RecordsName, metricRecords),
      new DnsTaskMetric(DnsMetrics.BytesName, metricBytes),
      new DnsTaskMetric(DnsMetrics.FallbacksName, metricFallbacks))

  override def close(): Unit = ()
}
