package graft.sources.dns.read

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
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

final class DnsTable(opts: DnsSourceOptions) extends Table with SupportsRead {
  override def name(): String =
    s"dns(${opts.common.server}:${opts.common.port})[${opts.zones.mkString(",")}]"

  override def schema(): StructType = DnsSchemas.read

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
      .asJava // streaming: DnsMicroBatchStream (DnsStreamConnector.scala)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DnsScanBuilder(opts)
}

final class DnsScanBuilder(opts: DnsSourceOptions) extends ScanBuilder {
  override def build(): Scan = new DnsScan(opts)
}

final class DnsScan(opts: DnsSourceOptions) extends Scan {
  override def readSchema(): StructType = DnsSchemas.read

  override def description(): String =
    s"DnsScan(server=${opts.common.server}, zones=${opts.zones.mkString(",")}, xfr=${opts.xfr})"

  override def toBatch: Batch = {
    // One named max-serial accumulator per zone, registered on the
    // driver at planning time (reference DnsSourceRelationProvider
    // .java:73-88); values surface in the Spark UI and feed streaming.
    val sc = SparkSession.active.sparkContext
    val accs = opts.zones.map { z =>
      val acc = new ZoneVersion
      sc.register(acc, s"dns.zone.version.$z")
      z -> acc
    }.toMap
    new DnsBatch(opts, opts.zones.map(z => z -> opts.serial).toMap, accs)
  }

  override def toMicroBatchStream(checkpointLocation: String) =
    new DnsMicroBatchStream(opts, checkpointLocation)
}

/** Batch at a fixed per-zone serial snapshot. Also reused by the
  * micro-batch stream for each batch's partition planning. */
final class DnsBatch(opts: DnsSourceOptions, serials: Map[String, Long],
                     accs: Map[String, ZoneVersion]) extends Batch {

  override def planInputPartitions(): Array[InputPartition] =
    opts.zones.zipWithIndex.map { case (zone, i) =>
      DnsZoneInputPartition(i, zone, serials.getOrElse(zone, opts.serial))
        .asInstanceOf[InputPartition]
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DnsReaderFactory(opts, accs)
}

/** One partition per zone (reference DnsZonePartition.java:11-19). */
final case class DnsZoneInputPartition(index: Int, zone: String, serial: Long)
  extends InputPartition

final class DnsReaderFactory(opts: DnsSourceOptions,
                             accs: Map[String, ZoneVersion])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DnsZoneInputPartition]
    new DnsPartitionReader(opts, p, accs.get(p.zone))
  }
}

/** Executor-side reader: runs the zone transfer, filters to A records
  * (done inside the client), tags actions, stamps one timestamp per
  * partition (reference DnsZoneRDD.java:63-97). IXFR deltas flatten as
  * ALL deletes then ALL adds — the global order is part of the
  * observable output (reference Xfr.java:52-74, SURVEY §2.3.4).
  */
final class DnsPartitionReader(opts: DnsSourceOptions, p: DnsZoneInputPartition,
                               acc: Option[ZoneVersion])
  extends PartitionReader[InternalRow] {

  // Configuration errors (unknown client name) must always propagate;
  // only the transfer itself is subject to the ignore-failures policy
  // (reference swallows transfer errors only — DnsZoneRDD.java:83-92).
  private val client = DnsClients.transferClient(opts.common)

  private val rows: Iterator[InternalRow] = {
    val tsMicros = opts.fixedTimestampMicros
      .getOrElse(System.currentTimeMillis() * 1000L)
    // Materialize the change list inside the guard: a lazy networked
    // client would otherwise throw during next(), outside the catch.
    val changes: Seq[(String, ARecord)] =
      try {
        val result = client.transfer(p.zone, p.serial, opts.xfr, opts.common.timeoutSec)
        acc.foreach(_.add(result.serial))
        result match {
          case AxfrResult(_, records) =>
            records.map(r => (DnsAction.Axfr, r))
          case IxfrResult(_, deltas) =>
            deltas.flatMap(_.deletes).map(r => (DnsAction.IxfrDelete, r)) ++
              deltas.flatMap(_.adds).map(r => (DnsAction.IxfrAdd, r))
        }
      } catch {
        case _: Exception if opts.ignoreFailures => Nil // swallow → empty zone (DnsZoneRDD.java:83-92)
      }
    changes.iterator.map { case (action, rec) =>
      val row = new GenericInternalRow(6)
      row.update(0, UTF8String.fromString(action))
      row.update(1, UTF8String.fromString(rec.fqdn.toLowerCase))
      row.update(2, UTF8String.fromString(rec.ip))
      row.update(3, UTF8String.fromString(opts.organization))
      row.setLong(4, tsMicros)
      row.update(5, UTF8String.fromString(p.zone))
      row.asInstanceOf[InternalRow]
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow = current

  override def close(): Unit = ()
}
