package graft.sources.avro

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** One orders row in its Avro carrier shape — field names are the
  * gate's column names; the timestamp rides as zone-free epoch
  * micros (the q_csv_roundtrip convention). */
final case class AvroOrder(
    o_orderkey: Long, o_orderstatus: String, o_totalprice: Double,
    o_date_us: Long, hazard: String)

/** Avro Object Container File codec for the q_avro_roundtrip gate —
  * the Kafka/streaming-bus carrier, fourth in the ingest family
  * (CSV / JSONL / ORC / WARC).
  *
  * Why the core Avro API and not `format("avro")`: the spark-avro
  * CONNECTOR is an external module not present in this zero-egress
  * image (`/opt/spark/jars` ships avro-1.12.1 core only), so the
  * round-trip goes through `DataFileWriter`/`DataFileReader` at the
  * same per-partition codec seam as the image/audio/WARC codecs. The
  * files are bog-standard OCF (deflate-compressed blocks, schema in
  * the header, sync markers every block), so a deployment with the
  * module installed reads the very same files via `format("avro")`
  * with scan-side pushdown — nothing about the layout is private.
  *
  * Scale notes: OCF is SPLITTABLE — the 16-byte sync marker between
  * blocks lets a reader seek to any byte offset and resynchronize
  * (`DataFileReader.sync`), which is how a 100 TB Avro lake fans out
  * many tasks per file; here each task owns one file, the fixture
  * scale. Strings are length-prefixed binary — newlines, tabs,
  * quotes, backslashes need NO quoting/escaping (the planted hazard
  * column proves it), which is exactly why busses prefer Avro over
  * CSV. */
object AvroCodec {

  val SchemaJson: String =
    """{"type":"record","name":"Order","namespace":"graft","fields":[
      |{"name":"o_orderkey","type":"long"},
      |{"name":"o_orderstatus","type":"string"},
      |{"name":"o_totalprice","type":"double"},
      |{"name":"o_date_us","type":"long"},
      |{"name":"hazard","type":"string"}]}""".stripMargin

  // Schema is not serializable-stable across closures; parse per use
  private def schema: Schema = new Schema.Parser().parse(SchemaJson)

  /** Write one OCF file from an iterator — called once per writer
    * task ATTEMPT. Callers must pass an attempt-unique path and
    * rename into place (see qAvroRoundtrip): `create` truncates, so a
    * retry on the same path is clean, but two LIVE speculative
    * attempts sharing a path would interleave writes. */
  def write(path: String, rows: Iterator[AvroOrder]): Long = {
    val sch = schema
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(sch, new java.io.File(path))
    var n = 0L
    try rows.foreach { r =>
      val rec = new GenericData.Record(sch)
      rec.put("o_orderkey", r.o_orderkey)
      rec.put("o_orderstatus", r.o_orderstatus)
      rec.put("o_totalprice", r.o_totalprice)
      rec.put("o_date_us", r.o_date_us)
      rec.put("hazard", r.hazard)
      w.append(rec)
      n += 1
    } finally w.close()
    n
  }

  /** Read one OCF file back. The reader takes the schema from the
    * FILE header (writer schema) — the round-trip must not depend on
    * the reader knowing anything but the field names. */
  def read(path: String): Iterator[AvroOrder] = {
    val r = new DataFileReader(new java.io.File(path),
      new GenericDatumReader[GenericRecord]())
    new Iterator[AvroOrder] {
      // hasNext itself decodes the next block header — a corrupt
      // sync/block boundary throws HERE, not in next(), so it gets
      // the same close-before-rethrow treatment (advice r17: the r16
      // leak fix covered only half the decode surface).
      def hasNext: Boolean = {
        val h = try r.hasNext catch { case t: Throwable => r.close(); throw t }
        if (!h) r.close()
        h
      }
      // decode failures must not leak the handle (advice r16): close
      // before rethrowing — an abandoned early-stopped iterator still
      // leaks until GC, which is why bulk callers should prefer
      // [[readAll]]'s loan pattern.
      def next(): AvroOrder = {
        val rec = try r.next() catch { case t: Throwable => r.close(); throw t }
        AvroOrder(
          rec.get("o_orderkey").asInstanceOf[Long],
          rec.get("o_orderstatus").toString, // Utf8 → String
          rec.get("o_totalprice").asInstanceOf[Double],
          rec.get("o_date_us").asInstanceOf[Long],
          rec.get("hazard").toString)
      }
    }
  }

  /** Loan-pattern full read — drains the file and closes the handle in
    * `finally`, so no caller can leak it by stopping early. */
  def readAll(path: String): Seq[AvroOrder] = {
    val r = new DataFileReader(new java.io.File(path),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[AvroOrder]
      while (r.hasNext) {
        val rec = r.next()
        out += AvroOrder(
          rec.get("o_orderkey").asInstanceOf[Long],
          rec.get("o_orderstatus").toString,
          rec.get("o_totalprice").asInstanceOf[Double],
          rec.get("o_date_us").asInstanceOf[Long],
          rec.get("hazard").toString)
      }
      out.result()
    } finally r.close()
  }
}
