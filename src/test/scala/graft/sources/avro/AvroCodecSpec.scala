package graft.sources.avro

import org.scalatest.funsuite.AnyFunSuite

/** The OCF codec under the q_avro_roundtrip gate, plus the
  * splittability claim SCALE.md makes: sync markers let a reader
  * start mid-file — proven here, not just cited. */
class AvroCodecSpec extends AnyFunSuite {

  private def rows(n: Int): Seq[AvroOrder] =
    (0 until n).map(i => AvroOrder(i.toLong, s"S${i % 3}",
      i * 1.25, 1000000L * i, s"hz\n\t\"${i % 7}\\x"))

  private def tmpFile(): java.io.File = {
    val f = java.io.File.createTempFile("graft-avro", ".avro")
    f.deleteOnExit()
    f
  }

  test("write/read round-trip preserves every field incl. control-char hazards") {
    val f = tmpFile()
    val in = rows(500)
    assert(AvroCodec.write(f.getPath, in.iterator) == 500L)
    val out = AvroCodec.read(f.getPath).toSeq
    assert(out == in)
  }

  test("sync markers: a reader seeked mid-file yields exactly a record-aligned suffix") {
    // the 100 TB fan-out path: N tasks each sync() to their byte range
    // and read whole blocks — here one seek proves block alignment
    val f = tmpFile()
    val in = rows(20000) // enough rows for many blocks at any interval
    AvroCodec.write(f.getPath, in.iterator)
    val r = new org.apache.avro.file.DataFileReader(
      f, new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    r.sync(f.length() / 2)
    val tail = Iterator.continually(r).takeWhile(_.hasNext)
      .map(_.next().get("o_orderkey").asInstanceOf[Long]).toSeq
    r.close()
    assert(tail.nonEmpty && tail.size < in.size,
      s"expected a proper suffix, got ${tail.size} of ${in.size}")
    // the suffix is record-aligned and contiguous to the end
    assert(tail == (in.size - tail.size until in.size).map(_.toLong))
  }

  test("reader takes the schema from the file header, not the caller") {
    val f = tmpFile()
    AvroCodec.write(f.getPath, rows(3).iterator)
    // read with a schema-less GenericDatumReader — exactly what
    // AvroCodec.read does; a wrong header would fail loudly here
    val out = AvroCodec.read(f.getPath).toSeq
    assert(out.map(_.o_orderstatus) == Seq("S0", "S1", "S2"))
  }
}
