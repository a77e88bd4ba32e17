package graft.sources.warc

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contract of the concatenated-gzip member reader, and
  * the `.warc.gz` splittability claim made at WarcCodec.scala:29-32 —
  * a mid-stream member boundary is a valid RESUME POINT (the Avro
  * `sync()` precedent, AvroCodecSpec). */
class WarcGzSpec extends AnyFunSuite {

  private def rec(typ: String, uri: String, payload: String): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"

  private val records = Seq(
    rec("warcinfo", "", "software: graft\r\n"),
    rec("request", "http://x/1", "GET /1 HTTP/1.1\r\n\r\n"),
    rec("response", "http://x/1", "<html>" + ("repetitive " * 100) + "</html>"),
    rec("response", "http://x/2", "short"))

  private def stream: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach(r => bos.write(GzipMembers.gzipMember(r.getBytes("UTF-8"))))
    bos.toByteArray
  }

  test("record-per-member round trip: bytes, order, offsets, lengths") {
    val bytes = stream
    val ms = GzipMembers.split(bytes)
    assert(ms.map(_.member_idx) == Seq(0L, 1L, 2L, 3L))
    assert(ms.map(m => new String(m.bytes, "UTF-8")) == records)
    // offsets tile the stream exactly: contiguous, in order, covering
    assert(ms.head.comp_offset == 0L)
    ms.sliding(2).foreach { case Seq(a, b) =>
      assert(a.comp_offset + a.comp_len == b.comp_offset)
    case _ => ()
    }
    assert(ms.last.comp_offset + ms.last.comp_len == bytes.length.toLong)
    // each member parses as exactly one WARC record
    ms.foreach(m => assert(WarcCodec.parse(0L, m.bytes).size == 1))
  }

  test("a mid-stream member boundary is a valid resume point") {
    val bytes = stream
    val full = GzipMembers.split(bytes)
    // resume at EVERY member boundary: the suffix parse reproduces
    // the full parse's decompressed bytes and absolute offsets —
    // this is what lets a 100 TB .warc.gz fan out tasks per member
    // range without decompressing from byte 0
    full.foreach { at =>
      val resumed = GzipMembers.split(bytes, at.comp_offset.toInt)
      assert(resumed.map(m => new String(m.bytes, "UTF-8")) ==
        full.drop(at.member_idx.toInt).map(m => new String(m.bytes, "UTF-8")))
      assert(resumed.map(_.comp_offset) ==
        full.drop(at.member_idx.toInt).map(_.comp_offset),
        s"absolute offsets must survive a resume at ${at.comp_offset}")
    }
  }

  test("read-at-offset: first() reproduces each member and parses ONLY it") {
    // the q_warc_cdx random-access contract: seeking to a CDX offset
    // and parsing one member equals the sequential parse of that
    // member — for EVERY boundary, including the last
    val bytes = stream
    val ms = GzipMembers.split(bytes)
    ms.foreach { m =>
      val one = GzipMembers.first(bytes, m.comp_offset.toInt)
      assert(one.bytes.toSeq == m.bytes.toSeq, s"member ${m.member_idx} bytes")
      assert(one.comp_len == m.comp_len, s"member ${m.member_idx} comp_len")
      assert(one.comp_offset == m.comp_offset)
      assert(one.member_idx == 0L, "idx counts from the resume point")
    }
    // stops after one member even with the rest of the stream behind it
    assert(GzipMembers.first(bytes, 0).comp_len == ms.head.comp_len)
    // out-of-range / end-of-stream offsets are loud
    intercept[IllegalArgumentException](GzipMembers.first(bytes, bytes.length))
    intercept[IllegalArgumentException](GzipMembers.first(bytes, -1))
    intercept[IllegalArgumentException](GzipMembers.split(bytes, -1))
    intercept[IllegalArgumentException](GzipMembers.split(bytes, bytes.length + 1))
  }

  test("a NON-boundary offset fails loudly, not by resynchronizing") {
    val bytes = stream
    val e = intercept[IllegalArgumentException](GzipMembers.split(bytes, 3))
    assert(e.getMessage.contains("not a member boundary"))
  }

  test("JDK multi-member semantics pinned: GZIPInputStream concatenates, we split") {
    // the classic bug this reader exists to avoid: JDK GZIPInputStream
    // DOES read past the first member (multi-member loop), but hides
    // every boundary; a naive new GZIPInputStream + readAllBytes gives
    // one concatenated blob — correct bytes, zero split points
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(stream))
    val blob = new String(in.readAllBytes(), "UTF-8")
    in.close()
    assert(blob == records.mkString)
    assert(GzipMembers.split(stream).size == records.size)
  }

  test("corruption fails loudly at the member: CRC32, ISIZE, truncation") {
    val bytes = stream
    // flip one payload byte inside member 2's deflate body
    val m2 = GzipMembers.split(bytes)(2)
    val corrupt = bytes.clone()
    corrupt((m2.comp_offset + m2.comp_len / 2).toInt) =
      (corrupt((m2.comp_offset + m2.comp_len / 2).toInt) ^ 0x01).toByte
    val e = intercept[Exception](GzipMembers.split(corrupt))
    assert(e.getMessage != null) // inflate error or CRC mismatch — loud either way
    // truncated final member
    val e2 = intercept[IllegalArgumentException](
      GzipMembers.split(bytes.take(bytes.length - 4)))
    assert(e2.getMessage.contains("truncated"))
    // trailer ISIZE mismatch (flip a trailer byte past the CRC)
    val bad = bytes.clone()
    bad(bytes.length - 1) = (bad(bytes.length - 1) ^ 0x7F).toByte
    val e3 = intercept[IllegalArgumentException](GzipMembers.split(bad))
    assert(e3.getMessage.contains("ISIZE"))
  }

  test("FNAME/FCOMMENT/FEXTRA/FHCRC header fields are consumed correctly") {
    // hand-build a member with FNAME + FCOMMENT + FEXTRA + FHCRC set:
    // real crawl tooling emits FNAME routinely
    val payload = "named member".getBytes("UTF-8")
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val body = new Array[Byte](256)
    val n = d.deflate(body); d.end()
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    val bos = new java.io.ByteArrayOutputStream()
    val header = Array[Int](0x1F, 0x8B, 8, 4 | 8 | 16 | 2, 0, 0, 0, 0, 0, 0xFF)
      .map(_.toByte)
    bos.write(header)
    bos.write(Array[Byte](3, 0)); bos.write(Array[Byte](1, 2, 3)) // FEXTRA len=3
    bos.write("file.warc".getBytes("UTF-8")); bos.write(0) // FNAME
    bos.write("a comment".getBytes("UTF-8")); bos.write(0) // FCOMMENT
    bos.write(Array[Byte](0, 0)) // FHCRC (unverified 16 bits, consumed)
    bos.write(body, 0, n)
    val trailer = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt).putInt(payload.length)
    bos.write(trailer.array())
    bos.write(GzipMembers.gzipMember("second".getBytes("UTF-8")))
    val ms = GzipMembers.split(bos.toByteArray)
    assert(ms.map(m => new String(m.bytes, "UTF-8")) == Seq("named member", "second"))
  }
}
