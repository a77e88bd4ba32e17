package graft.sources.warc

/** One decompressed gzip member plus its position in the compressed
  * stream — `comp_offset`/`comp_len` are what make the member a
  * RESUME POINT: a reader seeking to `comp_offset` can start a fresh
  * parse and reproduce every following member (proven in
  * WarcGzSpec, the `.warc.gz` twin of AvroCodecSpec's sync() proof). */
final case class GzipMember(
    member_idx: Long, comp_offset: Long, comp_len: Long, bytes: Array[Byte])

/** Concatenated-gzip (RFC 1952 multi-member) reader — the layout
  * every real `.warc.gz` crawl corpus uses: ONE record per gzip
  * member, members concatenated, so the file splits at member
  * boundaries without decompressing the whole stream.
  *
  * Why not `GZIPInputStream`: the JDK stream's multi-member read loop
  * exists but hides member boundaries (it silently concatenates
  * members — the classic "stops at the first member" bug is its
  * single-member sibling), and boundary OFFSETS are the whole point
  * here. This reader parses each member's header by the spec
  * (magic/CM/FLG + the four optional FEXTRA/FNAME/FCOMMENT/FHCRC
  * fields), inflates the raw deflate body with `Inflater(nowrap)`,
  * locates the member end via `getRemaining`, and VERIFIES the
  * CRC32 + ISIZE trailer — a corrupt member fails loudly at its
  * offset, never by resynchronizing past bad bytes (the
  * [[WarcCodec]] discipline).
  *
  * Scale shape: the same per-partition codec seam as [[WarcCodec]] —
  * one task per file (or per member range once offsets are indexed),
  * sequential scan where the bytes live, nothing shuffles but
  * projected fields. */
object GzipMembers {

  /** Split `bytes` into its gzip members, decompressed, with
    * compressed offsets. `from` starts mid-stream at a member
    * boundary (the resume-point surface; member_idx then counts from
    * 0 at the resume point, offsets stay absolute). */
  def split(bytes: Array[Byte], from: Int = 0): Seq[GzipMember] =
    split(bytes, from, Int.MaxValue)

  /** The RANDOM-ACCESS entry point a CDX index drives: seek to a
    * known member boundary and parse EXACTLY ONE member — the cost is
    * that member's bytes, independent of file size (the point-read
    * half of `q_warc_cdx`; equality with the sequential parse pinned
    * in WarcGzSpec). Loud on a non-boundary offset like every other
    * entry point. */
  def first(bytes: Array[Byte], from: Int): GzipMember = {
    val one = split(bytes, from, maxMembers = 1)
    require(one.nonEmpty, s"gz: no member at offset $from") // from == bytes.length
    one.head
  }

  private def split(bytes: Array[Byte], from: Int, maxMembers: Int): Seq[GzipMember] = {
    // A resume offset outside the stream is a caller bug, not a
    // boundary condition: negative would AIOOBE below, past-the-end
    // would silently yield zero members — both must surface loudly
    // like any non-boundary offset (advice r17).
    require(from >= 0 && from <= bytes.length,
      s"gz: resume offset $from out of range [0, ${bytes.length}]")
    val out = Seq.newBuilder[GzipMember]
    var pos = from
    var idx = 0L
    def u8(i: Int): Int = {
      require(i < bytes.length, s"gz: truncated member at byte $pos (need byte $i)")
      bytes(i) & 0xFF
    }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    while (pos < bytes.length && idx < maxMembers) {
      val start = pos
      require(u8(pos) == 0x1F && u8(pos + 1) == 0x8B,
        s"gz: bad magic at byte $pos (not a member boundary)")
      require(u8(pos + 2) == 8, s"gz: member at $pos has CM=${u8(pos + 2)}, want 8 (deflate)")
      val flg = u8(pos + 3)
      require((flg & 0xE0) == 0, s"gz: member at $pos sets reserved FLG bits")
      pos += 10 // magic, CM, FLG, MTIME(4), XFL, OS
      if ((flg & 4) != 0) pos += 2 + u16(pos) // FEXTRA
      if ((flg & 8) != 0) { while (u8(pos) != 0) pos += 1; pos += 1 } // FNAME
      if ((flg & 16) != 0) { while (u8(pos) != 0) pos += 1; pos += 1 } // FCOMMENT
      if ((flg & 2) != 0) pos += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, pos, bytes.length - pos)
        val chunk = new Array[Byte](64 * 1024)
        val body = new java.io.ByteArrayOutputStream()
        while (!inf.finished()) {
          val n = inf.inflate(chunk)
          require(n > 0 || inf.finished(),
            s"gz: member at $start needs more input (truncated deflate stream)")
          body.write(chunk, 0, n)
        }
        val deflateEnd = bytes.length - inf.getRemaining
        val data = body.toByteArray
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        require(u32(deflateEnd) == crc.getValue,
          s"gz: member at $start fails CRC32 — corrupt member must surface, not resync")
        require(u32(deflateEnd + 4) == (data.length.toLong & 0xFFFFFFFFL),
          s"gz: member at $start ISIZE ${u32(deflateEnd + 4)} != ${data.length}")
        pos = deflateEnd + 8
        out += GzipMember(idx, start.toLong, (pos - start).toLong, data)
        idx += 1
      } finally inf.end()
    }
    out.result()
  }

  /** Compress `data` as ONE gzip member (the record-per-member
    * writer half; deterministic: fixed level, zeroed MTIME). */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      `def`.setLevel(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    }
    try { gz.write(data); gz.finish() } finally gz.close()
    bos.toByteArray
  }
}
