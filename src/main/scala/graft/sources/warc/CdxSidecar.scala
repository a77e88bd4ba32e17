package graft.sources.warc

/** One CDX index entry: where a member lives in the compressed
  * stream and which URI its (first) record targets. */
final case class CdxEntry(uri: String, compOffset: Long, compLen: Long)

/** Minimal CDX-style sidecar index for record-per-member `.warc.gz`
  * files — the role real CDX files play for crawl archives: member
  * offsets that make records randomly addressable
  * ([[GzipMembers.first]] seeks straight to an offset; `q_warc_cdx`
  * gates the equivalence of point and sequential reads). Format: one
  * tab-separated `uri<TAB>comp_offset<TAB>comp_len` line per member,
  * in member order (the line number IS the member index). Tabs cannot
  * appear in a WARC-Target-URI header value (the header line is
  * CRLF-terminated and values are trimmed tokens), so the field
  * separator is unambiguous; malformed lines fail loudly — a corrupt
  * index must surface, never silently mis-seek. */
object CdxSidecar {

  /** Sidecar path convention: `<file>.cdx` beside the `.warc.gz`. */
  def fileFor(warcGz: java.io.File): java.io.File =
    new java.io.File(warcGz.getPath + ".cdx")

  /** Build the index from a file's bytes: ONE sequential codec-seam
    * pass (the `q_warc_cdx` build shape) — split members, parse each
    * member's first record for its URI, keep the member coordinates. */
  def build(bytes: Array[Byte]): Seq[CdxEntry] =
    GzipMembers.split(bytes).map { m =>
      val recs = WarcCodec.parse(0L, m.bytes)
      require(recs.nonEmpty,
        s"cdx: member ${m.member_idx} at offset ${m.comp_offset} parsed to zero records")
      CdxEntry(recs.head.target_uri, m.comp_offset, m.comp_len)
    }

  def write(sidecar: java.io.File, entries: Seq[CdxEntry]): Unit = {
    val sb = new StringBuilder
    entries.foreach { e =>
      require(e.uri.indexOf('\t') < 0 && e.uri.indexOf('\n') < 0,
        s"cdx: uri contains a separator character: '${e.uri}'")
      sb.append(e.uri).append('\t').append(e.compOffset)
        .append('\t').append(e.compLen).append('\n')
    }
    java.nio.file.Files.writeString(sidecar.toPath, sb.toString): Unit
  }

  def read(sidecar: java.io.File): Seq[CdxEntry] =
    java.nio.file.Files.readString(sidecar.toPath)
      .split("\n").toSeq.filter(_.nonEmpty).zipWithIndex.map { case (line, i) =>
        line.split("\t", -1) match {
          case Array(uri, off, len) =>
            try CdxEntry(uri, off.toLong, len.toLong) catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"cdx[${sidecar.getName}]: bad numbers on line $i: '$line'")
            }
          case _ => throw new IllegalArgumentException(
            s"cdx[${sidecar.getName}]: malformed line $i: '$line'")
        }
      }
}
