package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The ingest pair's oracle gates prove aggregate losslessness; this
  * spec pins the mechanics underneath: the written CSV really quotes
  * (the hazard column embeds the delimiter and quote char), the
  * written JSONL really stays one-record-one-line with the newline
  * escaped, and a sampled row round-trips to literal string equality. */
class IngestRoundtripSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("CSV hazard column survives write+read literally, and the file quotes") {
    import spark.implicits._
    // run the gate query first so the scratch layout exists
    Storage.qCsvRoundtrip(spark, dir).collect()
    val base = Scratch.dir("csv_roundtrip", dir)
    val row = spark.read
      .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, " +
        "o_date_us LONG, hazard STRING")
      .option("header", "true").csv(base)
      .filter($"o_orderkey" === 1L).collect()
    assert(row.length == 1)
    val hazard = row(0).getString(4)
    assert(hazard.startsWith("v,\"") && hazard.endsWith("\\x"),
      s"hazard did not round-trip: $hazard")
    // the raw bytes must contain a QUOTED field (writer really quoted)
    val files = new java.io.File(base).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val raw = new String(java.nio.file.Files.readAllBytes(files.head.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(raw.contains("\"v,"), "expected a quoted hazard field in the raw CSV")
  }

  test("JSONL keeps one record per line with the newline escaped") {
    import spark.implicits._
    Storage.qJsonlRoundtrip(spark, dir).collect()
    val base = Scratch.dir("jsonl_roundtrip", dir)
    val row = spark.read.schema("doc_id LONG, lang STRING, hazard STRING")
      .json(base).filter($"doc_id" === 1L).collect()
    assert(row.length == 1)
    val hazard = row(0).getString(2)
    assert(hazard.startsWith("l1\n\t\"") && hazard.endsWith("\\end"),
      s"hazard did not round-trip: $hazard")
    val files = new java.io.File(base).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    val lines = java.nio.file.Files.readAllLines(files.head.toPath)
    // every physical line is one complete JSON object (line-splittable)
    lines.forEach { l =>
      assert(l.trim.isEmpty || (l.startsWith("{") && l.endsWith("}")),
        s"line is not a complete record: $l")
    }
    assert(lines.stream().anyMatch(_.contains("\\n")),
      "expected an escaped newline in the raw JSONL")
  }
}
