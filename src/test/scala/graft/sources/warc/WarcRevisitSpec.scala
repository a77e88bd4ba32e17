package graft.sources.warc

import org.scalatest.funsuite.AnyFunSuite

/** Revisit-record parsing (record-identity headers) and the
  * resolution contract: a dangling WARC-Refers-To must fail LOUDLY,
  * never drop or null-extend (the q_warc_revisit discipline). */
class WarcRevisitSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def rec(typ: String, uri: String, payload: String,
      extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      extra +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"

  test("record-identity headers parse; absent headers stay empty") {
    val bytes = (
      rec("response", "http://x/1", "content-one",
        "WARC-Record-ID: <urn:a:1>\r\n") +
      rec("revisit", "http://x/1", "",
        "WARC-Record-ID: <urn:a:2>\r\nWARC-Refers-To: <urn:a:1>\r\n" +
          "WARC-Payload-Digest: md5:abc123\r\n")).getBytes("UTF-8")
    val out = WarcCodec.parse(0L, bytes)
    assert(out.map(_.record_id) == Seq("<urn:a:1>", "<urn:a:2>"))
    assert(out.map(_.refers_to) == Seq("", "<urn:a:1>"))
    assert(out.map(_.payload_digest) == Seq("", "md5:abc123"))
    assert(out(1).content_length == 0L, "revisit stores no payload")
  }

  test("resolution: dangling WARC-Refers-To fails loudly, never silently") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val recs = Seq(
      ("response", "<urn:a:1>", "", "h1"),
      ("revisit", "<urn:a:2>", "<urn:a:MISSING>", "")) // refers to nothing
      .toDF("warc_type", "record_id", "refers_to", "own_md5")
    val responses = recs.where($"warc_type" === "response")
      .select($"record_id".as("ref_id"), $"own_md5".as("ref_md5"))
    val resolved = recs.where($"warc_type" === "revisit")
      .join(responses, $"refers_to" === $"ref_id", "left")
      .where(coalesce(assert_true($"ref_md5".isNotNull,
        concat(lit("dangling WARC-Refers-To "), $"refers_to")), lit(true)))
    val e = intercept[Exception](resolved.collect())
    // the failure names the dangling reference (runtime assert message
    // may arrive wrapped in a SparkException chain)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("urn:a:MISSING")), messages(e).mkString("|"))
  }
}
