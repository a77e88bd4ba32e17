package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the URL canonicalizer (q_url_canonical) beyond the
  * fixture gate: canonicalization must be IDEMPOTENT (a canonical URL
  * re-canonicalizes to itself — the property that makes "canonicalize
  * at ingest, join on the column forever" sound), and transport noise
  * (scheme/host case, default ports, fragments, tracking params, param
  * order) must be exactly the equivalence it erases. */
class UrlCanonicalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(PipelineOps.urlCanonical("url").as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalization is idempotent on every fixture-shaped URL") {
    val hazards = for {
      scheme <- Seq("https", "HTTPS", "http", "HTTP")
      port <- Seq("", ":443", ":80", ":8080")
      path <- Seq("", "/", "/p/3", "/a/b.html")
      query <- Seq("", "?utm_source=x", "?z=9&a=7", "?utm_campaign=c&id=1&fbclid=f")
      frag <- Seq("", "#top")
    } yield s"$scheme://WwW.ExAmPle.com$port$path$query$frag"
    val once = canon(hazards)
    val twice = canon(once)
    assert(once == twice, "canonicalize(canonicalize(u)) != canonicalize(u)")
  }

  test("transport-noise variants collapse to one canonical form; real differences survive") {
    val variants = Seq(
      "https://site.com/p?b=2&a=1",
      "HTTPS://SITE.COM:443/p?a=1&b=2",
      "https://site.com:443/p?utm_source=feed&b=2&a=1#frag")
    assert(canon(variants).distinct.size == 1, canon(variants).mkString(", "))
    val different = Seq(
      "https://site.com/p?a=1&b=2",   // the collapsed form above
      "https://site.com:8080/p?a=1&b=2", // real port
      "http://site.com/p?a=1&b=2",    // different scheme
      "https://site.com/p?a=1&b=3")   // different param VALUE
    assert(canon(different).distinct.size == 4, canon(different).mkString(", "))
  }

  test("http default port :80 strips; :443 on http is a REAL port and survives") {
    assert(canon(Seq("http://h.com:80/x")) == Seq("http://h.com/x"))
    assert(canon(Seq("http://h.com:443/x")) == Seq("http://h.com:443/x"))
  }
}
