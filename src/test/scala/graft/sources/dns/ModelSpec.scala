package graft.sources.dns

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ModelSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("Fqdn.normalize appends the trailing dot exactly once") {
    assert(Fqdn.normalize("mail.google.com") == "mail.google.com.")
    assert(Fqdn.normalize("mail.google.com.") == "mail.google.com.")
  }

  test("Fqdn.zoneOf strips the first label, keeps absolute form") {
    assert(Fqdn.zoneOf("mail.google.com") == "google.com.")
    assert(Fqdn.zoneOf("mail.google.com.") == "google.com.")
    assert(Fqdn.zoneOf("a.b.c.d.example.acme.") == "b.c.d.example.acme.")
  }

  test("Fqdn.zoneOf of a single-label name is the root zone") {
    assert(Fqdn.zoneOf("host") == ".")
    assert(Fqdn.zoneOf("host.") == ".")
  }

  private val label = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("property: normalize is idempotent") {
    check(Prop.forAll(Gen.nonEmptyListOf(label).map(_.mkString("."))) { name =>
      Fqdn.normalize(Fqdn.normalize(name)) == Fqdn.normalize(name)
    })
  }

  test("property: zoneOf(label + '.' + rest) == normalize(rest)") {
    check(Prop.forAll(label, Gen.nonEmptyListOf(label).map(_.mkString("."))) { (l, rest) =>
      Fqdn.zoneOf(s"$l.$rest") == Fqdn.normalize(rest)
    })
  }

  test("XfrType parse is case-insensitive, rejects junk") {
    assert(XfrType.parse("axfr") == XfrType.AXFR)
    assert(XfrType.parse(" IxFr ") == XfrType.IXFR)
    intercept[IllegalArgumentException](XfrType.parse("ftp"))
  }

  test("source options: defaults, zone de-dup + normalization") {
    val o = DnsOptions.source(Map(
      "server" -> "dns1", "organization" -> "acme",
      "zones" -> "example.acme, another.zone.,example.acme"))
    assert(o.common.port == 53)
    assert(o.common.timeoutSec == 10)
    assert(o.serial == 0L)
    assert(o.xfr == XfrType.IXFR)
    assert(!o.ignoreFailures)
    assert(o.maxKeptCommits == 10)
    assert(o.zones == Seq("example.acme.", "another.zone."))
  }

  test("source options: missing required keys fail") {
    intercept[IllegalArgumentException](
      DnsOptions.source(Map("organization" -> "a", "zones" -> "z")))
    intercept[IllegalArgumentException](
      DnsOptions.source(Map("server" -> "s", "zones" -> "z")))
    intercept[IllegalArgumentException](
      DnsOptions.source(Map("server" -> "s", "organization" -> "a")))
  }

  test("source options: range validation") {
    val base = Map("server" -> "s", "organization" -> "a", "zones" -> "z")
    intercept[IllegalArgumentException](DnsOptions.source(base + ("port" -> "0")))
    intercept[IllegalArgumentException](DnsOptions.source(base + ("port" -> "70000")))
    intercept[IllegalArgumentException](DnsOptions.source(base + ("serial" -> "-1")))
    intercept[IllegalArgumentException](DnsOptions.source(base + ("max-kept-commits" -> "0")))
  }

  test("offset json round-trips, nonce forces inequality") {
    import graft.sources.dns.read.DnsOffset
    val o = DnsOffset(Map("example.acme." -> 7L, "another.zone." -> 3L), 42L)
    assert(DnsOffset.fromJson(o.json()) == o)
    assert(o.json() != DnsOffset(o.serials, 43L).json())
  }

  test("property: LWW dedup keeps max timestamp for any permutation") {
    // Mirrors the sink's dedup contract (reference DnsUpdate.java:46-54).
    val recs = (1 to 6).map(i =>
      DnsUpdateRecord(DnsAction.IxfrAdd, "h.z.acme.", "10.0.0.1", i.toLong * 1000, 60))
    check(Prop.forAll(Gen.const(())) { _ =>
      val shuffled = scala.util.Random.shuffle(recs.toList)
      val winner = shuffled.maxBy(_.timestampMicros)
      winner.timestampMicros == 6000L
    })
  }
}
