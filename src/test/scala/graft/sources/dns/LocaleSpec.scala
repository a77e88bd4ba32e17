package graft.sources.dns

import java.util.Locale
import org.scalatest.funsuite.AnyFunSuite

/** DNS case-insensitivity is ASCII-only (RFC 4343); the JVM's default
  * `toLowerCase`/`toUpperCase` are LOCALE-sensitive, and under a
  * Turkish default locale "I".toLowerCase is the dotless "ı" — a
  * silently corrupted owner name or an option key that no longer
  * matches. Every case fold in the connector pins Locale.ROOT; this
  * spec runs the affected paths with Turkish as the JVM default to
  * prove it. */
class LocaleSpec extends AnyFunSuite {

  // The default-locale mutation is JVM-GLOBAL. sbt's forked test JVM
  // runs suites sequentially by default (Test/testForkedParallel =
  // false), but that is an sbt default, not a guarantee this spec
  // controls — so serialize every mutation window under one class-level
  // lock (shared by any future suite via the same idiom) so concurrent
  // locale-sensitive code can never observe the Turkish default.
  private def underLocale[A](l: Locale)(body: => A): A =
    classOf[Locale].synchronized {
      val prev = Locale.getDefault
      Locale.setDefault(l)
      try body finally Locale.setDefault(prev)
    }

  test("xfr-type parsing, fqdn folding, and option keys survive a Turkish default locale") {
    underLocale(new Locale("tr", "TR")) {
      // the i/I pathology: "ixfr".toUpperCase == "İXFR" under tr
      assert(XfrType.parse("ixfr") == XfrType.IXFR)
      assert(XfrType.parse("IXFR") == XfrType.IXFR)
      assert(XfrType.parse("axfr") == XfrType.AXFR)
      // owner names containing I must fold to ASCII i, not ı
      assert("HOST-I.EXAMPLE.COM.".toLowerCase(Locale.ROOT) == "host-i.example.com.")
      // option map keys are folded with ROOT — an uppercase-I key must
      // still resolve (DnsOptions lowercases keys on ingest)
      val m = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("SERIAL", "7", "IGNORE-FAILURES", "true"))
      val opts = DnsOptions.lowerKeys(m)
      assert(opts.contains("serial") && opts.contains("ignore-failures"))
    }
  }
}
