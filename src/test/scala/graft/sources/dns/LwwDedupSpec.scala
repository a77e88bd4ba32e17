package graft.sources.dns

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Properties of the sink's LWW dedup (SURVEY §5(c)). */
class LwwDedupSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genUpdate: Gen[DnsUpdateRecord] = for {
    action <- Gen.oneOf(DnsAction.Axfr, DnsAction.IxfrAdd, DnsAction.IxfrDelete)
    host <- Gen.choose(0, 5)
    ip <- Gen.choose(0, 3)
    ts <- Gen.choose(1L, 1000000L)
    ttl <- Gen.choose(1, 86400)
  } yield DnsUpdateRecord(action, s"h$host.z.acme.", s"10.0.0.$ip", ts, ttl)

  private val genBatch: Gen[List[DnsUpdateRecord]] = Gen.listOfN(40, genUpdate)

  test("property: dedup is permutation-invariant") {
    check(Prop.forAll(genBatch, Gen.long) { (batch, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(batch)
      LwwDedup(batch) == LwwDedup(shuffled)
    })
  }

  test("property: one survivor per (action, fqdn, ip), carrying the max timestamp") {
    check(Prop.forAll(genBatch) { batch =>
      val out = LwwDedup(batch)
      val byId = batch.groupBy(u => (u.action, u.fqdn, u.ip))
      out.size == byId.size && out.forall { u =>
        u.timestampMicros == byId((u.action, u.fqdn, u.ip)).map(_.timestampMicros).max
      }
    })
  }

  test("property: output is chronologically ordered") {
    check(Prop.forAll(genBatch) { batch =>
      val ts = LwwDedup(batch).map(u => (u.timestampMicros, u.action, u.fqdn, u.ip))
      ts == ts.sorted
    })
  }

  test("property: applying deduped changes equals applying all chronologically") {
    // Final zone state from the deduped message == final state from the
    // full update log applied in (ts, action, fqdn, ip) order: dropping
    // superseded updates must never change the outcome.
    check(Prop.forAll(genBatch) { batch =>
      def finalState(changes: Seq[DnsUpdateRecord]): Set[(String, String)] = {
        var st = Set.empty[(String, String)]
        changes.sortBy(u => (u.timestampMicros, u.action, u.fqdn, u.ip)).foreach { u =>
          if (u.action == DnsAction.IxfrDelete) st -= ((u.fqdn, u.ip))
          else st += ((u.fqdn, u.ip))
        }
        st
      }
      // distinct timestamps per identity make the contract well-defined
      val distinctTs = batch.zipWithIndex.map { case (u, i) =>
        u.copy(timestampMicros = u.timestampMicros * 100 + i)
      }
      finalState(LwwDedup(distinctTs)) == finalState(distinctTs)
    })
  }
}
