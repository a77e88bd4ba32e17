package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the driver's t1 smoke check: entry() at sf0.001 has rows. */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }

  test("every query returns rows at sf0.001 (no vacuous entries)") {
    // threshold/dup-detection ops; legitimately sparse at tiny SF
    val allowEmpty = Set("q_ngram_jaccard", "q_embed_neardup")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(SparkTestSession.spark, "/root/testdata/sf0.001").count()
      if (!allowEmpty(name)) assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("oracleSql covers every query key") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("module query maps never collide (++ would silently overwrite one)") {
    // SparkEntry unions the per-module maps with ++ — a key defined in
    // two modules would drop one implementation without any error, and
    // the gate would green-light whichever survived. Fail here instead.
    val modules: Seq[(String, Set[String])] = Seq(
      "Relational" -> graft.queries.Relational.queries.keySet,
      "Connector" -> graft.queries.Connector.queries.keySet,
      "TextOps" -> graft.queries.TextOps.queries.keySet,
      "EmbeddingOps" -> graft.queries.EmbeddingOps.queries.keySet,
      "PipelineOps" -> graft.queries.PipelineOps.queries.keySet,
      "Multimodal" -> graft.functions.Multimodal.queries.keySet,
      "Storage" -> graft.queries.Storage.queries.keySet,
      "StreamingOps" -> graft.streaming.StreamingOps.queries.keySet,
      "PqOps" -> graft.queries.PqOps.queries.keySet,
      "CurationOps" -> graft.queries.CurationOps.queries.keySet)
    for {
      (na, a) <- modules
      (nb, b) <- modules if na < nb
    } {
      val overlap = a intersect b
      assert(overlap.isEmpty, s"$na and $nb both define: $overlap")
    }
    // and the union really is the sum — nothing was shadowed
    assert(SparkEntry.queries.size == modules.map(_._2.size).sum)
  }
}
