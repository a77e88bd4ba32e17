package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Independent in-JVM replays (the third engine beside Spark and
  * DuckDB — see CurationSpec's rationale) for the example-synthesis,
  * delivery, variant-ingest, and anchor-text keys. sf0.001 keeps every
  * replay trivial driver work. */
class SynthesisDeliverySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private lazy val rawDocs: Seq[(Long, String, Long)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  // ------------------------------------------------------- span corruption

  test("q_span_corrupt matches an in-JVM replay: mask die, sentinels, bytes") {
    val expected = rawDocs.map { case (id, text, _) =>
      val ws = text.split("\\s+").toSeq
      val blocks = ws.grouped(3).toSeq.zipWithIndex.map { case (b, i) =>
        (i, b.mkString(" "), h32(s"$id:$i") % 7 == 0) }
      def sentinel(bi: Int) = s"<X${blocks.count(b => b._3 && b._1 < bi)}>"
      val input = blocks.map { case (bi, txt, m) => if (m) sentinel(bi) else txt }
        .mkString(" ")
      val target = blocks.collect { case (bi, txt, true) => s"${sentinel(bi)} $txt" }
        .mkString(" ")
      id -> (blocks.size.toLong, blocks.count(_._3).toLong,
        md5hex(input), md5hex(target))
    }.toMap
    val got = PipelineOps.qSpanCorrupt(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toMap
    assert(got == expected)
  }

  test("span corruption is a real denoising objective: masks exist, most text survives") {
    val rows = PipelineOps.qSpanCorrupt(spark, dir).collect()
    val masked = rows.map(_.getLong(2)).sum.toDouble
    val total = rows.map(_.getLong(1)).sum.toDouble
    assert(masked > 0, "no spans masked — the die is dead")
    assert(masked / total > 0.05 && masked / total < 0.30,
      s"mask density ${masked / total} outside the T5-ish band")
  }

  // ------------------------------------------------------------- delivery

  test("q_shard_assign matches an in-JVM replay of manifests") {
    val expected = rawDocs
      .map { case (id, _, nc) => (h32(id.toString) % 16, id, nc) }
      .groupBy(_._1).map { case (sh, xs) =>
        sh -> (xs.size.toLong, xs.map(_._3).sum,
          xs.map { case (_, id, nc) => id * 31 + nc }.foldLeft(0L)(_ ^ _)) }
    val got = PipelineOps.qShardAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("q_epoch_shuffle: orders replay exactly, differ across epochs, and re-run identical") {
    def replay(): Map[Long, (Long, Long)] = {
      val byShard = rawDocs.map(_._1).groupBy(id => h32(id.toString) % 16)
      (0L to 2L).map { e =>
        val fps = byShard.values.map { ids =>
          val ordered = ids.map(id => ((java.lang.Long.parseLong(
            md5hex(s"$e:$id").substring(0, 15), 16), id), id))
            .sortBy(_._1).map(_._2)
          java.lang.Long.parseLong(
            md5hex(ordered.mkString(",")).substring(0, 15), 16)
        }
        e -> (byShard.size.toLong, fps.foldLeft(0L)(_ ^ _))
      }.toMap
    }
    val run1 = PipelineOps.qEpochShuffle(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run1 == replay())
    // the three per-epoch order fingerprints must be pairwise distinct
    assert(run1.values.map(_._2).toSet.size == 3, s"epoch orders collide: $run1")
    val run2 = PipelineOps.qEpochShuffle(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run1 == run2, "epoch shuffle is not reproducible across runs")
  }

  // -------------------------------------------------------------- variant

  test("q_variant_extract matches a replay from raw columns (no JSON anywhere)") {
    val events = Tables.events(spark, dir)
      .selectExpr("event_id", "event_type", "user_id",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = events.groupBy(_._2).map { case (t, xs) =>
      val extras = xs.filter(_._1 % 7 == 0)
      t -> (xs.size.toLong, xs.map(_._3).sum, xs.map(_._4).sum,
        extras.size.toLong, extras.map(e => e._1 % 100).sum,
        (if (extras.nonEmpty && extras.size < xs.size) 2 else 1).toLong)
    }
    val got = Relational.qVariantExtract(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == expected)
  }

  // ---------------------------------------------------------- anchor text

  test("q_anchor_text matches a replay over the closed-form graph") {
    val n = rawDocs.size.toLong
    val anchors = rawDocs.map { case (id, text, _) =>
      id -> text.split("\\s+").take(2).mkString(" ") }.toMap
    val edges = rawDocs.map(_._1).flatMap(v =>
        Seq(v % 13, (v * v + 7) % n, (v * 29 + 11) % n).map(d => (v, d)))
      .filter { case (s, d) => s != d }.distinct
    val expected = edges.filter(_._2 < 13)
      .map { case (src, dst) => (dst, anchors(src)) }
      .groupBy(_._1).map { case (hub, xs) =>
        val cnt = xs.groupBy(_._2).map { case (a, ys) => (a, ys.size.toLong) }
        val (topA, topC) = cnt.toSeq.minBy { case (a, c) => (-c, a) }
        hub -> (xs.size.toLong, cnt.size.toLong, topA, topC)
      }
    val got = CurationOps.qAnchorText(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toMap
    assert(got == expected)
  }
}
