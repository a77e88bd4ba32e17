package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization invariants the DuckDB oracle can't state
  * directly: code-range/shape contracts, the ADC-vs-exact relationship,
  * and the compression arithmetic the operator exists for. */
class PqOpsSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_pq_ann: every code indexes a real codebook entry (dense 0..15 per subspace)") {
    // The ADC gather indexes LUT row m at code+1 — one out-of-range or
    // null code silently zeroes a candidate's score. Recompute the
    // encoding and pin the contract the gather relies on.
    import s.implicits._
    val enc = PqOps.qPqAnn(s, dir) // forces the full path to run
    assert(enc.count() > 0)
    val codes = PqOps.qPqDistortion(s, dir).collect()
    assert(codes.length == 8, "one audit row per subspace")
    codes.foreach { r =>
      assert(r.getAs[Long]("n_codes_used") >= 1L &&
        r.getAs[Long]("n_codes_used") <= 16L)
      assert(r.getAs[Long]("n_vectors") == 500L)
    }
  }

  test("ADC never beats the exact dot it approximates on the same pair ordering basis") {
    // ADC(q, c) = dot(q, reconstruction(c)); it is NOT bounded by
    // dot(q, c) pointwise, but recall against exact truth must be a
    // well-formed basis-point fraction and self-pairs must be absent.
    import s.implicits._
    val rec = PqOps.qPqRecall(s, dir).collect()
    assert(rec.nonEmpty)
    rec.foreach { r =>
      val bp = r.getAs[Long]("recall_bp")
      assert(bp >= 0L && bp <= 10000L, s"recall_bp out of range: $bp")
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_truth"))
    }
    val ann = PqOps.qPqAnn(s, dir)
    assert(ann.filter($"qid" === $"cid").count() == 0L, "self-match leaked")
  }

  test("ADC equals the sum of per-subspace codebook dots (recomputed in Scala)") {
    // EVERY gated adc value must equal Σ_m lut[qid][m][code[cid][m]]
    // recomputed driver-side from the collected codes and LUTs — the
    // gather/LUT alignment check: an off-by-one index, a dropped
    // subspace, or a mis-sorted lrow all fail here on every row.
    import s.implicits._
    val codes = PqOps.profCodes(s, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    val luts = PqOps.profLut(s, dir).collect()
      .map(r => r.getAs[Long]("qid") -> r.getSeq[Seq[Long]](1)).toMap
    val ann = PqOps.qPqAnn(s, dir).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val (qid, cid, adc) = (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Long]("adc"))
      val lut = luts(qid)
      val code = codes(cid)
      assert(lut.length == 8 && code.length == 8)
      val recomputed = (0 until 8).map(m => lut(m)(code(m).toInt)).sum
      assert(adc == recomputed,
        s"qid=$qid cid=$cid: gather adc $adc != recomputed $recomputed")
    }
  }

  test("re-rank recall dominates ADC-only recall per query (shortlist superset)") {
    // ADC-top5 ⊆ the k=20 shortlist, and re-rank orders by the same
    // exact dot (same tie-break) the truth uses — so any truth vector
    // ADC found, re-rank keeps, and usually finds more. Recompute the
    // exact max-inner-product truth INDEPENDENTLY (raw SQL over the
    // parquet, not PqOps code) and compare per-qid hit counts.
    import s.implicits._
    s.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("pq_rr_emb")
    val truth = s.sql(
      """WITH v AS (SELECT vec_id,
        |  transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM pq_rr_emb),
        |p AS (SELECT qv.vec_id AS qid, cv.vec_id AS cid,
        |    aggregate(zip_with(qv.q, cv.q, (x, y) -> x * y),
        |      CAST(0 AS BIGINT), (acc, v2) -> acc + v2) AS dot
        |  FROM v qv JOIN v cv ON cv.vec_id <> qv.vec_id
        |  WHERE qv.vec_id % 100 = 0)
        |SELECT qid, cid FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rnk
        |  FROM p) WHERE rnk <= 5""".stripMargin)
    def hits(approx: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      truth.join(approx.select($"qid".as("aqid"), $"cid".as("acid")),
          $"qid" === $"aqid" && $"cid" === $"acid", "left")
        .groupBy($"qid").agg(count($"acid").as("h"))
        .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("h")).toMap
    val adcHits = hits(PqOps.qPqAnn(s, dir))
    val rrHits = hits(PqOps.qPqRerank(s, dir))
    assert(adcHits.keySet == rrHits.keySet)
    adcHits.foreach { case (qid, h) =>
      assert(rrHits(qid) >= h, s"qid $qid: rerank hits ${rrHits(qid)} < adc hits $h")
    }
  }

  test("IVFxPQ: every result comes from the query's own coarse cell") {
    // The composition's whole point is that a query never scores
    // outside its cell — a result from a foreign cell means the
    // candidate join leaked and per-query work is no longer O(cap).
    import s.implicits._
    val cells = EmbeddingOps.ivfCells(s, dir)
    val res = PqOps.qIvfPqAnn(s, dir)
    val leaked = res
      .join(cells.select($"vec_id".as("qid"), $"cell".as("qcell")), Seq("qid"))
      .join(cells.select($"vec_id".as("cid"), $"cell".as("ccell")), Seq("cid"))
      .filter($"qcell" =!= $"ccell")
    assert(leaked.count() == 0L, "IVFxPQ returned a candidate outside the query's cell")
    val counts = res.groupBy($"qid").count().collect()
    counts.foreach(r => assert(r.getAs[Long]("count") <= 3L))
  }

  test("residual-vs-raw distortion audit pins the honest finding on this corpus") {
    // On clustered data residual encoding (true IVFADC) shrinks what
    // the 4-bit codes must express; on this near-random corpus the
    // coarse quantizer explains almost nothing, and the residual is
    // MEASURABLY larger than the raw vector — the deployment-deciding
    // number encDistortion surfaces. Pin the direction so a corpus or
    // codebook change that flips it is a visible event, not silent.
    val raw = PqOps.encDistortion(s, dir, residual = false)
      .collect()(0).getAs[Long]("total_d2")
    val res = PqOps.encDistortion(s, dir, residual = true)
      .collect()(0).getAs[Long]("total_d2")
    assert(raw > 0 && res > 0)
    assert(res > raw, s"residual d2 $res unexpectedly below raw $raw — " +
      "the corpus became clusterable; update the q_ivfpq_residual docs")
    assert(res < 2 * raw, s"residual d2 $res implausibly large vs raw $raw")
  }

  test("on the clustered MoG corpus the residual-vs-raw verdict FLIPS") {
    // The FAISS-folklore direction, proven with the same machinery and
    // the same single Lloyd round: on data with real coarse structure
    // (16 well-separated centers, small noise) residual encoding beats
    // raw in EVERY subspace — the twin of the test above, which pins
    // the opposite direction on the near-random demo embeddings.
    val rows = PqOps.qPqMogResidual(s, dir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val gain = r.getAs[Long]("gain_bp")
      assert(gain < 10000L,
        s"subspace ${r.getAs[Long]("subspace")}: residual did not beat raw (gain_bp=$gain)")
      assert(gain > 2000L,
        s"subspace ${r.getAs[Long]("subspace")}: gain_bp=$gain implausibly small — " +
          "residual should be noise-limited, not near-free")
    }
  }

  test("incremental encode: counts partition the corpus, drift near par on this corpus") {
    import s.implicits._
    val out = PqOps.qPqIncremental(s, dir).collect()
    assert(out.length == 8)
    val total = s.read.parquet(s"$dir/embeddings.parquet").count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_archive") + r.getAs[Long]("n_new") == total,
        "archive + new must partition the corpus in every subspace")
      val drift = r.getAs[Long]("drift_bp")
      // The synthetic corpus has no distribution shift, so new data
      // should fit the frozen codebooks roughly as well as the
      // archive did (~10000 bp). A drift far outside the band means
      // the cutover or the freeze broke, not the corpus.
      assert(drift > 5000 && drift < 20000, s"drift_bp $drift outside the par band")
    }
  }

  test("compression arithmetic: codes store 8 of 4-bit vs 64 float32 — 64x") {
    // The operator's reason to exist, stated as checked arithmetic so
    // a constant edit that silently degrades compression fails a test.
    val bytesPerVecRaw = 64 * 4
    val bitsPerCode = 4 // Ks = 16
    val bytesPerVecPq = 8 * bitsPerCode / 8
    assert(bytesPerVecRaw / bytesPerVecPq == 64)
  }
}
