package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Independent in-JVM replays of the curation operators — a THIRD
  * engine beside Spark and the DuckDB oracle. Each test recomputes the
  * operator's exact integer semantics from the raw (doc_id, text,
  * lang, source) rows with plain Scala collections and compares every
  * output cell, so an error that happened to be mirrored into the
  * DuckDB SQL (shared-blindness, the one failure mode a two-engine
  * gate can't see) still fails here. sf0.001 = 500 docs, so the replays
  * are trivial driver work. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def wordHash(w: String): Long =
    java.lang.Long.parseLong(md5hex(w).substring(0, 8), 16)

  private lazy val rawDocs: Seq[(Long, String, String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq

  // ------------------------------------------------------------ pagerank

  private def replayPagerank(): Map[Long, (Long, Long, Long, Long, Long)] = {
    val vs = rawDocs.map(_._1)
    val n = vs.size.toLong
    val edges = vs.flatMap(v =>
        Seq(v % 13, (v * v + 7) % n, (v * 29 + 11) % n).map(d => (v, d)))
      .filter { case (s, d) => s != d }.distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r: Map[Long, Long] = vs.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val m = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / deg(s) }.sum }
      r = vs.map(v => v -> (150000000000L / n + 850L * m.getOrElse(v, 0L) / 1000L)).toMap
    }
    r.toSeq.map { case (v, rk) => (if (v < 13) v else -1L, rk) }
      .groupBy(_._1).map { case (g, rs) =>
        val ranks = rs.map(_._2)
        g -> (ranks.size.toLong, ranks.sum, ranks.min, ranks.max,
          ranks.foldLeft(0L)(_ ^ _))
      }
  }

  test("q_link_pagerank matches an in-JVM exact replay, cell for cell") {
    val got = CurationOps.qLinkPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == replayPagerank())
  }

  test("q_link_pagerank conserves fixed-point mass up to floor-div truncation") {
    val rows = CurationOps.qLinkPagerank(spark, dir).collect()
    val total = rows.map(_.getLong(2)).sum
    // each round can only LOSE mass (floor divs truncate; dangling
    // nodes leak); 500 nodes x 3 rounds of sub-unit truncation plus the
    // damping remainder stays within a few thousand units of 10^12
    assert(total <= 1000000000000L, s"mass grew: $total")
    assert(total > 999999900000L, s"mass leaked too much: $total")
  }

  test("q_link_pagerank: hubs out-rank the background (the skew is real)") {
    val rows = CurationOps.qLinkPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val (bgN, bgSum, _) = rows(-1L)
    val backgroundMean = bgSum / bgN
    // the %13 map pours ~n/13 in-edges into each hub; the background's
    // MAX can itself be a quadratic-collision node, so the meaningful
    // contrast is hub rank vs the typical (mean) background rank
    val hubMin = (0L to 12L).map(rows(_)._3).min
    assert(hubMin > 4 * backgroundMean,
      s"expected hub concentration, hub min=$hubMin background mean=$backgroundMean")
  }

  // ---------------------------------------------------------- line dedup

  private def replayLineDedup(): Map[Long, (Long, Long, String)] = {
    val lines: Map[Long, Seq[String]] = rawDocs.map { case (id, text, _, _) =>
      val banners =
        (if (id % 3 == 0) Seq("subscribe to our newsletter today") else Nil) ++
          (if (id % 5 == 0) Seq("all rights reserved contact us") else Nil)
      id -> (banners ++ text.split("\\s+").grouped(16).map(_.mkString(" ")).toSeq)
    }.toMap
    val df = lines.toSeq.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, ds) => l -> ds.size }
    lines.map { case (id, ls) =>
      val kept = ls.filter(df(_) < 5)
      id -> (ls.size.toLong, kept.size.toLong, md5hex(kept.mkString("|")))
    }
  }

  test("q_line_dedup matches an in-JVM replay: counts and surviving bytes") {
    val got = CurationOps.qLineDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == replayLineDedup())
  }

  test("q_line_dedup drops exactly the corpus-frequent lines at sf0.001") {
    // 500 docs: banner3 on 167 docs, banner5 on 100 — both over the
    // threshold, so every banner line (and nothing whose corpus
    // frequency is < 5) is dropped.
    val rows = CurationOps.qLineDedup(spark, dir).collect()
    val dropped = rows.map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    val expected = replayLineDedup()
    rows.foreach { r =>
      val id = r.getLong(0)
      val banners = (if (id % 3 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
      assert(dropped(id) >= banners, s"doc $id kept a planted banner")
    }
    assert(dropped.values.sum == expected.map(e => e._2._1 - e._2._2).sum)
  }

  // ---------------------------------------------------- quality classifier

  private def replayClassifier(): Map[(String, String), (Long, Long, Long, Long, Long)] =
    rawDocs.map { case (_, text, lang, source) =>
      val score = text.split("\\s+").map(w =>
        CurationOps.ClassifierWeights((wordHash(w) % 64).toInt)).sum
      ((lang, source), score)
    }.groupBy(_._1).map { case (k, xs) =>
      val ss = xs.map(_._2)
      k -> (ss.size.toLong, ss.count(_ >= 0).toLong, ss.sum, ss.min, ss.max)
    }

  test("q_quality_classifier matches an in-JVM replay of the linear model") {
    val got = CurationOps.qQualityClassifier(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == replayClassifier())
  }

  // ------------------------------------------------------------ retrieval

  private def tokens: Seq[(Long, Seq[Long])] =
    rawDocs.map { case (id, text, _, _) =>
      id -> text.split("\\s+").toSeq.map(wordHash) }

  test("q_inverted_index matches an in-JVM replay of df/cf/postings") {
    val post = tokens.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (th, xs) => (th, id, xs.size.toLong) } }
    val expected = post.groupBy(_._1).collect {
      case (th, ps) if ps.size >= 5 =>
        th -> (ps.size.toLong, ps.map(_._3).sum,
          ps.map { case (_, id, tf) => id * 37 + tf }.foldLeft(0L)(_ ^ _))
    }
    val got = CurationOps.qInvertedIndex(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  private def replayBm25(): Seq[(Long, Long, Long, Long)] = {
    val toks = tokens
    val post: Map[(Long, Long), Long] = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (th, xs) => (th, id) -> xs.size.toLong } }.toMap
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val n = toks.size.toLong
    val avgdl = dl.values.sum / n
    val df = post.keys.groupBy(_._1).map { case (th, ks) => th -> ks.size.toLong }
    val queries = toks.filter { case (id, _) => id % 7 == 0 && id < 56 }
      .map { case (id, ts) => (id / 7) -> ts.take(3).distinct }
    queries.sortBy(_._1).flatMap { case (q, qts) =>
      val scores = post.keys.map(_._2).toSeq.distinct.flatMap { d =>
        val s = qts.flatMap { th =>
          post.get((th, d)).map { tf =>
            val idf = (1000L * (2 * n - 2 * df(th) + 1)) / (2 * df(th) + 1)
            val tfc = (22000L * avgdl * tf) / (10 * avgdl * tf + 3 * avgdl + 9 * dl(d))
            idf * tfc
          }
        }
        if (s.isEmpty) None else Some(d -> s.sum)
      }
      scores.sortBy { case (d, s) => (-s, d) }.take(5).zipWithIndex
        .map { case ((d, s), i) => (q, i + 1L, d, s) }
    }
  }

  test("q_bm25_topk matches an in-JVM exact replay of integer BM25") {
    val got = CurationOps.qBm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == replayBm25())
  }

  test("bm25 ranking follows the surrogate idf: a rarer term outweighs a common one") {
    // the rational idf (2N-2df+1)/(2df+1) must be strictly decreasing
    // in df — the property that makes the surrogate rank like log idf
    val n = 1000L
    val idf = (df: Long) => (1000L * (2 * n - 2 * df + 1)) / (2 * df + 1)
    assert((1L until 100L).forall(d => idf(d) > idf(d + 1)))
  }

  test("q_phrase_search matches an in-JVM replay of sliding-bigram counts") {
    val toks = tokens.toMap
    val phrases = tokens.filter { case (id, _) => id % 7 == 0 && id < 56 }
      .map { case (id, ts) => (id / 7) -> (ts(0), ts(1)) }
    val expected = (for {
      (q, (t1, t2)) <- phrases
      (d, ts) <- toks
      n = ts.sliding(2).count { case Seq(a, b) => a == t1 && b == t2; case _ => false }
      if n > 0
    } yield (q, d, n.toLong)).sortBy(e => (e._1, e._2))
    val got = CurationOps.qPhraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q_postings_merge: the merged index IS the single-pass index (merge law)") {
    // the gated sibling q_inverted_index builds the same index in one
    // pass; the batch-split + merge must land on identical cells
    val direct = CurationOps.qInvertedIndex(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val merged = CurationOps.qPostingsMerge(spark, dir).collect()
    assert(merged.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap == direct)
    merged.foreach { r =>
      assert(r.getLong(4) + r.getLong(5) == r.getLong(1),
        s"per-half dfs don't add up for term ${r.getLong(0)}")
    }
  }

  test("q_dedup_agreement: classes partition the union of the two gated pair sets") {
    // the audit must account for EVERY pair either signal found —
    // class counts sum to |text ∪ embedding| and both/text_only add
    // up to the text side's gated pair count
    val text = TextOps.qMinhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = EmbeddingOps.qEmbedNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cls = CurationOps.qDedupAgreement(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cls.values.sum == (text ++ emb).size)
    assert(cls.getOrElse("both", 0L) + cls.getOrElse("text_only", 0L) == text.size)
    assert(cls.getOrElse("both", 0L) + cls.getOrElse("embedding_only", 0L) == emb.size)
    assert(cls.getOrElse("both", 0L) == (text intersect emb).size)
  }

  test("classifier weights are the documented Knuth mix, bounded in milli-units") {
    val w = CurationOps.ClassifierWeights
    assert(w.size == 64)
    assert(w.forall(x => x >= -2000 && x <= 2000))
    assert(w.distinct.size == 64, "weight collisions would weaken the feature space")
  }
}
