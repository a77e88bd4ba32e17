package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Corpus-curation operators — the graph/model-driven stages of a
  * training-data pipeline that sit between raw crawl ingest
  * ([[PipelineOps.qCrawlPipeline]]) and the text/dedup toolkit
  * ([[TextOps]]): link-graph authority scoring (PageRank), line-level
  * boilerplate dedup (the RefinedWeb/CCNet-style pass that removes
  * repeated banner lines rather than whole documents), and
  * model-as-data quality classification (hashed bag-of-words × a
  * weight vector, the fastText-classifier shape used for quality
  * filtering in LLaMA/CCNet-style pipelines).
  *
  * Cross-engine exactness discipline: every score is integer-domain
  * (fixed-point ranks, milli-unit weights), every division is a floor
  * div of non-negative operands (Spark `DIV` ≡ DuckDB `//`), and text
  * keys travel as md5-prefix integers per [[Hashing]] — so the DuckDB
  * oracles reproduce each result bit-for-bit regardless of partitioning
  * or summation order.
  */
object CurationOps {

  private def docs(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")

  // ------------------------------------------------------------ pagerank

  /** Link-graph PageRank in exact fixed-point integers.
    *
    * The fixture graph is derived closed-form from doc ids (both
    * engines rebuild it identically): each node v emits up to three
    * distinct out-edges — `v % 13` (13 heavy hubs), `(v² + 7) % n`
    * (quadratic map, natural moderate collisions), `(v·29 + 11) % n`
    * (affine bijection, uniform background) — self-loops removed. The
    * resulting in-degree skew is real (hubs end ~64× the background
    * rank at sf0.01), so the query demonstrates rank concentration,
    * not a uniform fixed point.
    *
    * Arithmetic is fixed-point with total mass 10^12: r₀ = 10^12 div n,
    * and each round computes m(v) = Σ_{u→v} r(u) div deg(u), then
    * r'(v) = (0.15·10^12 div n) + (850·m(v)) div 1000 — the standard
    * damped update with d = 0.85 expressed in integer floor divs, so
    * Spark and DuckDB agree bit-for-bit (floating-point PageRank never
    * hash-matches across engines: summation order changes ulps).
    * Truncation leaks a few parts per billion of mass per round
    * (dangling nodes would leak theirs too, identically in both
    * engines); nothing redistributes it, so the oracle's totals pin
    * the exact same fixed point.
    *
    * Scale shape (the reason this is written as a Scala loop over
    * DataFrames rather than one recursive SQL): the edge list with its
    * out-degrees is materialized ONCE (`localCheckpoint` — on a
    * cluster, a durable checkpoint) and every iteration is exactly one
    * shuffle (rank ⋈ edges on src, partial-aggregated map-side onto
    * dst) plus a bounded rank rebuild — per-iteration cost is
    * O(|E|/cores), the standard Pregel decomposition. Three rounds are
    * unrolled here into ONE dag (each round's ranks computed once, fed
    * forward — no re-execution) as the gate's convergence witness; a
    * production run loops the same body to a tolerance and
    * localCheckpoints the rank table every few rounds to keep the plan
    * bounded. The fixture maps square doc ids, so ids must stay
    * below 2^31 for the closed form itself (the ALGORITHM is id-width
    * agnostic).
    */
  /** (v, n): every node with the broadcast corpus count — the closed-
    * form graph's modulus rides as a column so nothing collects. */
  private def graphNodes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select($"doc_id".as("v"))
    d.crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
  }

  /** The fixture link graph (src, dst) off a given (v, n) node frame —
    * ONE definition shared by [[qLinkPagerank]] and [[qAnchorText]],
    * so the two keys can never disagree about which edges exist. */
  private def linkEdgesOf(nodes: DataFrame): DataFrame =
    nodes
      .select(col("v").as("src"), explode(array(
        col("v") % lit(13L),
        (col("v") * col("v") + lit(7L)) % col("n"),
        (col("v") * lit(29L) + lit(11L)) % col("n"))).as("dst"))
      .where(col("dst") =!= col("src")).distinct()

  private[queries] def linkEdges(s: SparkSession, dir: String): DataFrame =
    linkEdgesOf(graphNodes(s, dir))

  def qLinkPagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // nodes is referenced by the edge build, every unrolled round's
    // rank rebuild, AND the final rollup — materialize it once rather
    // than re-scanning the documents table ~5x in one dag
    val nodes = graphNodes(s, dir).localCheckpoint()
    val edges = linkEdgesOf(nodes)
    val withDeg = edges
      .join(edges.groupBy($"src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint() // the static graph: materialized once, reused every round
    var rank = nodes.select($"v", expr("1000000000000 DIV n").as("r"))
    for (_ <- 1 to 3) {
      val m = withDeg.join(rank.withColumnRenamed("v", "src"), "src")
        .groupBy($"dst").agg(sum(expr("r DIV deg")).as("m"))
      rank = nodes.join(m, nodes("v") === m("dst"), "left")
        .select(nodes("v"),
          expr("(150000000000 DIV n) + (850 * coalesce(m, CAST(0 AS BIGINT))) DIV 1000").as("r"))
    }
    rank
      .groupBy(when($"v" < 13, $"v").otherwise(lit(-1L)).as("grp"))
      .agg(count(lit(1)).as("n_nodes"),
        sum($"r").as("sum_rank"),
        min($"r").as("min_rank"),
        max($"r").as("max_rank"),
        expr("bit_xor(r)").as("rank_xor"))
      .orderBy($"grp")
  }

  // ---------------------------------------------------------- line dedup

  /** The two planted boilerplate lines — the fixture's stand-in for
    * cookie banners / footer chrome that real crawls repeat across
    * millions of pages. Membership is closed-form in doc_id so the
    * oracle rebuilds the lined corpus without Spark. */
  private val Banner3 = "subscribe to our newsletter today"
  private val Banner5 = "all rights reserved contact us"

  /** Oracle-side per-doc position-unroll bound (DuckDB lacks WITH
    * ORDINALITY, so the q_line_dedup / q_phrase_search oracles
    * enumerate positions with `generate_series(0, cap)`). The bound
    * was previously a bare `4000` in two oracle strings (r15 advice):
    * a fixture doc exceeding it would truncate the ORACLE side only —
    * a confusing hash mismatch with no pointer to the cap. Now both
    * oracles interpolate this constant and both Spark sides carry an
    * `assert_true` guard naming it, so a cap violation fails loudly
    * on the engine side with a message that says what to raise. */
  private[queries] val OracleUnrollCap = 4000

  /** Line-level corpus dedup (RefinedWeb-style): remove LINES that
    * repeat across many documents, keep the documents.
    *
    * Whole-document dedup (q_fingerprint_dedup, q_minhash_pairs)
    * cannot touch boilerplate — a page is unique even when its cookie
    * banner is on a million other pages. This pass views each doc as
    * lines (the corpus has no newlines, so "lines" are the planted
    * banners plus 16-word body chunks — the chunking IS the fixture;
    * a real corpus would split on '\n'), counts each line's document
    * frequency corpus-wide, drops lines appearing in ≥ 5 docs, and
    * reassembles every doc in original line order. Output per doc:
    * line counts before/after and the md5 of the reassembled text, so
    * the gate pins the exact surviving bytes, not just counts.
    *
    * Scale shape: one map-side explode (lines carry a 60-bit md5-
    * prefix key), one partial-aggregated exchange on the line key for
    * document frequencies, one equi-join back on that same key
    * (broadcast at fixture scale, a co-partitioned shuffle join at
    * corpus scale — keyed either way, asserted in PlanAuditSpec), and
    * one exchange on doc_id to reassemble. Line text shuffles once (into
    * the reassembly); frequencies travel as (hash, count) pairs. No
    * stage is quadratic in corpus size — frequency skew lands in the
    * partial aggregation, which compacts a million-document banner to
    * one row per map partition.
    */
  def qLineDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lined = docs(s, dir)
      .select($"doc_id", expr("split(text, '\\\\s+')").as("ws"))
      .select($"doc_id", expr(
        s"""concat(
           |  filter(array(
           |      IF(doc_id % 3 = 0, '$Banner3', CAST(NULL AS STRING)),
           |      IF(doc_id % 5 = 0, '$Banner5', CAST(NULL AS STRING))),
           |    x -> x IS NOT NULL),
           |  transform(sequence(0, CAST((size(ws) + 15) DIV 16 AS INT) - 1),
           |    c -> array_join(slice(ws, c * 16 + 1, 16), ' ')))""".stripMargin).as("lines"))
      // loud guard for the oracle's unroll bound — see [[OracleUnrollCap]]
      .filter(expr(s"coalesce(assert_true(size(lines) <= $OracleUnrollCap, " +
        s"'q_line_dedup: doc exceeds OracleUnrollCap=$OracleUnrollCap lines; " +
        "the DuckDB oracle unroll would truncate — raise the shared cap in CurationOps'), true)"))
    val lx = lined
      .select($"doc_id", posexplode($"lines").as(Seq("ln", "line")))
      .withColumn("lh",
        expr("CAST(conv(substring(md5(line), 1, 15), 16, 10) AS BIGINT)"))
    val freq = lx.groupBy($"lh").agg(countDistinct($"doc_id").as("df"))
    lx.join(freq, "lh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_lines"),
        count(when($"df" < 5, lit(1))).as("n_kept"),
        expr("""md5(array_join(transform(
                |  array_sort(collect_list(CASE WHEN df < 5 THEN struct(ln, line) END)),
                |  x -> x.line), '|'))""".stripMargin).as("kept_md5"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------- quality classifier

  /** The model: 64 hashed-feature buckets, weights in milli-units,
    * derived from the bucket index by a Knuth multiplicative mix so
    * both engines embed the identical literal vector. Model-as-data:
    * a production classifier swaps this literal for a 2M-bucket
    * broadcast array learned offline — the scoring plan is unchanged. */
  private[queries] val ClassifierWeights: IndexedSeq[Long] =
    (0 until 64).map(k => ((k.toLong * 2654435761L) % 4001L) - 2000L)

  /** Model-based quality classification: a linear text classifier
    * (the fastText shape: hashed bag-of-words × weight vector)
    * executed as data, distinct from the heuristic q_quality_score —
    * this is the "model scores the corpus" stage of a curation
    * pipeline, where the model is just another (broadcast) table.
    *
    * Each word hashes to one of 64 buckets ([[Hashing.wordHashSql]] —
    * the corpus-wide determinism contract), the doc's score is the
    * integer sum of its words' bucket weights (milli-units, exact in
    * int64: |w| ≤ 2000 so overflow needs 4.6·10^15 words in one doc),
    * and the verdict is score ≥ 0 — equivalent to thresholding the
    * sigmoid at ½, since the sigmoid is monotone; staying in logit
    * space keeps the gate integer-exact. Rolled up per (lang, source):
    * pass counts plus exact score stats, the per-slice acceptance
    * report a curation run publishes.
    *
    * Scale shape: scoring is MAP-ONLY — the weight vector rides into
    * the expression (a broadcast in spirit and, at 2M buckets, in
    * fact), no shuffle touches document text, and the one exchange is
    * the bounded (lang, source) rollup, partial-aggregated map-side.
    */
  def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wArr = s"array(${ClassifierWeights.mkString(",")})"
    docs(s, dir)
      .select($"lang", $"source",
        expr(s"""aggregate(${Hashing.wordHashSql}, CAST(0 AS BIGINT),
                 |  (acc, h) -> acc + CAST(element_at($wArr, CAST(h % 64 AS INT) + 1) AS BIGINT))""".stripMargin)
          .as("score_milli"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"score_milli" >= 0, lit(1))).as("n_pass"),
        sum($"score_milli").as("sum_score"),
        min($"score_milli").as("min_score"),
        max($"score_milli").as("max_score"))
      .orderBy($"lang", $"source")
  }

  // ------------------------------------------------------------ retrieval

  /** Inverted-index build: term → (document frequency, collection
    * frequency, postings fingerprint) for every term whose df ≥ 5.
    *
    * The index artifact behind every lexical-retrieval system, built
    * the only way that scales: tokens are (doc_id, term_hash) pairs,
    * the postings aggregation groups them by (term, doc) with map-side
    * partials (a term repeated in one doc combines before it moves),
    * and the per-term rollup is vocabulary-sized — Heaps-law sublinear
    * in corpus size. The postings themselves are pinned by an XOR
    * fingerprint (`doc_id·37 + tf`) rather than materialized into the
    * gate row, so the output stays vocabulary-bounded while any
    * wrong/missing/extra posting anywhere still flips a cell.
    */
  /** The index build over an arbitrary document slice — the SAME
    * construction whether it runs single-pass ([[qInvertedIndex]]) or
    * per ingest batch ([[qPostingsMerge]]), so the merge-law key can
    * only test the merge, never a construction drift. Returns the
    * un-thresholded per-term rollup (th, df, cf, postings_xor). */
  private def indexOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), explode(expr(Hashing.wordHashSql)).as("th"))
      .groupBy(col("th"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("th"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        expr("bit_xor(doc_id * 37 + tf)").as("postings_xor"))

  def qInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    indexOf(docs(s, dir))
      .where($"df" >= 5)
      .select($"th".as("term_hash"), $"df", $"cf", $"postings_xor")
      .orderBy($"term_hash")
  }

  /** BM25 top-5 retrieval over the inverted index, integer-exact.
    *
    * Queries are derived from the corpus closed-form (query q ∈ 0..7 =
    * the first three words of doc 7q, deduplicated), so both engines
    * know them without a side channel. Scoring is Okapi BM25 with
    * k1 = 6/5 and b = 3/4 — both rational, so the per-term factor
    * reduces EXACTLY to integers:
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) = 22·avgdl·tf /
    * (10·avgdl·tf + 3·avgdl + 9·dl), floor-scaled to milli-units. The
    * idf is the rational Robertson–Sparck-Jones surrogate
    * (N−df+½)/(df+½) = (2N−2df+1)/(2df+1) in milli-units — a
    * DELIBERATE divergence from the usual log(idf): the log is
    * transcendental, and two engines' libm need not agree in the last
    * ulp, which a hash gate cannot tolerate. The surrogate preserves
    * the ranking's term-rarity ordering (it is the log's argument,
    * and x ↦ log x is monotone) while staying bit-exact; a production
    * deployment that wants the damped log takes the same plan with a
    * float idf and loses only the cross-engine gate.
    *
    * Scale shape: the query-term table (queries × terms, with df
    * attached) is broadcast; the corpus-sized postings table is probed
    * by an equi-join on the term hash, so candidate volume is
    * Σ_q Σ_t df(t) — the inverted-index economics, proportional to how
    * common the query's terms are, never to corpus size (a real
    * deployment prunes stopword-grade terms from the query first; the
    * fixture's 31-word vocabulary would prune to nothing, so the gate
    * keeps all terms). Doc lengths attach to CANDIDATES only. Top-5
    * per query is the [[graft.functions.TopKAgg]] aggregator — ≤ k
    * pairs of map-side state per query, never a per-query sort of the
    * full candidate set (the window twin is the oracle, same rows).
    */
  def qBm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = docs(s, dir)
      .select($"doc_id", explode(expr(Hashing.wordHashSql)).as("th"))
    // The postings ARE the index — build them in ONE tokenize pass and
    // materialize (r19: post, dl and df each re-derived the token
    // stream, 5 FileScans of documents in the executed plan). Document
    // length is Σ tf over the doc's postings — no second token pass —
    // and df is a rollup of the same materialized frame.
    val post = tok.groupBy($"th", $"doc_id").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = post.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val nn = dl.agg(count(lit(1)).as("n"),
      expr("sum(dl) DIV count(1)").as("avgdl"))
    val df = post.groupBy($"th").agg(count(lit(1)).as("df"))
    val qt = docs(s, dir)
      .where($"doc_id" % 7 === 0 && $"doc_id" < 56)
      .select(expr("doc_id DIV 7").as("query_id"),
        explode(expr(s"slice(${Hashing.wordHashSql}, 1, 3)")).as("th"))
      .distinct()
    val top5 = udaf(new graft.functions.TopKAgg(5))
    broadcast(qt.join(df, "th"))
      .join(post, "th")
      .join(dl, "doc_id")
      .crossJoin(broadcast(nn))
      .groupBy($"query_id", $"doc_id")
      .agg(sum(
        expr("(1000 * (2*n - 2*df + 1)) DIV (2*df + 1)") *
          expr("(22000 * avgdl * tf) DIV (10*avgdl*tf + 3*avgdl + 9*dl)"))
        .as("score_milli"))
      .groupBy($"query_id")
      .agg(top5($"doc_id", $"score_milli").as("tops"))
      .select($"query_id", posexplode($"tops"))
      .select($"query_id", ($"pos" + 1).cast("long").as("rk"),
        $"col._1".as("doc_id"), $"col._2".as("score_milli"))
      .orderBy($"query_id", $"rk")
  }

  /** Positional phrase search: find every document containing an exact
    * two-word phrase, with occurrence counts — the positional-index
    * operator every lexical engine layers over the inverted index
    * (bag-of-words retrieval cannot distinguish "York New" from
    * "New York").
    *
    * Phrases are corpus-derived like the BM25 queries (query q = the
    * first two words of doc 7q). The positional postings are
    * (doc_id, pos, term_hash) triples; each phrase's two term lists
    * are pulled by a broadcast equi-join on the term hash (work ∝ df
    * of the phrase's terms — index economics, the whole point: query
    * time never scans documents), then adjacency is one equi-join on
    * (query, doc, pos+1). Candidates bound every stage: the adjacency
    * join's sides are term-df-sized, never corpus-sized.
    */
  /** The role-tagged phrase-term pull, PRE-checkpoint — one broadcast
    * equi-join on the term hash over the positional postings, so the
    * pulled volume is ∝ df of the phrase terms. Exposed separately so
    * PlanAuditSpec audits this exact shape (qPhraseSearch checkpoints
    * it, which truncates the lineage to an RDD scan). */
  private[queries] def phrasePullPlan(tokpos: DataFrame, ph: DataFrame): DataFrame = {
    val phTerms = ph.select(col("query_id"), col("th1").as("pth"), lit(1).as("role"))
      .unionByName(ph.select(col("query_id"), col("th2").as("pth"), lit(2).as("role")))
    tokpos.join(broadcast(phTerms), tokpos("th") === col("pth"))
      .select(col("query_id"), col("role"), col("doc_id"), col("pos"))
  }

  /** [[qPhraseSearch]]'s two input frames, shared with the plan audit. */
  private[queries] def phraseInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val tokpos = docs(s, dir)
      .select($"doc_id", posexplode(expr(Hashing.wordHashSql)).as(Seq("pos", "th")))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"th")
      // loud guard for the oracle's unroll bound — see [[OracleUnrollCap]]
      .filter(expr(s"coalesce(assert_true(pos <= $OracleUnrollCap, " +
        s"'q_phrase_search: token position exceeds OracleUnrollCap=$OracleUnrollCap; " +
        "the DuckDB oracle unroll would truncate — raise the shared cap in CurationOps'), true)"))
    val ph = docs(s, dir)
      .where($"doc_id" % 7 === 0 && $"doc_id" < 56)
      .select(expr("doc_id DIV 7").as("query_id"),
        expr(s"element_at(${Hashing.wordHashSql}, 1)").as("th1"),
        expr(s"element_at(${Hashing.wordHashSql}, 2)").as("th2"))
      .distinct()
    (tokpos, ph)
  }

  def qPhraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (tokpos, ph) = phraseInputs(s, dir)
    // Both term pulls ride ONE tokenize pass: the phrase terms join
    // the positional postings once with a role tag (r19: m1 and m2
    // each re-tokenized the corpus — 4 FileScans in the executed
    // plan), and the df-sized match frame is checkpointed so the two
    // role filters below don't replay the pull. Work stays ∝ df of
    // the phrase terms. The pull shape itself (keyed on th, broadcast
    // terms) is audited on [[phrasePullPlan]] — the checkpoint hides
    // it behind an RDD scan in the final plan.
    val m = phrasePullPlan(tokpos, ph).localCheckpoint()
    val m1 = m.filter($"role" === 1).select($"query_id", $"doc_id", $"pos")
    val m2 = m.filter($"role" === 2)
      .select($"query_id".as("q2"), $"doc_id".as("d2"), ($"pos" - 1).as("p2"))
    m1.join(m2, $"query_id" === $"q2" && $"doc_id" === $"d2" && $"pos" === $"p2")
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy($"query_id", $"doc_id")
  }

  /** Mergeable-postings proof: the inverted index is rebuilt from two
    * disjoint ingest batches (doc_id parity) and MERGED — df and cf
    * add, the postings XOR composes — then gated against the oracle's
    * single-pass index over the whole corpus. Equality is the merge
    * law (`index(A) ⊕ index(B) ≡ index(A ∪ B)` for disjoint batches),
    * the property that lets a 100 TB index build incrementally —
    * yesterday's index plus today's batch, no recompute — mirroring
    * the min-k semilattice proof (`q_index_merge`) for the lexical
    * index. The per-half dfs ride into the output so the gate pins the
    * split itself, not just the merged totals.
    */
  def qPostingsMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def half(parity: Int): DataFrame =
      indexOf(docs(s, dir).where($"doc_id" % 2 === parity))
        .withColumn("parity", lit(parity))
    half(0).unionByName(half(1))
      .groupBy($"th")
      .agg(sum($"df").as("df"), sum($"cf").as("cf"),
        expr("bit_xor(postings_xor)").as("postings_xor"),
        sum(when($"parity" === 0, $"df").otherwise(0L)).as("df_a"),
        sum(when($"parity" === 1, $"df").otherwise(0L)).as("df_b"))
      .where($"df" >= 5)
      .select($"th".as("term_hash"), $"df", $"cf", $"postings_xor", $"df_a", $"df_b")
      .orderBy($"term_hash")
  }

  /** Anchor-text profiles for the hub pages — the web-graph text
    * signal search engines and corpus-quality classifiers aggregate:
    * every edge (u → v) contributes u's leading bigram as "anchor
    * text" for v, and each hub's profile reports anchor volume,
    * diversity, and the dominant anchor (max count, lexicographic-min
    * tie-break).
    *
    * Composition key: the SAME edge set as [[qLinkPagerank]]
    * ([[linkEdges]], shared so the two keys cannot disagree about the
    * graph) joined to the documents' text. Scale shape: the anchor
    * table is one codegen'd map over the docs; the edge⋈anchor join is
    * equi on the source id; the per-hub top-1 is `min_by` over a
    * (−count, anchor) ordering struct — ≤ 1 record of state per hub,
    * never a rank window (the oracle states it the window way). The
    * hub filter (`dst < 13`) lands BEFORE the join, so only hub-bound
    * edges move. */
  def qAnchorText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val anchors = docs(s, dir).select($"doc_id",
      expr("array_join(slice(split(text, '\\\\s+'), 1, 2), ' ')").as("anchor"))
    // the (v, n) node frame is read twice by the closed-form edge
    // build (ids + the count attach) — fence it once like
    // qLinkPagerank already does, so the only other docs scan is the
    // anchor-text pull itself (3 FileScans → 2 in the r20 plan)
    val cnt = linkEdgesOf(graphNodes(s, dir).localCheckpoint()).where($"dst" < 13)
      .join(anchors, $"doc_id" === $"src")
      .groupBy($"dst", $"anchor").agg(count(lit(1)).as("c"))
    cnt.groupBy($"dst".as("hub"))
      .agg(sum($"c").as("n_anchors"),
        count(lit(1)).as("n_distinct"),
        min_by($"anchor", struct((-$"c").as("nc"), $"anchor")).as("top_anchor"),
        min_by($"c", struct((-$"c").as("nc"), $"anchor")).as("top_count"))
      .orderBy($"hub")
  }

  /** Cross-signal dedup agreement audit: do the LEXICAL near-dup
    * signal (MinHash/LSH Jaccard over shingles — [[TextOps]]'s staged
    * pair set) and the SEMANTIC one (banded cosine over embeddings —
    * [[EmbeddingOps]]'s verified pair set) flag the same pairs?
    *
    * A production curation run uses both; this audit is the report
    * that says whether they overlap, and by how much, BEFORE someone
    * unions them blindly (pairs only one signal finds are exactly the
    * interesting ones: paraphrases the hash signal misses, and
    * hash-identical boilerplate the embedding space spreads apart).
    * The fixture's docs and embeddings align by id (doc_id ≡ vec_id),
    * and both pair sets come from the SAME shared machinery as their
    * own gated keys (`TextOps.nearDupPairs`, `embedNearDupScored`) so
    * this key can never disagree with them about what a near-dup is.
    *
    * Scale shape: both inputs are already verified PAIR sets — orders
    * of magnitude smaller than the corpus — and the reconciliation is
    * one full-outer equi-join on the pair key plus a 3-row rollup.
    */
  def qDedupAgreement(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val text = TextOps.nearDupPairs(s, dir)
      .select($"doc_a", $"doc_b", lit(1).as("t"))
    val emb = EmbeddingOps.embedNearDupScored(s, dir)
      .select($"va".as("doc_a"), $"vb".as("doc_b"), lit(1).as("e"))
    text.join(emb, Seq("doc_a", "doc_b"), "full_outer")
      .select($"doc_a", $"doc_b",
        when($"t".isNotNull && $"e".isNotNull, "both")
          .when($"t".isNotNull, "text_only")
          .otherwise("embedding_only").as("signal"))
      .groupBy($"signal")
      .agg(count(lit(1)).as("n_pairs"),
        expr("bit_xor(doc_a * 100003 + doc_b)").as("pair_xor"))
      .orderBy($"signal")
  }

  // -------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_link_pagerank" -> qLinkPagerank,
    "q_line_dedup" -> qLineDedup,
    "q_quality_classifier" -> qQualityClassifier,
    "q_inverted_index" -> qInvertedIndex,
    "q_bm25_topk" -> qBm25TopK,
    "q_phrase_search" -> qPhraseSearch,
    "q_postings_merge" -> qPostingsMerge,
    "q_dedup_agreement" -> qDedupAgreement,
    "q_anchor_text" -> qAnchorText,
  )

  /** The closed-form link graph as DuckDB CTEs (nn/nodes/e0) — ONE
    * definition nested by both graph oracles (q_link_pagerank,
    * q_anchor_text), mirroring the Spark side's shared [[linkEdgesOf]]
    * so an edit to the fixture graph cannot desync them. */
  private val linkGraphCteSql: String =
    """nn AS (SELECT count(*) AS n FROM documents),
      |nodes AS (SELECT doc_id AS v FROM documents),
      |e0 AS (SELECT DISTINCT src, dst FROM (
      |  SELECT v AS src, v % 13 AS dst FROM nodes
      |  UNION ALL SELECT v, (v*v + 7) % n FROM nodes, nn
      |  UNION ALL SELECT v, (v*29 + 11) % n FROM nodes, nn) u
      | WHERE dst <> src)""".stripMargin

  /** One unrolled PageRank round as a DuckDB CTE pair; `prev` is the
    * rank relation of the previous round. */
  private def prRound(i: Int, prev: String): String =
    s"""m$i AS (SELECT e.dst AS v, CAST(sum(r.r // e.deg) AS BIGINT) AS m
       |  FROM e JOIN $prev r ON r.v = e.src GROUP BY e.dst),
       |i$i AS (SELECT nodes.v,
       |    (SELECT 150000000000 // n FROM nn) + (850 * coalesce(m$i.m, 0)) // 1000 AS r
       |  FROM nodes LEFT JOIN m$i ON m$i.v = nodes.v)""".stripMargin

  val oracles: Map[String, String] = Map(
    // The oracle rebuilds the closed-form graph and replays the exact
    // fixed-point recurrence — every floor div mirrored, so the final
    // per-group totals/extrema/XOR must match bit-for-bit.
    "q_link_pagerank" ->
      s"""WITH $linkGraphCteSql,
         |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
         |e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
         |r0 AS (SELECT v, 1000000000000 // n AS r FROM nodes, nn),
         |${prRound(1, "r0")},
         |${prRound(2, "i1")},
         |${prRound(3, "i2")}
         |SELECT CASE WHEN v < 13 THEN v ELSE -1 END AS grp,
         |       count(*) AS n_nodes,
         |       CAST(sum(r) AS BIGINT) AS sum_rank,
         |       min(r) AS min_rank, max(r) AS max_rank,
         |       bit_xor(r) AS rank_xor
         |FROM i3 GROUP BY 1 ORDER BY grp""".stripMargin,
    // The lined view is rebuilt closed-form (banner membership is
    // arithmetic in doc_id; body chunks replay the same 16-word
    // slicing — DuckDB's 1-based inclusive slice clamps exactly like
    // Spark's (start, length) slice), and the kept_md5 pins the
    // surviving bytes in original order.
    "q_line_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents),
         |lined AS (
         |  SELECT doc_id,
         |    list_concat(
         |      list_filter([CASE WHEN doc_id % 3 = 0 THEN '$Banner3' END,
         |                   CASE WHEN doc_id % 5 = 0 THEN '$Banner5' END],
         |                  x -> x IS NOT NULL),
         |      list_transform(range(0, CAST((len(ws) + 15) // 16 AS INT)),
         |                     c -> array_to_string(ws[c*16+1 : c*16+16], ' '))) AS lines
         |  FROM d),
         |lx AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS ln, lines[i+1] AS line,
         |         CAST('0x' || substring(md5(lines[i+1]), 1, 15) AS BIGINT) AS lh
         |  FROM lined, (SELECT unnest(generate_series(0, $OracleUnrollCap)) AS i) t
         |  WHERE i < len(lines)),
         |freq AS (SELECT lh, count(DISTINCT doc_id) AS df FROM lx GROUP BY lh)
         |SELECT lx.doc_id,
         |       count(*) AS n_lines,
         |       count(*) FILTER (WHERE freq.df < 5) AS n_kept,
         |       md5(coalesce(string_agg(lx.line, '|' ORDER BY lx.ln)
         |                      FILTER (WHERE freq.df < 5), '')) AS kept_md5
         |FROM lx JOIN freq USING (lh)
         |GROUP BY lx.doc_id ORDER BY lx.doc_id""".stripMargin,
    // The index rebuilt from the token stream by a second engine —
    // the XOR postings fingerprint means one wrong tf anywhere flips
    // a cell even though postings never materialize in the output.
    "q_inverted_index" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${Hashing.wordHashListSql}) AS th FROM documents),
         |post AS (SELECT th, doc_id, count(*) AS tf FROM tok GROUP BY th, doc_id)
         |SELECT th AS term_hash, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
         |       bit_xor(doc_id * 37 + tf) AS postings_xor
         |FROM post GROUP BY th HAVING count(*) >= 5 ORDER BY term_hash""".stripMargin,
    // The oracle states top-5 the spec way (one window per query);
    // the Spark side must reproduce it from the bounded-state
    // aggregator. Every floor div is mirrored.
    "q_bm25_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${Hashing.wordHashListSql}) AS th FROM documents),
         |post AS (SELECT th, doc_id, count(*) AS tf FROM tok GROUP BY th, doc_id),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |nn AS (SELECT count(*) AS n,
         |              (SELECT CAST(sum(dl) AS BIGINT) FROM dl) // count(*) AS avgdl
         |       FROM dl),
         |df AS (SELECT th, count(*) AS df FROM post GROUP BY th),
         |qt AS (
         |  SELECT DISTINCT doc_id // 7 AS query_id,
         |         unnest((${Hashing.wordHashListSql})[1:3]) AS th
         |  FROM documents WHERE doc_id % 7 = 0 AND doc_id < 56),
         |scored AS (
         |  SELECT qt.query_id, post.doc_id,
         |    CAST(sum(
         |      ((1000 * (2*nn.n - 2*df.df + 1)) // (2*df.df + 1)) *
         |      ((22000 * nn.avgdl * post.tf) // (10*nn.avgdl*post.tf + 3*nn.avgdl + 9*dl.dl))
         |    ) AS BIGINT) AS score_milli
         |  FROM qt JOIN post ON post.th = qt.th
         |       JOIN dl ON dl.doc_id = post.doc_id, nn
         |       JOIN df ON df.th = qt.th
         |  GROUP BY qt.query_id, post.doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id, score_milli,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY score_milli DESC, doc_id) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id, score_milli
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // Positional postings rebuilt with the generate_series index
    // trick (DuckDB lacks WITH ORDINALITY); adjacency stated as
    // pos+1 on the m1 side — the Spark plan shifts m2 by -1, same set.
    "q_phrase_search" ->
      s"""WITH tokpos AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos, hs[i+1] AS th
         |  FROM (SELECT doc_id, ${Hashing.wordHashListSql} AS hs FROM documents),
         |       (SELECT unnest(generate_series(0, $OracleUnrollCap)) AS i) t
         |  WHERE i < len(hs)),
         |ph AS (
         |  SELECT DISTINCT doc_id // 7 AS query_id, hs[1] AS th1, hs[2] AS th2
         |  FROM (SELECT doc_id, ${Hashing.wordHashListSql} AS hs FROM documents)
         |  WHERE doc_id % 7 = 0 AND doc_id < 56),
         |m1 AS (SELECT ph.query_id, tp.doc_id, tp.pos
         |       FROM ph JOIN tokpos tp ON tp.th = ph.th1),
         |m2 AS (SELECT ph.query_id, tp.doc_id, tp.pos
         |       FROM ph JOIN tokpos tp ON tp.th = ph.th2)
         |SELECT m1.query_id, m1.doc_id, count(*) AS n_occurrences
         |FROM m1 JOIN m2 ON m2.query_id = m1.query_id AND m2.doc_id = m1.doc_id
         |                AND m2.pos = m1.pos + 1
         |GROUP BY m1.query_id, m1.doc_id
         |ORDER BY m1.query_id, m1.doc_id""".stripMargin,
    // The oracle builds the index in ONE pass over the whole corpus
    // (per-half dfs as conditional counts); the Spark side must arrive
    // at the identical index from two disjoint batches + a merge —
    // equality IS the merge law.
    "q_postings_merge" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${Hashing.wordHashListSql}) AS th FROM documents),
         |post AS (SELECT th, doc_id, count(*) AS tf FROM tok GROUP BY th, doc_id)
         |SELECT th AS term_hash,
         |       count(*) AS df,
         |       CAST(sum(tf) AS BIGINT) AS cf,
         |       bit_xor(doc_id * 37 + tf) AS postings_xor,
         |       count(*) FILTER (WHERE doc_id % 2 = 0) AS df_a,
         |       count(*) FILTER (WHERE doc_id % 2 = 1) AS df_b
         |FROM post GROUP BY th HAVING count(*) >= 5 ORDER BY term_hash""".stripMargin,
    // Same closed-form edge set as the pagerank oracle; the top
    // anchor stated the window way (the Spark side must reproduce it
    // from bounded-state min_by).
    "q_anchor_text" ->
      s"""WITH $linkGraphCteSql,
        |a AS (SELECT doc_id, array_to_string(string_split_regex(text, '\\s+')[1:2], ' ') AS anchor
        |      FROM documents),
        |ea AS (SELECT e0.dst, a.anchor FROM e0 JOIN a ON a.doc_id = e0.src
        |       WHERE e0.dst < 13),
        |cnt AS (SELECT dst, anchor, count(*) AS c FROM ea GROUP BY dst, anchor),
        |top AS (SELECT dst, anchor AS top_anchor, c AS top_count FROM (
        |  SELECT dst, anchor, c, row_number() OVER (PARTITION BY dst ORDER BY c DESC, anchor) AS rn
        |  FROM cnt) WHERE rn = 1)
        |SELECT cnt.dst AS hub, CAST(sum(c) AS BIGINT) AS n_anchors,
        |       count(*) AS n_distinct, min(top.top_anchor) AS top_anchor,
        |       min(top.top_count) AS top_count
        |FROM cnt JOIN top ON top.dst = cnt.dst
        |GROUP BY cnt.dst ORDER BY hub""".stripMargin,
    // Both pair pipelines nested verbatim from their own gated
    // oracles' shared CTEs (minhash owns bands/capped/cand, the
    // embedding chain is e-prefixed), reconciled by one full outer
    // join — the audit cannot disagree with the audited keys.
    "q_dedup_agreement" ->
      s"""WITH ${TextOps.minhashCteSql},
         |${TextOps.textPairsCteSql("text_pairs")},
         |${EmbeddingOps.embedPairsCteSql},
         |allp AS (
         |  SELECT coalesce(t.doc_a, e.va) AS doc_a,
         |         coalesce(t.doc_b, e.vb) AS doc_b,
         |         CASE WHEN t.doc_a IS NOT NULL AND e.va IS NOT NULL THEN 'both'
         |              WHEN t.doc_a IS NOT NULL THEN 'text_only'
         |              ELSE 'embedding_only' END AS signal
         |  FROM text_pairs t FULL OUTER JOIN escored e
         |    ON e.va = t.doc_a AND e.vb = t.doc_b)
         |SELECT signal, count(*) AS n_pairs,
         |       bit_xor(doc_a * 100003 + doc_b) AS pair_xor
         |FROM allp GROUP BY signal ORDER BY signal""".stripMargin,
    // Same literal weight vector, same md5-prefix word hash, same
    // integer sum — the oracle is the model applied by a second engine.
    "q_quality_classifier" ->
      s"""WITH scored AS (
         |  SELECT lang, source,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(${Hashing.wordHashListSql},
         |        h -> CAST(([${ClassifierWeights.mkString(",")}])[CAST(h % 64 AS INT) + 1] AS BIGINT))),
         |      (acc, x) -> acc + x) AS score_milli
         |  FROM documents)
         |SELECT lang, source,
         |  count(*) AS n_docs,
         |  count(*) FILTER (WHERE score_milli >= 0) AS n_pass,
         |  CAST(sum(score_milli) AS BIGINT) AS sum_score,
         |  min(score_milli) AS min_score, max(score_milli) AS max_score
         |FROM scored GROUP BY lang, source ORDER BY lang, source""".stripMargin,
  )
}
