package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Partition-count invariance: a distributed plan must produce the
  * SAME rows under any `spark.sql.shuffle.partitions` — the local
  * stand-in for "the answer doesn't change when the cluster grows".
  * Catches float-order nondeterminism, rand()/monotonic-id leakage,
  * per-partition tie-breaks, and non-commutative accumulation. Runs a
  * representative query per operator family (windows, salting, HOF
  * hashing, checkpoint-materialized aggregates, banded dedup) at 2 vs
  * 13 shuffle partitions (13 is prime — no accidental alignment with
  * the 4-partition default the rest of the suite uses). */
class InvarianceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val keys = Seq(
    "q_asof_join",        // union-window tie ordering
    "q_rolling_peak",     // RANGE frame
    "q_salted_agg",       // two-phase salted sums (decimal-exact)
    "q_salted_join",      // salted join + dsum2
    "q_sequence_pack",    // running sum + subset-partitioned agg
    "q_collocations",     // localCheckpoint + integer lift + limit ties
    "q_vocab_coverage",   // literal top-K vocab tie-break
    "q_simhash_pairs",    // band join + distinct
    "q_minhash_pairs",    // collect_set array verify
    "q_streaming_hourly", // streaming replay
    "q_kmeans_clusters",  // floor-of-double centroid means over partial sums
    "q_semantic_dedup",   // cluster self-join + float-cosine threshold
    "q_graph_components", // iterative min-label propagation round count
    "q_rank_global",      // two-phase rank across range boundaries
    "q_cdc_stream",       // multi-batch foreachBatch LWW merge chain
    "q_pii_scrub",        // regex scrub + xor checksum
    "q_pq_ann",           // trained codebooks + ADC gather + top-k ties
    "q_ivfpq_residual",   // cells + residuals + frozen gather + re-rank
    "q_cms_heavy_hitters", // sketch linearity + TakeOrdered ties
    "q_k_anonymity",      // broadcast class stats + left-join rollup
    "q_winnow_fingerprint", // packed-key array_min winnowing + xor checksum
    "q_weighted_sample",  // integer acceptance compare + bit_xor rollup
    "q_padding_waste",    // per-bucket max under partial agg
    "q_survivorship",     // max_by FILTER tiebreaks under partial agg
    "q_ngram_novelty",    // split die + train-gram membership join
    "q_sq8_recall",       // sorted-struct stats arrays + adc/cid ties
    "q_rp_recall",        // broadcast sign matrix + pdot/cid ties
    "q_containment",      // shared band rows + sized verify
    "q_source_overlap",   // bottom-64 sketch + exact-join matrix
    "q_shared_spans",     // diagonal islands + rare-window guard
    "q_filter_funnel",    // CASE attribution + lang share window
    "q_token_edit_pairs", // PassJoin segment join + bucket-cap rank windows
    "q_budget_select",    // level-granular histogram cutoff windows
    "q_leak_safe_split",  // CC labels + rep-hash split + countDistinct rollup
    "q_column_profile",   // unpivot + (column, value) two-phase distinct
    "q_data_constraints", // conditional aggs + anti-join count
    "q_mad_outliers",     // two-phase quantile: bucket histogram + in-bucket rank ties
    "q_bucketed_join",    // fixed 8-bucket layout under any shuffle partitioning
    "q_csv_roundtrip",    // file count varies with partitions; XOR checksum must not
    "q_jsonl_roundtrip",  // same, line-split carrier
    "q_audio_decode",     // per-partition codec batches
    "q_gdpr_delete",      // broadcast anti-join + conditional-agg accounting
    "q_snapshot_diff",    // full-outer null classification + key XORs
    "q_epoch_shuffle",    // per-shard collect_list order fixed by array_sort, not arrival
    "q_link_pagerank",    // checkpointed edges + 3 iterated joins, integer fixed-point
    "q_line_dedup",       // collect_list reassembly ordered by array_sort, not arrival
    "q_bm25_topk")        // TopKAgg tie-break + floor-div scoring under partial agg

  private def rows(key: String, parts: Int): Seq[Row] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try graft.SparkEntry.queries(key)(spark, dir).collect().toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  keys.foreach { key =>
    test(s"$key: identical rows at 2 and 13 shuffle partitions") {
      assert(rows(key, 2) == rows(key, 13))
    }
  }

  test("sequence(a, b) runs DESCENDING when a > b — the quirk rankPhase2 guards") {
    // rankPhase2's explode-forward wraps sequence() in
    // when(pid < P-1, ...) because Spark's sequence(a, b) does NOT
    // return an empty array when a > b — it counts DOWN. If an
    // upstream Spark release ever changes that to empty-array
    // semantics, this pin fails and the guard can be simplified,
    // instead of the behavior change silently altering offsets.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = spark.range(1).select(
      sequence(lit(3), lit(1)).as("desc"), sequence(lit(1), lit(3)).as("asc"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(r._1 == Seq(3L, 2L, 1L), s"sequence(3,1) semantics changed: ${r._1}")
    assert(r._2 == Seq(1L, 2L, 3L))
  }

  test("rankPhase2 survives a shuffle-partition change between phases") {
    // Phase-1 pids are frozen by the caller's checkpoint; phase 2 must
    // derive its pid bound from the DATA, not the live conf — a
    // conf-derived bound silently omits high pids (ranks collapse or
    // duplicate) when spark.sql.shuffle.partitions shrinks between
    // phases. Run phase 1 wide (13), phase 2 narrow (2), and demand a
    // contiguous 0..n-1 rank in key order.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val users = Tables.events(spark, dir).select(col("user_id")).distinct()
      val p1 = TextOps.rankPhase1(users).localCheckpoint()
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val got = TextOps.rankPhase2(spark, p1)
        .orderBy(col("user_id")).select(col("rk")).as[Long].collect().toSeq
      assert(got == got.indices.map(_.toLong),
        s"ranks not contiguous 0..${got.size - 1} after conf change")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
