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
    "q_pii_scrub")        // regex scrub + xor checksum

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
}
