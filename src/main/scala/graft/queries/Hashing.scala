package graft.queries

/** The cross-engine determinism contract for text hashing, defined
  * ONCE: every operator that hashes words must use these exact
  * expressions, and each Spark expression has its DuckDB twin right
  * next to it — an edit that changes one side (e.g. widening the hash
  * prefix) cannot silently miss the other or a third inlined copy.
  *
  * The word alphabet is the first 8 md5 hex chars as a 32-bit integer:
  * small enough that products in rolling hashes stay exact in int64,
  * reproducible bit-for-bit in any engine with md5. */
private[queries] object Hashing {

  /** Oracle-side per-doc word-position unroll bound: DuckDB lacks
    * WITH ORDINALITY, so position-indexed oracles enumerate with
    * `generate_series(0, cap)` — a doc whose word count exceeds it
    * would truncate the ORACLE side only, a confusing hash mismatch
    * with no pointer to the cap (the r15-advice hazard class; the
    * line/phrase twin lives in CurationOps.OracleUnrollCap). New
    * position-unrolled oracles interpolate this constant and guard
    * the Spark side with an assert_true naming it. */
  val WordUnrollCap = 2000

  /** Per-word 32-bit hash list over whitespace-split text (Spark SQL). */
  val wordHashSql: String =
    "transform(split(text, '\\\\s+'), x -> CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT))"

  /** DuckDB twin of [[wordHashSql]]. */
  val wordHashListSql: String =
    "list_transform(string_split_regex(text, '\\s+'), x -> CAST('0x' || substring(md5(x), 1, 8) AS BIGINT))"

  /** Polynomial rolling hash (acc*31 + h mod 1e9+7) over the first `k`
    * word hashes — the prefix/boilerplate fingerprint (Spark SQL). */
  def prefixFingerprintSql(k: Int): String =
    s"aggregate(slice($wordHashSql, 1, $k), CAST(0 AS BIGINT), (acc, h) -> (acc * 31 + h) % 1000000007)"

  /** DuckDB twin of [[prefixFingerprintSql]] (DuckDB slices are
    * 1-based inclusive; list_reduce has no init form, hence the
    * prepended zero). */
  def prefixFingerprintDuck(k: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), ($wordHashListSql)[1:$k]), (acc, h) -> (acc * 31 + h) % 1000000007)"
}
