package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared LSH banding machinery: per-bucket candidate caps and
  * bucket-local pair expansion, used by every banded dedup/ANN
  * operator (text minhash, n-gram blocking, embedding sign-LSH) so the
  * cap/expansion semantics cannot drift between the families.
  *
  * Scale properties (asserted in `PlanAuditSpec`): the cap's
  * row_number filter compiles to a partial WindowGroupLimit BELOW the
  * exchange (each mapper ships ≤ cap rows per bucket), and the
  * aggregation in `bucketPairs` reuses the window's hash partitioning
  * — one exchange pays for cap + expansion together. */
private[queries] object Banding {

  /** Keep each bucket's `cap` smallest ids (deterministic,
    * oracle-mirrored as a row_number ≤ cap). `bucketCol` is the
    * grouping key — "band" for the LSH families, "cell" for IVF. */
  def capBuckets(bands: DataFrame, idCol: String, cap: Int,
                 bucketCol: String = "band"): DataFrame = {
    val w = Window.partitionBy(col(bucketCol)).orderBy(col(idCol))
    bands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap).drop("rn")
  }

  /** Bucket-local pair expansion: one shuffle of (id, band) rows, then
    * each bucket expands its own (capped) id list — collect_set state
    * is bounded by the cap, and there is no self-join recomputing the
    * signature pipeline for both sides. Output columns `aName` <
    * `bName`, deduped across buckets. */
  def bucketPairs(cappedBands: DataFrame, idCol: String,
                  aName: String, bName: String): DataFrame =
    cappedBands.groupBy(col("band"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(sequence(0, size(ids)-2), " +
          s"i -> transform(sequence(i+1, size(ids)-1), " +
          s"j -> struct(ids[i] AS $aName, ids[j] AS $bName))))")).as("p"))
      .select(col(s"p.$aName"), col(s"p.$bName"))
      .distinct()

  /** Bucket-local pair VERIFY: like [[bucketPairs]], but each capped
    * band row also carries the member's verify payload (`n` = distinct
    * element count, `hs` = element-hash array), so the exact set
    * intersection runs INSIDE the bucket and only passing pairs leave
    * it. This is the shape that survives a duplicate-dense corpus:
    * shuffled bytes are bucket rows × payload — linear in corpus ×
    * band count — where joining payloads onto expanded candidate pairs
    * ships pairs × payload, which under heavy duplication is quadratic
    * in duplicate multiplicity (measured at the 100× stress: the
    * pair-join form exceeded memory/time; this form runs, SCALE.md).
    * `keep` is a SQL lambda over `p.inter`/`p.sz` (sz = na + nb);
    * duplicates across buckets collapse by exact-value distinct. */
  def verifiedPairs(cappedBands: DataFrame, idCol: String,
                    aName: String, bName: String, keep: String): DataFrame =
    cappedBands.groupBy(col("band"))
      .agg(sort_array(collect_list(struct(col(idCol), col("n"), col("hs")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(expr(
        s"""filter(
              flatten(transform(sequence(0, size(xs)-2),
                i -> transform(sequence(i+1, size(xs)-1),
                  j -> struct(xs[i].$idCol AS $aName, xs[j].$idCol AS $bName,
                    CAST(size(array_intersect(xs[i].hs, xs[j].hs)) AS BIGINT) AS inter,
                    xs[i].n + xs[j].n AS sz)))),
              $keep)""")).as("p"))
      .select(col(s"p.$aName").as(aName), col(s"p.$bName").as(bName),
        col("p.inter").as("inter"), (col("p.sz") - col("p.inter")).as("uni"))
      .distinct()

  /** [[verifiedPairs]] with the two set sizes kept SEPARATE in the
    * verify struct (`p.na`/`p.nb` instead of their sum) — for keep
    * rules that are not symmetric in the sizes, e.g. Broder
    * CONTAINMENT |A∩B| / min(|A|,|B|), which a Jaccard rule cannot
    * express. Same bucket-local shape and scale properties. */
  def verifiedPairsSized(cappedBands: DataFrame, idCol: String,
                         aName: String, bName: String, keep: String): DataFrame =
    cappedBands.groupBy(col("band"))
      .agg(sort_array(collect_list(struct(col(idCol), col("n"), col("hs")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(expr(
        s"""filter(
              flatten(transform(sequence(0, size(xs)-2),
                i -> transform(sequence(i+1, size(xs)-1),
                  j -> struct(xs[i].$idCol AS $aName, xs[j].$idCol AS $bName,
                    xs[i].n AS na, xs[j].n AS nb,
                    CAST(size(array_intersect(xs[i].hs, xs[j].hs)) AS BIGINT) AS inter)))),
              $keep)""")).as("p"))
      .select(col(s"p.$aName").as(aName), col(s"p.$bName").as(bName),
        col("p.na").as("n_a"), col("p.nb").as("n_b"), col("p.inter").as("inter"))
      .distinct()
}
