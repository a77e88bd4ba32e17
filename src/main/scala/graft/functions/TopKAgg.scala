package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: the k best (id, score) pairs per group, ranked
  * by score DESC with smallest-id tie-break — arg-top-k, the
  * window-free form of "top N per group".
  *
  * The scale contrast with the window form (`q_window_topk_parts`,
  * `row_number` over a partition) is the point: a rank window SORTS
  * every group's full row set (and a skewed group sorts in one task),
  * while this buffer holds AT MOST k pairs per group and
  * partial-aggregates map-side like any built-in — each input
  * partition reduces locally to ≤ k pairs per group before anything
  * shuffles, so shuffle volume is groups × k, independent of row
  * count. Merge is commutative/associative and order-insensitive
  * (the same sorted-trim law as [[MinKAgg]]), which is exactly what
  * licenses the map-side combine.
  *
  * Encoders come from the call site (`import s.implicits._`); the
  * class has no SparkSession dependency. */
final class TopKAgg(k: Int)(implicit bufEnc: Encoder[Seq[(Long, Long)]])
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive: $k")

  /** Ascending = best first: larger score, then smaller id. */
  private val ord: Ordering[(Long, Long)] =
    Ordering.by(t => (-t._2, t._1))

  override def zero: Seq[(Long, Long)] = Vector.empty

  /** INVARIANT the fast path leans on: every buffer that reaches
    * `reduce` is sorted best-first with size ≤ k, because `zero` and
    * `trim` are the only producers of buffers. The `b.last` skip is
    * only correct under that invariant — if a future edit returns an
    * untrimmed or unsorted buffer from any path, this silently drops
    * pairs that should have been kept (asserted in TopKAggSpec). */
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    // skip the resort when a can't displace the weakest kept pair —
    // the common case once the buffer is warm
    if (b.size >= k && ord.gteq(a, b.last)) b else trim(b :+ a)

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(x ++ y)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = s.sorted(ord)
    if (sorted.size <= k) sorted else sorted.take(k)
  }

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = bufEnc
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufEnc
}
