package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: the k smallest input values per group (with
  * duplicates), ascending. The third extension tier alongside the
  * native Expression (`QuantizedDot`) and the composed built-ins: a
  * custom AGGREGATE function, registered per call site through
  * `functions.udaf`. Buffer state is at most k values, merge is
  * commutative/associative and order-insensitive (property-tested), so
  * partial aggregation — map-side combine, the thing that makes a
  * group-by scale — applies exactly as it does to built-in aggregates.
  * This is the aggregation core of MinHash (k independent minima);
  * `q_mink_hash` exercises it standalone.
  *
  * Encoders are taken from the call site (`import s.implicits._`), not
  * summoned internally, so the class has no SparkSession dependency. */
final class MinKAgg(k: Int)(implicit seqEnc: Encoder[Seq[Long]])
  extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    // avoid resorting when a can't make the cut — the common case once
    // the buffer is warm
    if (b.size >= k && a >= b.last) b else trim(b :+ a)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)

  override def finish(b: Seq[Long]): Seq[Long] = b

  private def trim(s: Seq[Long]): Seq[Long] = {
    val sorted = s.sorted
    if (sorted.size <= k) sorted else sorted.take(k)
  }

  override def bufferEncoder: Encoder[Seq[Long]] = seqEnc
  override def outputEncoder: Encoder[Seq[Long]] = seqEnc
}
