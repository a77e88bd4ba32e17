package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: OR-union of a fixed-size bitset over input bit
  * positions — the mergeable core of a Bloom filter (and of any
  * fixed-width bitmap index). Callers hash values to k positions with
  * ordinary codegen'd column expressions and feed the positions in;
  * the aggregator only sets bits, so it stays hash-agnostic and the
  * build side and probe side share ONE set of position expressions
  * (see `PipelineOps.bloomPositionsSql`).
  *
  * The buffer is `numBits/64` longs regardless of input cardinality,
  * and merge is bitwise OR — commutative, associative, idempotent —
  * so partial aggregation applies and re-inserting a value is a
  * no-op. Idempotence is what makes the sketch INCREMENTAL at 100 TB:
  * yesterday's corpus filter ORs with today's batch filter in
  * `numBits/64` longs of work, no corpus rescan.
  *
  * Positions outside [0, numBits) fail fast: a caller whose hash
  * expression disagrees with `numBits` would otherwise build a filter
  * that silently answers "absent" for reachable positions — a FALSE
  * NEGATIVE, the one error class a Bloom filter must never have. */
final class BitSetAgg(numBits: Int)(implicit arrEnc: Encoder[Array[Long]])
  extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64: $numBits")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(b: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < numBits, s"bit position out of range: $pos")
    b((pos >> 6).toInt) |= 1L << (pos & 63)
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = arrEnc
  override def outputEncoder: Encoder[Array[Long]] = arrEnc
}
