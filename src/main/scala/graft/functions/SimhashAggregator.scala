package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * SimHash as a typed [[Aggregator]]: input rows are (tokenHash48, count),
 * the buffer is the 48 bit-vote counters, the output is the 48-bit
 * signature. Registered as a UDAF (`functions.udaf`) this folds the whole
 * signature in ONE aggregate column — semantically identical to the
 * 49-static-column formulation in DedupQueries (the DuckDB oracle covers
 * both), with a much smaller generated-code footprint.
 *
 * Buffer math: vote_i = 2·Σ(cnt where bit i set) − Σcnt, so we track the
 * masked sums and the total; sign(vote_i) > 0 ⇔ 2·masked_i > total.
 * Merge is element-wise addition ⇒ associative and order-independent, the
 * contract partial aggregation needs at any parallelism.
 */
object SimhashAggregator extends Aggregator[(Long, Long), Array[Long], Long] {

  private val Bits = 48

  override def zero: Array[Long] = new Array[Long](Bits + 1)   // [0]=total

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val (h, cnt) = in
    buf(0) += cnt
    var i = 0
    while (i < Bits) {
      if (((h >>> i) & 1L) == 1L) buf(i + 1) += cnt
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= Bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (2 * buf(i + 1) > buf(0)) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
