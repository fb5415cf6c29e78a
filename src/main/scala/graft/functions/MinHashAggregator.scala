package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF building a MinHash signature from base shingle hashes — the
  * `Aggregator[IN, BUF, OUT]` rung of the extension ladder (SURVEY.md §2.12):
  * mergeable fixed-size state (the k minima), so partial aggregation runs
  * map-side and the shuffle carries k longs per key regardless of shingle
  * count — sketch semantics at 100 TB.
  *
  * Hash family matches [[TextFns.affineHash]] exactly (same constants, same
  * modulus), property-tested equal to the DataFrame min-over-affine
  * formulation in TextQueries.q_dedup_minhash.
  */
class MinHashAggregator(numHashes: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val P = TextFns.HashMod

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val v = ((3L + 2L * i) * h + (7L + 11L * i)) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
