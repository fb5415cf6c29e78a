package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF keeping the top-k (value DESC, id ASC) rows per group with a
  * BOUNDED k-entry buffer — the scale-right grouped top-k (SURVEY.md §2.12,
  * the second `Aggregator` rung after [[MinHashAggregator]]).
  *
  * Why it exists: grouped top-k via `Window.partitionBy(g).orderBy(v)` +
  * `rank <= k` sorts EVERY group's full row set (the W1 trap — fatal when a
  * group holds a 100 TB table's worth of rows), and the salted two-phase
  * rewrite (q_window_rank) fixes the funnel but still shuffles a top-k per
  * salt. This aggregator's state is k (value, id) pairs regardless of group
  * size, merged map-side, so the shuffle carries at most k entries per
  * (group, map partition) and no sort of the data ever happens.
  *
  * Determinism: ordering is (value DESC, id ASC) with ids unique, so the
  * kept set and its order are total — the DuckDB `row_number` oracle
  * reproduces them exactly. Insertion keeps the buffer sorted (k is small;
  * linear insert beats heap constant-factor and keeps merge a simple
  * sorted-merge prefix).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** (a before b) in the (value DESC, id ASC) total order. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size == k && before(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => before(x, e)) match { case -1 => buf.size; case n => n }
      (buf.take(i) :+ x) ++ buf.drop(i) take k
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // both inputs sorted; merge the prefixes until k entries are taken
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && before(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
