package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregate (the `Aggregator[IN, BUF, OUT]` extension
  * surface SURVEY.md §2.11 maps extension aggregates to): per group, keep
  * the k (score, id) entries with the highest score, ties broken by
  * smallest id — deterministic, so results hash-match a `row_number`
  * window oracle.
  *
  * Why an aggregate and not a window: the buffer is BOUNDED at k entries
  * and partial-aggregable, so map-side combine ships at most k rows per
  * group per partition and the merge tree never materializes a whole
  * group. A ranking window (even with WindowGroupLimit's pre-shuffle
  * prune) still sorts its per-partition survivors; for very high group
  * cardinality with small k, the heap-merge shape is the one that scales.
  * k is bounded (model parameter — k·|groups| output rows is the
  * contract), so the linear insert is effectively O(1) per row.
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, "k >= 1")

  /** best-first ordering: higher score first, then smaller id.
    * java.lang.Double.compare, not `>`: NaN orders as the LARGEST score and
    * equal to itself — matching how both Spark and DuckDB sort a
    * `value DESC` window, so NaN scores rank first deterministically
    * instead of being silently dropped by IEEE comparison semantics.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val e = (in._2, in._1)
    if (buf.size >= k && better(buf.last, e)) buf
    else {
      val i = buf.indexWhere(b => better(e, b))
      val inserted = if (i < 0) buf :+ e else (buf.take(i) :+ e) ++ buf.drop(i)
      if (inserted.size > k) inserted.take(k) else inserted
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // merge two best-first sequences, keep k
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** DataFrame-friendly form: `topK(3)(col("id"), col("score"))` returns an
    * array<struct> of the group's top entries, best first.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(TopKAgg(k))
}
