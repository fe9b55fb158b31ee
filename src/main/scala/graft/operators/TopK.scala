package graft.operators

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k aggregator: the grouped analog of
  * `TakeOrderedAndProject`. Used by kNN joins so the shuffle carries at
  * most k candidates per (group, partition) — map-side partial
  * aggregation trims each partition's candidates to k before any data
  * moves, instead of shuffling every candidate row through a window.
  *
  * Ordering: (dist, id) ascending — the engine-wide tie-break.
  */
object TopK {

  type Cand = (Long, Double) // (id, dist)

  private def ord(c: Cand): (Double, Long) = (c._2, c._1)

  /** Buffer is a sorted ascending Vector of at most k candidates. */
  final class TopKAgg(k: Int) extends Aggregator[Cand, Seq[Cand], Seq[Cand]] {
    override def zero: Seq[Cand] = Vector.empty

    override def reduce(buf: Seq[Cand], c: Cand): Seq[Cand] =
      if (buf.nonEmpty && buf.length >= k &&
          implicitly[Ordering[(Double, Long)]].gteq(ord(c), ord(buf.last))) buf
      else ((buf :+ c).sortBy(ord)).take(k)

    override def merge(a: Seq[Cand], b: Seq[Cand]): Seq[Cand] =
      (a ++ b).sortBy(ord).take(k)

    override def finish(r: Seq[Cand]): Seq[Cand] = r

    override def bufferEncoder: Encoder[Seq[Cand]] = ExpressionEncoder[Seq[Cand]]()
    override def outputEncoder: Encoder[Seq[Cand]] = ExpressionEncoder[Seq[Cand]]()
  }

  /** Typed column for `groupByKey(...).agg(topK(k))`. */
  def topK(k: Int): TypedColumn[Cand, Seq[Cand]] = {
    require(k > 0, s"k must be positive, got $k")
    new TopKAgg(k).toColumn
  }
}
