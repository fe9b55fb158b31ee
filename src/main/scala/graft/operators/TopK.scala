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

  type Term = (String, Long, Double) // (word, tf, score)

  /** (score desc, word asc) — the per-doc top-terms ordering (TF-IDF
    * and friends). Double.compare, not negation: negating 0.0 yields
    * -0.0 which compares below +0.0 and would flip SQL tie order. */
  private val termOrd: Ordering[Term] = new Ordering[Term] {
    override def compare(x: Term, y: Term): Int = {
      val c = java.lang.Double.compare(y._3, x._3)
      if (c != 0) c else x._1.compareTo(y._1)
    }
  }

  /** Bounded per-group top-k over scored TERMS — same contract as
    * [[TopKAgg]] with (score desc, word asc) ordering and a carried
    * payload column. Map-side partial aggregation trims each
    * partition's terms to k before the shuffle, so a per-doc top-terms
    * reduction never shuffles the full (doc, word) matrix the way a
    * rank window would. */
  final class TopTermsAgg(k: Int) extends Aggregator[Term, Seq[Term], Seq[Term]] {
    override def zero: Seq[Term] = Vector.empty

    override def reduce(buf: Seq[Term], c: Term): Seq[Term] =
      if (buf.length >= k && termOrd.gteq(c, buf.last)) buf
      else (buf :+ c).sorted(termOrd).take(k)

    override def merge(a: Seq[Term], b: Seq[Term]): Seq[Term] =
      (a ++ b).sorted(termOrd).take(k)

    override def finish(r: Seq[Term]): Seq[Term] = r

    override def bufferEncoder: Encoder[Seq[Term]] = ExpressionEncoder[Seq[Term]]()
    override def outputEncoder: Encoder[Seq[Term]] = ExpressionEncoder[Seq[Term]]()
  }

  /** Typed column for `groupByKey(...).agg(topTerms(k))`. */
  def topTerms(k: Int): TypedColumn[Term, Seq[Term]] = {
    require(k > 0, s"k must be positive, got $k")
    new TopTermsAgg(k).toColumn
  }
}
