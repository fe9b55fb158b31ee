package graft.operators

import graft.expressions.FloatKernels
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword (BM25) retrieval and hybrid keyword+vector rank fusion — the
  * classic companion surface of a vector store (engine extension; the
  * reference's own search path is vector-only, `/root/reference/src/
  * vector_db/api/app.py:163-233`, so "a user switching engines" gets the
  * standard hybrid upgrade rather than a gap).
  *
  * Determinism contract (the DuckDB-oracle requirement every graft
  * operator carries): BM25 per-term statistics are exact BIGINTs (tf,
  * df, dl, N, Σdl), every double is derived from them through a fixed
  * expression tree (libm-exact ln via [[FloatKernels.ln]], explicit
  * left-to-right score fold over the query terms), and ranks are
  * integers from (score DESC, id ASC) orderings — so scores and fused
  * rankings are bit-identical across engines, not just approximately
  * equal.
  *
  * Scale shape: one pass computes corpus stats (two BIGINTs, broadcast);
  * one token explode keeps ONLY query-term hits (the `isin` filter runs
  * inside the explode stage, so non-matching tokens never reach a
  * shuffle) and aggregates per doc in a single exchange — no join
  * against the corpus, because each token row carries its doc's length.
  * Top-k is TakeOrderedAndProject; fusion windows run over the two
  * bounded top-C lists, never the corpus.
  */
object TextSearch {

  /** BM25 (Robertson–Spärck Jones idf in the +1 form Lucene uses, so idf
    * stays positive even for terms in most docs) scores for every doc
    * matching ≥ 1 query term. Output: (id, dl, score).
    *
    * Tokenization matches the engine's text operators: lowercase,
    * whitespace split, empty fragments dropped. */
  def bm25Scored(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    // tokens are lowercased and whitespace-split, so a term that isn't
    // a single lowercase token can never match — fail loudly instead of
    // silently scoring it 0 everywhere
    require(terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)
        && t == t.toLowerCase),
      s"terms must be single lowercase tokens, got $terms")
    val spark = docs.sparkSession
    val toks = docs.select(col(idCol).as("__id"),
        size(array_remove(split(lower(col(textCol)), "\\s+"), "")).cast("long").as("dl"),
        explode(split(lower(col(textCol)), "\\s+")).as("__w"))
      .filter(col("__w").isin(terms: _*))
    // per-doc tf of each term + the doc's length, one shuffle on id
    val tfAggs = min(col("dl")).as("dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("__w") === t, lit(1L)).otherwise(lit(0L))).as(s"tf$i")
      }
    val tf = toks.groupBy("__id").agg(tfAggs.head, tfAggs.tail: _*)
    // corpus stats: exact longs only (doc count, total tokens, per-term
    // docfreqs) — the df aggregate runs over the matched docs, not the
    // corpus
    val corpus = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(array_remove(split(lower(col(textCol)), "\\s+"), "")).cast("long"))
        .as("total_tokens"))
    val dfAggs = terms.indices.map { i =>
      sum(when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L))).as(s"df$i")
    }
    val dfs = tf.agg(dfAggs.head, dfAggs.tail: _*)
    val withStats = tf.crossJoin(broadcast(corpus)).crossJoin(broadcast(dfs))
    // avgdl and idf from exact longs; score = left-to-right fold over
    // terms in query order (the oracle spells the same chain)
    val nD = col("n_docs").cast("double")
    val avgdl = col("total_tokens").cast("double") / nD
    val score = terms.indices.foldLeft(lit(0.0)) { (acc, i) =>
      val tfD = col(s"tf$i").cast("double")
      val dfD = col(s"df$i").cast("double")
      val idf = FloatKernels.ln((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      acc + idf * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    withStats.select(col("__id").as(idCol), col("dl"), score.as("score"))
  }

  /** BM25 top-k: (id, score), deterministic (score DESC, id ASC) order —
    * plans as TakeOrderedAndProject, no global sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(docs, idCol, textCol, terms, k1, b)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Rank positions 1..C of an already-bounded top-C list (single
    * in-memory window — callers pass TakeOrdered output, never a
    * corpus). */
  private def ranked(top: DataFrame, idCol: String, scoreCol: String): DataFrame =
    top.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol).asc))
        .cast("long"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * two bounded top-C lists: rrf(d) = Σ_lists 1/(kRrf + rank_list(d)),
    * absent-from-list contributes 0. Inputs are (id, score) DataFrames
    * ALREADY cut to their top-C (both engines cut on bit-identical
    * scores, so the candidate sets agree). Output: (id, rrf_score,
    * rank_a, rank_b) for the fused top-k, ties broken by id. */
  def rrfFuse(topA: DataFrame, topB: DataFrame, idCol: String, k: Int,
              kRrf: Int = 60): DataFrame = {
    val ra = ranked(topA, idCol, "score").select(col(idCol), col("rank").as("rank_a"))
    val rb = ranked(topB, idCol, "score").select(col(idCol), col("rank").as("rank_b"))
    val kD = lit(kRrf.toDouble)
    ra.join(rb, Seq(idCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (kD + col("rank_a").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (kD + col("rank_b").cast("double")), lit(0.0)))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("rrf_score"), col("rank_a"), col("rank_b"))
  }
}
