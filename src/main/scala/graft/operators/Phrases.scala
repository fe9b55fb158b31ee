package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation (phrase) mining — the word2vec phrase-learning pass
  * (Mikolov et al. 2013, NeurIPS "Distributed Representations of Words
  * and Phrases", §4): score(a, b) = (C(ab) − δ) / (C(a) · C(b)), with δ
  * discounting rare pairs, then the corpus is rewritten joining each
  * learned phrase's occurrences with '_' so downstream
  * embedding/tokenization treats "new_york" as one unit. The reference
  * engine embeds whatever text it is handed
  * (`/root/reference/src/vector_db/services/embedding_service.py`); a
  * training-data pipeline produces that text, and phrase joining is the
  * standard pre-embedding rewrite.
  *
  * Determinism: all counts are exact BIGINTs; the score is ONE IEEE
  * division of two exactly-representable integers (pair and product
  * counts ≪ 2⁵³), so ranking and the rewrite replay bit-for-bit in the
  * oracle. The rewrite itself is the [[Bpe]] delimited-symbol replace
  * chain with whole WORDS as symbols: tokens wrap as ␂tok␃, each phrase
  * (in learned rank order) is one literal non-overlapping
  * left-to-right `replace` — later phrases see earlier fusions, exactly
  * reproducible as SQL `replace`. Like word2vec, one pass learns
  * bigram phrases; run learn+apply again for trigrams.
  *
  * Scale shape: one token-keyed and one pair-keyed counting shuffle
  * (both map-side combinable); the unigram side of the score join is
  * vocabulary-sized (AQE broadcasts it when small, degrades to a
  * shuffle join on degenerate corpora — no forced hint). The learned
  * phrase table is top-k bounded (driver state ≤ k pairs); the rewrite
  * rides the scan as a per-row expression chain.
  */
object Phrases {

  /** ␂/␃ delimiters are stripped from text before tokenization (the
    * [[Bpe]] scraped-corpus discipline — a token containing them would
    * corrupt the replace-chain symbol boundaries). */
  private def cleanTokens(textCol: Column): Column =
    array_remove(
      split(regexp_replace(lower(textCol), "[\u0002\u0003]", ""), "\\s+"), "")

  /** Scored bigram table: (a, b, pair_cnt, cnt_a, cnt_b, score) for
    * adjacent-token pairs with pair_cnt ≥ `minCount`. */
  def collocations(df: DataFrame, textCol: String,
                   delta: Long, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = df.select(cleanTokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val bi = toks.select(explode(
        when(size(col("t")) >= 2,
          transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("a"),
              element_at(col("t"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minCount)
    bi.join(uni.select(col("w").as("a"), col("cnt").as("cnt_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("cnt").as("cnt_b")), Seq("b"))
      .select(col("a"), col("b"), col("pair_cnt"), col("cnt_a"), col("cnt_b"),
        ((col("pair_cnt") - lit(delta)).cast("double") /
          (col("cnt_a") * col("cnt_b")).cast("double")).as("score"))
  }

  /** The k highest-scoring phrases in deterministic (score desc, a, b)
    * order — the bounded learned artifact the rewrite applies. */
  def topPhrases(df: DataFrame, textCol: String, k: Int,
                 delta: Long, minCount: Long): Seq[(String, String)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    collocations(df, textCol, delta, minCount)
      .orderBy(col("score").desc, col("a").asc, col("b").asc)
      .limit(k).select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** GloVe-style windowed co-occurrence counts (Pennington et al. 2014,
    * EMNLP "GloVe" §3): X(a, b) = Σ over occurrences of context word b
    * within `window` positions of center word a, weighted 1/distance —
    * the sparse matrix the embedding objective trains on. Symmetric:
    * each position pair contributes to BOTH directed entries.
    *
    * Determinism: each weight is the exact IEEE division 1/d, but the
    * per-pair SUM of such doubles is order-dependent — so the sum
    * routes through DECIMAL(38,18) (the [[Pca]] discipline): exact,
    * order-independent, bit-identical under any partitioning, and
    * replayable by the oracle's VARCHAR-routed decimal casts.
    *
    * Scale shape: the explode is `window` rows per token (linear); ONE
    * pair-keyed map-side-combinable aggregation shuffle; the output is
    * vocabulary², which for real corpora is the bounded model artifact
    * (prune with `minX` downstream). */
  def cooccurrence(df: DataFrame, textCol: String,
                   window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    import org.apache.spark.sql.types.DecimalType
    val toks = df.select(cleanTokens(col(textCol)).as("t"))
    // Spark's sequence(1, stop) DESCENDS when stop < 1 — guard short docs
    toks.select(explode(flatten(
        when(size(col("t")) >= 2, transform(sequence(lit(1), size(col("t")) - 1),
          i => transform(
            sequence(lit(1), least(lit(window), size(col("t")) - i)),
            d => struct(element_at(col("t"), i).as("a"),
              element_at(col("t"), i + d).as("b"),
              (lit(1.0d) / d.cast("double")).as("w")))))
          .otherwise(array().cast(
            "array<array<struct<a:string,b:string,w:double>>>")))).as("p"))
      .select(explode(array(
        struct(col("p.a").as("a"), col("p.b").as("b"), col("p.w").as("w")),
        struct(col("p.b").as("a"), col("p.a").as("b"), col("p.w").as("w"))))
        .as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(sum(col("e.w").cast(DecimalType(38, 18))).cast("double").as("x"))
  }

  /** Positive PMI over the windowed co-occurrence matrix (Levy &
    * Goldberg 2014, NeurIPS "Neural Word Embedding as Implicit Matrix
    * Factorization" — the count-based embedding SGNS implicitly
    * factorizes): ppmi(a, b) = max(0, ln(X_ab·N / (X_a·X_b))).
    * Marginals and the total are the same decimal-routed exact sums as
    * [[cooccurrence]]; the score is then single IEEE multiply/divide
    * steps into the libm-exact ln, clamped at 0 — bit-identical under
    * any partitioning, replayable in SQL.
    *
    * The pair table persists (MEMORY_AND_DISK) so the corpus-sized
    * explode+aggregation runs once and the marginals/total read the
    * vocabulary²-bounded result. */
  def cooccurrencePpmi(df: DataFrame, textCol: String,
                       window: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // the pair table is vocabulary²-bounded — persisting it means the
    // corpus-sized explode+aggregation runs ONCE, not once per marginal
    val x = cooccurrence(df, textCol, window)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def decSum(c: Column) = sum(c.cast(DecimalType(38, 18))).cast("double")
    val xa = x.groupBy("a").agg(decSum(col("x")).as("xa"))
    val n = x.agg(decSum(col("x")).as("n"))
    x.join(xa, Seq("a"))
      .join(xa.select(col("a").as("b"), col("xa").as("xb")), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("x"),
        greatest(lit(0.0d), graft.expressions.FloatKernels.ln(
          (col("x") * col("n")) / (col("xa") * col("xb")))).as("ppmi"))
  }

  /** Corpus rewrite: each phrase (in rank order) joins its adjacent
    * occurrences with '_' via the delimited replace chain. Output:
    * idCol, text_phr (space-joined rewritten tokens), n_tokens
    * (pre-rewrite), n_merges (tokens fused away). */
  def applyPhrases(df: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[(String, String)]): DataFrame = {
    val toks = cleanTokens(col(textCol))
    graft.functions.ColumnOps.bindOnce(toks) { t =>
      val delim = concat_ws("",
        transform(t, x => concat(lit("\u0002"), x, lit("\u0003"))))
      val merged = phrases.foldLeft(delim) { case (c, (a, b)) =>
        replace(c, lit("\u0002" + a + "\u0003\u0002" + b + "\u0003"),
          lit("\u0002" + a + "_" + b + "\u0003"))
      }
      val textPhr = regexp_replace(
        regexp_replace(merged, "\u0003\u0002", " "), "^\u0002|\u0003$", "")
      graft.functions.ColumnOps.bindOnce(textPhr) { tp =>
        val nAfter = when(tp === "", lit(0)).otherwise(size(split(tp, " ")))
        struct(tp.as("text_phr"), size(t).cast("long").as("n_tokens"),
          (size(t) - nAfter).cast("long").as("n_merges"))
      }
    } match { case packed =>
      df.select(col(idCol), packed.as("r"))
        .select(col(idCol), col("r.text_phr").as("text_phr"),
          col("r.n_tokens").as("n_tokens"), col("r.n_merges").as("n_merges"))
    }
  }
}
