package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) merge learning and subword
  * tokenization (Sennrich, Haddow & Birch, ACL 2016 — the subword-unit
  * algorithm behind GPT-2/RoBERTa-style tokenizers). The piece a
  * training-data pipeline needs from the reference's text boundary
  * (`/root/reference/src/vector_db/services/embedding_service.py:146-168`
  * tokenizes with a pretrained vocab; a 100 TB curation engine must also
  * be able to LEARN that vocab from its own corpus).
  *
  * Scale shape: the corpus is touched exactly once — a word-count
  * aggregation (map-side combined, one shuffle on `word`). Every merge
  * iteration after that runs over the VOCABULARY table (distinct words ×
  * counts), which is orders of magnitude smaller than the corpus and
  * independent of corpus row count; each iteration is one vocab-sized
  * adjacent-pair aggregation plus a single-row argmax `collect`. Only
  * the merge table itself (≤ `nMerges` rows) ever reaches the driver —
  * the classic "learn on the aggregated vocab, not the corpus" BPE
  * formulation, distributed.
  *
  * Determinism: symbol strings are stored DELIMITED — every symbol
  * wrapped as \u0002sym\u0003 — so "merge pair (l, r) everywhere" is a
  * literal left-to-right non-overlapping string replace of
  * \u0002l\u0003\u0002r\u0003 with \u0002lr\u0003. That is exactly
  * BPE's scan-from-left merge order (e.g. `aaa` + (a,a) → `[aa][a]`),
  * and exactly reproducible as SQL `replace` on any engine, which is
  * what makes the whole learned merge table oracle-checkable. Argmax
  * ties break by (count desc, left asc, right asc) — binary string
  * order on both engines.
  */
object Bpe {

  /** Symbol delimiters: C0 control chars that cannot appear in
    * whitespace-split word text read from the curation tables. */
  val SymOpen = "\u0002"
  val SymClose = "\u0003"

  /** One learned merge: `left` + `right` fused after `rank − 1` prior
    * merges, with the corpus-weighted adjacent-pair count that won the
    * argmax. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** (word, cnt) vocabulary of a text column: lowercase, whitespace
    * split. The single corpus-sized pass of the whole algorithm.
    * `minCount` is the 100 TB vocab knob: dropping hapax/rare words
    * (standard BPE practice) bounds the per-iteration table by the
    * frequent-word vocabulary instead of the raw distinct-word count —
    * rare words can't win a corpus-weighted pair argmax anyway until
    * merges are deep enough that their pairs aggregate with common
    * ones, which `minCount` ≤ the argmax floor preserves. */
  def wordCounts(df: DataFrame, textCol: String,
                 minCount: Long = 1L): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Word → delimited symbol string of single characters. */
  def initSymbols(word: Column): Column =
    array_join(
      transform(split(word, ""), c => concat(lit(SymOpen), c, lit(SymClose))), "")

  /** Delimited symbol string → symbol array (inverse of the wrapping:
    * strip the outer delimiters, split on the inner `\u0003\u0002`
    * seams). */
  def symbolArray(syms: Column): Column =
    split(regexp_replace(syms, "^\u0002|\u0003$", ""), "\u0003\u0002")

  /** Apply one merge to a delimited symbol string: literal left-to-right
    * non-overlapping replace (Spark's `replace` and SQL `replace` share
    * that contract). */
  def applyMerge(syms: Column, left: String, right: String): Column =
    replace(syms,
      lit(SymOpen + left + SymClose + SymOpen + right + SymClose),
      lit(SymOpen + left + right + SymClose))

  /** Closed-form per-row expression applying a whole merge chain to a
    * word (merges must be in learned rank order — later merges see the
    * fused symbols of earlier ones). */
  def applyMergesToWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initSymbols(word)) { case (c, (l, r)) => applyMerge(c, l, r) }

  /** Delimited symbol string → space-joined token stream. */
  def symbolsToTokens(syms: Column): Column =
    regexp_replace(regexp_replace(syms, "\u0003\u0002", " "), "^\u0002|\u0003$", "")

  /** Learn up to `nMerges` BPE merges from a (word, cnt) vocabulary.
    * Stops early when the best remaining pair's corpus count drops below
    * `minPairCount` (or no adjacent pair is left). Each iteration
    * persists the updated vocab and unpersists the previous one, so the
    * plan never grows beyond a single replace over a materialized
    * table. */
  def learnMerges(words: DataFrame, nMerges: Int,
                  minPairCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // each round's argmax action materializes the CURRENT vocab's cache,
    // so the previous round's cache is only dropped after its successor
    // is safely materialized — one job per round (the argmax), no
    // separate count() materialization pass
    var cur = words.select(initSymbols(col("word")).as("syms"), col("cnt"))
      .persist()
    var prev: DataFrame = null
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = adjacentPairCounts(cur)
        .orderBy(col("pc").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty || top(0).getAs[Long]("pc") < minPairCount) done = true
      else {
        val (l, r) = (top(0).getAs[String]("l"), top(0).getAs[String]("r"))
        out += Merge(rank, l, r, top(0).getAs[Long]("pc"))
        val next = cur
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .persist()
        prev = cur
        cur = next
        rank += 1
      }
    }
    cur.unpersist()
    if (prev != null) prev.unpersist()
    out.toSeq
  }

  /** Corpus-weighted adjacent-symbol-pair counts of a (syms, cnt)
    * vocabulary — the per-iteration aggregation. */
  private def adjacentPairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"), symbolArray(col("syms")).as("sa"))
      // single-symbol words have no adjacent pair; the guard also keeps
      // sequence() from inferring a negative step on size-1 arrays
      .filter(size(col("sa")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(0, size(sa)-2), i -> struct(sa[i] AS l, sa[i+1] AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("pc"))

  /** Learn merges end-to-end from a text column and return them as a
    * DataFrame (rank, left_sym, right_sym, pair_count) — the shape the
    * driver's oracle checks. */
  def learnMergeTable(df: DataFrame, textCol: String, nMerges: Int,
                      minPairCount: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val merges = learnMerges(wordCounts(df, textCol), nMerges, minPairCount)
    merges.map(m => (m.rank.toLong, m.left, m.right, m.pairCount))
      .toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** BPE token array of a text column under a merge chain — the
    * loader-facing column: counts feed `Chunker.packWindows`, arrays
    * feed export sinks. Pure per-row expression. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column = {
    val words = filter(split(lower(text), "\\s+"), w => w =!= lit(""))
    flatten(transform(words, w =>
      split(symbolsToTokens(applyMergesToWord(w, merges)), " ")))
  }

  /** Tokenize a text column with a fixed merge chain: per-document BPE
    * token count and an md5 digest of the space-joined token stream.
    * Pure per-row expression — at corpus scale this rides the scan with
    * no shuffle, the standard "apply the learned tokenizer" pass. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(lower(col(textCol)), "\\s+"), w => w =!= lit(""))
    val stream = array_join(
      transform(words, w => symbolsToTokens(applyMergesToWord(w, merges))), " ")
    df.select(col(idCol), stream.as("toks"))
      .select(col(idCol),
        when(col("toks") === "", lit(0L))
          .otherwise(size(split(col("toks"), " ")).cast("long")).as("n_bpe_tokens"),
        md5(col("toks")).as("tokens_md5"))
  }
}
