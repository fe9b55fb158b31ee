package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening: flag corpus documents that share
  * word n-grams with a held-out evaluation set — the decontamination
  * pass every LLM training pipeline runs before export (n-gram overlap
  * against benchmark suites, as published in the GPT-3/PaLM/Llama
  * data-curation appendices).
  *
  * Scale shape: the benchmark side is small by construction (eval
  * suites are MBs, the corpus is TBs), so its distinct gram set is
  * broadcast and the corpus side stays a single scan + explode followed
  * by one aggregation on doc id — the corpus is never shuffled on gram
  * and never joined against itself. Shares the word-shingle kernel (and
  * therefore the DuckDB oracle gram construction) with
  * [[Dedup.ngramJaccardPairs]].
  */
object Contamination {

  /** Corpus docs sharing ≥ `minShared` distinct word `n`-grams with the
    * benchmark set, with the shared-gram count as evidence. */
  def overlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
              textCol: String, n: Int = 3, minShared: Int = 2): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(minShared > 0, s"minShared must be positive, got $minShared")
    // shingleSet is already distinct-per-doc, so count(*) after the
    // semi-style join counts distinct shared grams with no extra distinct
    val grams = corpus.select(col(idCol),
      explode(Dedup.shingleSet(col(textCol), n)).as("__gram"))
    val benchGrams = benchmark
      .select(explode(Dedup.shingleSet(col(textCol), n)).as("__gram"))
      .distinct()
    grams.join(broadcast(benchGrams), Seq("__gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The curation form: drop contaminated docs from the corpus. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, minShared: Int = 2): DataFrame =
    corpus.join(overlap(corpus, benchmark, idCol, textCol, n, minShared)
        .select(idCol),
      Seq(idCol), "left_anti")
}
