package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar operators for training-data pipelines: token
  * counting, language ID (n-gram/stopword heuristic), quality scoring,
  * and document fingerprinting. All pure Catalyst column expressions
  * (codegen'd, per-row scans — no shuffle, no UDFs), so they hold at
  * 100 TB as embarrassingly parallel map work.
  */
object TextFunctions {

  /** Raw whitespace-split fragment count (a SPLIT count, not a word
    * count: leading whitespace or an empty string contributes one empty
    * fragment — the oracle mirrors this exactly; use
    * [[repetitionSignals]]/[[graft.operators.Chunker]] tokenization
    * when phantom fragments matter). */
  def tokenCount(text: Column): Column =
    size(split(text, "\\s+")).cast("long")

  /** BPE-ish subword count: words + digits + punctuation runs, the usual
    * cheap proxy for tokenizer output size. All whitespace fragments are
    * dropped (trim-based — a bare `=!= " "` check would count tabs and
    * newlines as subwords). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[\\s\\p{Punct}])|(?=[\\s\\p{Punct}])"),
      t => trim(t) =!= "")).cast("long")

  /** The distinct blocklist patterns occurring in `text` as substrings,
    * in pattern-list order — the C4-style bad-word page gate (Raffel et
    * al. 2020 §2.2: drop any page containing a listed word or phrase;
    * production lists run to thousands of entries). One Aho-Corasick
    * automaton pass per row, built once and shipped via the plan's
    * reference array, so per-row cost is O(n_chars), independent of
    * list size — where the naive `contains() OR contains() …` chain
    * rescans the text |patterns| times. Exact substring semantics;
    * compose word boundaries by normalizing the text (collapse
    * non-letters to spaces, pad the ends) and space-padding patterns. */
  def blocklistMatches(text: Column, patterns: Seq[String]): Column =
    graft.expressions.TextKernels.multiPatternMatches(text, patterns)

  /** True when any blocklist pattern occurs in `text` — the page gate. */
  def blocklistAny(text: Column, patterns: Seq[String]): Column =
    size(blocklistMatches(text, patterns)) > 0

  /** Stopword-marker language scores. Marker sets are tiny per-language
    * function-word lists (public linguistic knowledge). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我"))

  private def markerHits(tokens: Column, markers: Seq[String]): Column =
    size(array_intersect(tokens, array(markers.map(lit): _*))) // distinct markers present

  /** Language-ID heuristic: the language whose marker set has the most
    * distinct hits in the text; zero hits → "und" (undetermined). Ties
    * resolve to the alphabetically-first tied language (deterministic:
    * languages evaluated in sorted order, strict-greater to displace) —
    * the DuckDB oracle's CASE ladder implements the same rule. */
  def langId(text: Column): Column = {
    val tokens = array_distinct(split(lower(text), "\\s+"))
    val ordered = langMarkers.toSeq.sortBy(_._1)
    val scored = ordered.map { case (lang, markers) => (lang, markerHits(tokens, markers)) }
    val best = scored.foldLeft((lit("und"), lit(0))) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    best._1
  }

  /** Quality signals: character length, token count, punctuation ratio,
    * uppercase ratio, mean token length, stopword(en) ratio. */
  def qualitySignals(text: Column): Map[String, Column] = {
    val toks = split(text, "\\s+")
    val nTok = size(toks)
    val len = length(text)
    Map(
      "n_chars_q" -> len.cast("long"),
      "n_tokens_q" -> nTok.cast("long"),
      "punct_ratio" -> (length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        greatest(len, lit(1)).cast("double")),
      "upper_ratio" -> (length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
        greatest(len, lit(1)).cast("double")),
      "mean_token_len" -> ((len - (nTok - 1)).cast("double") /
        greatest(nTok, lit(1)).cast("double")),
      "stopword_ratio" -> (size(filter(split(lower(text), "\\s+"),
        t => t.isin(langMarkers("en"): _*))).cast("double") /
        greatest(nTok, lit(1)).cast("double")))
  }

  /** Scalar quality score in [0,1]: rewards mid-length docs with low
    * punctuation density and a sane stopword rate. Deterministic double
    * arithmetic (fixed operation order). */
  def qualityScore(text: Column): Column = {
    val s = qualitySignals(text)
    val lenScore = least(s("n_tokens_q").cast("double") / lit(64.0), lit(1.0))
    val punctPenalty = least(s("punct_ratio") * lit(4.0), lit(1.0))
    val stopScore = least(s("stopword_ratio") * lit(5.0), lit(1.0))
    (lenScore * lit(0.5) + (lit(1.0) - punctPenalty) * lit(0.3) + stopScore * lit(0.2))
  }

  /** fastText-style hashed linear text classifier logit (Joulin et al.
    * 2016, arXiv:1607.01759): bag of word unigrams + bigrams, each
    * hashed into one of `dim` weight buckets, logit = bias + Σ weights.
    * The weight vector is the caller's (trained offline — the quality /
    * toxicity / domain classifiers a curation pipeline applies at scale
    * are all this shape); scoring is a pure per-row expression that
    * rides the corpus scan with no shuffle and no model join.
    *
    * Determinism: buckets come from the md5-derived [[graft.operators.Sketch.hash32]]
    * and the weight fold runs in gram order (unigrams left→right, then
    * bigrams left→right), so the double sum is bit-reproducible and
    * oracle-replayable. */
  def hashedLinearLogit(text: Column, dim: Int, weights: Seq[Double],
                        bias: Double): Column = {
    require(weights.length == dim, s"need $dim weights, got ${weights.length}")
    // one codegen kernel call per row (graft.expressions.GramBucketUtil
    // .hashedLogit) — same gram order, bucket arithmetic, and IEEE fold
    // order as the declarative filter/transform/aggregate chain this
    // replaces, which was CodegenFallback (interpreted dispatch + a
    // 32-hex-char md5 string round-trip per gram)
    graft.expressions.TextKernels.hashedLogitMd5(
      split(lower(text), "\\s+"), dim, weights, bias)
  }

  /** Document fingerprint: minimum md5 over character shingles — the
    * order-robust rolling-hash fingerprint (winnowing's min-selection
    * over a shingle window, degenerate window = whole doc). */
  def fingerprint(text: Column, shingle: Int = 8): Column =
    // bindOnce: referencing lower(text) inside the lambda would
    // re-lowercase the full text once per shingle position (O(len²))
    ColumnOps.bindOnce(lower(text)) { t =>
      array_min(transform(
        sequence(lit(1), greatest(length(t) - (shingle - 1), lit(1))),
        i => md5(t.substr(i, lit(shingle)))))
    }

  /** Gopher-style repetition signals (word-level): the within-document
    * repetition filters a corpus-curation pipeline runs alongside
    * [[qualitySignals]] (Rae et al. 2021 §A1.1 use line/paragraph and
    * top-n-gram fractions; these are their whitespace-token analogs).
    * Per-row scans only — no shuffle, embarrassingly parallel:
    *  - dup_word_frac: fraction of token positions occupied by repeats
    *    of an earlier token,
    *  - dup_3gram_frac: same over 3-gram positions,
    *  - top_bigram_frac: fraction of bigram positions covered by the
    *    single most frequent bigram (count only — no tie-break needed).
    * Degenerate docs (< n tokens) score 0.0 by definition: nothing is
    * repeated. The per-row top-bigram fold is O(tokens·distinct), fine
    * for documents; chunk pathological multi-MB docs upstream. */
  def repetitionSignals(text: Column): Map[String, Column] = {
    // empty fragments dropped: leading/trailing whitespace would
    // otherwise add a phantom "" token that inflates n_tokens and every
    // repetition fraction.
    // bindOnce everywhere a derived array is referenced inside a
    // lambda: the embedded subtree would otherwise re-evaluate per
    // element — the unbound forms here were O(n²) (n-grams re-splitting
    // the text per position) to O(n³) (top-bigram re-deriving the
    // bigram array per distinct bigram × per scan element).
    import ColumnOps.bindOnce
    val t0 = array_remove(split(lower(text), "\\s+"), "")
    val emptyArr = array().cast("array<string>")
    def bigrams(t: Column): Column =
      when(size(t) >= 2, transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
        .otherwise(emptyArr)
    def dupFrac(arr: Column): Column =
      when(size(arr) > 0,
        (size(arr) - size(array_distinct(arr))).cast("double") / size(arr).cast("double"))
        .otherwise(lit(0.0))
    Map(
      "n_tokens" -> size(t0).cast("long"),
      // no bindOnce: dupFrac has no lambda, so t0's repeated per-row
      // references stay on the codegen path where subexpression
      // elimination already collapses them
      "dup_word_frac" -> dupFrac(t0),
      "dup_3gram_frac" -> bindOnce(t0) { t =>
        dupFrac(when(size(t) >= 3, transform(sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
            element_at(t, i + 2))))
          .otherwise(emptyArr))
      },
      "top_bigram_frac" -> bindOnce(t0) { t =>
        bindOnce(bigrams(t)) { bg =>
          when(size(bg) > 0,
            array_max(transform(array_distinct(bg),
              b => size(filter(bg, x => x === b)))).cast("double")
              / size(bg).cast("double"))
            .otherwise(lit(0.0))
        }
      })
  }
}
