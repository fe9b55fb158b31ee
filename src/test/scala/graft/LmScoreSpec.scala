package graft

import graft.operators.LmScore

class LmScoreSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the rug"),
      (2L, "the dog sat on the mat"),
      (3L, "zx qv zx qv zx"),   // alien tail: bigrams rare vs the rest
      (4L, "single"),           // no bigrams
      (5L, ""))                 // no tokens at all
      .toDF("doc_id", "text")
  }

  test("counts: bigrams in-order, unigrams are occurrence counts") {
    val bg = LmScore.bigramCounts(corpus, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg(("the", "cat")) == 2L)   // docs 0, 1
    assert(bg(("sat", "on")) == 3L)    // docs 0, 1, 2
    assert(bg(("zx", "qv")) == 2L)     // within-doc repetition counts twice
    assert(!bg.contains(("mat", "the"))) // bigrams don't cross documents
    val ug = LmScore.unigramCounts(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ug("the") == 6L)
    assert(ug("zx") == 3L)
    assert(LmScore.bigramCounts(corpus, "doc_id", "text", minCount = 3L)
      .count() == 2L) // only (sat, on) and (on, the) survive pruning
  }

  test("selfScore: common phrasing scores lower than alien text; edge docs null") {
    val r = LmScore.selfScore(corpus, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), Option(x.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(r.size == 6)
    assert(r(0L)._1 == 5L && r(3L)._1 == 4L)
    // every scored doc: mean neg-logprob is positive (probs < 1)
    assert(Seq(0L, 1L, 2L, 3L).forall(id => r(id)._2.exists(_ > 0)))
    // doc 3's bigrams are rarer and its unigrams less predictive
    assert(r(3L)._2.get > r(0L)._2.get)
    // < 2 tokens → n_bigrams 0, null score
    assert(r(4L) == ((0L, None)) && r(5L) == ((0L, None)))
  }

  test("score is partitioning-invariant (sequential in-order fold)") {
    val one = LmScore.selfScore(corpus.coalesce(1), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.get(2)).toMap
    val many = LmScore.selfScore(corpus.repartition(7), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.get(2)).toMap
    assert(one == many) // bit-exact double equality across partitionings
  }

  test("pruned model scores pruned bigrams as unseen, not as an error") {
    val full = LmScore.selfScore(corpus, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    val pruned = LmScore.selfScore(corpus, "doc_id", "text", minCount = 3L)
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    // doc 3 loses all its model bigrams under pruning → score strictly worse
    assert(pruned(3L).get.asInstanceOf[Double] > full(3L).get.asInstanceOf[Double])
  }

  test("stupid backoff: tier arithmetic exact on a hand corpus") {
    val s = spark
    import s.implicits._
    // trigrams of "a b c a b c": abc, bca, cab, abc — only abc survives
    // the minCount=2 prune; bca/cab back off to the bigram tier
    val df = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val out = LmScore.backoffSelfScore(df, "doc_id", "text",
      trigramMinCount = 2L).collect()
    val r = out(0)
    assert(r.getAs[Long]("n_trigrams") == 4L)
    // tier1: 2/C2(ab)=2 → 1.0 (×2); tier2: 0.4·C2(ca)/C1(c)=0.4·1/2,
    // 0.4·C2(ab)/C1(a)=0.4·2/2
    val expected = math.log(1.0) + math.log(0.4 * (1.0 / 2.0)) +
      math.log(0.4 * (2.0 / 2.0)) + math.log(1.0)
    assert(math.abs(r.getAs[Double]("sum_logscore") - expected) < 1e-12)
  }

  test("stupid backoff: terminal tier fires for unseen tokens, stays finite") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val test_ = Seq((9L, "x y z"), (10L, "a b")).toDF("doc_id", "text")
    val out = LmScore.backoffScore(test_, "doc_id", "text",
        LmScore.trigramCounts(train, "doc_id", "text"),
        LmScore.bigramCounts(train, "doc_id", "text"),
        LmScore.unigramCounts(train, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // xyz: trigram and bigram unseen → α²·(0+1)/(N=6+V=3)
    val lp = math.log(0.4 * 0.4 * (1.0 / 9.0))
    assert(math.abs(out(9L).getAs[Double]("sum_logscore") - lp) < 1e-12)
    // < 3 tokens: null score contract
    assert(out(10L).getAs[Long]("n_trigrams") == 0L)
    assert(out(10L).isNullAt(out(10L).fieldIndex("lm_backoff")))
  }

  private def bucketCorpus = {
    val s = spark
    import s.implicits._
    // two languages with deliberately different phrasing mixes, plus the
    // edge docs: no bigrams (12), empty (13), null lang (14), and a
    // language whose every doc is unscorable (15)
    Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "the cat sat on the rug", "en"),
      (2L, "the dog sat on the mat", "en"),
      (3L, "zx qv zx qv zx", "en"),
      (4L, "the cat ate the mat", "en"),
      (5L, "dog cat rug mat zzz", "en"),
      (6L, "le chat dort ici", "fr"),
      (7L, "le chat dort la bas", "fr"),
      (8L, "le chien dort ici", "fr"),
      (9L, "un mot rare ici", "fr"),
      (10L, "le chat mange ici", "fr"),
      (11L, "chien chat rare bas qq", "fr"),
      (12L, "single", "en"),
      (13L, "", "en"),
      (14L, "the cat sat on the mat", null),
      (15L, "alone", "xx"))
      .toDF("doc_id", "text", "lang")
  }

  test("perplexityBuckets: labels match per-language exact tercile ranks") {
    val out = LmScore.perplexityBuckets(bucketCorpus, "doc_id", "text", "lang")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[String]("ppl_bucket")).toMap
    assert(out.size == 16)
    // independent expectation: score the corpus, then per lang sort the
    // non-null scores and cut at rank max(1, ceil(p*n))
    val scored = LmScore.selfScore(bucketCorpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    val langOf = bucketCorpus.collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    val expected = langOf.map { case (id, lg) =>
      val want = (lg, scored(id)) match {
        case (None, _) | (_, None) => "unscored"
        case (Some(l), Some(sc)) =>
          val ss = langOf.collect {
            case (i, Some(`l`)) if scored(i).isDefined => scored(i).get
          }.toSeq.sorted
          if (ss.isEmpty) "unscored"
          else {
            def cut(p: Double) =
              ss(math.max(1L, math.ceil(p * ss.size).toLong).toInt - 1)
            if (sc <= cut(1.0 / 3)) "head"
            else if (sc <= cut(2.0 / 3)) "middle"
            else "tail"
          }
      }
      id -> want
    }
    assert(out == expected)
    // the cut is per-language: both languages produce all three buckets
    for (l <- Seq("en", "fr")) {
      val bs = langOf.collect { case (id, Some(`l`)) => out(id) }.toSet
      assert(Set("head", "middle", "tail").subsetOf(bs), s"$l got $bs")
    }
    // edge contracts
    assert(out(12L) == "unscored" && out(13L) == "unscored")
    assert(out(14L) == "unscored") // null lang
    assert(out(15L) == "unscored") // lang with zero scored docs
  }

  test("perplexityBuckets is partitioning-invariant") {
    val one = LmScore.perplexityBuckets(
        bucketCorpus.coalesce(1), "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("ppl_bucket")).toMap
    val many = LmScore.perplexityBuckets(
        bucketCorpus.repartition(7), "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("ppl_bucket")).toMap
    assert(one == many)
  }
}
