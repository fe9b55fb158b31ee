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
}
