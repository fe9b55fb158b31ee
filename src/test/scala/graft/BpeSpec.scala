package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    // classic BPE toy corpus shape: 'low' x5, 'lower' x2, 'newest' x6,
    // 'widest' x3 — the known first merges are (e,s) then (es,t)
    val rows =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("learnMerges reproduces the textbook first merges on the toy corpus") {
    val merges = Bpe.learnMerges(Bpe.wordCounts(corpus, "text"), nMerges = 3)
    // 'es' appears in newest(6) + widest(3) = 9 — the top pair; then
    // (es,t) at 9 again but ties break after (e,s) is consumed; the
    // exact sequence is the published one: (e,s), (es,t), ...
    assert(merges.head.left == "e" && merges.head.right == "s")
    assert(merges.head.pairCount == 9L)
    assert(merges(1).left == "es" && merges(1).right == "t")
    assert(merges(1).pairCount == 9L)
  }

  test("merge application is leftmost-first non-overlapping (aaa + (a,a) = [aa][a])") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "aaa")).toDF("id", "text")
    val out = Bpe.tokenize(df, "id", "text", Seq("a" -> "a")).collect()(0)
    assert(out.getAs[Long]("n_bpe_tokens") == 2L) // aa + a
    val toks = df.select(
      Bpe.symbolsToTokens(Bpe.applyMergesToWord(lit("aaa"), Seq("a" -> "a"))))
      .collect()(0).getString(0)
    assert(toks == "aa a")
  }

  test("chained merges consume earlier fusions") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "the then other")).toDF("id", "text")
    val chain = Seq("t" -> "h", "th" -> "e")
    val toks = df.select(array_join(transform(
      split(col("text"), " "),
      w => Bpe.symbolsToTokens(Bpe.applyMergesToWord(w, chain))), " "))
      .collect()(0).getString(0)
    // the→[the]; then→[the][n]; other→[o][the][r]
    assert(toks == "the the n o the r")
  }

  test("single-char and empty words are safe; token counts conserve") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "a bb  a"), (1L, " ")).toDF("id", "text")
    val out = Bpe.tokenize(df, "id", "text", Seq("b" -> "b"))
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_bpe_tokens") == 3L) // a, [bb], a
    assert(out(1).getAs[Long]("n_bpe_tokens") == 0L)
  }

  test("tokens array agrees with tokenize's count and conserves characters") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "The theft then")).toDF("id", "text")
    val chain = Seq("t" -> "h", "th" -> "e")
    val toks = df.select(Bpe.tokens(col("text"), chain).as("ts"))
      .collect()(0).getSeq[String](0)
    // the→[the]; theft→[the][f][t]; then→[the][n]
    assert(toks == Seq("the", "the", "f", "t", "the", "n"))
    val n = Bpe.tokenize(df, "id", "text", chain)
      .collect()(0).getAs[Long]("n_bpe_tokens")
    assert(n == toks.length)
    assert(toks.mkString == "the theft then".toLowerCase.replace(" ", ""))
  }

  test("learned merges are partition-invariant") {
    val one = Bpe.learnMerges(Bpe.wordCounts(corpus.repartition(1), "text"), 3)
    val many = Bpe.learnMerges(Bpe.wordCounts(corpus.repartition(7), "text"), 3)
    assert(one == many)
  }

  test("early stop: merge count bounded by available pairs") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "ab ab ab")).toDF("id", "text")
    // after (a,b) there is no adjacent pair left with count >= 2
    val merges = Bpe.learnMerges(Bpe.wordCounts(df, "text"), nMerges = 5)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }
}
