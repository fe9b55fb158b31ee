package graft

import graft.operators.Phrases

/** Collocation mining + phrase rewrite (Mikolov et al. 2013 §4). */
class PhrasesSpec extends SparkSpec {

  test("collocations: exact counts and δ-discounted score") {
    val s = spark
    import s.implicits._
    // "new york" ×3, "york city" ×1; unigrams: new=3, york=3, city=2
    val df = Seq(
      (1L, "new york new york is big"),
      (2L, "new york city"),
      (3L, "the city")).toDF("doc_id", "text")
    val rows = Phrases.collocations(df, "text", delta = 1L, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ny = rows(("new", "york"))
    assert(ny.getAs[Long]("pair_cnt") == 3L)
    assert(ny.getAs[Long]("cnt_a") == 3L && ny.getAs[Long]("cnt_b") == 3L)
    assert(ny.getAs[Double]("score") == (3.0 - 1.0) / (3L * 3L).toDouble)
    // "york city" count 1 < minCount: filtered
    assert(!rows.contains(("york", "city")))
  }

  test("applyPhrases: greedy non-overlap on runs, rank-order chaining") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a a a a"),   // greedy: (1,2) and (3,4) fuse
      (2L, "a a a"),     // (1,2) fuses, 3 survives
      (3L, "a b c"),     // (a,b) ranks first: b consumed before (b,c)
      (4L, "x y z")).toDF("doc_id", "text")
    val out = Phrases.applyPhrases(df, "doc_id", "text",
        Seq(("a", "a"), ("a", "b"), ("b", "c")))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_phr") == "a_a a_a")
    assert(out(0).getAs[Long]("n_merges") == 2L)
    assert(out(1).getAs[String]("text_phr") == "a_a a")
    assert(out(1).getAs[Long]("n_merges") == 1L)
    assert(out(2).getAs[String]("text_phr") == "a_b c")
    assert(out(3).getAs[String]("text_phr") == "x y z")
    assert(out(3).getAs[Long]("n_merges") == 0L)
  }

  test("topPhrases feeds applyPhrases: learned rank is deterministic") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(20)(i =>
      (i.toLong, "new york " + (if (i % 2 == 0) "hot dog" else "cold cat")))
      .toDF("doc_id", "text")
    val phr = Phrases.topPhrases(df, "text", k = 3, delta = 1L, minCount = 5L)
    // "hot dog" and "cold cat" tie at (10−1)/(10·10) = 0.09 — the
    // (score, a, b) tie-break puts cold first — and both beat
    // "new york"'s (20−1)/(20·20) = 0.0475
    assert(phr == Seq(("cold", "cat"), ("hot", "dog"), ("new", "york")))
    val out = Phrases.applyPhrases(df, "doc_id", "text", phr)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_phr") == "new_york hot_dog")
    assert(out(1).getAs[String]("text_phr") == "new_york cold_cat")
  }

  test("cooccurrence: harmonic weights, symmetry, decimal-exact sums") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val x = Phrases.cooccurrence(df, "text", window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // (a,b): pos1-2 d=1 → 1.0; pos3-? b after second a? tokens a b c a:
    // pairs within 2: (a,b,1) (a,c,1/2) (b,c,1) (b,a,1/2) (c,a,1)
    assert(x(("a", "b")) == 1.0 + 0.5) // directed a→b 1.0 plus b→a mirror 0.5
    assert(x(("b", "a")) == x(("a", "b"))) // symmetric by construction
    assert(x(("a", "c")) == 0.5 + 1.0)
    assert(x(("b", "c")) == 1.0)
    // partitioning invariance bit for bit (the decimal-routed sum)
    val many = Phrases.cooccurrence(
      df.union(df).union(df).repartition(7), "text", 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(java.lang.Double.doubleToRawLongBits(many(("a", "b"))) ==
      java.lang.Double.doubleToRawLongBits(3 * 1.5))
  }

  test("delimiter control chars in input are stripped, not corrupting") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = Phrases.applyPhrases(df, "doc_id", "text", Seq(("a", "b")))
      .collect()
    assert(out(0).getAs[String]("text_phr") == "a_b a_b")
  }
}
