package graft

import graft.operators.{Classifier, Dsir}
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  // target docs speak "science theorem proof", background speaks
  // "celebrity gossip scandal"; held-out candidates mix both
  private def corpus = {
    val s = spark
    import s.implicits._
    val target = Seq("science theorem proof lemma", "theorem proof science result",
      "proof lemma theorem science")
    val back = Seq("celebrity gossip scandal rumor", "gossip scandal celebrity photo",
      "scandal rumor gossip celebrity", "celebrity photo rumor gossip")
    (target.map((_, true)) ++ back.map((_, false))).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("id", "text", "is_t")
  }

  test("log-weights rank target-like documents above background-like ones") {
    val df = corpus
    val m = Dsir.learn(df, "text", col("is_t"), dim = 64)
    val s = spark
    import s.implicits._
    val cands = Seq(
      (100L, "science proof theorem insight"), // target-like
      (101L, "gossip celebrity scandal story") // background-like
    ).toDF("id", "text")
    val scored = cands.select(col("id"),
      Dsir.logWeight(col("text"), m).as("w")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(100L) > scored(101L),
      s"target-like doc should outweigh background-like: $scored")
    assert(scored(100L) > 0 && scored(101L) < 0,
      s"signs should separate the domains: $scored")
  }

  test("learning is deterministic and partition-invariant") {
    val a = Dsir.learn(corpus.repartition(1), "text", col("is_t"), dim = 32)
    val b = Dsir.learn(corpus.repartition(7), "text", col("is_t"), dim = 32)
    assert(java.util.Arrays.equals(a.lambda, b.lambda))
    assert(a.targetGrams == b.targetGrams && a.rawGrams == b.rawGrams)
  }

  test("gram totals count unigrams + bigrams of target vs all rows") {
    val m = Dsir.learn(corpus, "text", col("is_t"), dim = 64)
    // 7 docs x 4 tokens = 28 unigrams + 7 x 3 bigrams = 21 → 49 raw
    assert(m.rawGrams == 49L, s"raw grams: ${m.rawGrams}")
    // 3 target docs x (4 + 3) = 21
    assert(m.targetGrams == 21L, s"target grams: ${m.targetGrams}")
  }

  test("unseen-bucket lambda equals the smoothing constant") {
    val m = Dsir.learn(corpus, "text", col("is_t"), dim = 4096)
    // a bucket no gram hashed into: λ = ln(totR+dim) − ln(totT+dim)
    val expected = (java.lang.Math.log(1.0) -
      java.lang.Math.log(m.targetGrams + 4096.0)) -
      (java.lang.Math.log(1.0) - java.lang.Math.log(m.rawGrams + 4096.0))
    val used = corpus.select(explode(
        Classifier.gramBuckets(col("text"), 4096)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val unseen = (0 until 4096).find(b => !used.contains(b)).get
    assert(m.lambda(unseen) == expected)
  }

  test("resample keeps k rows, deterministically, weighted toward the target") {
    val df = corpus
    val m = Dsir.learn(df, "text", col("is_t"), dim = 64)
    val scored = df.select(col("id"), col("is_t"),
      Dsir.logWeight(col("text"), m).as("w"))
    val a = Dsir.resample(scored, "id", col("w"), k = 3, salt = "x")
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = Dsir.resample(scored.repartition(5), "id", col("w"), k = 3, salt = "x")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b, s"resample must be deterministic: $a vs $b")
    assert(a.size == 3)
    // target docs carry far larger weights; with only 3 target docs and
    // λ gaps of several nats, the 3 selected must all be target docs
    val targetIds = df.filter(col("is_t")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a.toSet.subsetOf(targetIds),
      s"expected target docs selected, got $a (targets $targetIds)")
  }

  test("scoring plan is a shuffle-free per-row scan") {
    val s = spark
    import s.implicits._
    val df = (0L until 20L).map(i => (i, "alpha beta gamma")).toDF("id", "text")
    val m = Dsir.Model(Array.fill(32)(0.1), 32, 1L, 1L)
    val plan = df.select(Dsir.logWeight(col("text"), m))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"unexpected shuffle in DSIR scoring plan:\n$plan")
  }
}
