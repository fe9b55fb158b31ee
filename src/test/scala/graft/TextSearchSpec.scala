package graft

import graft.operators.TextSearch
import org.apache.spark.sql.functions._

class TextSearchSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "spark engine spark spark"),          // tf(spark)=3, dl=4
      (1L, "spark engine runs fast"),            // tf(spark)=1, dl=4
      (2L, "a very long document about engines " +
        "with many words and one spark mention here"), // tf=1, long dl
      (3L, "nothing relevant at all"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
  }

  test("bm25: tf monotonicity and length normalization") {
    val scored = TextSearch.bm25Scored(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // docs without the term (or null text) never appear
    assert(scored.keySet == Set(0L, 1L, 2L))
    // higher tf at equal length wins; shorter doc at equal tf wins
    assert(scored(0L) > scored(1L), s"tf=3 should outscore tf=1: $scored")
    assert(scored(1L) > scored(2L), s"short doc should outscore long at equal tf: $scored")
    assert(scored.values.forall(_ > 0))
  }

  test("bm25: hand-computed score for a one-term corpus") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "x y"), (2L, "x x")).toDF("doc_id", "text")
    val r = TextSearch.bm25Scored(tiny, "doc_id", "text", Seq("x"), k1 = 1.2, b = 0.75)
      .collect().map(row => row.getAs[Long]("doc_id") -> row.getAs[Double]("score")).toMap
    // N=2, df=2, avgdl=2, dl=2 → idf = ln((2-2+0.5)/(2+0.5)+1) = ln(1.2)
    val idf = math.log((2.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def bm(tf: Double) = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * 2.0 / 2.0))
    assert(math.abs(r(1L) - bm(1.0)) < 1e-12)
    assert(math.abs(r(2L) - bm(2.0)) < 1e-12)
  }

  test("bm25 rejects terms that could never match the token stream") {
    intercept[IllegalArgumentException] {
      TextSearch.bm25Scored(docs, "doc_id", "text", Seq("Spark"))
    }
    intercept[IllegalArgumentException] {
      TextSearch.bm25Scored(docs, "doc_id", "text", Seq("two words"))
    }
    intercept[IllegalArgumentException] {
      TextSearch.bm25Scored(docs, "doc_id", "text", Seq("a", "a"))
    }
  }

  test("bm25 top-k: deterministic (score desc, id asc) cut") {
    val top = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("spark", "engine"), 2)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(top.length == 2)
    assert(top.head == 0L, s"doc 0 dominates both terms: ${top.toSeq}")
  }

  test("rrf fusion: both-list docs outrank single-list docs at equal ranks") {
    val s = spark
    import s.implicits._
    val listA = Seq((10L, 5.0), (11L, 4.0), (12L, 3.0)).toDF("doc_id", "score")
    val listB = Seq((10L, 0.9), (13L, 0.8), (11L, 0.7)).toDF("doc_id", "score")
    val fused = TextSearch.rrfFuse(listA, listB, "doc_id", 10, kRrf = 60)
      .collect()
    val byId = fused.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("rrf_score")).toMap
    // 10 is rank 1 in both lists → strictly the best
    assert(fused.head.getAs[Long]("doc_id") == 10L)
    assert(byId(10L) == 1.0 / 61 + 1.0 / 61)
    // 11 (ranks 2+3) beats 12 and 13 (one list each)
    assert(byId(11L) > byId(12L) && byId(11L) > byId(13L))
    // absent-list rank is null, not zero
    val r12 = fused.find(_.getAs[Long]("doc_id") == 12L).get
    assert(r12.isNullAt(r12.fieldIndex("rank_b")))
  }

  test("rrf fusion: ties broken by id, k bounds the output") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 1.0), (2L, 1.0)).toDF("doc_id", "score")
    val b = Seq((2L, 1.0), (1L, 1.0)).toDF("doc_id", "score")
    // equal scores → rank by id asc in both lists → 1 beats 2
    val fused = TextSearch.rrfFuse(a, b, "doc_id", 1)
    val rows = fused.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("doc_id") == 1L)
  }

  test("bm25 plan: top-k is TakeOrdered, no corpus-wide window") {
    val plan = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("spark"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered plan:\n$plan")
  }
}
