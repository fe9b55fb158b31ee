package graft

import graft.operators.{Bq, Search}
import org.apache.spark.sql.functions._

class BqSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int, seed: Int = 11) = {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(r.nextFloat() * 4f - 2f)))
      .toDF("id", "embedding")
  }

  test("encode: kernel matches the driver-side fold bit for bit") {
    val df = vecs(100, 70) // 2 full words + a 6-bit partial word
    val rows = Bq.encode(df, "embedding")
      .select("id", "embedding", "bq_code").collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      assert(r.getSeq[Long](2) == Bq.encodeQuery(emb).toSeq,
        s"row ${r.getLong(0)}: kernel and driver fold disagree")
    }
    assert(rows.head.getSeq[Long](2).length == 3)
  }

  test("encode: sign boundary — zero packs as 1, negative as 0") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, Seq(0f, -0.5f, 0.5f, -0f))).toDF("id", "embedding")
    val code = Bq.encode(df, "embedding").select("bq_code")
      .head.getSeq[Long](0)
    // 4 dims in one partial word, MSB-first: bits (1,0,1,1) -> 0b1011
    assert(code == Seq(11L))
  }

  test("hamming: zero to self, counts flipped sign bits exactly") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, Seq(1f, 1f, 1f, 1f)),
      (1L, Seq(1f, -1f, 1f, -1f)),
      (2L, Seq(-1f, -1f, -1f, -1f))).toDF("id", "embedding")
    val q = Seq(1f, 1f, 1f, 1f)
    val r = Bq.hammingSearch(Bq.encode(df, "embedding"), "id", "bq_code", q, 3)
      .select("id", "ham")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 0L, 1L -> 2L, 2L -> 4L))
  }

  test("hamming search: deterministic (ham, id) order and length mismatch fails") {
    val df = Bq.encode(vecs(300, 64), "embedding")
    val q = Seq.fill(64)(0.5f)
    val top = Bq.hammingSearch(df, "id", "bq_code", q, 20)
      .select("ham", "id").collect()
    val pairs = top.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sorted.toSeq == pairs.toSeq, "not (ham, id) ordered")
    intercept[Exception] {
      Bq.hammingSearch(df, "id", "bq_code", Seq.fill(32)(0.5f), 5).collect()
    }
  }

  test("rerank: recall vs exact kNN beats plain hamming cut at the same k") {
    val df = vecs(500, 64)
    val q = Seq.tabulate(64)(i => (math.sin(i * 0.37) * 1.5).toFloat)
    val exact = Search.knnExact(df, "id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val enc = Bq.encode(df, "embedding")
    val ham = Bq.hammingSearch(enc, "id", "bq_code", q, 10)
      .collect().map(_.getLong(0)).toSet
    val rr = Bq.rerankSearch(enc, "id", "bq_code", "embedding", q, 10, 100)
      .collect().map(_.getLong(0)).toSet
    val hamRecall = (ham & exact).size / 10.0
    val rrRecall = (rr & exact).size / 10.0
    assert(rrRecall >= hamRecall, s"rerank $rrRecall < hamming $hamRecall")
    assert(rrRecall >= 0.6, s"rerank@100 recall $rrRecall below 0.6")
  }

  test("filtered search: non-matching rows can never appear (exclusion contract)") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(3)
    val df = (0L until 300L)
      .map(i => (i, Seq.fill(32)(r.nextFloat() * 2f - 1f), (i % 5).toInt))
      .toDF("id", "embedding", "label")
    val enc = Bq.encode(df, "embedding")
    val q = Seq.fill(32)(0.25f)
    val ham = Bq.hammingSearch(enc, "id", "bq_code", q, 20,
      filter = Some(col("label") === 2)).collect()
    assert(ham.length == 20)
    assert(ham.forall(_.getAs[Int]("label") == 2), "filter violated in screen")
    val rr = Bq.rerankSearch(enc, "id", "bq_code", "embedding", q, 10, 40,
      filter = Some(col("label") === 2)).collect()
    assert(rr.length == 10)
    assert(rr.forall(_.getAs[Int]("label") == 2), "filter violated after rerank")
  }

  test("rerank window must cover k") {
    val enc = Bq.encode(vecs(50, 8), "embedding")
    intercept[IllegalArgumentException] {
      Bq.rerankSearch(enc, "id", "bq_code", "embedding", Seq.fill(8)(0f),
        k = 10, rerank = 5)
    }
  }

  test("centered BQ: zero-threshold codes are constant on an all-positive " +
      "corpus; midpoint thresholds make the screen informative") {
    val s = spark
    import s.implicits._
    // all-positive corpus (the [0,1)-feature / count-embedding shape)
    val r = new scala.util.Random(5)
    val df = (0L until 400L).map(i => (i, Seq.fill(16)(r.nextFloat())))
      .toDF("id", "embedding")
    // zero-threshold: every code identical -> Hamming 0 everywhere
    val plain = Bq.encode(df, "embedding")
      .select("bq_code").distinct().count()
    assert(plain == 1, s"expected one constant code, got $plain distinct")
    // centered: thresholds are per-dim range midpoints (order-free)
    val th = Bq.trainThresholds(df, "embedding")
    assert(th.length == 16 && th.forall(t => t > 0.2 && t < 0.8))
    val reTh = Bq.trainThresholds(df.repartition(7), "embedding")
    assert(th.toSeq == reTh.toSeq, "thresholds depend on partitioning")
    val enc = Bq.encode(df, "embedding", thresholds = th.toSeq)
    assert(enc.select("bq_code").distinct().count() > 100,
      "centered codes should spread")
    // the centered screen finds true neighborhoods where plain cannot:
    // a screen-only (no-rerank) Hamming cut must beat the id-ascending
    // head plain BQ degenerates to
    val q = df.filter(col("id") === 7L).select("embedding")
      .head.getSeq[Float](0).toSeq
    val exact = Search.knnExact(df, "id", "embedding", q, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val centeredHits = Bq.hammingSearch(enc, "id", "bq_code", q, 40,
        thresholds = th.toSeq)
      .select("id").collect().map(_.getLong(0)).toSet.intersect(exact).size
    val plainHits = Bq.hammingSearch(Bq.encode(df, "embedding"), "id",
        "bq_code", q, 40)
      .select("id").collect().map(_.getLong(0)).toSet.intersect(exact).size
    assert(centeredHits > plainHits,
      s"centered screen ($centeredHits/10) should beat blind plain ($plainHits/10)")
    // kernel ≡ driver fold with thresholds
    val rows = enc.select("embedding", "bq_code").collect()
    rows.take(50).foreach { row =>
      assert(row.getSeq[Long](1) ==
        Bq.encodeQuery(row.getSeq[Float](0), th.toSeq).toSeq)
    }
    // ragged input fails loud in training
    val ragged = Seq((0L, Seq(1f, 2f)), (1L, Seq(1f))).toDF("id", "embedding")
    intercept[IllegalArgumentException] {
      Bq.trainThresholds(ragged, "embedding")
    }
  }

  test("scaledRerank: 3k floor at toy N, ~3·sqrt(N) above, monotone") {
    // floor: tiny corpora keep the fixed multiple
    assert(Bq.scaledRerank(10, 0L) == 30)
    assert(Bq.scaledRerank(10, 100L) == 30)
    // measured anchors: 1M -> 3000 (9/10 margin), 10M -> ~9487 >= the
    // measured 9/10 window shape
    assert(Bq.scaledRerank(10, 1000000L) == 3000)
    val w10m = Bq.scaledRerank(10, 10000000L)
    assert(w10m >= 9486 && w10m <= 9500)
    val vals = Seq(0L, 1000L, 1000000L, 100000000L).map(Bq.scaledRerank(10, _))
    assert(vals == vals.sorted)
  }
}
