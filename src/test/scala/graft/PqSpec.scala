package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

/** PQ contracts from the reference's tests: validation (test_pq.py:20-58),
  * hand-built nearest-centroid encode (test_pq.py:92-116), code
  * shape/range (test_pq.py:154-176). */
class PqSpec extends SparkSpec {

  test("validation: dim must divide by chunks; canonical params pass") {
    assert(Pq.validate(768, 8) == 96) // canonical test params (test_pq.py:13-18)
    intercept[IllegalArgumentException](Pq.validate(10, 3))
    intercept[IllegalArgumentException](Pq.validate(0, 2))
  }

  test("encode with hand-built centroids picks the nearest per chunk") {
    // dim=4, chunks=2, subdim=2; chunk centroids placed so the expected
    // nearest indices are known (mirrors test_pq.py:92-116).
    val cb = Pq.Codebook(Array(
      Array(Array(0f, 0f), Array(1f, 1f), Array(5f, 5f)),   // chunk 0
      Array(Array(10f, 10f), Array(0f, 1f), Array(2f, 2f)))) // chunk 1
    val df = toDF(Seq(
      (0L, Array(0.9f, 1.1f, 0.1f, 0.9f)), // → chunk0 idx 1, chunk1 idx 1
      (1L, Array(4.8f, 5.2f, 9.5f, 10.5f)))) // → chunk0 idx 2, chunk1 idx 0
    val codes = Pq.encode(df, "embedding", cb).orderBy("id")
      .select("pq_code").collect().map(_.getSeq[Int](0).toSeq)
    assert(codes(0) == Seq(1, 1))
    assert(codes(1) == Seq(2, 0))
  }

  test("trained codes have shape (n, chunks) and values in [0, k)") {
    val data = corpus(60, 16)
    val df = toDF(data)
    val cb = Pq.train(df, "embedding", dim = 16, chunks = 4, k = 3)
    assert(cb.chunks == 4 && cb.k == 3 && cb.subDim == 4)
    val codes = Pq.encode(df, "embedding", cb).select("pq_code")
      .collect().map(_.getSeq[Int](0))
    assert(codes.length == 60)
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 3)))
  }

  test("ADC search: close vectors rank near the top") {
    // base, base+0.1, base+10 structure (test_pq.py:154-176): ADC must
    // rank the near-duplicate above the far vector.
    val base = Array.fill(16)(0.5f)
    val near = base.map(_ + 0.1f)
    val far = base.map(_ + 10f)
    val df = toDF(Seq((0L, base), (1L, near), (2L, far)))
    val cb = Pq.train(df, "embedding", 16, chunks = 4, k = 3)
    val res = Pq.adcSearch(Pq.encode(df, "embedding", cb), "id", "pq_code",
      cb, base.toSeq, k = 3).select("id").collect().map(_.getLong(0))
    assert(res.take(2).toSet == Set(0L, 1L))
    assert(res.last == 2L)
  }

  test("codebook parquet round-trip is lossless (B11)") {
    val df = toDF(corpus(60, 16, seed = 3L))
    val cb = Pq.train(df, "embedding", 16, chunks = 4, k = 5)
    val path = java.nio.file.Files.createTempDirectory("pq").toString + "/cb"
    Pq.save(cb, path)
    val back = Pq.load(spark, path)
    assert(back.chunks == cb.chunks && back.k == cb.k && back.subDim == cb.subDim)
    for (c <- 0 until cb.chunks; i <- 0 until cb.k)
      assert(java.util.Arrays.equals(back.centroids(c)(i), cb.centroids(c)(i)))
  }

  test("ADC rejects mismatched query dimension") {
    val cb = Pq.Codebook(Array(Array(Array(0f, 0f))))
    intercept[IllegalArgumentException](
      Pq.adcDistanceColumn(col("pq_code"), cb, Seq(1f, 2f, 3f)))
  }

  test("ADC rerank: exact top-k within the shortlist, recall >= pure ADC, " +
      "window guard") {
    val data = corpus(300, 16, seed = 9L)
    val df = toDF(data)
    val cb = Pq.train(df, "embedding", 16, chunks = 4, k = 4)
    val enc = Pq.encode(df, "embedding", cb)
    val q = data(5)._2.toSeq
    val exact = graft.operators.Search.knnExact(df, "id", "embedding", q, 10)
      .select("id").collect().map(_.getLong(0))
    val rer = Pq.adcRerankSearch(enc, "id", "pq_code", "embedding", cb, q,
      k = 10, rerank = 60)
    val rerIds = rer.select("id").collect().map(_.getLong(0))
    val adcIds = Pq.adcSearch(enc, "id", "pq_code", cb, q, 10)
      .select("id").collect().map(_.getLong(0))
    // self-match survives the coarse screen and reranks to the top with
    // exact distance 0
    assert(rerIds.head == 5L)
    assert(rer.select("dist").head.getDouble(0) < 1e-6)
    // rerank can only improve on pure ADC at the same k
    assert(rerIds.toSet.intersect(exact.toSet).size >=
      adcIds.toSet.intersect(exact.toSet).size)
    // output ranking is exact within the survivors: distances ascend
    val dists = rer.select("dist").collect().map(_.getDouble(0))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    intercept[IllegalArgumentException] {
      Pq.adcRerankSearch(enc, "id", "pq_code", "embedding", cb, q,
        k = 10, rerank = 5)
    }
  }

  test("scaledRerank: 3k floor at toy N, sqrt(N) above, monotone") {
    assert(Pq.scaledRerank(10, 0L) == 30)
    assert(Pq.scaledRerank(10, 500L) == 30)
    // measured anchors: sqrt(N) windows score 10/10 at both tiers
    assert(Pq.scaledRerank(10, 1000000L) == 1000)
    assert(Pq.scaledRerank(10, 10000000L) == 3163) // ceil(sqrt(1e7))
    val vals = Seq(0L, 1000L, 1000000L, 100000000L).map(Pq.scaledRerank(10, _))
    assert(vals == vals.sorted)
  }
}
