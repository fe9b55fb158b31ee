package graft

import graft.operators.{Ivf, IvfPq, Pq, Search}
import org.apache.spark.sql.functions._

/** IVF-PQ composite contracts: residual arithmetic, encode shape and
  * partition invariance, exhaustive-probe ADC agreement with a driver
  * reimplementation, and recall under the reference's IVF-style gate. */
class IvfPqSpec extends SparkSpec {

  private def built(n: Int = 80, dim: Int = 16) = {
    val df = toDF(corpus(n, dim))
    val (encoded, model) = IvfPq.build(df, "embedding", kClusters = 4,
      chunks = 4, kCodes = 4)
    (df, encoded, model)
  }

  test("residual = x − centroid[cluster], float-exact; encode shape sane") {
    val (_, encoded, model) = built()
    val rows = Ivf.assign(toDF(corpus(80, 16)), model.ivf)
      .withColumn("r", IvfPq.residualColumn(col("embedding"),
        col(Ivf.ClusterCol), model.ivf.centroids))
      .collect()
    rows.foreach { row =>
      val emb = row.getSeq[Float](1)
      val c = model.ivf.centroids(row.getAs[Int](Ivf.ClusterCol))
      val r = row.getSeq[Float](3)
      assert(r.indices.forall(i => r(i) == emb(i) - c(i)))
    }
    val codes = encoded.select("pq_code").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
  }

  test("encode is partition-invariant") {
    val df = toDF(corpus(60, 16))
    val (_, model) = IvfPq.build(df, "embedding", 4, 4, 4)
    def snap(d: org.apache.spark.sql.DataFrame) =
      IvfPq.encode(d, "embedding", model).select("id", Ivf.ClusterCol, "pq_code")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    assert(snap(df.coalesce(1)) == snap(df.repartition(7)))
  }

  test("exhaustive probe matches a driver-side ADC reimplementation") {
    val (df, encoded, model) = built()
    val q = df.filter(col("id") === 3L).head.getSeq[Float](1)
    val got = IvfPq.search(encoded, model, "id", q, nProbe = 4, topK = 10)
      .select("id", "dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // reference: same table arithmetic, straight scala
    val enc = encoded.select("id", Ivf.ClusterCol, "pq_code").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    val expect = enc.map { case (id, cid, code) =>
      val qr = q.indices.map(i =>
        (q(i).toDouble - model.ivf.centroids(cid)(i).toDouble).toFloat)
      val d = math.sqrt(code.zipWithIndex.map { case (j, c) =>
        val sub = model.pq.centroids(c)(j)
        val off = c * model.pq.subDim
        sub.indices.map { dd =>
          val t = sub(dd).toDouble - qr(off + dd).toDouble; t * t
        }.sum
      }.sum)
      (id, d)
    }.sortBy(x => (x._2, x._1)).take(10)
    assert(got.toSeq == expect.toSeq)
  }

  test("self is found and rerank recall clears the IVF gate at exhaustive probe") {
    val (df, encoded, model) = built(n = 100)
    val ids = Seq(1L, 11L, 21L, 31L, 41L, 51L, 61L, 71L, 81L, 91L)
    val hits = ids.count { qid =>
      val q = df.filter(col("id") === qid).head.getSeq[Float](1)
      val approx = IvfPq.search(encoded, model, "id", q, nProbe = 4, topK = 5,
          rerank = 25)
        .select("id").collect().map(_.getLong(0)).toSet
      val exact = Search.knnExact(df, "id", "embedding", q, 5)
        .select("id").collect().map(_.getLong(0)).toSet
      approx.contains(qid) && (approx & exact).size >= 3 // recall ≥ 0.6
    }
    assert(hits >= 7, s"only $hits/10 queries cleared the recall gate")
  }

  test("hierarchical coarse level: encode two-level, save/load round-trip, search green") {
    val data = corpus(300, 16, seed = 9L)
    val df = toDF(data).cache()
    val (encoded, model) = IvfPq.build(df, "embedding", kClusters = 16,
      chunks = 4, kCodes = 4, hierarchical = Some(true))
    assert(model.hier.nonEmpty, "explicit hierarchical build carries the hier model")
    assert(model.ivf.k == model.hier.get.k)
    // assignment through the composite equals the hier kernel directly
    val viaHier = graft.operators.Ivf.assignHier(df, model.hier.get)
      .select("id", graft.operators.Ivf.ClusterCol).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    encoded.select("id", graft.operators.Ivf.ClusterCol).collect().foreach { r =>
      assert(r.getInt(1) == viaHier(r.getLong(0)))
    }
    // exhaustive probe + rerank finds self
    val got = IvfPq.search(encoded, model, "id", data(11)._2.toSeq,
      nProbe = model.ivf.k, topK = 5, rerank = 50)
    assert(got.collect().head.getAs[Long]("id") == 11L)
    // save/load preserves the hierarchy (encode-after-load = encode-before)
    val dir = java.nio.file.Files.createTempDirectory("ivfpqhier").toString
    IvfPq.save(model, dir)
    val back = IvfPq.load(spark, dir, "embedding")
    assert(back.hier.nonEmpty, "load must rehydrate the hier model")
    val enc2 = IvfPq.encode(df, "embedding", back)
      .select("id", graft.operators.Ivf.ClusterCol).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(enc2 == viaHier)
  }
}
