package graft

import graft.operators.{Lsh, Search}
import org.apache.spark.sql.functions._

/** Hyperplane LSH: signature determinism, planted-near-dup retrieval
  * (the pipeline use case), bucketed pair generation, and — the real
  * contract — banded-table recall at a MODERATE threshold (0.45, the
  * pipeline's near-dup setting) rather than only on ~identical vectors. */
class LshSpec extends SparkSpec {

  private val dim = 16

  /** Centered Gaussian corpus: cosine concentrates around 0 (σ ≈
    * 1/√dim), so pairs above 0.45 are a genuine upper tail — unlike the
    * uniform-[0,1) fixture, whose positive-orthant vectors are all
    * mutually similar and would make any recall gate vacuous. */
  private def gaussCorpus(n: Int, d: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(i => (i, Array.fill(d)(rnd.nextGaussian().toFloat)))
  }

  test("executor and driver signatures agree on every row") {
    val data = corpus(80, dim)
    val model = Lsh.fit(dim, nBits = 12)
    val rows = Lsh.assign(toDF(data), "embedding", model)
      .select("id", Lsh.BucketCol).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    data.foreach { case (id, v) =>
      assert(rows(id) == Lsh.signature(v.toSeq, model), s"signature mismatch for id $id")
    }
  }

  test("multi-probe search finds planted near-duplicates") {
    val rnd = new scala.util.Random(11)
    val base = corpus(100, dim)
    // 10 queries: base vector + small noise — high cosine similarity
    val queries = (0 until 10).map { i =>
      val v = base(i * 7)._2
      (base(i * 7)._1, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }
    val model = Lsh.fit(dim, nBits = 10)
    val assigned = Lsh.assign(toDF(base), "embedding", model)
    val found = queries.count { case (wantId, q) =>
      val hits = Lsh.search(assigned, model, "id", "embedding", q.toSeq, 1)
        .select("id").collect().map(_.getLong(0))
      hits.headOption.contains(wantId)
    }
    assert(found >= 8, s"planted near-dup found only $found/10 times")
  }

  test("bucketed near-dup pairs are a subset of brute-force pairs and find identicals") {
    val data = corpus(50, dim)
    val withDup = data :+ (900L, data.head._2.clone())
    val model = Lsh.fit(dim, nBits = 8)
    val assigned = Lsh.assign(toDF(withDup), "embedding", model)
    val pairs = Lsh.cosineNearDupPairs(assigned, "id", "embedding", 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 900L))) // identical vectors share every bucket bit
    val brute = graft.operators.Dedup.cosineNearDupPairs(toDF(withDup), "id", "embedding", 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(brute))
  }

  test("banded near-dup recall >= 0.9 at threshold 0.45 (moderate similarity)") {
    val data = gaussCorpus(150, dim, seed = 7)
    val df = toDF(data)
    val brute = graft.operators.Dedup.cosineNearDupPairs(df, "id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 50, s"fixture too sparse: ${brute.size} true pairs")
    val model = Lsh.fitBanded(dim, bitsPerTable = 4, nTables = 32, seed = 1)
    val banded = Lsh.cosineNearDupPairs(Lsh.assign(df, "embedding", model),
      "id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(brute), "rerank must keep only true pairs")
    val recall = banded.size.toDouble / brute.size
    assert(recall >= 0.9, s"banded recall $recall (${banded.size}/${brute.size}) < 0.9")
  }

  test("banded search recall >= 0.7 vs exact kNN at moderate similarity") {
    val data = gaussCorpus(300, dim, seed = 13)
    val df = toDF(data)
    val model = Lsh.fitBanded(dim, bitsPerTable = 8, nTables = 16, seed = 2)
    val assigned = Lsh.assign(df, "embedding", model)
    val recalls = (0 until 5).map { qi =>
      val q = data(qi * 50)._2.toSeq
      val exact = Search.knnExact(df, "id", "embedding", q, 10)
        .select("id").collect().map(_.getLong(0)).toSet
      val approx = Lsh.search(assigned, model, "id", "embedding", q, 10, probeBits = 2)
        .select("id").collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean search recall $mean < 0.7 (per-query: $recalls)")
  }

  test("filtered search: zero exclusion violations, recall >= 0.7 on the filtered subset") {
    // the reference's filter contract (test_search_api.py:149-172):
    // non-matching docs must NEVER appear, and recall is measured
    // against exact kNN over the matching subset only
    val s = spark
    import s.implicits._
    val data = gaussCorpus(300, dim, seed = 21)
    val df = data.map { case (id, v) => (id, v, (id % 3).toInt) }
      .toDF("id", "embedding", "label")
    val model = Lsh.fitBanded(dim, bitsPerTable = 8, nTables = 16, seed = 4)
    val assigned = Lsh.assign(df, "embedding", model)
    val filt = col("label") === 1
    val fdf = df.filter(filt)
    val recalls = (0 until 5).map { qi =>
      val q = data(qi * 50 + 3)._2.toSeq
      val res = Lsh.search(assigned, model, "id", "embedding", q, 10,
        probeBits = 2, filter = Some(filt)).collect()
      res.foreach(r => assert(r.getAs[Long]("id") % 3 == 1,
        s"filter violation: id ${r.getAs[Long]("id")}"))
      val exact = Search.knnExact(fdf, "id", "embedding", q, 10)
        .select("id").collect().map(_.getLong(0)).toSet
      val approx = res.map(_.getAs[Long]("id")).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean filtered recall $mean < 0.7 (per-query: $recalls)")
  }

  test("single-table model remains the L=1 special case of the banded path") {
    val data = gaussCorpus(60, dim, seed = 3)
    val model = Lsh.fit(dim, nBits = 6, seed = 9)
    assert(model.nTables == 1 && model.bitsPerTable == 6)
    val assigned = Lsh.assign(toDF(data), "embedding", model)
    val rows = assigned.select("id", Lsh.BucketCol).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    data.foreach { case (id, v) =>
      assert(rows(id) == Lsh.signatures(v.toSeq, model)(0))
    }
  }
}
