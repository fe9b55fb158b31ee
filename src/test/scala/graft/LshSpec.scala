package graft

import graft.operators.{Lsh, Search}
import org.apache.spark.sql.functions._

/** Hyperplane LSH: signature determinism, planted-near-dup retrieval
  * (the pipeline use case), and bucketed pair generation. */
class LshSpec extends SparkSpec {

  private val dim = 16

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
}
