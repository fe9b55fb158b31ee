package graft

import graft.functions.VectorFunctions._
import graft.operators.Search
import org.apache.spark.sql.functions._

/** Exact-kNN + filter semantics, mirroring the reference's contracts:
  * self@dist<1e-6 (test_hnsw.py:102-111), unit-basis retrieval
  * (test_mmap_vector_store.py:320-349), filter exclusion
  * (test_search_api.py:149-185), missing-key ⇒ no match
  * (storage_service.py:118-128). */
class SearchSpec extends SparkSpec {

  test("L2 distance matches hand-computed values") {
    val df = toDF(Seq((0L, Array(1f, 2f, 3f)), (1L, Array(4f, 6f, 3f))))
    val d = df.agg(min(l2(col("embedding"), lit(Array(1f, 2f, 3f))))).head.getDouble(0)
    assert(d == 0.0)
    val d2 = df.filter(col("id") === 1)
      .select(l2(col("embedding"), lit(Array(1f, 2f, 3f)))).head.getDouble(0)
    assert(math.abs(d2 - 5.0) < 1e-12) // 3-4-0 triangle
  }

  test("exact search returns the query itself at distance < 1e-6") {
    val data = corpus(20, 8)
    val res = Search.knnExact(toDF(data), "id", "embedding", data.head._2.toSeq, 5)
      .collect()
    assert(res.length == 5)
    assert(res.head.getAs[Long]("id") == 0L)
    assert(res.head.getAs[Double]("dist") < 1e-6)
    // ascending distance order
    val dists = res.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
  }

  test("unit basis vectors: nearest to e1 is e1") {
    val basis = (0 until 4).map(i => (i.toLong, Array.tabulate(4)(j => if (i == j) 1f else 0f)))
    val res = Search.knnExact(toDF(basis), "id", "embedding", Seq(1f, 0f, 0f, 0f), 2).collect()
    assert(res.head.getAs[Long]("id") == 0L && res.head.getAs[Double]("dist") == 0.0)
  }

  test("cosine distance: parallel vectors at 0, orthogonal at 1") {
    val df = toDF(Seq((0L, Array(2f, 0f)), (1L, Array(0f, 3f))))
    val r = df.select(col("id"), cosineDistance(col("embedding"), lit(Array(1f, 0f))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(0L)) < 1e-12 && math.abs(r(1L) - 1.0) < 1e-12)
  }

  test("metadata filter: AND-of-equalities, missing key means no match") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, Map("color" -> "red", "type" -> "fruit")),
      (1L, Map("color" -> "green", "type" -> "fruit")),
      (2L, Map("color" -> "red", "type" -> "vehicle")),
      (3L, Map("type" -> "fruit"))) // no color key
      .toDF("id", "metadata")
    val hits = df.filter(Search.metadataFilter(col("metadata"),
      Map("color" -> "red", "type" -> "fruit"))).select("id").as[Long].collect()
    assert(hits.toSeq == Seq(0L))
    // empty-filter short-circuit: no matches → empty result flows through
    val none = df.filter(Search.metadataFilter(col("metadata"), Map("color" -> "blue")))
    assert(none.count() == 0)
  }

  test("rangeSearch: exactly the rows within radius, filter composes") {
    val data = corpus(50, 8)
    val df = toDF(data)
    val q = data.head._2.toSeq
    val all = Search.knnExact(df, "id", "embedding", q, 50)
      .select("id", "dist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r = all.values.toSeq.sorted.apply(10) // radius capturing 11 rows
    val in = Search.rangeSearch(df, "id", "embedding", q, r)
      .select("id", "dist").collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(in == all.filter(_._2 <= r), "range set must equal brute-force cut")
    // a pre-filter structurally excludes non-matching rows
    val odd = Search.rangeSearch(df, "id", "embedding", q, r,
      Some(col("id") % 2 === 1)).select("id").collect().map(_.getLong(0))
    assert(odd.forall(_ % 2 == 1))
    assert(Search.rangeSearch(df, "id", "embedding", q, 0.0).count()
      == all.count(_._2 <= 0.0))
  }

  test("knnJoin yields k ranked neighbors per query") {
    val data = corpus(50, 8)
    val base = toDF(data)
    val queries = toDF(data.take(3)).select(col("id").as("qid"), col("embedding").as("qemb"))
    val res = Search.knnJoin(base, "id", "embedding", queries, "qid", "qemb", 4).collect()
    assert(res.length == 12)
    // each query's rank-1 neighbor is itself at distance 0
    val self = res.filter(_.getAs[Int]("rank") == 1)
    assert(self.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    assert(self.forall(_.getAs[Double]("dist") < 1e-6))
  }

  test("knnJoinIvf with exhaustive probe equals brute-force knnJoin") {
    val data = corpus(60, 8)
    val base = toDF(data)
    val queries = toDF(data.take(4)).select(col("id").as("qid"), col("embedding").as("qemb"))
    val (assigned, model) = graft.operators.Ivf.build(base, "embedding", 4)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) -> r.getAs[Long]("neighbor_id")
    val brute = Search.knnJoin(base, "id", "embedding", queries, "qid", "qemb", 5)
      .collect().map(key).toMap
    val ivf = Search.knnJoinIvf(assigned, model, "id", queries, "qid", "qemb", 5, nProbe = 4)
      .collect().map(key).toMap
    assert(ivf == brute)
    // pruned probe still finds each query itself first
    val pruned = Search.knnJoinIvf(assigned, model, "id", queries, "qid", "qemb", 5, nProbe = 1)
      .collect().filter(_.getAs[Int]("rank") == 1)
    assert(pruned.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
  }
}
