package graft

import graft.operators.{Hnsw, Search}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** HNSW contracts from the reference's tests: self@dist<1e-6 + ordering
  * (test_hnsw.py:95-111), recall ≥ 0.7 on ≥ 80% of 10 queries
  * (test_hnsw.py:136-153, N=100 dim=16 M=8 efc=50 ef=50 k=5), level-0
  * connectivity ≥ 90% (test_hnsw.py:155-185, N=50 dim=8 M=4 efc=20),
  * idempotent re-insert (test_hnsw.py:309-327), delete (B2). */
class HnswSpec extends SparkSpec {

  test("search returns the query itself first at distance < 1e-6") {
    val data = corpus(20, 8)
    val res = Hnsw.search(toDF(data), "id", "embedding", data.head._2.toSeq,
      k = 5, ef = 20, Hnsw.Params(m = 8, efConstruction = 50)).collect()
    assert(res.length == 5)
    assert(res.head.getAs[Long]("id") == 0L)
    assert(res.head.getAs[Double]("dist") < 1e-6)
    val dists = res.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
  }

  test("recall >= 0.7 vs brute force on >= 80% of 10 queries") {
    val data = corpus(100, 16)
    val df = toDF(data).cache()
    val queries = (0 until 10).map(i => (i.toLong, data(i * 11 % 100)._2))
    val params = Hnsw.Params(m = 8, efConstruction = 50)
    val approx = Hnsw.searchBatch(df, "id", "embedding", queries, k = 5, ef = 50, params)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    val good = queries.count { case (qid, qv) =>
      val exact = Search.knnExact(df, "id", "embedding", qv.toSeq, 5)
        .select("id").collect().map(_.getLong(0)).toSet
      exact.intersect(approx(qid)).size.toDouble / 5 >= 0.7
    }
    assert(good >= 8, s"only $good/10 queries reached recall 0.7")
  }

  test("level-0 graph connectivity >= 90% BFS-reachable per partition") {
    val data = corpus(50, 8)
    val edges = Hnsw.buildEdges(toDF(data), "id", "embedding",
      Hnsw.Params(m = 4, efConstruction = 20), numPartitions = 1)
      .filter(col("level") === 0)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    assert(nodes.length >= 45) // all but stragglers participate in the graph
    val seen = mutable.Set(nodes.head)
    val stack = mutable.Stack(nodes.head)
    while (stack.nonEmpty) {
      adj.getOrElse(stack.pop(), Array.empty[Long]).foreach { n =>
        if (seen.add(n)) stack.push(n)
      }
    }
    assert(seen.size.toDouble / nodes.length >= 0.9,
      s"only ${seen.size}/${nodes.length} reachable")
  }

  test("idempotent insert: duplicate ids don't duplicate graph nodes") {
    val data = corpus(20, 8)
    val dup = toDF(data ++ data.take(5)) // re-insert 5 ids
    val res = Hnsw.search(dup, "id", "embedding", data.head._2.toSeq, k = 20,
      ef = 40, Hnsw.Params(m = 4, efConstruction = 20))
      .select("id").collect().map(_.getLong(0))
    assert(res.length == res.distinct.length)
  }

  test("delete removes ids from results") {
    val data = corpus(30, 8)
    val df = Hnsw.delete(toDF(data), "id", Seq(0L, 1L))
    val res = Hnsw.search(df, "id", "embedding", data.head._2.toSeq, k = 10,
      ef = 30, Hnsw.Params(m = 4, efConstruction = 20))
      .select("id").collect().map(_.getLong(0))
    assert(!res.contains(0L) && !res.contains(1L))
  }

  test("multi-partition search merges shard results exactly") {
    val data = corpus(200, 8)
    val df = toDF(data)
    val res = Hnsw.searchBatch(df, "id", "embedding",
      Seq((0L, data(3)._2)), k = 5, ef = 100,
      Hnsw.Params(m = 8, efConstruction = 100), numPartitions = 4).collect()
    assert(res.length == 5)
    assert(res.map(_.getAs[Long]("id")).contains(3L))
    assert(res.map(_.getAs[Int]("rank")).toSeq.sorted == Seq(1, 2, 3, 4, 5))
  }

  test("persisted edges search (B11 load path) equals the direct build-and-search") {
    val data = corpus(150, 8)
    val df = toDF(data)
    val params = Hnsw.Params(m = 8, efConstruction = 60)
    val parts = 4
    val dir = java.nio.file.Files.createTempDirectory("hnsw").toString
    Hnsw.buildEdges(df, "id", "embedding", params, parts)
      .write.mode("overwrite").parquet(s"$dir/edges")
    val queries = Seq((0L, data(5)._2), (1L, data(77)._2))
    def rows(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => (x.getAs[Long]("query_id"), x.getAs[Int]("rank"),
        x.getAs[Long]("id"), x.getAs[Double]("dist"))).sortBy(t => (t._1, t._2))
    val fromEdges = rows(Hnsw.searchEdges(spark.read.parquet(s"$dir/edges"), df,
      "id", "embedding", queries, k = 5, ef = 60, parts, params).collect())
    val direct = rows(Hnsw.searchBatch(df, "id", "embedding",
      queries, k = 5, ef = 60, params, parts).collect())
    // same seeded per-shard graphs ⇒ identical results, no rebuild needed
    assert(fromEdges.toSeq == direct.toSeq)
    assert(fromEdges.count(_._1 == 0L) == 5 && fromEdges.count(_._1 == 1L) == 5)
    // self-match survives the persisted round-trip
    assert(fromEdges.exists { case (q, _, id, d) => q == 0L && id == 5L && d < 1e-6 })
  }

  test("filtered search: zero exclusion violations, recall >= 0.7 on the filtered subset") {
    // reference filter contract (test_search_api.py:149-172): the
    // predicate composes BEFORE graph construction, so non-matching ids
    // are structurally absent; recall is vs exact kNN on the subset
    val s = spark
    import s.implicits._
    val data = corpus(200, 16)
    val df = data.map { case (id, v) => (id, v, (id % 4).toInt) }
      .toDF("id", "embedding", "label")
    val filt = col("label") === 1
    val fdf = df.filter(filt)
    val params = Hnsw.Params(m = 8, efConstruction = 50)
    val queries = (0 until 10).map(i => (i.toLong, data(i * 17 % 200)._2))
    val res = Hnsw.searchBatch(df, "id", "embedding", queries, k = 5, ef = 50,
      params, filter = Some(filt)).collect()
    res.foreach(r => assert(r.getAs[Long]("id") % 4 == 1,
      s"filter violation: id ${r.getAs[Long]("id")}"))
    val byQ = res.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    val good = queries.count { case (qid, qv) =>
      val exact = Search.knnExact(fdf, "id", "embedding", qv.toSeq, 5)
        .select("id").collect().map(_.getLong(0)).toSet
      exact.intersect(byQ(qid)).size.toDouble / 5 >= 0.7
    }
    assert(good >= 8, s"only $good/10 filtered queries reached recall 0.7")
  }

  test("incremental insertEdges: new batch searchable, recall matches full rebuild") {
    // the reference inserts into a live graph (hnsw.py:143-225); the
    // engine's analog inserts a batch into persisted shard graphs with
    // no full rebuild — acceptance is the reference's recall contract,
    // plus the inserted ids must actually be reachable
    val data = corpus(150, 16)
    val base = toDF(data.take(100))
    val batch = toDF(data.drop(100))
    val all = toDF(data)
    val params = Hnsw.Params(m = 8, efConstruction = 50)
    val parts = 4
    val edges0 = Hnsw.buildEdges(base, "id", "embedding", params, parts)
    val edges1 = Hnsw.insertEdges(edges0, base, batch, "id", "embedding", parts, params)
    // every inserted id has adjacency in the updated graph
    val srcs = edges1.select("src").distinct().collect().map(_.getLong(0)).toSet
    (100L until 150L).foreach(id => assert(srcs.contains(id), s"inserted id $id has no edges"))
    val queries = (0 until 10).map(i => (i.toLong, data(i * 13 % 150)._2))
    val approx = Hnsw.searchEdges(edges1, all, "id", "embedding", queries,
        k = 5, ef = 50, parts, params)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    val good = queries.count { case (qid, qv) =>
      val exact = Search.knnExact(all, "id", "embedding", qv.toSeq, 5)
        .select("id").collect().map(_.getLong(0)).toSet
      exact.intersect(approx(qid)).size.toDouble / 5 >= 0.7
    }
    assert(good >= 8, s"only $good/10 queries reached recall 0.7 after incremental insert")
    // a query ON a new vector finds it at distance ~0
    val self = Hnsw.searchEdges(edges1, all, "id", "embedding",
      Seq((0L, data(120)._2)), k = 1, ef = 50, parts, params).collect()
    assert(self.head.getAs[Long]("id") == 120L && self.head.getAs[Double]("dist") < 1e-6)
    // re-inserting already-present ids is a no-op (idempotent, hnsw.py:152-155)
    val edges2 = Hnsw.insertEdges(edges1, all, batch, "id", "embedding", parts, params)
    assert(edges2.count() == edges1.count())
  }

  test("refreshEdges: snapshot catch-up builds then inserts only unseen ids") {
    val data = corpus(120, 8)
    val params = Hnsw.Params(m = 8, efConstruction = 40)
    val parts = 2
    val dir = java.nio.file.Files.createTempDirectory("hnsw-refresh").toString + "/edges"
    val v1 = toDF(data.take(80))
    Hnsw.refreshEdges(v1, dir, "id", "embedding", parts, params) // first flush: full build
    val n1 = spark.read.parquet(dir).count()
    assert(n1 > 0)
    val v2 = toDF(data)
    Hnsw.refreshEdges(v2, dir, "id", "embedding", parts, params) // catch-up: 40 new ids
    val edges = spark.read.parquet(dir)
    assert(edges.count() > n1)
    val res = Hnsw.searchEdges(edges, v2, "id", "embedding",
      Seq((0L, data(100)._2)), k = 3, ef = 40, parts, params).collect()
    assert(res.head.getAs[Long]("id") == 100L && res.head.getAs[Double]("dist") < 1e-6)
  }

  test("persisted edges search works for non-bigint id columns") {
    // murmur3 hashes int and long inputs differently: searchEdges must
    // shard on the CASTED long (as buildEdges does) or every vector of
    // an int-id table lands in the wrong shard and results silently
    // degrade — this pins the agreement for int ids
    val data = corpus(120, 8)
    val s = spark
    import s.implicits._
    val intDf = data.map { case (id, v) => (id.toInt, v) }.toDF("id", "embedding")
    val longDf = toDF(data)
    val params = Hnsw.Params(m = 8, efConstruction = 60)
    val parts = 4
    val edges = Hnsw.buildEdges(intDf, "id", "embedding", params, parts)
    val queries = Seq((0L, data(5)._2), (1L, data(40)._2))
    def rows(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => (x.getAs[Long]("query_id"), x.getAs[Int]("rank"),
        x.getAs[Long]("id"), x.getAs[Double]("dist"))).sortBy(t => (t._1, t._2))
    val fromInt = rows(Hnsw.searchEdges(edges, intDf, "id", "embedding",
      queries, k = 5, ef = 60, parts, params).collect())
    val fromLong = rows(Hnsw.searchEdges(
      Hnsw.buildEdges(longDf, "id", "embedding", params, parts), longDf,
      "id", "embedding", queries, k = 5, ef = 60, parts, params).collect())
    assert(fromInt.toSeq == fromLong.toSeq)
    assert(fromInt.exists { case (q, _, id, d) => q == 0L && id == 5L && d < 1e-6 })
  }

  test("scaledEf: identity at the measured anchor, perShardN^0.30 growth above it") {
    // at/below the anchor shard size the configured beam passes through
    assert(Hnsw.scaledEf(50, 1000000L, 32) == 50)   // 31,250/shard = anchor
    assert(Hnsw.scaledEf(50, 1000L, 4) == 50)
    // the two measured sweep points: ef=50 fails at 312,500/shard where
    // ef=100 passes — the fit must land exactly on the passing beam
    assert(Hnsw.scaledEf(50, 10000000L, 32) == 100)
    // monotone in corpus size, and another decade doubles the beam again
    assert(Hnsw.scaledEf(50, 100000000L, 32) == 200)
    // more shards = smaller per-shard graphs = less widening needed
    assert(Hnsw.scaledEf(50, 10000000L, 320) == 50)
    // degenerate partition counts clamp instead of dividing by zero
    assert(Hnsw.scaledEf(50, 31250L, 0) == 50)
  }
}
