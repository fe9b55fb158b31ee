package graft

import graft.operators.{Ivf, Search}
import org.apache.spark.sql.functions._

/** IVF build/search contracts from the reference's tests:
  * conservation Σ|lists| = N (test_ivf.py:44), error messages
  * (test_ivf.py:51-64,183-195), self@dist<1e-6 (test_ivf.py:117-125),
  * recall ≥ 0.6 on ≥ 70% of 10 queries with exhaustive probe
  * (test_ivf.py:129-167). */
class IvfSpec extends SparkSpec {

  test("build: k clusters, sizes conserve N, centroids have right shape") {
    val df = toDF(corpus(50, 8))
    val (assigned, model) = Ivf.build(df, "embedding", k = 4)
    assert(model.k == 4)
    assert(model.centroids.length == 4 && model.centroids.forall(_.length == 8))
    val sizes = assigned.groupBy(Ivf.ClusterCol).count().collect()
    assert(sizes.map(_.getAs[Long]("count")).sum == 50L)
    assert(sizes.length <= 4)
  }

  test("build: empty input and N < k raise the reference's errors") {
    val empty = toDF(Seq.empty)
    val e1 = intercept[IllegalArgumentException](Ivf.build(empty, "embedding", 4))
    assert(e1.getMessage.contains("empty"))
    val e2 = intercept[IllegalArgumentException](Ivf.build(toDF(corpus(3, 8)), "embedding", 4))
    assert(e2.getMessage.contains("at least"))
  }

  test("search: n_probe bounds validated") {
    val (assigned, model) = Ivf.build(toDF(corpus(50, 8)), "embedding", 4)
    val q = corpus(50, 8).head._2.toSeq
    intercept[IllegalArgumentException](Ivf.search(assigned, model, "id", q, 0, 5))
    intercept[IllegalArgumentException](Ivf.search(assigned, model, "id", q, 5, 5))
  }

  test("search: exact-match query returns itself at distance < 1e-6") {
    val data = corpus(100, 16)
    val (assigned, model) = Ivf.build(toDF(data), "embedding", 4)
    val res = Ivf.search(assigned, model, "id", data(7)._2.toSeq, nProbe = 4, topK = 5).collect()
    assert(res.head.getAs[Long]("id") == 7L)
    assert(res.head.getAs[Double]("dist") < 1e-6)
  }

  test("recall >= 0.6 vs brute force on >= 70% of 10 queries (exhaustive probe)") {
    val data = corpus(100, 16)
    val df = toDF(data).cache()
    val (assigned, model) = Ivf.build(df, "embedding", 4)
    val cached = assigned.cache()
    val hits = (0 until 10).count { qi =>
      val q = data(qi * 7 % 100)._2.toSeq
      val exact = Search.knnExact(df, "id", "embedding", q, 5)
        .select("id").collect().map(_.getLong(0)).toSet
      val approx = Ivf.search(cached, model, "id", q, nProbe = 4, topK = 5)
        .select("id").collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size.toDouble / 5 >= 0.6
    }
    // n_probe = k is exhaustive: recall is exactly 1.0, well above the bar
    assert(hits >= 7, s"only $hits/10 queries hit recall >= 0.6")
  }

  test("recall >= 0.6 vs brute force at n_probe = k/2 (pruned probe)") {
    // the reference's recall bar (test_ivf.py:150-167) at a genuinely
    // pruned setting — half the clusters are never scanned
    val data = corpus(200, 16)
    val df = toDF(data).cache()
    val (assigned, model) = Ivf.build(df, "embedding", k = 8)
    val cached = assigned.cache()
    val hits = (0 until 10).count { qi =>
      val q = data(qi * 7 % 200)._2.toSeq
      val exact = Search.knnExact(df, "id", "embedding", q, 5)
        .select("id").collect().map(_.getLong(0)).toSet
      val approx = Ivf.search(cached, model, "id", q, nProbe = 4, topK = 5)
        .select("id").collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size.toDouble / 5 >= 0.6
    }
    assert(hits >= 7, s"only $hits/10 queries hit recall >= 0.6 at nProbe=k/2")
  }

  test("buildBalanced: a 90%-mass cluster splits below the cap; search stays exact at full probe") {
    // 90% of rows in one tight jittered blob, 10% spread wide: plain
    // k-means parks the blob in one giant list that defeats partition
    // pruning and skews the knnJoinIvf shuffle
    val rnd = new scala.util.Random(7L)
    // 90% in a blob so tight that splitting it gains k-means almost no
    // SSE, next to three wide orthogonal satellites each worth a
    // centroid — the blob lands in exactly one giant list
    val blob = (0L until 900L).map(i =>
      (i, Array.fill(8)(0.5f + rnd.nextFloat() * 0.05f)))
    val sats = (900L until 1000L).map { i =>
      val axis = (i % 3).toInt
      val v = Array.fill(8)(rnd.nextFloat() * 2f)
      v(axis) += 50f
      (i, v)
    }
    val df = toDF(blob ++ sats)

    val (plain, _) = Ivf.build(df, "embedding", k = 4, seed = 7L)
    val plainMax = plain.groupBy(Ivf.ClusterCol).count().collect()
      .map(_.getAs[Long]("count")).max
    assert(plainMax >= 850L, s"expected a hot cluster, max=$plainMax")

    val (assigned, model) = Ivf.buildBalanced(df, "embedding", k = 4,
      seed = 7L, maxClusterFraction = 0.25)
    val sizes = assigned.groupBy(Ivf.ClusterCol).count().collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("count")).toMap
    // conservation + contiguous ids within the grown model
    assert(sizes.values.sum == 1000L)
    assert(sizes.keys.forall(c => c >= 0 && c < model.k))
    // the hot cluster actually split below the cap (jittered blob IS
    // separable); allow slack for k-means imbalance within the blob
    val maxFrac = sizes.values.max.toDouble / 1000.0
    assert(maxFrac <= 0.5, s"post-split max cluster fraction $maxFrac")
    assert(model.k > 4, "model did not grow sub-centroids")

    // exhaustive probe over the balanced index ≡ exact kNN (same
    // contract as the unbalanced index: splitting must not lose rows)
    val q = blob(3)._2.toSeq
    val ivfTop = Ivf.search(assigned, model, "id", q, nProbe = model.k, topK = 5)
      .collect().map(_.getAs[Long]("id")).toSeq
    val exactTop = Search.knnExact(df, "id", "embedding", q, 5)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(ivfTop == exactTop)

    // an unsplittable blob (identical vectors) terminates without
    // spinning: ids stay contiguous, conservation holds
    val same = toDF((0L until 200L).map(i => (i, Array.fill(8)(1f))) ++
      (200L until 220L).map(i => (i, Array.fill(8)(i.toFloat))))
    val (a2, m2) = Ivf.buildBalanced(same, "embedding", k = 3, seed = 7L,
      maxClusterFraction = 0.1, maxRounds = 3)
    assert(a2.count() == 220L)
    assert(a2.groupBy(Ivf.ClusterCol).count().collect()
      .forall(r => r.getInt(0) >= 0 && r.getInt(0) < m2.k))
  }

  test("drift: near zero on stationary data, large after a shift, maintain() fires") {
    val data = corpus(200, 8)
    val df = toDF(data)
    val (assigned, model) = Ivf.build(df, "embedding", k = 4)
    val d0 = Ivf.drift(assigned, model)
    // centroids were trained on exactly this data: re-estimated means are
    // the converged Lloyd's means (sample == full data here)
    assert(d0 < 0.15, s"stationary drift $d0 not near zero")
    // shift the whole distribution by +5 in every dim
    val shifted = df.withColumn("embedding",
      transform(col("embedding"), v => (v + lit(5.0f)).cast("float")))
    val shiftedAssigned = Ivf.assign(shifted, model)
    val d1 = Ivf.drift(shiftedAssigned, model)
    assert(d1 > 1.0, s"shifted drift $d1 unexpectedly small")
    val (reassigned, m2, fired) = Ivf.maintain(shifted, model, k = 4, driftThreshold = 0.5)
    assert(fired, "maintain must re-train past the threshold")
    assert(Ivf.drift(reassigned, m2) < 0.15, "post-rebuild drift must collapse")
    // sampled drift agrees in order of magnitude with the full scan
    val dSampled = Ivf.drift(shiftedAssigned, model, fraction = 0.5)
    assert(dSampled > 1.0)
  }

  test("incremental add assigns to nearest centroid; delete removes") {
    val data = corpus(50, 8)
    val (assigned, model) = Ivf.build(toDF(data), "embedding", 4)
    val newRows = toDF(Seq((100L, data.head._2))) // duplicate of row 0's vector
    val added = Ivf.assign(newRows, model)
    val c0 = assigned.filter(col("id") === 0).select(Ivf.ClusterCol).head.getInt(0)
    assert(added.select(Ivf.ClusterCol).head.getInt(0) == c0)
    val afterDelete = Ivf.delete(assigned, "id", Seq(0L, 1L))
    assert(afterDelete.count() == 48)
  }

  test("cluster stats: min/max/avg/total") {
    val (assigned, _) = Ivf.build(toDF(corpus(50, 8)), "embedding", 4)
    val r = Ivf.clusterStats(assigned).head
    assert(r.getAs[Long]("total") == 50L)
    assert(r.getAs[Long]("min_size") <= r.getAs[Long]("max_size"))
  }

  test("lloydStepOrdered: partition-invariant bit-exact sums, counts conserve N") {
    val df = toDF(corpus(60, 8))
    val (_, model) = Ivf.build(df, "embedding", k = 4)
    def run(d: org.apache.spark.sql.DataFrame) =
      Ivf.lloydStepOrdered(Ivf.assign(d, model), "id", "embedding")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    val one = run(df.coalesce(1))
    val many = run(df.repartition(7))
    assert(one == many) // bit-exact doubles across partitionings
    // each dimension's counts over clusters sum to N
    val perDim = one.groupBy(_._1._2).map { case (_, cells) => cells.map(_._2._2).sum }
    assert(perDim.forall(_ == 60L))
    // mean is sum/n exactly
    assert(one.values.forall { case (s, n, m) => m == s / n.toDouble })
  }

  test("model persistence round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/model"
    val data = corpus(50, 8)
    val (_, model) = Ivf.build(toDF(data), "embedding", 4)
    Ivf.save(model, dir)
    val loaded = Ivf.load(spark, dir, "embedding")
    assert(loaded.k == model.k)
    assert(loaded.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq)
  }

  test("scaledNProbe: identity at reference scale, fraction-preserving above, clamped") {
    // identity for every toy/reference-sized index (k <= base/fraction)
    assert(Ivf.scaledNProbe(10, 64) == 10)
    assert(Ivf.scaledNProbe(10, 100) == 10)
    // above the identity range: at least 10% of lists (ceil)
    assert(Ivf.scaledNProbe(10, 101) == 11)
    assert(Ivf.scaledNProbe(10, 1000) == 100)  // measured 9/10 GATE PASS at 1M
    assert(Ivf.scaledNProbe(10, 3162) == 317)  // measured 10/10 at 10M
    // small indexes clamp to exhaustive (reference permits n_probe = k;
    // the UNscaled default 10 > k would fail search's range check)
    assert(Ivf.scaledNProbe(10, 4) == 4)
    // monotone in k
    val vals = Seq(1, 10, 100, 1000, 10000).map(Ivf.scaledNProbe(10, _))
    assert(vals == vals.sorted)
    // the two arms agree at the 100M anchor (k = 10^4: both 1000)...
    assert(Ivf.scaledNProbe(10, 10000) == 1000)
    // ...and past it the 10·√k list-count arm binds, so the probed
    // FRACTION falls with scale instead of pinning an O(N) scan/query
    // (recall tracks probed-list count across the measured decades:
    // ~100 lists = gate edge, ~300+ = pass, at 1M AND 10M AND 100M)
    assert(Ivf.scaledNProbe(10, 100000) == 3163)   // 3.2%, not 10000
    assert(Ivf.scaledNProbe(10, 1000000) == 10000) // 1.0%, not 100000
    // a raised knob raises BOTH arms proportionally
    assert(Ivf.scaledNProbe(10, 1000, fraction = 0.25) == 250)
    assert(Ivf.scaledNProbe(10, 1000000, fraction = 0.2) == 20000)
  }

  test("searchIvf auto probe (nProbe <= 0) equals the explicit scaled value") {
    val dir = java.nio.file.Files.createTempDirectory("ivfauto").toString
    val store = graft.VectorStore.open(spark, dir, dim = 8)
    val rows = toDF(corpus(60, 8))
      .select(col("embedding"), concat(lit("doc"), col("id")).as("content"))
    store.ingest(rows)
    store.buildIvf(k = 6)
    val q = corpus(60, 8)(3)._2.toSeq
    val auto = store.searchIvf(q, nProbe = 0, k = 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    // k=6 <= 100: the auto path is identity on the config base (10),
    // clamped to k -> exhaustive probing of all 6 lists
    val explicit = store.searchIvf(q, nProbe = 6, k = 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(auto == explicit)
    // searchApi without n_probe takes the auto path (no range error on
    // a small index, where the raw config default 10 > k would throw)
    val api = store.searchApi(q, Map("index" -> "ivf", "top_k" -> "5"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(api == explicit)
  }

  // ---- hierarchical (two-level) quantizer ----

  test("two-level kernel equals the composed flat argmins (global ids)") {
    val dim = 8
    val data = corpus(200, dim, seed = 7L)
    // fixed two-level geometry: 3 supers with 2/3/1 children
    val rng = new scala.util.Random(5)
    def vec() = Array.fill(dim)(rng.nextFloat())
    val supers = Array.fill(3)(vec())
    val children = Array(Array.fill(2)(vec()), Array.fill(3)(vec()), Array(vec()))
    val m = Ivf.HierModel(supers, children, "embedding")
    assert(m.k == 6 && m.offsets.toSeq == Seq(0, 2, 5))
    val got = Ivf.assignHier(toDF(data), m)
      .select("id", Ivf.ClusterCol).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference computation in plain Scala (same double L2^2 fold)
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    def argmin(cs: Array[Array[Float]], v: Array[Float]): Int =
      cs.zipWithIndex.minBy { case (c, i) => (d2(c, v), i) }._2
    data.foreach { case (id, v) =>
      val g = argmin(supers, v)
      val expect = m.offsets(g) + argmin(children(g), v)
      assert(got(id) == expect, s"id $id: got ${got(id)}, expect $expect")
    }
  }

  test("buildHier: contiguous ids, conservation, exhaustive probe = exact kNN") {
    val data = corpus(300, 8, seed = 11L)
    val df = toDF(data).cache()
    val (assigned, hm) = Ivf.buildHier(df, "embedding", k = 16, seed = 1L)
    assert(hm.k >= 12 && hm.k <= 16, s"achieved k ${hm.k} far from target")
    assert(hm.k1 == 4)
    val ids = assigned.select(Ivf.ClusterCol).distinct().collect().map(_.getInt(0))
    assert(ids.forall(c => c >= 0 && c < hm.k), "cluster ids contiguous in [0, k)")
    assert(assigned.count() == 300L)
    // exhaustive probe over the FLAT view = exact kNN
    val q = data(13)._2.toSeq
    val got = Ivf.search(assigned, hm.flat, "id", q, nProbe = hm.k, topK = 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    val exact = Search.knnExact(df, "id", "embedding", q, 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("hier save/load round-trip preserves supers, children, and the flat view") {
    val data = corpus(120, 8, seed = 3L)
    val (_, hm) = Ivf.buildHier(toDF(data), "embedding", k = 9, seed = 2L)
    val dir = java.nio.file.Files.createTempDirectory("hiermodel").toString
    Ivf.saveHier(hm, s"$dir/model", s"$dir/supers")
    val back = Ivf.loadHier(spark, s"$dir/model", s"$dir/supers", "embedding")
    assert(back.supers.map(_.toSeq).toSeq == hm.supers.map(_.toSeq).toSeq)
    assert(back.children.map(_.map(_.toSeq).toSeq).toSeq ==
      hm.children.map(_.map(_.toSeq).toSeq).toSeq)
    // the flat load() of the SAME model table serves the search side
    val flat = Ivf.load(spark, s"$dir/model", "embedding")
    assert(flat.centroids.map(_.toSeq).toSeq == hm.flat.centroids.map(_.toSeq).toSeq)
  }

  test("probeClustersHier: exhaustive = all lists; covers nProbe; matches " +
      "the two-level ranking on a hand-built model") {
    val rng = new scala.util.Random(7)
    def vec(dim: Int) = Array.fill(dim)(rng.nextFloat())
    val supers = Array.fill(4)(vec(8))
    val children = Array(Array.fill(3)(vec(8)), Array.fill(2)(vec(8)),
      Array.fill(4)(vec(8)), Array(vec(8)))
    val m = Ivf.HierModel(supers, children, "embedding")
    assert(m.k == 10)
    val q = vec(8).toSeq
    // exhaustive request probes every list (the oracle-exact contract)
    assert(Ivf.probeClustersHier(m, q, m.k).sorted == (0 until m.k))
    assert(Ivf.probeClustersHier(m, q, m.k + 0).length == m.k)
    // pruned request: exactly nProbe lists, and they are the nProbe
    // nearest CHILDREN among the top supers covering beta*nProbe lists
    def d2(a: Array[Float]): Double =
      a.zip(q).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val nProbe = 3
    val got = Ivf.probeClustersHier(m, q, nProbe, beta = 2.0)
    assert(got.length == nProbe)
    val superRank = supers.zipWithIndex.map { case (c, g) => (d2(c), g) }
      .sortBy(identity).map(_._2)
    // accumulate supers until >= 6 children (beta 2.0 * 3)
    val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
    var covered = 0
    superRank.iterator.takeWhile(_ => covered < 6).foreach { g =>
      picked += g; covered += children(g).length
    }
    val expect = picked.flatMap { g =>
      children(g).zipWithIndex.map { case (c, j) => (d2(c), m.offsets(g) + j) }
    }.sortBy(identity).take(nProbe).map(_._2)
    assert(got == expect.toSeq, s"got $got expect $expect")
  }

  test("searchHier: flat ranking below FlatBuildMaxK = identical results " +
      "to the flat search; exhaustive = exact kNN") {
    val data = corpus(300, 8, seed = 21L)
    val df = toDF(data).cache()
    val (assigned, hm) = Ivf.buildHier(df, "embedding", k = 16, seed = 4L)
    val q = data(7)._2.toSeq
    // small-k stores keep the exact flat ranking — bit-identical probes
    val viaHier = Ivf.searchHier(assigned, hm, "id", q, nProbe = 5, topK = 10)
      .select("id", "dist")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaFlat = Ivf.search(assigned, hm.flat, "id", q, nProbe = 5, topK = 10)
      .select("id", "dist")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaHier == viaFlat)
    // exhaustive probe through searchHier = exact kNN
    val got = Ivf.searchHier(assigned, hm, "id", q, nProbe = hm.k, topK = 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    val exact = Search.knnExact(df, "id", "embedding", q, 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("allocateChildren: proportional, min-1 for non-empty, sums to k") {
    val sizes = Map(0 -> 700L, 1 -> 200L, 2 -> 99L, 3 -> 1L, 4 -> 0L)
    val a = Ivf.allocateChildren(10, 5, sizes)
    assert(a.sum == 10, s"sum ${a.sum}")
    assert(a(0) >= 6 && a(1) >= 2, "large supers get proportional shares")
    assert(a(3) >= 1, "non-empty super gets at least one child")
    assert(a(4) == 0, "empty super gets none")
  }
}
