package graft

import graft.operators.Diversity
import org.apache.spark.sql.functions._

/** Greedy k-center selection + nearest-center cover contracts. */
class DiversitySpec extends SparkSpec {

  /** Driver-local reference: the same greedy farthest-point traversal
    * in plain Scala (min-id seed, id tie-break, sequential double
    * fold). */
  private def localKCenter(rows: Seq[(Long, Array[Float])],
                           k: Int): Seq[(Long, Long, Double)] = {
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      math.sqrt(s)
    }
    val byId = rows.sortBy(_._1)
    var selected = Vector((1L, byId.head._1, 0.0))
    var md = byId.map(r => (r._1, r._2, l2(r._2, byId.head._2)))
    var i = 2
    var done = false
    while (i <= k && !done) {
      val cands = md.filter(_._3 > 0)
      if (cands.isEmpty) done = true
      else {
        val best = cands.minBy(c => (-c._3, c._1))
        selected :+= ((i.toLong, best._1, best._3))
        md = md.map(r => (r._1, r._2, math.min(r._3, l2(r._2, best._2))))
        i += 1
      }
    }
    selected
  }

  test("kCenter: blob corpus — one center per blob, farthest-first") {
    val s = spark
    import s.implicits._
    // 3 tight blobs far apart on distinct axes; seed (id 0) in blob A
    def blob(base: Float, axis: Int, ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        if (j == axis) base + (i % 5) * 0.01f else 0f))
    }
    val rows = blob(10f, 0, 0 until 20) ++ blob(10f, 1, 20 until 40) ++
      blob(10f, 2, 40 until 60)
    val out = Diversity.kCenter(toDF(rows), "id", "embedding", 3)
      .orderBy("sel_rank").collect()
    assert(out.length == 3)
    val axes = out.map(_.getLong(1) / 20).toSet
    assert(axes == Set(0L, 1L, 2L), s"expected one center per blob: ${out.mkString(",")}")
    assert(out(0).getDouble(2) == 0.0) // seed
    // trajectory is non-increasing after the seed
    assert(out(1).getDouble(2) >= out(2).getDouble(2))
  }

  test("kCenter: matches the driver-local greedy reference bit-for-bit") {
    val rows = corpus(200, 16)
    val expect = localKCenter(rows, 10)
    val got = Diversity.kCenter(toDF(rows), "id", "embedding", 10)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
    // partition invariance: the trajectory is a pure function of the set
    val got7 = Diversity.kCenter(toDF(rows).repartition(7), "id", "embedding", 10)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got7 == expect)
  }

  test("kCenter: duplicate-heavy corpus stops early; empty corpus is empty") {
    val s = spark
    import s.implicits._
    // only 2 distinct embeddings across 50 rows → exactly 2 centers
    val rows = (0L until 50L).map(i =>
      (i, Array.tabulate(4)(j => if (i % 2 == 0) 1f else if (j == 0) 5f else 0f)))
    val out = Diversity.kCenter(toDF(rows), "id", "embedding", 8)
      .orderBy("sel_rank").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L)) // min-id of each class
    assert(Diversity.kCenter(toDF(rows).limit(0), "id", "embedding", 3)
      .count() == 0)
  }

  /** Driver-local MMR reference: exact top-c cosine candidates, then
    * the greedy λ·rel − (1−λ)·maxsim loop with (score DESC, id ASC)
    * ties — same IEEE fold order as the operator. */
  private def localMmr(rows: Seq[(Long, Array[Float])], q: Array[Float],
                       c: Int, k: Int, lambda: Double): Seq[(Long, Long)] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    var rest = rows.map { case (id, e) => (id, e, cos(e, q)) }
      .sortBy(r => (-r._3, r._1)).take(c).toBuffer
    val ms = scala.collection.mutable.Map.empty[Long, Double]
    var out = Vector.empty[(Long, Long)]
    var rank = 1L
    while (rank <= k && rest.nonEmpty) {
      val pick = rest.map { case (id, e, r) =>
        val s = if (rank == 1L) lambda * r else lambda * r - (1 - lambda) * ms(id)
        (id, e, s)
      }.minBy(t => (-t._3, t._1))
      out :+= ((rank, pick._1))
      rest = rest.filterNot(_._1 == pick._1)
      rest.foreach { case (id, e, _) =>
        val sim = cos(e, pick._2)
        ms(id) = if (rank == 1L) sim else math.max(ms(id), sim)
      }
      rank += 1L
    }
    out
  }

  test("mmrRerank: near-duplicate-heavy corpus — one copy of the best cluster plus complements") {
    val s = spark
    import s.implicits._
    // 5 mutual near-copies (ids 0-4: rel≈0.9, pairwise sim≈1 — NOT
    // aligned with q, so the redundancy penalty bites) and 5 mutually
    // diverse complements (ids 10-14: rel=0.8, sim-to-copy≈0.72).
    // Plain top-3 by relevance = three copies; MMR at λ=0.5 = one copy
    // (0.5·0.9−0.5·1 = −0.05) then complements (0.5·0.8−0.5·0.72 = +0.04).
    val q = Array.tabulate(8)(j => if (j == 0) 1f else 0f)
    val copies = (0L until 5L).map(i =>
      (i, Array.tabulate(8)(j =>
        if (j == 0) 0.9f else if (j == 7) 0.436f + i * 0.0001f else 0f)))
    val comps = (10L until 15L).map(i =>
      (i, Array.tabulate(8)(j =>
        if (j == 0) 0.8f else if (j == (i - 9).toInt) 0.6f else 0f)))
    val out = Diversity.mmrRerank(toDF(copies ++ comps), "id", "embedding",
        q, nCandidates = 10, k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(out.length == 3)
    val picked = out.map(_.getLong(1)).toSeq
    assert(picked.head < 5L, s"rank-1 must be a copy: $picked")
    assert(picked.tail.forall(_ >= 10L),
      s"ranks 2-3 must be complements, not more copies: $picked")
    // rel column is the cosine to the query; score non-increasing is NOT
    // guaranteed across rounds (ms grows), but rank-1 score = λ·rel
    assert(out(0).getDouble(3) == 0.5 * out(0).getDouble(2))
  }

  test("mmrRerank: matches the driver-local greedy reference; λ=1 is plain top-k") {
    val rows = corpus(300, 16)
    val q = rows(7)._2
    val got = Diversity.mmrRerank(toDF(rows), "id", "embedding", q, 40, 10, 0.5)
      .orderBy("mmr_rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == localMmr(rows, q, 40, 10, 0.5))
    // λ=1: diversity term vanishes → selection order is relevance order
    val flat = Diversity.mmrRerank(toDF(rows), "id", "embedding", q, 40, 10, 1.0)
      .orderBy("mmr_rank").collect().map(_.getLong(1)).toSeq
    val topk = localMmr(rows, q, 40, 10, 1.0).map(_._2)
    assert(flat == topk)
    // partition invariance of the candidate cut
    val got5 = Diversity.mmrRerank(toDF(rows).repartition(5), "id", "embedding",
      q, 40, 10, 0.5).orderBy("mmr_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got5 == got)
  }

  test("mmrRerank: k > candidate pool stops early; bad args rejected") {
    val rows = corpus(6, 8)
    val out = Diversity.mmrRerank(toDF(rows), "id", "embedding",
      rows.head._2, nCandidates = 6, k = 6, lambda = 0.3)
    assert(out.count() == 6)
    intercept[IllegalArgumentException] {
      Diversity.mmrRerank(toDF(rows), "id", "embedding", rows.head._2, 5, 9)
    }
  }

  private def l2d(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    math.sqrt(s)
  }

  test("apportion: largest-remainder — Σ budgets = k, ∝ mass, deterministic ties") {
    import graft.operators.Diversity.apportion
    // 16 over masses 50/30/20 → exact quotas 8/4.8/3.2 → floors 8/4/3,
    // one leftover by largest remainder (.8) → 8/5/3
    assert(apportion(Seq((0, 50L), (1, 30L), (2, 20L)), 16) ==
      Map(0 -> 8, 1 -> 5, 2 -> 3))
    // remainder tie (25/25/50, k=5 → quotas 1.25/1.25/2.5 → floors
    // 1/1/2, leftovers 1: rem .5 beats .25 → cell 2 takes it)
    assert(apportion(Seq((0, 25L), (1, 25L), (2, 50L)), 5) ==
      Map(0 -> 1, 1 -> 1, 2 -> 3))
    // equal-remainder tie breaks on LOWER cell id
    assert(apportion(Seq((0, 1L), (1, 1L)), 1) == Map(0 -> 1, 1 -> 0))
    // k smaller than cell count: tiny cells get 0
    val b = apportion(Seq((0, 100L), (1, 1L), (2, 1L)), 2)
    assert(b.values.sum == 2 && b(0) == 2)
  }

  test("kCenterPerCell: matches the per-cell local greedy composition bit-for-bit") {
    val rows = corpus(300, 8)
    // 4 fixed "centroids" = 4 corpus points spread by id
    val cents = Array(0L, 75L, 150L, 225L).map(i => rows(i.toInt)._2)
    val model = graft.operators.Ivf.Model(cents, "embedding")
    val got = Diversity.kCenterPerCell(toDF(rows), "id", "embedding", 12, model)
      .orderBy("cell", "sel_rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

    // local reference: first-match squared-L2 argmin assignment,
    // largest-remainder budgets, local greedy per cell
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val cellOf = rows.map { case (id, e) =>
      id -> cents.zipWithIndex.minBy { case (c, j) => (sq(e, c), j) }._2
    }.toMap
    val counts = rows.groupBy(r => cellOf(r._1)).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val budget = graft.operators.Diversity.apportion(counts, 12)
    val expect = counts.map(_._1).flatMap { cell =>
      val members = rows.filter(r => cellOf(r._1) == cell)
      if (budget(cell) == 0) Seq.empty
      else localKCenter(members, budget(cell))
        .map { case (rank, id, d) => (cell, rank, id, d) }
    }.sortBy(t => (t._1, t._2))
    assert(got == expect)
    assert(got.map(_._1).distinct.size == counts.size)
    assert(got.size == 12) // Σ budgets = k, no cell exhausted here
  }

  test("kCenterPerCell: partition invariance; blob corpus covers every blob") {
    val s = spark
    import s.implicits._
    def blob(axis: Int, ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        if (j == axis) 10f + (i % 5) * 0.01f else 0f))
    }
    val rows = blob(0, 0 until 40) ++ blob(1, 40 until 80) ++
      blob(2, 80 until 100)
    val cents = Array(
      Array.tabulate(8)(j => if (j == 0) 10f else 0f),
      Array.tabulate(8)(j => if (j == 1) 10f else 0f),
      Array.tabulate(8)(j => if (j == 2) 10f else 0f))
    val model = graft.operators.Ivf.Model(cents, "embedding")
    val out = Diversity.kCenterPerCell(toDF(rows), "id", "embedding", 10, model)
      .orderBy("cell", "sel_rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // mass 40/40/20 → budgets 4/4/2; every blob is covered ∝ its mass
    assert(out.count(_._1 == 0) == 4)
    assert(out.count(_._1 == 1) == 4)
    assert(out.count(_._1 == 2) == 2)
    val out13 = Diversity.kCenterPerCell(toDF(rows).repartition(13), "id",
        "embedding", 10, model)
      .orderBy("cell", "sel_rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out13 == out)
  }

  test("kCenterPerCell: cover radius within 2× of global greedy on blob corpus; duplicate cells stop early") {
    val s = spark
    import s.implicits._
    def blob(axis: Int, ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        if (j == axis) 10f + (i % 7) * 0.03f else (i % 3) * 0.02f))
    }
    val rows = blob(0, 0 until 50) ++ blob(1, 50 until 100) ++
      blob(2, 100 until 150)
    val df = toDF(rows)
    val k = 9
    def radius(centers: Seq[Long]): Double = {
      val ce = centers.map(rows.toMap)
      rows.map { case (_, e) => ce.map(c => l2d(e, c)).min }.max
    }
    val globalSel = Diversity.kCenter(df, "id", "embedding", k)
      .collect().map(_.getLong(1)).toSeq
    val cents = Array(
      Array.tabulate(8)(j => if (j == 0) 10f else 0f),
      Array.tabulate(8)(j => if (j == 1) 10f else 0f),
      Array.tabulate(8)(j => if (j == 2) 10f else 0f))
    val cellSel = Diversity.kCenterPerCell(df, "id", "embedding", k,
        graft.operators.Ivf.Model(cents, "embedding"))
      .collect().map(_.getLong(2)).toSeq
    assert(cellSel.size == k)
    // the per-cell composition pays a bounded coverage premium when the
    // coarse partition respects the cluster structure
    assert(radius(cellSel) <= 2.0 * radius(globalSel) + 1e-12,
      s"per-cell radius ${radius(cellSel)} vs global ${radius(globalSel)}")
    // duplicate-heavy cell exhausts: 30 rows, only 2 distinct embeddings
    val dup = (0L until 30L).map(i =>
      (i, Array.tabulate(4)(j => if (i % 2 == 0) 1f else if (j == 0) 5f else 0f)))
    val dupOut = Diversity.kCenterPerCell(toDF(dup), "id", "embedding", 6,
      graft.operators.Ivf.Model(Array(Array.fill(4)(0f)), "embedding"))
    assert(dupOut.count() == 2)
  }

  test("kCenterPerCell: hot cell fails fast with the buildBalanced message, not an OOM") {
    // one centroid → ALL 50 rows land in cell 0; with maxCellSize=20 the
    // pre-shuffle count check must reject before any task materializes
    // the cell in memory
    val rows = corpus(50, 4)
    val model = graft.operators.Ivf.Model(Array(Array.fill(4)(0f)), "embedding")
    val ex = intercept[IllegalArgumentException] {
      Diversity.kCenterPerCell(toDF(rows), "id", "embedding", 5, model,
        maxCellSize = 20L).count()
    }
    assert(ex.getMessage.contains("buildBalanced"))
    assert(ex.getMessage.contains("cell 0"))
    // same data under the default cap still runs
    assert(Diversity.kCenterPerCell(toDF(rows), "id", "embedding", 5, model)
      .count() == 5)
  }

  test("assignToCenters: rows go to their true nearest center; centers cover themselves") {
    val rows = corpus(100, 8)
    val centersDf = Diversity.kCenter(toDF(rows), "id", "embedding", 4)
    val ids = centersDf.orderBy("sel_rank").collect().map(_.getLong(1))
    val embById = rows.toMap
    val centers = ids.map(i => (i, embById(i)))
    val cover = Diversity.assignToCenters(toDF(rows), "id", "embedding", centers)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(cover.size == 100)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      math.sqrt(s)
    }
    rows.foreach { case (id, emb) =>
      val (cid, cd) = cover(id)
      val best = centers.map(c => (c._1, l2(emb, c._2))).minBy(_._2)._2
      assert(cd == best, s"row $id assigned dist $cd, nearest is $best")
      assert(l2(emb, centers.find(_._1 == cid).get._2) == cd)
    }
    ids.foreach(i => assert(cover(i) == (i, 0.0))) // centers self-assign
  }
}
