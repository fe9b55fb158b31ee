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
