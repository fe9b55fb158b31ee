package graft

import graft.operators.Triangles

/** Degree-oriented triangle counting + clustering coefficients. */
class TrianglesSpec extends SparkSpec {

  test("K4 minus an edge: exact counts and coefficients") {
    val s = spark
    import s.implicits._
    // edges 1-2, 1-3, 2-3, 1-4, 2-4 (no 3-4): triangles {1,2,3}, {1,2,4}
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      .toDF("a", "b")
    val tri = Triangles.triangles(pairs, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 3L), (1L, 2L, 4L)))
    val pv = Triangles.perVertex(pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(pv(1L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(pv(2L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(pv(3L) == ((2L, 1L, 1.0)))
    assert(pv(4L) == ((2L, 1L, 1.0)))
  }

  test("stars are triangle-free; dup/reversed/self edges are cleaned") {
    val s = spark
    import s.implicits._
    val pairs = Seq((0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (0L, 0L),
      (0L, 1L)).toDF("a", "b")
    assert(Triangles.triangles(pairs, "a", "b").count() == 0L)
    val pv = Triangles.perVertex(pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(pv(0L) == ((3L, 0L, 0.0))) // hub: dups/self-loops dropped
    assert(pv(1L) == ((1L, 0L, 0.0))) // degree-1: coeff 0 by contract
  }

  test("degree orientation ≡ the id-ordered 3-way join on a random graph") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random graph with a hub (node 0 connects to
    // everything — the skew case the orientation exists for)
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)) ++
      (1 to 29).map(i => (0L, i.toLong))
    val pairs = edges.toDF("a", "b")
    val mine = Triangles.triangles(pairs, "a", "b").count()
    // reference: canonical edges e, id-ordered 3-way join
    val e = pairs.selectExpr("least(a, b) AS a", "greatest(a, b) AS b")
      .where("a <> b").distinct()
    e.createOrReplaceTempView("tg_ref_e")
    val ref = s.sql(
      """SELECT count(*) FROM tg_ref_e e1
        |JOIN tg_ref_e e2 ON e2.a = e1.a AND e2.b > e1.b
        |JOIN tg_ref_e e3 ON e3.a = e1.b AND e3.b = e2.b""".stripMargin)
      .head.getLong(0)
    assert(mine == ref && mine > 0)
  }
}
