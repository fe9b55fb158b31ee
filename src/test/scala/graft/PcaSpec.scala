package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Second-moment PCA power iteration + All-but-the-Top projection. */
class PcaSpec extends SparkSpec {

  /** Deterministic synthetic corpus with a planted dominant direction
    * u ∝ (3, 4, 0, 0): strong u component + small orthogonal jitter. */
  private def planted = {
    val s = spark
    import s.implicits._
    val u = Array(0.6f, 0.8f, 0.0f, 0.0f)
    (1 to 300).map { i =>
      val a = 2.0f + (i % 7) * 0.5f // dominant coefficient
      val n1 = ((i * 31) % 11 - 5) * 0.02f
      val n2 = ((i * 17) % 13 - 6) * 0.02f
      (i.toLong, Array(a * u(0) + 0f, a * u(1) + 0f, n1, n2))
    }.toDF("id", "vec")
  }

  test("topComponent recovers a planted direction; lambda positive") {
    val out = Pca.topComponent(planted, col("vec"), dim = 4, iters = 8)
      .orderBy("i").collect()
    val v = out.map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    assert(lambda > 0.0)
    // unit norm
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    // aligned with (0.6, 0.8, ~0, ~0) up to sign
    val cos = v(0) * 0.6 + v(1) * 0.8
    assert(math.abs(cos) > 0.999, s"direction ${v.toSeq} not aligned")
    assert(math.abs(v(2)) < 0.05 && math.abs(v(3)) < 0.05)
  }

  test("secondMoment is partitioning-invariant bit for bit") {
    val df = planted
    def m(parts: Int) = Pca.secondMoment(df.repartition(parts), col("vec"), 4)
      .orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSeq
    assert(m(2) == m(9), "decimal-routed sums must not depend on partitioning")
  }

  test("dense-buffer aggregator equals the SQL explode route bit for bit") {
    val s = spark
    import s.implicits._
    // planted data PLUS the edge rows the SQL route defines semantics
    // for: a NaN component (ANSI casts NaN → null → term skipped), a
    // null vector (explode of null → dropped), and tiny magnitudes
    // that round at scale 18
    val edge = Seq(
      (1001L, Array(Float.NaN, 1f, 2f, 3f)),
      (1004L, Array(1e-12f, 2e-12f, -3e-12f, 4e-12f)),
      (1005L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "vec")
    // a null ELEMENT (not a null array): every product touching it is
    // a null cast → skipped, on both routes
    val nullElem = s.sql(
      "SELECT 1002L AS id, array(CAST(NULL AS float), 1.0f, 2.0f, 3.0f) AS vec")
    val df = planted.unionByName(edge).unionByName(nullElem)
    def bits(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("i", "j").collect()
        .map(r => (r.getInt(0), r.getInt(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSeq
    val dense = bits(Pca.secondMoment(df, col("vec"), 4))
    val sql = bits(Pca.secondMomentExplode(df, col("vec"), 4))
    assert(dense == sql,
      "dense-buffer Gram must replay the SQL decimal route bit for bit")
    assert(dense.length == 16)

    // ANSI edge parity: finite-but-out-of-range products and short
    // vectors are ERRORS on both routes (ANSI cast / element_at)
    for (bad <- Seq(Array(Float.MaxValue, Float.MaxValue, 1f, 1f),
                    Array(5f, 6f))) {
      val b = planted.unionByName(Seq((2000L, bad)).toDF("id", "vec"))
      intercept[Exception] { Pca.secondMoment(b, col("vec"), 4).collect() }
      intercept[Exception] { Pca.secondMomentExplode(b, col("vec"), 4).collect() }
    }
  }

  test("projectOut: residuals orthogonal to the component, norm shrinks") {
    val df = planted
    val comp = Pca.topComponent(df, col("vec"), dim = 4, iters = 8)
      .orderBy("i").collect().map(_.getDouble(1))
    val res = df.select(col("id"), Pca.projectOut(col("vec"), comp).as("r"),
        col("vec"))
      .collect()
    res.foreach { r =>
      val x = r.getSeq[Float](2).map(_.toDouble)
      val p = r.getSeq[Double](1)
      val dot = p.zip(comp).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-9, s"residual not orthogonal: $dot")
      val xn = x.map(a => a * a).sum
      val pn = p.map(a => a * a).sum
      assert(pn <= xn + 1e-12, "projection must not grow the norm")
    }
  }
}
