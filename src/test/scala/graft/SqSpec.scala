package graft

import graft.operators.{Search, Sq}
import org.apache.spark.sql.functions._

class SqSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int, seed: Int = 7) = {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(r.nextFloat() * 4f - 2f)))
      .toDF("id", "embedding")
  }

  test("train: exact per-dim min/max, partitioning-invariant") {
    val df = vecs(200, 8)
    val m1 = Sq.train(df, "embedding")
    val m2 = Sq.train(df.repartition(13), "embedding")
    assert(m1.vmin.toSeq == m2.vmin.toSeq && m1.vdiff.toSeq == m2.vdiff.toSeq)
    assert(m1.dim == 8 && m1.vdiff.forall(_ > 0))
  }

  test("encode: codes in [0,255], grid endpoints hit exactly") {
    val df = vecs(100, 4)
    val m = Sq.train(df, "embedding")
    val codes = Sq.encode(df, "embedding", m).select("sq_code")
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x <= 255)))
    // every dim's min maps to 0 and max to 255 somewhere in the corpus
    (0 until 4).foreach { i =>
      assert(codes.exists(_(i) == 0), s"dim $i never hits code 0")
      assert(codes.exists(_(i) == 255), s"dim $i never hits code 255")
    }
  }

  test("encode: constant dimension encodes 0, no NaN poisoning") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, Seq(1f, 5f)), (1L, Seq(1f, 7f))).toDF("id", "embedding")
    val m = Sq.train(df, "embedding")
    assert(m.vdiff(0) == 0.0)
    val codes = Sq.encode(df, "embedding", m).select("sq_code")
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(_(0) == 0))
    assert(codes.map(_(1)).sorted.toSeq == Seq(0, 255))
  }

  test("encode clamps out-of-range vectors instead of wrapping") {
    val s = spark
    import s.implicits._
    val train = Seq((0L, Seq(0f)), (1L, Seq(1f))).toDF("id", "embedding")
    val m = Sq.train(train, "embedding")
    val wild = Seq((2L, Seq(-5f)), (3L, Seq(9f))).toDF("id", "embedding")
    val codes = Sq.encode(wild, "embedding", m).select("sq_code")
      .collect().map(_.getSeq[Int](0).head).sorted.toSeq
    assert(codes == Seq(0, 255))
  }

  test("ADC distance error is bounded by the grid pitch") {
    val df = vecs(300, 16)
    val m = Sq.train(df, "embedding")
    val q = Seq.fill(16)(0.5f)
    val adc = Sq.adcSearch(Sq.encode(df, "embedding", m), "id", "sq_code",
        m, q, k = 300)
      .select("id", "dist")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = Search.knnExact(df, "id", "embedding", q, k = 300)
      .select("id", "dist")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // per-dim reconstruction error ≤ pitch/2 = vdiff/510 → L2 error
    // ≤ sqrt(Σ (vdiff_i/510)²)
    val bound = math.sqrt(m.vdiff.map(d => (d / 510.0) * (d / 510.0)).sum)
    exact.foreach { case (id, d) =>
      assert(math.abs(adc(id) - d) <= bound + 1e-9,
        s"id $id: adc=${adc(id)} exact=$d bound=$bound")
    }
  }

  test("ADC top-10 recall vs exact kNN clears the reference bar") {
    val df = vecs(500, 32)
    val m = Sq.train(df, "embedding")
    val enc = Sq.encode(df, "embedding", m)
    val r = new scala.util.Random(99)
    val recalls = (1 to 10).map { _ =>
      val q = Seq.fill(32)(r.nextFloat() * 4f - 2f)
      val approx = Sq.adcSearch(enc, "id", "sq_code", m, q, 10)
        .select("id").collect().map(_.getLong(0)).toSet
      val exact = Search.knnExact(df, "id", "embedding", q, 10)
        .select("id").collect().map(_.getLong(0)).toSet
      approx.intersect(exact).size / 10.0
    }
    // 8-bit grids reconstruct far better than PQ — expect near-perfect
    assert(recalls.count(_ >= 0.7) >= 8, s"recalls: $recalls")
  }

  test("model persistence round-trips") {
    val df = vecs(50, 6)
    val m = Sq.train(df, "embedding")
    val dir = java.nio.file.Files.createTempDirectory("sq").toString + "/model"
    Sq.save(m, dir, spark)
    val m2 = Sq.load(spark, dir)
    assert(m2.vmin.toSeq == m.vmin.toSeq && m2.vdiff.toSeq == m.vdiff.toSeq)
  }
}
