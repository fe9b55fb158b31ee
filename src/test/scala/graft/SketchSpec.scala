package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  private def ids(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).map(i => i * 7919L % 1000003L).toDF("v")
  }

  test("sketch: bounded at k, ascending, distinct, partitioning-invariant") {
    val df = ids(5000)
    val sk = Sketch.kmvSketch(df, col("v"), 64).head.getSeq[Long](0)
    assert(sk.length == 64)
    assert(sk == sk.distinct.sorted, "sketch not ascending-distinct")
    val sk13 = Sketch.kmvSketch(df.repartition(13), col("v"), 64)
      .head.getSeq[Long](0)
    assert(sk == sk13, "sketch depends on partitioning")
  }

  test("estimate: within 25% of truth at k=256 over 10k distinct values") {
    val df = ids(10000) // 10000 distinct v values
    val est = Sketch.distinctEstimate(df, col("v"), 256)
      .head.getDouble(0)
    val truth = df.distinct().count().toDouble
    assert(math.abs(est - truth) / truth < 0.25,
      s"estimate $est vs truth $truth")
  }

  test("estimate: exact when distinct count below k") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L, 3L, 2L, 1L).toDF("v")
    val est = Sketch.distinctEstimate(df, col("v"), 256).head.getDouble(0)
    assert(est == 3.0)
  }

  test("merge: union of sketches equals sketch of union") {
    val a = ids(3000)
    val b = ids(6000) // superset value stream, heavy overlap
    val k = 128
    val skA = Sketch.kmvSketch(a, col("v"), k).head.getSeq[Long](0)
    val skB = Sketch.kmvSketch(b, col("v"), k).head.getSeq[Long](0)
    val skU = Sketch.kmvSketch(a.union(b), col("v"), k).head.getSeq[Long](0)
    assert(Sketch.mergeSketches(skA, skB, k) == skU)
    assert(Sketch.mergeSketches(skA, skB, k) ==
      Sketch.mergeSketches(skB, skA, k), "merge not commutative")
  }

  test("streaming sketch across micro-batches equals the batch sketch of all data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("kmvstream").toString
    val state = new java.util.concurrent.atomic.AtomicReference[Seq[Long]](Seq.empty)
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val k = 64

    source.addData(0L until 2000L: _*)
    Sketch.streamingDistinct(source.toDF().toDF("v"), col("v"), k,
      s"$tmp/ckpt", state).awaitTermination()
    source.addData(1000L until 4000L: _*) // overlapping second batch
    Sketch.streamingDistinct(source.toDF().toDF("v"), col("v"), k,
      s"$tmp/ckpt", state).awaitTermination()

    val batchAll = Sketch.kmvSketch((0L until 4000L).toDF("v"), col("v"), k)
      .head.getSeq[Long](0)
    assert(state.get() == batchAll,
      "streamed merge diverged from the batch sketch")
  }

  test("sampledQuantiles: close to exact, deterministic, salt redraws") {
    val s = spark
    import s.implicits._
    val df = (0L until 20000L).map(i => (i, (i % 1000).toDouble)).toDF("id", "v")
    val q = Sketch.sampledQuantiles(df, col("v"), col("id"),
      probs = Seq(0.5), fraction = 0.1).head.getDouble(0)
    assert(math.abs(q - 499.5) < 25, s"sampled median $q far from 499.5")
    val q2 = Sketch.sampledQuantiles(df.repartition(11), col("v"), col("id"),
      probs = Seq(0.5), fraction = 0.1).head.getDouble(0)
    assert(q == q2, "sampled quantile depends on partitioning")
    intercept[IllegalArgumentException] {
      Sketch.sampledQuantiles(df, col("v"), col("id"), Seq(0.5), fraction = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sketch.sampledQuantiles(df, col("v"), col("id"), Seq(1.5), fraction = 0.1)
    }
  }

  test("duplicate values never inflate the sketch") {
    val s = spark
    import s.implicits._
    val dup = (1 to 1000).map(_ => 42L).toDF("v")
    val sk = Sketch.kmvSketch(dup, col("v"), 16).head.getSeq[Long](0)
    assert(sk.length == 1)
  }
}
