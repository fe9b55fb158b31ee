package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("interleave matches hand-computed Morton codes (dim0 = even bits)") {
    val s = spark
    import s.implicits._
    // (x, y, morton) with x on even bit positions, y on odd
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 3L, 14L), (3L, 2L, 13L), (7L, 7L, 63L), (5L, 6L, 57L))
    val df = cases.toDF("x", "y", "expected")
    val got = df.withColumn("z",
        Layout.interleave(Seq(col("x"), col("y")), bits = 3))
      .filter(col("z") =!= col("expected")).count()
    assert(got == 0L, "Morton code mismatch")
  }

  test("bucket is exact integral arithmetic: endpoints and monotonicity") {
    val s = spark
    import s.implicits._
    val df = (0L to 100L).toDF("x")
    val b = df.select(col("x"), Layout.bucket(col("x"), 0L, 100L, 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(b.find(_._1 == 0L).get._2 == 0L)
    assert(b.find(_._1 == 100L).get._2 == 15L)
    assert(b.sortBy(_._1).map(_._2).sliding(2).forall(p => p(0) <= p(1)),
      "bucket must be monotone")
  }

  test("z-sorted quartiles of a 16x16 grid are exactly the four quadrants") {
    val s = spark
    import s.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = grid.select(col("x"), col("y"),
        Layout.zvalue(Seq(col("x"), col("y")), Seq((0L, 15L), (0L, 15L)),
          bits = 4).as("z"))
      .orderBy("z").collect()
    assert(z.length == 256)
    // the z-curve visits one quadrant fully before the next: each
    // 64-row slice is one (x-half, y-half) box — the property that
    // makes range-partitioned writes give every dim compact min/max
    z.grouped(64).foreach { q =>
      val xs = q.map(_.getLong(0)); val ys = q.map(_.getLong(1))
      assert(xs.max - xs.min == 7 && ys.max - ys.min == 7,
        s"slice spans x=[${xs.min},${xs.max}] y=[${ys.min},${ys.max}], " +
          "expected an 8x8 quadrant")
    }
  }

  test("zorderBy partitions cover disjoint ordered z-intervals (zone-map contract)") {
    val s = spark
    import s.implicits._
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y").repartition(8) // scrambled input
    val laid = Layout.zorderBy(grid, Seq(col("x"), col("y")), bits = 5,
      numFiles = 4)
    val zIdx = laid.schema.fieldIndex("zval")
    // per output partition (≈ output file): rows sorted, z-intervals
    // disjoint and ordered — each written file gets a compact z min/max,
    // which is what zone-map skipping prunes on
    val ranges = laid.rdd.mapPartitionsWithIndex { (pid, it) =>
      val zs = it.map(_.getLong(zIdx)).toSeq
      if (zs.isEmpty) Iterator.empty
      else {
        assert(zs.sliding(2).forall(p => p.size < 2 || p(0) <= p(1)),
          s"partition $pid not sorted by z")
        Iterator((pid, zs.min, zs.max, zs.size))
      }
    }.collect().sortBy(_._1)
    assert(ranges.map(_._4.toLong).sum == 1024L)
    assert(ranges.length > 1, "range partitioning must actually split")
    ranges.sliding(2).foreach { case Array((_, _, hi, _), (p, lo, _, _)) =>
      assert(hi <= lo, s"partition $p overlaps the previous z-interval")
    case _ => ()
    }
  }

  test("overflow guard rejects ranges too wide for exact bucketing") {
    val s = spark
    import s.implicits._
    val df = Seq(0L, Long.MaxValue / 2).toDF("x")
    intercept[IllegalArgumentException] {
      Layout.zorderBy(df, Seq(col("x")), bits = 16, numFiles = 2)
    }
  }
}
