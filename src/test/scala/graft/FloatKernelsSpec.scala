package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** The codegen'd kernels must be BITWISE identical to the interpreted
  * higher-order-function folds (same IEEE-754 sequence) — this is what
  * licenses swapping them under the DuckDB oracle. */
class FloatKernelsSpec extends SparkSpec {

  test("kernel l2Sq/dot match the HOF fold bit-for-bit on random vectors") {
    val data = corpus(200, 64, seed = 7L)
    val df = toDF(data)
    val q = lit(data.head._2)
    val rows = df.select(
      l2Sq(col("embedding"), q).as("k_l2"),
      l2SqHof(col("embedding"), q).as("h_l2"),
      dot(col("embedding"), q).as("k_dot"),
      dotHof(col("embedding"), q).as("h_dot")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("kernels survive both codegen and interpreted eval paths") {
    val df = toDF(Seq((0L, Array(1f, 2f, 3f))))
    // force interpreted path via a plan codegen can't fuse (collect_list)
    val v = df.groupBy().agg(collect_list(col("embedding")).as("es"))
      .select(explode(col("es")).as("e"))
      .select(l2Sq(col("e"), lit(Array(0f, 0f, 0f))).as("d"))
      .head.getDouble(0)
    assert(v == 14.0)
    assert(df.select(l2Sq(col("embedding"), lit(Array(0f, 0f, 0f))))
      .head.getDouble(0) == 14.0)
  }

  test("dimension mismatch is a hard error, not a silent truncation") {
    val df = toDF(Seq((0L, Array(1f, 2f, 3f))))
    val e = intercept[Exception] {
      df.select(l2Sq(col("embedding"), lit(Array(1f, 2f)))).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("dimension mismatch"))
    // interpreted path errors identically
    val e2 = intercept[Exception] {
      df.groupBy().agg(collect_list(col("embedding")).as("es"))
        .select(explode(col("es")).as("v"))
        .select(l2Sq(col("v"), lit(Array(1f, 2f)))).collect()
    }
    assert(rootMsg(e2).contains("dimension mismatch"))
  }

  test("null array yields null distance") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, Some(Array(1f, 2f))), (1L, None))
      .toDF("id", "embedding")
    val r = df.select(col("id"), l2Sq(col("embedding"), lit(Array(1f, 2f))).as("d"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) == 0.0)
    assert(r(1).isNullAt(1))
  }
}
