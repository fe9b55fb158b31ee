package graft.tools

import graft.operators.Search
import org.apache.spark.sql.functions._

/** Decompose the 1M-row exact-kNN cost: scan vs distance vs top-k. */
object ProfileScan {
  def main(args: Array[String]): Unit = {
    val n = 1000000L
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/graft_scale_$n"
    val df = spark.read.parquet(dir)
    val q = df.filter(col("id") === 0).select("embedding").head.getSeq[Float](0).toSeq

    def t(name: String)(f: => Long): Unit = (1 to 2).foreach { r =>
      val t0 = System.nanoTime(); val x = f
      println(f"PROF $name run$r ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$x)")
    }
    t("count_only")(df.count())
    t("scan_arrays")(df.agg(sum(element_at(col("embedding"), 1))).count())
    t("dist_only")(df.select(graft.functions.VectorFunctions.l2Sq(col("embedding"),
      lit(q.toArray)).as("d")).agg(sum(col("d"))).count())
    t("exact_knn")(Search.knnExact(df, "id", "embedding", q, 10).count())
    println(Search.knnExact(df, "id", "embedding", q, 10).queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
