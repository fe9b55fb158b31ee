package graft.tools

import graft.operators.Search
import org.apache.spark.sql.functions._

/** Isolate the 1M x 100-query kNN join cost. */
object ProfileKnnJoin {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/tmp/graft_scale_1000000")
    df.agg(sum(element_at(col("embedding"), 1))).count()
    val queries = df.filter(col("id") < 100)
      .select(col("id").as("qid"), col("embedding").as("qemb"))
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val n = Search.knnJoin(df, "id", "embedding", queries, "qid", "qemb", 10).count()
      println(f"PROF knn_join run$r ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    spark.stop()
  }
}
