package graft.tools

import graft.core.Tables
import graft.functions.HashingEmbedder
import graft.operators.Search
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose e2_embed_search cost. */
object ProfileE2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $label run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    time("embed_only") {
      HashingEmbedder.embed(docs, "doc_id", "text", dim = 64).count()
    }
    time("embed_text_1row") {
      HashingEmbedder.embedText(spark, "spark table scan fast query", dim = 64).length.toLong
    }
    val q = HashingEmbedder.embedText(spark, "spark table scan fast query", dim = 64)
    time("embed_plus_dist") {
      HashingEmbedder.embed(docs, "doc_id", "text", dim = 64)
        .withColumn("dist", graft.functions.VectorFunctions.cosineDistance(col("embedding"), lit(q)))
        .filter(col("dist") >= -1).count()
    }
    time("embed_plus_knn") {
      Search.knnCosine(HashingEmbedder.embed(docs, "doc_id", "text", dim = 64),
        "doc_id", "embedding", q.toSeq, 10).count()
    }
    spark.stop()
  }
}
