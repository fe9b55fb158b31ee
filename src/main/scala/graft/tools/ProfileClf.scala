package graft.tools

import graft.operators.Classifier
import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: break down Classifier.train cost (setup vs
  * per-iteration) at a given SF. */
object ProfileClf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm tables
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CLFPROF $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // dump the per-iteration gradient plan (window + agg over the cache)
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 18)
      val feats = docs
        .select(col("doc_id").as("__id"),
          (col("lang") === "en").cast("double").as("__y"),
          graft.expressions.TextKernels.gramBucketCountsMd5(
            coalesce(split(lower(col("text")), "\\s+"),
              array().cast("array<string>")), 64).as("__p"))
        .repartition(col("__id"))
        .select(col("__id"), col("__y"), explode(col("__p")).as("__e"))
        .select(col("__id"), col("__y"),
          col("__e.b").as("__b"), col("__e.c").as("__c"))
        .sortWithinPartitions("__id")
        .persist()
      feats.count()
      val wl = lit(Array.fill(65)(0.01))
      val win = Window.partitionBy("__id")
      val grad = feats
        .withColumn("__z",
          sum((col("__c") * element_at(wl, col("__b") + 1)).cast(dec))
            .over(win).cast("double"))
        .select(col("__b"),
          ((greatest(lit(0.0), least(lit(1.0),
            lit(0.5) + col("__z") * lit(0.25))) - col("__y")) * col("__c"))
            .as("__g"))
        .groupBy("__b").agg(sum(col("__g").cast(dec)).cast("double").as("__g"))
      println("=== iteration plan ===")
      println(grad.queryExecution.executedPlan.toString.take(3000))
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        grad.collect()
        println(f"CLFPROF iter-job $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      feats.unpersist()
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      t("gramBuckets-scan") {
        docs.select(Classifier.gramBuckets(col("text"), 64).as("b"))
          .select(sum(size(col("b")))).head
      }
      t("train-iters1") {
        Classifier.train(docs, "doc_id", "text", col("lang") === "en",
          64, 1, 0.5)
      }
      t("train-iters4") {
        Classifier.train(docs, "doc_id", "text", col("lang") === "en",
          64, 4, 0.5)
      }
      t("train-iters8") {
        Classifier.train(docs, "doc_id", "text", col("lang") === "en",
          64, 8, 0.5)
      }
      t("hashedLinearLogit-score") {
        docs.select(graft.functions.TextFunctions.hashedLinearLogit(
          col("text"), 64, Array.fill(64)(0.01).toSeq, 0.0).as("l"))
          .select(sum(col("l"))).head
      }
    }
    spark.stop()
  }
}
