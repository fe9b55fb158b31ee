package graft.tools

import org.apache.spark.sql.functions._

/** Isolate boilerplate-removal and LM-scoring cost at 1M synthetic docs
  * (dev tool; prints the aggregates so nothing can be pruned away). */
object ProfileTextOps {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.range(n).select(col("id"),
      concat_ws(" ", (0 until 8).map(j =>
        pmod(xxhash64(col("id") * 8 + j), lit(5000)).cast("string")): _*).as("text"))
    docs.agg(sum(length(col("text")))).head // warm (head, not count —
    // count() over a global aggregate folds to a constant and runs nothing)
    (1 to 2).foreach { r =>
      var t0 = System.nanoTime()
      val lm = graft.operators.LmScore.selfScore(docs, "id", "text", minCount = 2L)
        .agg(sum(col("lm_score")), count(lit(1))).head
      println(f"PROF lm_selfscore run$r ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $lm")
      t0 = System.nanoTime()
      val bp = graft.operators.Dedup.boilerplateRemove(docs, "id", "text", " ",
          minDocFreq = n / 2)
        .agg(sum(length(col("text_clean"))), sum(col("n_removed"))).head
      println(f"PROF boilerplate  run$r ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $bp")
    }
    spark.stop()
  }
}
