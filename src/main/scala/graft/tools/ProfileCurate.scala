package graft.tools

import graft.core.Tables
import graft.operators.{Curation, Export}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: stage-by-stage cost of the curation pipelines. */
object ProfileCurate {
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
    docs.count() // warm
    def t[A](name: String)(f: => A): Unit = {
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime(); f
        println(f"CURPROF $name run$run: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    t("scan_only")(docs.agg(count(lit(1))).head)
    t("gopher_gate")(docs.filter(Curation.gopherPass(col("text"),
      minWords = 30L, maxWords = 90L, minStopHits = 1L))
      .agg(count(lit(1))).head)
    val gated = docs.filter(Curation.gopherPass(col("text"),
      minWords = 30L, maxWords = 90L, minStopHits = 1L))
    t("word_windows")(gated.select(Curation.wordWindows(col("text"), 8))
      .agg(count(lit(1))).head)
    val cleaned = Curation.c4CleanLines(gated, "doc_id",
        Curation.wordWindows(col("text"), 8), minWords = 5,
        requirePunct = false)
      .filter(!col("doc_dropped") && col("n_kept") > 0)
      .select(col("doc_id"), col("text_clean"))
    t("c4_clean")(cleaned.agg(count(lit(1))).head)
    val deduped = Curation.globalLineDedup(cleaned, "doc_id",
        split(col("text_clean"), "\n"))
      .filter(col("n_kept") > 0)
    t("line_dedup")(deduped.agg(count(lit(1))).head)
    t("manifest")(Export.manifest(deduped, "doc_id", "text_dedup",
      length(col("text_dedup")), nShards = 4).orderBy("shard").count())
    spark.stop()
  }
}
