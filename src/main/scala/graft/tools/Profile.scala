package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiling main: time named SparkEntry queries (or sub-pipelines)
  * in isolation. Usage: runMain graft.tools.Profile <sfDir> <query>...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    SparkEntry.queries("o2_knn_exact")(spark, sfDir).count()
    names.foreach { n =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $n run$run: $dt%.2f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}
