package graft

import graft.operators.{Dedup, Ivf, Pq, Search}
import org.apache.spark.sql.functions._

/** Scale probe: synthesizes a 1M-row x 64-dim vector table and times the
  * core operators — evidence for the 100x-scale-up claims (run manually;
  * not part of the driver contract). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"/tmp/graft_scale_$n"
    // deterministic pseudo-random embeddings from hash mixing
    spark.range(n).select(col("id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(xxhash64(col("id") * 64 + i), lit(10000)) / 10000.0).cast("float"))
          .as("embedding"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val q = df.filter(col("id") === 0).select("embedding").head.getSeq[Float](0).toSeq

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$r)")
    }

    t("exact_knn_top10")(Search.knnExact(df, "id", "embedding", q, 10).count())
    var model: Ivf.Model = null
    t("ivf_build_k64") { val (a, m) = Ivf.build(df, "embedding", 64); model = m; a.count() }
    val assigned = Ivf.assign(df, model)
    t("ivf_search_probe4")(Ivf.search(assigned, model, "id", q, 4, 10).count())
    var cb: Pq.Codebook = null
    t("pq_train_8x256") { cb = Pq.train(df, "embedding", 64, 8, 256); cb.k.toLong }
    t("pq_encode_1M")(Pq.encode(df, "embedding", cb).agg(sum(element_at(col("pq_code"), 1))).count())
    t("pq_adc_top10")(Pq.adcSearch(Pq.encode(df, "embedding", cb), "id", "pq_code", cb, q, 10).count())
    spark.stop()
  }
}
