package graft

import graft.core.Tables
import graft.operators.{Ivf, Search}
import org.apache.spark.sql.functions._

/** Recall/latency curve for the pruned IVF search paths (run manually;
  * not part of the driver contract). For each n_probe setting, measures
  * mean recall@k vs the exact kNN answer over `nQueries` held-out query
  * vectors plus mean per-query latency — the documented evidence behind
  * COVERAGE.md's recall curve and IvfSpec's n_probe=k/2 gate (the
  * reference's acceptance style: a recall contract at a pruned setting,
  * /root/reference/tests/indexing/test_ivf.py:150-167). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val kClusters = if (args.length > 1) args(1).toInt else 16
    val topK = 10
    val nQueries = 20
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir).cache()
    val n = emb.count()
    val (assignedRaw, model) = Ivf.build(emb, "embedding", kClusters)
    val assigned = assignedRaw.cache()
    assigned.count()

    val queries = emb.orderBy(col("vec_id")).limit(nQueries)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))

    val exact: Map[Long, Set[Long]] = queries.map { case (qid, q) =>
      qid -> Search.knnExact(emb, "vec_id", "embedding", q, topK)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap

    println(f"RECALL sf_dir=$dir n=$n k_clusters=$kClusters top_k=$topK queries=$nQueries")
    println("n_probe  mean_recall  mean_latency_s")
    for (nProbe <- Seq(1, 2, 4, kClusters / 2, kClusters).distinct.sorted) {
      var recallSum = 0.0
      val t0 = System.nanoTime()
      queries.foreach { case (qid, q) =>
        val got = Ivf.search(assigned, model, "vec_id", q, nProbe, topK)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        recallSum += got.intersect(exact(qid)).size.toDouble / topK
      }
      val lat = (System.nanoTime() - t0) / 1e9 / nQueries
      println(f"$nProbe%7d  ${recallSum / nQueries}%11.3f  $lat%14.4f")
    }

    // IVF-PQ composite: ADC-only vs rerank (shortlist = 4·k) at the
    // same probe settings — the compressed-scan path's recall evidence
    val (encodedRaw, pqModel) = graft.operators.IvfPq.build(
      emb, "embedding", kClusters, chunks = 8, kCodes = 64)
    val encoded = encodedRaw.cache()
    encoded.count()
    println("IVFPQ (chunks=8 kCodes=64)")
    println("n_probe  adc_recall  rerank_recall  adc_lat_s  rerank_lat_s")
    for (nProbe <- Seq(1, 2, 4, kClusters / 2, kClusters).distinct.sorted) {
      def run(rerank: Int): (Double, Double) = {
        var recallSum = 0.0
        val t0 = System.nanoTime()
        queries.foreach { case (qid, q) =>
          val got = graft.operators.IvfPq.search(encoded, pqModel, "vec_id",
              q, nProbe, topK, rerank)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          recallSum += got.intersect(exact(qid)).size.toDouble / topK
        }
        (recallSum / nQueries, (System.nanoTime() - t0) / 1e9 / nQueries)
      }
      val (ra, la) = run(0)
      val (rr, lr) = run(10 * topK)
      println(f"$nProbe%7d  $ra%10.3f  $rr%13.3f  $la%9.4f  $lr%12.4f")
    }

    // BQ tier: 1-bit Hamming screen alone vs screen+exact-rerank at
    // growing rerank windows — recall evidence for the cheapest tier
    val bqEnc = graft.operators.Bq.encode(emb, "embedding").cache()
    bqEnc.count()
    println("BQ (1-bit sign, 64 dims -> 2 words)")
    println("rerank_window  hamming_recall  rerank_recall")
    for (window <- Seq(topK, 3 * topK, 10 * topK, 30 * topK)) {
      var hamSum = 0.0
      var rrSum = 0.0
      queries.foreach { case (qid, q) =>
        val ham = graft.operators.Bq.hammingSearch(bqEnc, "vec_id", "bq_code",
            q, topK).select("vec_id").collect().map(_.getLong(0)).toSet
        hamSum += ham.intersect(exact(qid)).size.toDouble / topK
        val rr = graft.operators.Bq.rerankSearch(bqEnc, "vec_id", "bq_code",
            "embedding", q, topK, window)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        rrSum += rr.intersect(exact(qid)).size.toDouble / topK
      }
      println(f"$window%13d  ${hamSum / nQueries}%14.3f  ${rrSum / nQueries}%13.3f")
    }
    spark.stop()
  }
}
