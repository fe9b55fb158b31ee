package graft

import graft.operators.{Ivf, Search}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-plan contracts: the scale properties the operators claim
  * must be visible in the plans Catalyst actually produces. */
class PlanSpec extends SparkSpec {

  test("IVF search over a partitioned table prunes partitions at the scan") {
    val data = corpus(100, 8)
    val dir = Files.createTempDirectory("ivfplan").toString + "/t"
    val (assigned, model) = Ivf.build(toDF(data), "embedding", 4)
    Ivf.writePartitioned(assigned, dir)
    val table = spark.read.parquet(dir)
    val plan = Ivf.search(table, model, "id", data.head._2.toSeq, nProbe = 2, topK = 5)
      .queryExecution.executedPlan.toString
    // partition pruning: cluster_id is a partition column and the filter
    // must land in PartitionFilters, not a post-scan Filter
    assert(plan.contains("PartitionFilters: [cluster_id"),
      s"expected partition pruning on cluster_id, plan:\n$plan")
  }

  test("exact kNN plans as TakeOrderedAndProject (no global sort)") {
    val plan = Search.knnExact(toDF(corpus(50, 8)), "id", "embedding",
      corpus(1, 8).head._2.toSeq, 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Sort ["), s"unexpected global sort in:\n$plan")
  }

  test("metadata filter on a parquet table is pushed into the scan") {
    val dir = Files.createTempDirectory("pushdown").toString + "/t"
    val s = spark
    import s.implicits._
    corpus(50, 4).map { case (i, v) => (i, v, (i % 3).toString) }
      .toDF("id", "embedding", "label").write.parquet(dir)
    val plan = Search.knnExact(s.read.parquet(dir), "id", "embedding",
      Seq(0f, 0f, 0f, 0f), 5, Some(col("label") === "1"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,1)]"),
      s"filter not pushed to parquet scan:\n$plan")
  }
}
