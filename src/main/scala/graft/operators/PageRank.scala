package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PageRank over an undirected pair graph (e.g. the near-duplicate
  * pair graphs [[Dedup]] emits) — fixed-iteration power method with
  * the classic damping form r' = (1−d)/n + d·Σ_in r(u)/deg(u).
  * Within a dedup cluster the highest-rank member is the most-connected
  * canonical representative — an authority-based alternative to
  * [[Dedup.keepBestInCluster]]'s quality argmax.
  *
  * Determinism: the per-node neighbor sum is routed through
  * DECIMAL(38,18) (exact, order-independent) before returning to
  * double, so ranks are bit-identical under any partitioning AND
  * reproducible by the DuckDB oracle's unrolled-iteration SQL — an
  * iterative graph computation with a hash-exact oracle.
  *
  * Scale: each iteration is one broadcast-or-shuffle join of E edges
  * with N ranks plus a grouped sum (map-side combined after the
  * decimal cast); lineage is cut per iteration (localCheckpoint, the
  * same discipline as [[Dedup.connectedComponents]]). Fixed iteration
  * count keeps the driver loop bounded.
  */
object PageRank {

  /** @param pairs undirected edges as (a, b) columns
    * @param iters fixed number of power iterations
    * @param damping classic damping factor d */
  def run(pairs: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("id")).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "PageRank over an empty pair graph")
    val nD = n.toDouble
    // every node of an undirected pair graph has deg >= 1 — no dangling
    // mass; the left join + coalesce only guards numeric edge cases.
    // edges⋈deg is loop-invariant: materialize it once rather than
    // re-running the degree aggregation + join every iteration
    val ew = edges.join(deg, "src").localCheckpoint(true)
    var ranks = nodes.withColumn("r", lit(1.0) / lit(nD))
    for (_ <- 1 to iters) {
      val contribs = ew
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), (col("r") / col("deg").cast("double")).as("c"))
      val sums = contribs.groupBy(col("dst").as("id"))
        .agg(sum(col("c").cast(DecimalType(38, 18))).cast("double").as("s"))
      ranks = nodes.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) / lit(nD) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }
}
