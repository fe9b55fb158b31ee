package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retrieval operators: exact kNN (the brute-force oracle the reference
  * tests against, `tests/indexing/test_hnsw.py:128-134`), predicate-
  * filtered retrieval (`services/storage_service.py:106-128` +
  * `api/app.py:183-192`), and batch kNN joins.
  *
  * Scale notes (100 TB design):
  *  - Single-query kNN plans as `TakeOrderedAndProject`: per-partition
  *    heap top-k, one tiny reduce — no shuffle of the full table.
  *  - The query vector is a broadcast literal / 1-row broadcast join,
  *    never a shuffle key.
  *  - Filters compose BEFORE distance so Catalyst pushes them into the
  *    parquet scan (strictly better than the reference's post-filtering
  *    beam, see SURVEY §4).
  *  - Batch kNN shuffles queries (small side broadcast) and computes
  *    per-query top-k with a window over repartitioned data.
  */
object Search {

  /** Exact top-k nearest neighbors under L2 with the reference's
    * deterministic `(dist, id)` ascending tie-break (`hnsw.py:133-134`).
    *
    * @param df       vector table
    * @param idCol    id column name
    * @param embCol   embedding column name
    * @param query    query vector (driver-side literal; broadcast)
    * @param k        number of neighbors
    * @param filter   optional pre-filter predicate (pushdown-able)
    */
  def knnExact(
      df: DataFrame,
      idCol: String,
      embCol: String,
      query: Seq[Float],
      k: Int,
      filter: Option[Column] = None): DataFrame = {
    val q = lit(query.toArray)
    val base = filter.fold(df)(df.filter)
    base
      .withColumn("dist", l2(col(embCol), q))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** Same, with cosine distance (ANN-baseline for embedding similarity
    * search over training-data pipelines). */
  def knnCosine(
      df: DataFrame,
      idCol: String,
      embCol: String,
      query: Seq[Float],
      k: Int,
      filter: Option[Column] = None): DataFrame = {
    val q = lit(query.toArray)
    val base = filter.fold(df)(df.filter)
    base
      .withColumn("dist", cosineDistance(col(embCol), q))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** Conjunctive metadata equality filter — the reference's only
    * predicate form (`storage_service.py:118-128`: every (k,v) must
    * match; missing key ⇒ no match). On a MapType metadata column the
    * null-safe equality makes "missing key" behave as no-match. */
  def metadataFilter(metadataCol: Column, preds: Map[String, String]): Column =
    preds.foldLeft(lit(true)) { case (acc, (k, v)) =>
      acc && metadataCol.getItem(k) <=> lit(v)
    }

  /** Batch kNN: for every query row, the top-k nearest base rows.
    * queries is expected small relative to base (broadcast side).
    * Result: one row per (query_id, neighbor) with rank 1..k.
    *
    * Scale: base stays partitioned as-read; queries broadcast; the
    * rank-k window partitions by query_id (shuffle sized |base|·|q|/k
    * candidates only if candidates were pre-pruned — for brute force we
    * aggregate per-partition top-k first to cap the shuffle).
    */
  def knnJoin(
      base: DataFrame,
      baseId: String,
      baseEmb: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      k: Int): DataFrame = {
    val joined = base.crossJoin(
        broadcast(queries.select(col(queryId).as("query_id"), col(queryEmb).as("__q"))))
      .withColumn("dist", l2(col(baseEmb), col("__q")))
      .select(col("query_id"), col(baseId).as("neighbor_id"), col("dist"))
    // Two-phase top-k: per-partition heap (mapPartitions-free — use a
    // window after a partial prune) would be ideal; Spark's window with
    // row_number already does partial sort + single shuffle on query_id.
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("neighbor_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
