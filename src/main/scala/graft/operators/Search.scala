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

  /** O2 variant: radius (range) search — every row within `radius` L2
    * distance of the query, unordered (callers sort or aggregate; the
    * result size is data-dependent, so no TakeOrdered shortcut exists
    * and imposing a global sort here would force a range-partition
    * exchange on pipelines that only count or join the matches). The
    * range_search companion to top-k that the public ANN stacks pair
    * with it — engine extension; the reference is top-k only. Per-row
    * scan + filter: no shuffle at any scale. */
  def rangeSearch(
      df: DataFrame,
      idCol: String,
      embCol: String,
      query: Seq[Float],
      radius: Double,
      filter: Option[Column] = None): DataFrame = {
    require(radius >= 0, s"radius must be non-negative, got $radius")
    val q = lit(query.toArray)
    val base = filter.fold(df)(df.filter)
    base
      .withColumn("dist", l2(col(embCol), q))
      .filter(col("dist") <= radius)
  }

  /** Conjunctive metadata equality filter — the reference's only
    * predicate form (`storage_service.py:118-128`: every (k,v) must
    * match; missing key ⇒ no match). On a MapType metadata column the
    * null-safe equality makes "missing key" behave as no-match. */
  def metadataFilter(metadataCol: Column, preds: Map[String, String]): Column =
    preds.foldLeft(lit(true)) { case (acc, (k, v)) =>
      acc && metadataCol.getItem(k) <=> lit(v)
    }

  /** Conjunctive equality filter over the raw-fidelity `metadata_json`
    * column (SURVEY §1.2): keys are JSON paths (`label`, `tags[0]`,
    * `a.b` — a leading `$.` is added when absent), values compare
    * against `get_json_object`'s string rendering, so an int value
    * matches `"3"`, a list element `tags[1]` matches its scalar, and a
    * whole list matches its compact JSON text. Missing path ⇒ null ⇒
    * no match — the reference's filter semantics
    * (`storage_service.py:118-128`) extended to non-string values
    * (`tests/integration/test_embed_api.py:153-160` stores int + list).
    * Codegen'd (`GetJsonObject` is a native expression); at 100 TB the
    * filter rides the scan like any other predicate. */
  def metadataJsonFilter(jsonCol: Column, preds: Map[String, String]): Column =
    preds.foldLeft(lit(true)) { case (acc, (path, v)) =>
      val p = if (path.startsWith("$")) path else "$." + path
      acc && get_json_object(jsonCol, p) <=> lit(v)
    }

  /** Batch kNN: for every query row, the top-k nearest base rows.
    * queries is expected small relative to base (broadcast side).
    * Result: one row per (query_id, neighbor) with rank 1..k.
    *
    * Scale: base stays partitioned as-read; queries broadcast; the
    * bounded-heap TopK aggregator gets map-side partial aggregation, so
    * the shuffle carries ≤ k candidates per (query, partition) — never
    * the |base|·|q| candidate set (a window would shuffle it all).
    */
  def knnJoin(
      base: DataFrame,
      baseId: String,
      baseEmb: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      k: Int): DataFrame = {
    val cand = base.crossJoin(
        broadcast(queries.select(col(queryId).as("query_id"), col(queryEmb).as("__q"))))
      .select(col("query_id"), col(baseId).as("neighbor_id"),
        l2(col(baseEmb), col("__q")).as("dist"))
    groupedTopK(cand, k)
  }

  /** IVF-bucketed batch kNN — the 100 TB path: each query only scans its
    * nProbe nearest clusters (partition pruning on a cluster-partitioned
    * base). Same output contract as knnJoin; approximate with the usual
    * IVF recall trade (exhaustive when nProbe = model.k). */
  def knnJoinIvf(
      assignedBase: DataFrame,
      model: Ivf.Model,
      baseId: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      k: Int,
      nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= model.k,
      s"n_probe must be between 1 and ${model.k}, got $nProbe")
    import graft.expressions.FloatKernels
    // rank centroids per query row: array_sort over (dist, cid) structs
    val centDists = array(model.centroids.zipWithIndex.map { case (c, j) =>
      struct(FloatKernels.l2Sq(col("__q"), typedLit(c.toSeq)).as("d"),
        lit(j).as("cid"))
    }: _*)
    val probed = queries
      .select(col(queryId).as("query_id"), col(queryEmb).as("__q"))
      .withColumn("__probes",
        transform(slice(array_sort(centDists), 1, nProbe), s => s.getField("cid")))
      .withColumn(Ivf.ClusterCol, explode(col("__probes")))
      .drop("__probes")
    val cand = assignedBase.join(broadcast(probed), Seq(Ivf.ClusterCol))
      .select(col("query_id"), col(baseId).as("neighbor_id"),
        l2(col(model.embCol), col("__q")).as("dist"))
    groupedTopK(cand, k)
  }

  /** Per-query top-k reduction via the bounded-heap aggregator. */
  private def groupedTopK(cand: DataFrame, k: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    cand.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.topK(k))
      .flatMap { case (qid, cands) =>
        cands.iterator.zipWithIndex.map { case ((id, d), i) => (qid, id, d, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "dist", "rank")
  }
}
