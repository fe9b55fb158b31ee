package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ composite index — the canonical billion-vector layout
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011, §IV; the FAISS `IVFPQ` shape): coarse-quantize each
  * vector to its nearest IVF centroid, then product-quantize the
  * RESIDUAL (x − centroid) instead of x itself. Residuals concentrate
  * near 0, so the same codebook budget quantizes them far more
  * accurately, and search combines IVF's partition pruning with PQ's
  * memory-bounded ADC scan:
  *
  *   probe nProbe clusters  →  per probed cluster c, precompute the ADC
  *   table of (query − centroid_c) against the residual codebook
  *   (driver-side, chunks×k doubles)  →  one codegen table-lookup fold
  *   per surviving row  →  (dist, id) top-k.
  *
  * Scale shape: the index column set is (cluster_id int, pq_code
  * array<byte-sized ints>) — 64-dim float vectors compress ~32× — and a
  * cluster-partitioned parquet table prunes to nProbe/k of the data at
  * the scan (PlanSpec's partition-pruning contract). No shuffle
  * anywhere in search; build shuffles only for the bounded training
  * samples.
  *
  * Composes [[Ivf]] (coarse level) and [[Pq]] (residual level); the
  * reference has the parts (ivf.py, pq.py) but not the composition —
  * this is the engine's scale-path extension, oracle-pinned via the
  * fixed-centroid + fixed-codebook twin (`o6_ivfpq_fixed`).
  */
object IvfPq {

  val ResidualCol = "residual"
  val CodeCol = "pq_code"

  /** `hier` carries the two-level coarse quantizer when the index was
    * built past the flat driver-fit ceiling ([[Ivf.FlatBuildMaxK]]):
    * the SEARCH side only ever needs the flat `ivf` view (probe
    * ranking + ADC tables by global centroid id), but the ENCODE side
    * must assign through the hierarchy or every ingested row pays the
    * O(k·dim) flat scan the hierarchy exists to remove. */
  final case class Model(ivf: Ivf.Model, pq: Pq.Codebook,
                         hier: Option[Ivf.HierModel] = None)

  /** x − centroid(cluster) as array<float> — float subtraction per
    * component (bit-identical to double-subtract-then-round-to-float,
    * which is how the SQL oracle spells it). */
  def residualColumn(embCol: Column, clusterCol: Column,
                     centroids: Array[Array[Float]]): Column =
    zip_with(embCol,
      element_at(typedLit(centroids.map(_.toSeq).toSeq), clusterCol + 1),
      (x, c) => x - c)

  /** Assign + residual-encode. Output drops the residual: the index
    * payload is (… input cols …, cluster_id, pq_code). */
  def encode(df: DataFrame, embCol: String, model: Model): DataFrame =
    model.hier.fold(Ivf.assign(df, model.ivf))(h => Ivf.assignHier(df, h))
      .withColumn(CodeCol,
        Pq.encodeColumn(
          residualColumn(col(embCol), col(Ivf.ClusterCol), model.ivf.centroids),
          model.pq))

  /** Train both levels: IVF coarse centroids on the vectors, PQ
    * codebook on the residuals (both on bounded unbiased samples).
    * Returns (encoded rows, model). */
  def build(df: DataFrame, embCol: String, kClusters: Int, chunks: Int,
            kCodes: Int, seed: Long = 42L,
            sampleSize: Int = Ivf.DefaultSampleSize,
            hierarchical: Option[Boolean] = None): (DataFrame, Model) = {
    // past the flat driver-fit ceiling the coarse level builds through
    // the two-level quantizer (same auto rule as VectorStore.buildIvf);
    // the residual/PQ stages are hierarchy-agnostic — they see only the
    // flat centroid view and the global cluster ids
    val useHier = hierarchical.getOrElse(kClusters > Ivf.FlatBuildMaxK)
    val (assigned, ivfM, hierM) =
      if (useHier) {
        val (a, h) = Ivf.buildHier(df, embCol, kClusters, seed,
          sampleSize = sampleSize)
        (a, h.flat, Some(h))
      } else {
        val (a, m) = Ivf.build(df, embCol, kClusters, seed,
          sampleSize = sampleSize)
        (a, m, None)
      }
    val dim = ivfM.centroids.head.length
    val withRes = assigned.withColumn(ResidualCol,
      residualColumn(col(embCol), col(Ivf.ClusterCol), ivfM.centroids))
    val pq = Pq.train(withRes, ResidualCol, dim, chunks, kCodes, seed,
      sampleSize = sampleSize)
    val model = Model(ivfM, pq, hierM)
    (withRes.withColumn(CodeCol, Pq.encodeColumn(col(ResidualCol), pq))
      .drop(ResidualCol), model)
  }

  /** Driver-side query residual against one coarse centroid — the same
    * double-subtract-then-round the row side uses. */
  private def queryResidual(query: Seq[Float], centroid: Array[Float]): Seq[Float] = {
    require(query.length == centroid.length,
      s"query dim ${query.length} != centroid dim ${centroid.length}")
    query.indices.map(i => (query(i).toDouble - centroid(i).toDouble).toFloat)
  }

  /** ADC top-k over the probed clusters: per-cluster distance tables
    * from the query's residuals, one `when` branch per probed cluster
    * dispatching to its table (nProbe branches — tiny), exact
    * (dist, id) tie-break. On a cluster-partitioned table the `isin`
    * filter is partition pruning.
    *
    * `rerank` > 0 enables the standard two-stage deployment: take a
    * `rerank`-sized ADC shortlist, then re-score it with EXACT distances
    * on the raw embedding column (which must still be present in
    * `encoded`). The shortlist is tiny (≈ a few × topK), so the exact
    * pass touches a fixed number of rows regardless of corpus size —
    * quantization error stops costing recall without giving up the
    * compressed scan. */
  def search(encoded: DataFrame, model: Model, idCol: String,
             query: Seq[Float], nProbe: Int, topK: Int,
             rerank: Int = 0, filter: Option[Column] = None): DataFrame = {
    require(rerank == 0 || rerank >= topK,
      s"rerank ($rerank) must be 0 (off) or >= topK ($topK)")
    val probed = Ivf.probeClusters(model.ivf, query, nProbe)
    val dist = probed.map { c =>
      (c, Pq.adcDistanceColumn(col(CodeCol), model.pq,
        queryResidual(query, model.ivf.centroids(c))))
    }.foldLeft(lit(null).cast("double")) { case (acc, (c, d)) =>
      when(col(Ivf.ClusterCol) === c, d).otherwise(acc)
    }
    val base = encoded.filter(col(Ivf.ClusterCol).isin(probed: _*))
    val adc = filter.fold(base)(base.filter)
      .withColumn("dist", dist)
      .orderBy(col("dist").asc, col(idCol).asc)
    if (rerank == 0) adc.limit(topK)
    else Search.knnExact(adc.limit(rerank).drop("dist"),
      idCol, model.ivf.embCol, query, topK)
  }

  /** B11 for the composite: both levels persist as parquet side tables
    * (coarse centroids via [[Ivf.save]], residual codebook via
    * [[Pq.save]]). */
  def save(model: Model, path: String): Unit = {
    model.hier match {
      case Some(h) =>
        // the child table at ivf/ stays positionally compatible with
        // the flat load; the super table rides in a sibling subdir
        Ivf.saveHier(h, s"$path/ivf", s"$path/supers")
      case None =>
        Ivf.save(model.ivf, s"$path/ivf")
        // a flat re-train over an earlier hierarchical model must not
        // leave a stale super table re-hier-ifying the next load
        val p = new org.apache.hadoop.fs.Path(s"$path/supers")
        p.getFileSystem(org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration).delete(p, true)
        ()
    }
    Pq.save(model.pq, s"$path/pq")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String,
           embCol: String): Model = {
    val supers = new org.apache.hadoop.fs.Path(s"$path/supers/_SUCCESS")
    val hasHier = supers.getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(supers)
    val hier =
      if (hasHier)
        Some(Ivf.loadHier(spark, s"$path/ivf", s"$path/supers", embCol))
      else None
    Model(Ivf.load(spark, s"$path/ivf", embCol), Pq.load(spark, s"$path/pq"),
      hier)
  }
}
