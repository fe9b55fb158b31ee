package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization: split the embedding into `chunks` subvectors,
  * k-means each subspace, encode vectors as per-chunk centroid indices.
  *
  * Reference semantics (`/root/reference/src/vector_db/inference/pq.py`):
  *  - train: per-chunk k-means, parallel across chunks (`pq.py:23-75`);
  *    requires dim % chunks == 0 (`pq.py:30-31`).
  *  - compress/encode: argmin-distance centroid index per chunk, first
  *    index wins ties (numpy argmin; `pq.py:77-108`). Encode-only — the
  *    reference has no decode or ADC search; ADC top-k here is our
  *    engine's extension for memory-bounded search at scale.
  *
  * Spark design: the codebook is a small chunks×k×subdim literal
  * broadcast into codegen'd array expressions — encode and ADC are pure
  * Catalyst higher-order functions, no UDFs, no shuffle.
  */
object Pq {

  case class Codebook(centroids: Array[Array[Array[Float]]]) {
    def chunks: Int = centroids.length
    def k: Int = centroids.head.length
    def subDim: Int = centroids.head.head.length
    def dim: Int = chunks * subDim
  }

  def validate(dim: Int, chunks: Int): Int = {
    require(chunks > 0 && dim > 0, s"dim ($dim) and chunks ($chunks) must be positive")
    require(dim % chunks == 0,
      s"Embedding dimension ($dim) must be divisible by chunks ($chunks)")
    dim / chunks
  }

  /** B8: train per-chunk codebooks. Spark's scheduler supplies the
    * parallelism the reference got from a process pool (pq.py:64-75). */
  def train(df: DataFrame, embCol: String, dim: Int, chunks: Int, k: Int,
            seed: Long = 42L, maxIter: Int = 100): Codebook = {
    val subDim = validate(dim, chunks)
    val centroids = (0 until chunks).map { c =>
      val sub = df.select(
        array_to_vector(slice(col(embCol), c * subDim + 1, subDim)).as("features"))
      val km = new KMeans().setK(k).setSeed(seed + c).setMaxIter(maxIter)
        .setFeaturesCol("features").setPredictionCol("__p")
      km.fit(sub).clusterCenters.map(_.toArray.map(_.toFloat))
    }.toArray
    Codebook(centroids)
  }

  /** Squared L2 between a sub-slice column and a literal centroid array,
    * as a sequential Double fold (same discipline as VectorFunctions). */
  private def l2SqLit(subVec: Column, centroid: Column): Column =
    aggregate(
      zip_with(subVec, centroid,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** B9: encode — `pq_code` column of per-chunk argmin centroid indices
    * (first-match tie-break = numpy argmin). Pure column expression. */
  def encodeColumn(embCol: Column, cb: Codebook): Column = {
    val codes = (0 until cb.chunks).map { c =>
      val sub = slice(embCol, c * cb.subDim + 1, cb.subDim)
      val dists = transform(typedLit(cb.centroids(c).map(_.toSeq).toSeq),
        cent => l2SqLit(sub, cent))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    array(codes: _*)
  }

  def encode(df: DataFrame, embCol: String, cb: Codebook,
             codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, encodeColumn(col(embCol), cb))

  /** ADC (asymmetric distance computation) — engine extension: exact
    * per-chunk distance table from the query to every centroid is
    * precomputed driver-side (chunks×k doubles), then each row's
    * approximate distance is a table lookup + fold over its code array.
    * Scan-only, no shuffle; pairs with top-k as approximate search. */
  def adcDistanceColumn(codeCol: Column, cb: Codebook, query: Seq[Float]): Column = {
    require(query.length == cb.dim,
      s"query dim ${query.length} != codebook dim ${cb.dim}")
    val table: Seq[Seq[Double]] = (0 until cb.chunks).map { c =>
      val qSub = query.slice(c * cb.subDim, (c + 1) * cb.subDim)
      cb.centroids(c).toSeq.map { cent =>
        cent.zip(qSub).map { case (x, y) =>
          (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
        }.sum
      }
    }
    sqrt(aggregate(
      zip_with(codeCol, typedLit(table), (code, row) => element_at(row, code + 1)),
      lit(0.0), (acc, v) => acc + v))
  }

  /** Approximate top-k via ADC over encoded rows. */
  def adcSearch(encoded: DataFrame, idCol: String, codeCol: String,
                cb: Codebook, query: Seq[Float], k: Int): DataFrame =
    encoded.withColumn("dist", adcDistanceColumn(col(codeCol), cb, query))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
}
