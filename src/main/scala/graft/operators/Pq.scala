package graft.operators

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

  /** Default train-sample bound (see Ivf.DefaultSampleSize). */
  val DefaultSampleSize = 100000

  /** B8: train per-chunk codebooks on a bounded sample with seeded local
    * Lloyd's — one distributed sample collect, then pure CPU across
    * chunks in parallel threads (the analog of the reference's process
    * pool, pq.py:64-75). Sample-based codebook training is the standard
    * PQ scale path; encode stays fully distributed. */
  def train(df: DataFrame, embCol: String, dim: Int, chunks: Int, k: Int,
            seed: Long = 42L, maxIter: Int = 100,
            sampleSize: Int = DefaultSampleSize): Codebook = {
    val subDim = validate(dim, chunks)
    // unbiased seeded sample (see Ivf.trainingSample — a bare limit()
    // would train codebooks on the physical head of an ordered corpus)
    val sample = Ivf.trainingSample(df, embCol, sampleSize, seed)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futures = (0 until chunks).map { c => Future {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, c * subDim, (c + 1) * subDim))
      graft.core.LocalKMeans.fit(sub, k, maxIter, seed + c)
    } }
    Codebook(Await.result(Future.sequence(futures), Duration.Inf).toArray)
  }

  /** B9: encode — `pq_code` column of per-chunk argmin centroid indices
    * (first-match tie-break = numpy argmin). One codegen'd
    * NearestCentroid kernel per chunk, reading the chunk's slice
    * in-place (no array copies). */
  def encodeColumn(embCol: Column, cb: Codebook): Column =
    array((0 until cb.chunks).map { c =>
      graft.expressions.FloatKernels.nearestCentroid(
        embCol, cb.centroids(c), offset = c * cb.subDim)
    }: _*)

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
    val table: Array[Array[Double]] = (0 until cb.chunks).map { c =>
      val qSub = query.slice(c * cb.subDim, (c + 1) * cb.subDim)
      cb.centroids(c).map { cent =>
        cent.zip(qSub).map { case (x, y) =>
          (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
        }.sum
      }
    }.toArray
    // codegen table-lookup fold (the zip_with/aggregate HOF form is
    // CodegenFallback — interpreted dispatch per row dominated the
    // 1M-row scale probe)
    sqrt(graft.expressions.FloatKernels.adcLookup(codeCol, table))
  }

  /** Approximate top-k via ADC over encoded rows. */
  def adcSearch(encoded: DataFrame, idCol: String, codeCol: String,
                cb: Codebook, query: Seq[Float], k: Int): DataFrame =
    encoded.withColumn("dist", adcDistanceColumn(col(codeCol), cb, query))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)

  /** Measured anchor for the default rerank window (ScaleProbe
    * `pq_recall_sweep`, 8×256 codebook on the uniform-random worst
    * case, yardstick ≥0.6@10 on ≥7/10 queries): PURE ADC fails the
    * gate at corpus scale — 0/10 at both 1M and 10M — because the
    * quantization error reaches the final ranking; an exact rerank of
    * the ⌈√N⌉-row ADC shortlist scores 10/10 at BOTH tiers (1M →
    * w=1000, 10M → w=3162; √N/3 is the 9/10 edge at 1M and 6/10 at
    * 10M). A tighter ranker than BQ's 64-bit Hamming (whose margin
    * needs 3·√N), hence the smaller factor. */
  val RerankScaleFactor: Double = 1.0

  /** Scale the exact-rerank window with corpus size: max(3·k, ⌈√n⌉).
    * Callers that set a window explicitly pass it through unscaled. */
  def scaledRerank(k: Int, n: Long,
                   factor: Double = RerankScaleFactor): Int =
    math.max(3 * k,
      math.ceil(factor * math.sqrt(math.max(n, 0L).toDouble)).toInt)

  /** Two-stage PQ search: ADC top-`rerank` shortlist, then exact L2
    * rerank of the survivors to top-k — the same screen-then-rerank
    * shape as [[Bq.rerankSearch]] and the IvfPq rerank stage, closing
    * the quantization error on the final ranking while the corpus scan
    * still reads only codes. `encoded` must retain the float `embCol`
    * alongside the code (when codes are persisted WITHOUT floats —
    * the 32× storage win — fetch the shortlist's vectors with a
    * point-join first, as `VectorStore.searchIvfPq` does). Output
    * `dist` is the EXACT distance; the screen's ADC distance rides
    * along as `dist_adc`. */
  def adcRerankSearch(encoded: DataFrame, idCol: String, codeCol: String,
                      embCol: String, cb: Codebook, query: Seq[Float],
                      k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank window $rerank smaller than k=$k")
    adcSearch(encoded, idCol, codeCol, cb, query, rerank)
      .withColumnRenamed("dist", "dist_adc")
      .withColumn("dist",
        graft.functions.VectorFunctions.l2(col(embCol), lit(query.toArray)))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** B11: codebook persistence — parquet round-trip of the chunks×k×subdim
    * centroid tensor (the engine's analog of the reference's pickled
    * service-held centroids, inference_service pattern / ivf.py:217-241). */
  def save(cb: Codebook, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    cb.centroids.zipWithIndex.flatMap { case (cents, c) =>
      cents.zipWithIndex.map { case (cent, i) => (c, i, cent.toSeq) }
    }.toSeq.toDF("chunk", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Codebook = {
    val rows = spark.read.parquet(path)
      .orderBy("chunk", "centroid_id").collect()
    val byChunk = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
    Codebook(byChunk.map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)
    }.toArray)
  }
}
