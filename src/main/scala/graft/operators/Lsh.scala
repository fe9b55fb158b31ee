package graft.operators

import graft.expressions.FloatKernels
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH over embedding columns — the second ANN scale
  * path next to IVF partition pruning (SURVEY §2.1 O6), and the bucketed
  * candidate generator for embedding near-dup at corpus scale.
  *
  * Signature bit j = [dot(v, h_j) ≥ 0] for seeded Gaussian hyperplanes
  * h_j (sign-random-projection; collision probability 1 - θ/π for angle
  * θ — SimHash for vectors). Deterministic: seeded plane generation and
  * the engine-wide left-to-right double dot fold on both driver and
  * executor sides.
  *
  * Scale: signatures are one codegen'd scan (nBits dot kernels, no
  * shuffle); bucketed search prunes to the query's bucket plus 1-bit
  * multi-probe neighbors; near-dup pairing shuffles once on the bucket
  * id and never materializes cross-bucket pairs.
  */
object Lsh {

  val BucketCol = "lsh_bucket"

  case class Model(planes: Array[Array[Float]]) {
    def nBits: Int = planes.length
    def dim: Int = planes.headOption.map(_.length).getOrElse(0)
  }

  /** Seeded Gaussian hyperplanes (data-independent — no training scan). */
  def fit(dim: Int, nBits: Int, seed: Long = 42L): Model = {
    require(nBits > 0 && nBits <= 30, s"nBits must be in [1, 30], got $nBits")
    require(dim > 0, s"dim must be positive, got $dim")
    val rnd = new java.util.Random(seed)
    Model(Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  /** Signature as an int bucket id: Σ_j [dot(v, h_j) ≥ 0] << j. */
  def signatureColumn(emb: Column, model: Model): Column =
    model.planes.zipWithIndex.map { case (h, j) =>
      when(FloatKernels.dot(emb, lit(h)) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  def assign(df: DataFrame, embCol: String, model: Model): DataFrame =
    df.withColumn(BucketCol, signatureColumn(col(embCol), model))

  /** Driver-side signature of one vector — the same float→double
    * left-to-right fold as the DotFloat kernel, so a query lands in
    * exactly the bucket its row would. */
  def signature(v: Seq[Float], model: Model): Int = {
    require(v.length == model.dim,
      s"vector dim ${v.length} != model dim ${model.dim}")
    model.planes.zipWithIndex.map { case (h, j) =>
      var acc = 0.0
      var i = 0
      while (i < h.length) { acc += v(i).toDouble * h(i).toDouble; i += 1 }
      if (acc >= 0) 1 << j else 0
    }.sum
  }

  /** Approximate top-k: candidates from the query's bucket plus every
    * 1-bit-flip neighbor (multi-probe — boundary-crossing tolerance),
    * exact (dist, id) rerank on the survivors. */
  def search(assigned: DataFrame, model: Model, idCol: String, embCol: String,
             query: Seq[Float], k: Int): DataFrame = {
    val sig = signature(query, model)
    val buckets = sig +: (0 until model.nBits).map(j => sig ^ (1 << j))
    Search.knnExact(assigned.filter(col(BucketCol).isin(buckets: _*)),
      idCol, embCol, query, k)
  }

  /** Near-duplicate candidate pairs: exact cosine over same-bucket pairs
    * only (the LSH-bucketed variant of Dedup.cosineNearDupBucketed). */
  def cosineNearDupPairs(assigned: DataFrame, idCol: String, embCol: String,
                         threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val a = assigned.select(col(BucketCol), col(idCol).as("a"), col(embCol).as("ea"))
      .withColumn("__na", norm(col("ea")))
    val b = assigned.select(col(BucketCol), col(idCol).as("b"), col(embCol).as("eb"))
      .withColumn("__nb", norm(col("eb")))
    a.join(b, Seq(BucketCol))
      .filter(col("a") < col("b"))
      .withColumn("cos_sim", dot(col("ea"), col("eb")) / (col("__na") * col("__nb")))
      // zero-norm guard: NaN sorts above every double in Spark, so 0/0
      // pairs would otherwise pass any threshold
      .filter(col("__na") > 0 && col("__nb") > 0 && col("cos_sim") >= threshold)
      // each row has exactly one bucket, so same-bucket pairs are already
      // unique — no distinct() (it would add a full extra shuffle)
      .select("a", "b", "cos_sim")
  }
}
