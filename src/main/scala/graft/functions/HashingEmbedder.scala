package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic feature-hashing text embedder — the hermetic stand-in
  * for the reference's sentence-transformers model (E1/E2,
  * `/root/reference/src/vector_db/inference/embedding.py:38-52`), which
  * cannot run in a zero-egress JVM environment. Same contract: text →
  * fixed-dim float vector, dimension validated, identical text ⇒
  * identical vector (the reference's mocked-embedder integration tests
  * rely only on those properties).
  *
  * Algorithm (feature hashing / "hashing trick"): each lowercase token
  * hashes to a bucket in [0, dim) with a ±1 sign from an independent
  * hash; the vector of signed counts is L2-normalized.
  *
  * Scale: explode → two-key aggregate → dense-ify via map lookup. One
  * shuffle on (id, bucket), map-side combined; no driver state, no UDFs.
  */
object HashingEmbedder {

  val DefaultDim = 64

  /** E2 batch path: adds `embedding` (array<float>, length dim).
    * One explode + one hash-aggregate of `dim` conditional sums — fully
    * codegen'd, map-side combined, no per-row map/array allocation. */
  def embed(df: DataFrame, idCol: String, textCol: String,
            dim: Int = DefaultDim, outCol: String = "embedding"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val tok = explode(split(lower(col(textCol)), "\\s+"))
    val tokens = df
      .select(col(idCol).as("__eid"), tok.as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col("__eid"),
        pmod(xxhash64(col("__tok")), lit(dim)).cast("int").as("__bucket"),
        when(pmod(xxhash64(concat(lit("sign|"), col("__tok"))), lit(2)) === 0, lit(1.0))
          .otherwise(lit(-1.0)).as("__sign"))
    val sums = (0 until dim).map(i =>
      sum(when(col("__bucket") === i, col("__sign")).otherwise(0.0)).as(s"__b$i"))
    val grouped = tokens.groupBy("__eid").agg(sums.head, sums.tail: _*)
    val bcols = (0 until dim).map(i => coalesce(col(s"__b$i"), lit(0.0)))
    val normE = sqrt(bcols.map(c => c * c).reduce(_ + _))
    val safeNorm = when(normE === 0.0, lit(1.0)).otherwise(normE)
    val withVec = grouped
      .withColumn(outCol, array(bcols.map(c => (c / safeNorm).cast("float")): _*))
      .select(col("__eid").as(idCol), col(outCol))
    // left join + zero-vector fallback: token-less rows (empty text) keep
    // a well-defined embedding instead of silently dropping out
    df.join(withVec, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol),
        typedLit(Seq.fill(dim)(0.0f))))
  }

  /** E1 single-text path (driver convenience; used by tests/serving). */
  def embedText(spark: org.apache.spark.sql.SparkSession, text: String,
                dim: Int = DefaultDim): Array[Float] = {
    import spark.implicits._
    val df = Seq((0L, text)).toDF("id", "text")
    embed(df, "id", "text", dim).select("embedding")
      .head.getSeq[Float](0).toArray
  }

  /** Dim validation at read-back, the reference's hard error
    * (embedding_service.py:146-149). */
  def validateDim(vec: Column, dim: Int): Column =
    when(size(vec) === dim, vec).otherwise(raise_error(
      concat(lit(s"Expected embedding dimension $dim, got "), size(vec).cast("string"))))
}
