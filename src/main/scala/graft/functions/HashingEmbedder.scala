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

  /** E2 batch path: adds `embedding` (array<float>, length dim). */
  def embed(df: DataFrame, idCol: String, textCol: String,
            dim: Int = DefaultDim, outCol: String = "embedding"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val tok = explode(split(lower(col(textCol)), "\\s+"))
    val bucketed = df
      .select(col(idCol).as("__eid"), tok.as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col("__eid"),
        pmod(xxhash64(col("__tok")), lit(dim)).cast("int").as("__bucket"),
        when(pmod(xxhash64(concat(lit("sign|"), col("__tok"))), lit(2)) === 0, lit(1.0))
          .otherwise(lit(-1.0)).as("__sign"))
      .groupBy("__eid", "__bucket").agg(sum(col("__sign")).as("__v"))
      .groupBy("__eid")
      .agg(map_from_entries(collect_list(struct(col("__bucket"), col("__v")))).as("__m"))
    val dense = transform(sequence(lit(0), lit(dim - 1)),
      i => coalesce(element_at(col("__m"), i), lit(0.0)))
    val withVec = bucketed.withColumn("__dense", dense)
      .withColumn("__norm", sqrt(aggregate(col("__dense"), lit(0.0), (a, v) => a + v * v)))
      .withColumn(outCol, transform(col("__dense"),
        v => (v / when(col("__norm") === 0.0, lit(1.0)).otherwise(col("__norm"))).cast("float")))
      .select(col("__eid").as(idCol), col(outCol))
    df.join(withVec, idCol)
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
