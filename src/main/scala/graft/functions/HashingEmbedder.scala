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
  * Scale: a per-row codegen fold ([[graft.expressions.CountEmbedUtil]])
  * computes each row's vector INSIDE the scan — zero exchange at any
  * corpus size. (The previous explode → typed-Aggregator formulation
  * shuffled one (id, bucket) row per corpus token — measured as
  * `pipeline_rag`'s 10M variance source, 94.9–128.9 s run to run, and
  * dominated the chunk-embed path; the signed counts are exact
  * integers, so the per-row fold is bit-identical to any aggregation
  * order and every oracle replay is unchanged.) */
object HashingEmbedder {

  val DefaultDim = 64

  /** Shared token prep: lowercase, whitespace-split. Empty tokens are
    * skipped inside the kernels (the old explode path filtered them);
    * null text rows fall to the zero-vector coalesce. */
  private def toks(textCol: String): Column = split(lower(col(textCol)), "\\s+")

  private def withEmbedding(df: DataFrame, vec: Column, dim: Int,
                            outCol: String): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    // zero-vector fallback: null-text rows keep a well-defined embedding
    df.withColumn(outCol, coalesce(vec, typedLit(Seq.fill(dim)(0.0f))))
  }

  /** E2 batch path: adds `embedding` (array<float>, length dim) — the
    * xxhash64 bucket/sign variant, L2-normalized. One codegen call per
    * row; no explode, no shuffle, no driver state. `idCol` is unused
    * (kept for source compatibility with the former join-back shape). */
  def embed(df: DataFrame, idCol: String, textCol: String,
            dim: Int = DefaultDim, outCol: String = "embedding"): DataFrame =
    withEmbedding(df,
      graft.expressions.TextKernels.xxCountEmbed(toks(textCol), dim,
        normalize = true), dim, outCol)

  /** md5-variant UNNORMALIZED signed-count embedding: bucket = (64-bit
    * int of the first 8 hex chars of md5(token)) mod dim, sign = parity
    * of the 9th hex nibble — every step exists identically in ANSI-ish
    * SQL, and the raw counts are exact small integers, so any arithmetic
    * over them (dots, norms, cosine) is order-independent and
    * oracle-checkable bit-for-bit. Cosine over the raw counts equals
    * cosine over the normalized vectors mathematically AND avoids the
    * float-rounding of the normalized components. */
  /** md5 token → (bucket, sign) column pair — the cross-engine hash
    * core of [[embedMd5Counts]], exposed so other md5-count consumers
    * (e.g. [[graft.operators.MultiVec]]) can't drift from it. */
  def md5BucketSignCols(tok: org.apache.spark.sql.Column, dim: Int)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val digest = md5(tok)
    ((conv(substring(digest, 1, 8), 16, 10).cast("long") % dim).cast("int"),
      when(conv(substring(digest, 9, 1), 16, 10).cast("int") % 2 === 0, lit(1.0))
        .otherwise(lit(-1.0)))
  }

  def embedMd5Counts(df: DataFrame, idCol: String, textCol: String,
                     dim: Int = DefaultDim, outCol: String = "embedding"): DataFrame =
    withEmbedding(df,
      graft.expressions.TextKernels.md5CountEmbed(toks(textCol), dim,
        normalize = false), dim, outCol)

  /** md5-variant NORMALIZED embedding — the production [[embed]] shape
    * (signed counts, L2-normalized, float32 components) with the
    * cross-engine md5 hash: every component is c/sqrt(Σc²), one
    * correctly-rounded double division + one double→float rounding from
    * exact integers, so the embedding — and anything folded over it in
    * array order — is oracle-checkable bit-for-bit. */
  def embedMd5Normalized(df: DataFrame, idCol: String, textCol: String,
                         dim: Int = DefaultDim, outCol: String = "embedding"): DataFrame =
    withEmbedding(df,
      graft.expressions.TextKernels.md5CountEmbed(toks(textCol), dim,
        normalize = true), dim, outCol)

  /** Driver-side twin of [[embedMd5Normalized]] for a single text —
    * identical arithmetic to DenseVecAgg.finish (sqrt of the exact
    * integer norm², per-component divide, round to float). */
  def md5NormalizedLocal(text: String, dim: Int = DefaultDim): Array[Float] = {
    val c = md5CountsLocal(text, dim)
    var s = 0.0
    c.foreach(v => s += v * v)
    val n = if (s == 0.0) 1.0 else math.sqrt(s)
    c.map(v => (v / n).toFloat)
  }

  /** Driver-side twin of [[embedMd5Counts]]'s per-token hash — shared
    * with the oracle-SQL generator so engine and oracle can't drift. */
  def md5BucketSign(token: String, dim: Int): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % dim).toInt
    val sign = if (Character.digit(hex.charAt(8), 16) % 2 == 0) 1 else -1
    (bucket, sign)
  }

  /** Driver-side md5-variant count vector of one text (query embedding
    * for [[embedMd5Counts]] corpora; exact integers). */
  def md5CountsLocal(text: String, dim: Int = DefaultDim): Array[Double] = {
    val out = new Array[Double](dim)
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { t =>
      val (b, s) = md5BucketSign(t, dim)
      out(b) += s
    }
    out
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
