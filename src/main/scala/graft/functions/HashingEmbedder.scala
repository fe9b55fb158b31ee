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

  /** Dense signed-count buffer aggregator: one double slot per bucket,
    * map-side combined, normalized in `finish`. Buffer entries are exact
    * small integers (±1 sums), so partial-aggregation order cannot change
    * a bit of the result; the only rounding happens once, in the final
    * per-element division.
    *
    * (A previous formulation as `dim` separate `sum(when(bucket===i))`
    * aggregate columns generated multi-MB whole-stage code — 7s+ per
    * query even on one row, all codegen overhead. A single dense-buffer
    * aggregator keeps the plan O(1) in `dim`.) */
  private final class DenseVecAgg(dim: Int, normalize: Boolean = true)
      extends org.apache.spark.sql.expressions.Aggregator[(Int, Double), Array[Double], Seq[Float]] {
    override def zero: Array[Double] = new Array[Double](dim)
    override def reduce(b: Array[Double], a: (Int, Double)): Array[Double] = {
      b(a._1) += a._2; b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0; while (i < dim) { x(i) += y(i); i += 1 }; x
    }
    override def finish(b: Array[Double]): Seq[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      if (!normalize) {
        // raw signed counts — exact small integers, float-exact
        while (i < dim) { out(i) = b(i).toFloat; i += 1 }
        return out.toSeq
      }
      var s = 0.0
      while (i < dim) { s += b(i) * b(i); i += 1 }
      val n = if (s == 0.0) 1.0 else math.sqrt(s)
      i = 0
      while (i < dim) { out(i) = (b(i) / n).toFloat; i += 1 }
      out.toSeq
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
  }

  /** E2 batch path: adds `embedding` (array<float>, length dim).
    * One explode + one dense-buffer hash-aggregate — map-side combined,
    * shuffle carries one dim-length buffer per id per partition. Ids are
    * grouped by their string form (injective within a column type), so
    * any atomic id type works without lossy casts; the output keeps the
    * input's id column untouched. (The udaf-over-groupBy form of this
    * aggregator benched ~15x slower — ScalaAggregator pays per-row
    * encoder round-trips; the typed path does not.) */
  def embed(df: DataFrame, idCol: String, textCol: String,
            dim: Int = DefaultDim, outCol: String = "embedding"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val tokens = df
      .select(col(idCol).cast("string").as("__eid"),
        explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col("__eid"),
        pmod(xxhash64(col("__tok")), lit(dim)).cast("int").as("__bucket"),
        when(pmod(xxhash64(concat(lit("sign|"), col("__tok"))), lit(2)) === 0, lit(1.0))
          .otherwise(lit(-1.0)).as("__sign"))
    aggTokens(df, idCol, tokens, dim, outCol, normalize = true)
  }

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
    aggTokens(df, idCol, md5Tokens(df, idCol, textCol, dim), dim, outCol,
      normalize = false)

  /** Shared token prep for the md5-variant embedders: lowercase,
    * whitespace-split, drop empties, hash each token to (bucket, sign).
    * One definition so the normalized and raw-count embedders cannot
    * desynchronize on tokenization. */
  private def md5Tokens(df: DataFrame, idCol: String, textCol: String,
                        dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val (bucket, sign) = md5BucketSignCols(col("__tok"), dim)
    df.select(col(idCol).cast("string").as("__eid"),
        explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col("__eid"), bucket.as("__bucket"), sign.as("__sign"))
  }

  /** md5-variant NORMALIZED embedding — the production [[embed]] shape
    * (signed counts, L2-normalized, float32 components) with the
    * cross-engine md5 hash: every component is c/sqrt(Σc²), one
    * correctly-rounded double division + one double→float rounding from
    * exact integers, so the embedding — and anything folded over it in
    * array order — is oracle-checkable bit-for-bit. */
  def embedMd5Normalized(df: DataFrame, idCol: String, textCol: String,
                         dim: Int = DefaultDim, outCol: String = "embedding"): DataFrame =
    aggTokens(df, idCol, md5Tokens(df, idCol, textCol, dim), dim, outCol,
      normalize = true)

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

  private def aggTokens(df: DataFrame, idCol: String, tokens: DataFrame,
                        dim: Int, outCol: String, normalize: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withVec = tokens.as[(String, Int, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new DenseVecAgg(dim, normalize).toColumn.name("__emb"))
      .toDF("__eid", "__emb")
    // left join under an internal name, then surface as outCol — a
    // pre-existing outCol column on df is replaced, not made ambiguous.
    // Zero-vector fallback: token-less rows (empty text) keep a
    // well-defined embedding instead of silently dropping out.
    df.join(withVec, df(idCol).cast("string") === col("__eid"), "left")
      .drop("__eid")
      .withColumn(outCol, coalesce(col("__emb"), typedLit(Seq.fill(dim)(0.0f))))
      .drop("__emb")
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
