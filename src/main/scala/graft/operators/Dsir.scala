package graft.operators

import graft.expressions.FloatKernels
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that look like a target
  * domain by importance weights under hashed bag-of-n-gram language
  * models. This is the data-selection step a pretraining curation
  * pipeline runs between dedup and packing (the reference stops at the
  * store/search boundary — `/root/reference/src/vector_db/storage.py`
  * has no selection surface — but its users curate corpora on top, and
  * DSIR is the published standard for "match the target distribution").
  *
  * Model: unigram+bigram features hashed into `dim` buckets — EXACTLY
  * the [[Classifier.gramBuckets]] / `hashedLinearLogit` construction,
  * so the learned log-ratios score through the same per-row fold. With
  * add-1-smoothed bucket frequencies p̂_t (target) and p̂_r (raw), a
  * document with bucket counts n_b gets importance log-weight
  * log w(x) = Σ_b n_b · λ_b,  λ_b = ln p̂_t[b] − ln p̂_r[b].
  *
  * Scale shape: learning is ONE corpus pass — a single map-side-combined
  * groupBy over the exploded gram stream produces raw and target counts
  * together (the target is a predicate over the same rows, not a second
  * scan); only `dim` count pairs reach the driver. Scoring is a pure
  * per-row expression riding the corpus scan (no shuffle, no model
  * join — λ travels as a literal array). Resampling is the standard
  * Gumbel-top-k realization of importance resampling: a deterministic
  * per-id Gumbel perturbation of the log-weight and one global top-k.
  *
  * Determinism/oracle: counts are exact integers; λ is computed with
  * libm `Math.log` (bit-identical to DuckDB `ln`, see
  * [[graft.expressions.LnDouble]]); the scoring fold runs in gram order
  * — every arithmetic step is replayable in unrolled SQL.
  */
object Dsir {

  /** Learned bucket log-ratios. `targetGrams`/`rawGrams` are the total
    * feature counts behind the smoothing denominators. */
  final case class Model(lambda: Array[Double], dim: Int,
                         targetGrams: Long, rawGrams: Long)

  /** Fit λ from one pass over `df`: rows where `isTarget` is true form
    * the target corpus, ALL rows form the raw corpus (the paper's
    * "target ⊆ raw or separate" framing — pass a disjoint union if the
    * target lives elsewhere). Buckets never seen in either corpus get
    * λ = ln(totR+dim) − ln(totT+dim) via smoothing. */
  def learn(df: DataFrame, textCol: String, isTarget: Column,
            dim: Int): Model = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val rows = df
      .select(isTarget.cast("boolean").as("__t"),
        explode(Classifier.gramBuckets(col(textCol), dim)).as("__b"))
      .groupBy("__b")
      .agg(count(lit(1)).as("__cr"),
        count(when(col("__t"), lit(1))).as("__ct"))
      .collect()
    val cr = new Array[Long](dim)
    val ct = new Array[Long](dim)
    rows.foreach { r =>
      val b = r.getInt(0); cr(b) = r.getLong(1); ct(b) = r.getLong(2)
    }
    val totT = ct.sum
    val totR = cr.sum
    // λ_b as the four-ln difference — the oracle evaluates the same
    // shape, so the doubles agree bitwise (libm ln + IEEE subtraction)
    val lam = Array.tabulate(dim) { b =>
      (java.lang.Math.log(ct(b) + 1.0) -
        java.lang.Math.log(totT + dim.toDouble)) -
        (java.lang.Math.log(cr(b) + 1.0) -
          java.lang.Math.log(totR + dim.toDouble))
    }
    Model(lam, dim, totT, totR)
  }

  /** Per-document importance log-weight Σ_b n_b·λ_b — evaluated as the
    * gram-ordered fold (`hashedLinearLogit` with weights λ, bias 0), so
    * it rides the scan shuffle-free and is bit-reproducible. */
  def logWeight(text: Column, model: Model): Column =
    TextFunctions.hashedLinearLogit(text, model.dim,
      model.lambda.toSeq, bias = 0.0)

  /** Importance resampling without replacement via the Gumbel-top-k
    * trick: key_i = log w_i + G_i with G_i = −ln(−ln u_i) a
    * deterministic per-id Gumbel draw ([[Sampling.hashUniform]]); the k
    * largest keys are a weighted sample ∝ w_i (Efraimidis–Spirakis in
    * log space). One global top-k — Spark plans it as
    * TakeOrderedAndProject, partial per partition, no full sort.
    * A 2⁻³² hash-collision u = 0 yields key = −∞ (sorts last, never
    * sampled) rather than an error. */
  def resample(df: DataFrame, idCol: String, logWeightCol: Column, k: Int,
               salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val gumbel = negate(FloatKernels.ln(
      negate(FloatKernels.ln(Sampling.hashUniform(col(idCol), salt)))))
    df.withColumn("dsir_key", logWeightCol + gumbel)
      .orderBy(col("dsir_key").desc, col(idCol).asc)
      .limit(k)
  }
}
