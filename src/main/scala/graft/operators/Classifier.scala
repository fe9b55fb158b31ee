package graft.operators

import graft.functions.ColumnOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed training for the fastText-shape hashed linear text
  * classifier that [[graft.functions.TextFunctions.hashedLinearLogit]]
  * scores with (Joulin et al. 2016, arXiv:1607.01759): bag of word
  * unigrams + bigrams, each hashed into one of `dim` weight buckets,
  * trained by full-batch gradient descent. This closes the one learned
  * artifact the reference consumes but never produces (its pretrained
  * embedding/classifier boundary,
  * `/root/reference/src/vector_db/services/inference/embedding.py:38-52`):
  * a curation pipeline needs to FIT its quality/language/domain
  * classifiers on labeled docs, not just apply them.
  *
  * Link function: the HARD sigmoid σ̂(z) = clamp(0.5 + z/4, 0, 1)
  * (the piecewise-linear sigmoid of Courbariaux et al. 2015), not
  * exp-based logistic — deliberately. The delta-rule gradient
  * (σ̂(z)−y)·x needs only +, ×, min, max in IEEE double, so every
  * training step is bit-reproducible across engines and the DuckDB
  * oracle replays the whole optimization unrolled (the
  * `graph_pagerank` / `t_bpe_learn` discipline). exp() bit-parity
  * across libms is NOT guaranteed; clamp parity is.
  *
  * Determinism: all cross-row sums (per-doc z, per-bucket gradient)
  * are routed through DECIMAL(38,18) — exact, order-independent under
  * any partitioning — then cast back to double; per-row arithmetic is
  * a fixed expression tree. The bias is bucket `dim`: a constant
  * feature 1.0 appended per doc, so one gradient aggregation updates
  * weights AND bias, and every doc (even gram-less ones) has a z row.
  *
  * Scale shape: the corpus is touched once to build the (doc, bucket,
  * count) table, persisted partitioned by doc id. Each iteration is
  * one job: a partition-local per-doc z sum (no exchange — the persist
  * partitioning serves the groupBy and the error join), then a
  * map-side-combined dim+1-group gradient sum; only dim+1 doubles
  * reach the driver per iteration. Iteration count is fixed and small
  * — at 1000 executors the loop cost is iters × one corpus-pass job.
  */
object Classifier {

  final case class Model(weights: Array[Double], bias: Double, dim: Int) {
    /** Weight table (idx 0..dim-1 = bucket weights, idx dim = bias) —
      * the oracle-checked shape. */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (weights.zipWithIndex.map { case (w, i) => (i.toLong, w) } :+
        (dim.toLong, bias)).toSeq.toDF("idx", "w")
    }
  }

  /** B11 for the learned artifact: persist the (idx, w) weight table
    * through the crash-safe snapshot protocol (the `bucketScored` /
    * index-persistence precedent). Doubles round-trip parquet exactly,
    * so a loaded model scores bit-identically to the fresh one — train
    * once, let every downstream scoring/calibration report read the
    * dim+1-row side table instead of replaying the GD passes (at 100 TB
    * a refit per report is iters extra corpus passes). */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
           path: String): Unit =
    graft.core.SnapshotIO.publish(model.toDF(spark), path)

  /** Read a persisted model back; hard error when absent or malformed
    * (a silently-zero classifier is worse than a crash). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = graft.core.SnapshotIO.read(spark, path)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"no classifier model published at $path"))
      .collect()
    require(rows.length >= 2, s"classifier model at $path has ${rows.length} rows")
    val byIdx = rows.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val dim = byIdx.length - 1
    require(byIdx.map(_._1).toSeq == (0L to dim.toLong),
      s"classifier model at $path has non-contiguous idx")
    Model(byIdx.take(dim).map(_._2), byIdx(dim)._2, dim)
  }

  /** Hashed gram-bucket array of a text column — EXACTLY the gram and
    * bucket construction of `hashedLinearLogit` (lowercase whitespace
    * unigrams left→right, then bigrams left→right, md5-derived hash32
    * mod dim), so trained weights score consistently. One codegen
    * kernel call per row ([[graft.expressions.GramBucketUtil]]) — the
    * declarative filter/transform/aggregate HOF chain this replaces is
    * CodegenFallback and paid interpreted dispatch plus a 32-hex-char
    * md5 string round-trip per gram. */
  def gramBuckets(text: Column, dim: Int): Column =
    graft.expressions.TextKernels.gramBucketsMd5(
      split(lower(text), "\\s+"), dim)

  /** Full-batch hard-sigmoid GD from zero-initialized weights.
    *
    * Each iteration is ONE exchange-free pass over the cached feature
    * table: the per-doc z is a window sum over the doc partition key
    * (the cache is hash-partitioned AND sorted by doc id, so the window
    * needs no exchange and no per-iteration sort), the error term is
    * computed inline from the label column the features carry, and only
    * the dim+1-group gradient aggregation shuffles (dim+1 doubles). The
    * previous shape paid a groupBy + two co-partitioned joins per
    * iteration — 3 cache scans and ~5 stages each; this is 1 scan and
    * 2 stages. All cross-row sums stay DECIMAL(38,18)-routed (exact and
    * order-independent), so the learned weights are bit-identical.
    *
    * @param label 0/1 double column (evaluated against `df`'s columns)
    * @param lr    learning rate η; update is w −= η·(g/n) per step
    */
  def train(df: DataFrame, idCol: String, textCol: String, label: Column,
            dim: Int, iters: Int, lr: Double): Model = {
    require(dim >= 1 && iters >= 1 && lr > 0,
      s"bad hyperparameters: dim=$dim iters=$iters lr=$lr")
    val dec = DecimalType(38, 18)
    // per-doc (bucket, count) pairs — including the constant bias
    // feature at bucket `dim`, so every doc (even a gram-less one) has
    // a feature row and one aggregation updates weights AND bias —
    // computed by ONE kernel call per row
    // ([[graft.expressions.GramBucketUtil.bucketCounts]]): no explode +
    // groupBy shuffle of the corpus-sized gram table, no bias-branch
    // union. The one shuffle is the doc-keyed repartition of the
    // UN-exploded rows (one skinny row per doc); rows explode after it
    // (Generate preserves partitioning) and sort by doc id, so the
    // per-iteration window runs exchange-free and sort-free over the
    // cached table. A null text coalesces to no tokens → bias row only,
    // the same rows the explode-branch/bias-branch union produced.
    val feats = df
      .select(col(idCol).as("__id"), label.cast("double").as("__y"),
        graft.expressions.TextKernels.gramBucketCountsMd5(
          coalesce(split(lower(col(textCol)), "\\s+"),
            array().cast("array<string>")), dim).as("__p"))
      .repartition(col("__id"))
      // explode_outer, not explode: the array is never empty (bias entry
      // always present), but plain explode makes the optimizer infer a
      // size(__p) > 0 filter and push it into the scan — re-evaluating
      // the gram kernel (the md5 pass) TWICE per row
      .select(col("__id"), col("__y"), explode_outer(col("__p")).as("__e"))
      .select(col("__id"), col("__y"),
        col("__e.b").as("__b"), col("__e.c").as("__c"))
      .sortWithinPartitions("__id")
      .persist()
    // doc count = bias-row count (one per doc) — off the cache, not a
    // second corpus scan
    val nD = feats.filter(col("__b") === dim).count().toDouble
    val win = org.apache.spark.sql.expressions.Window.partitionBy("__id")

    val w = Array.fill(dim + 1)(0.0) // w(dim) = bias
    for (_ <- 1 to iters) {
      val wl = lit(w)
      // z_d = Σ_b c_db·w_b (decimal window sum — same addends, same
      // exact sum as the previous groupBy+join form), then the hard-
      // sigmoid error rides each feature row inline
      val grad = feats
        .withColumn("__z",
          sum((col("__c") * element_at(wl, col("__b") + 1)).cast(dec))
            .over(win).cast("double"))
        .select(col("__b"),
          ((greatest(lit(0.0), least(lit(1.0),
            lit(0.5) + col("__z") * lit(0.25))) - col("__y")) * col("__c"))
            .as("__g"))
        .groupBy("__b").agg(sum(col("__g").cast(dec)).cast("double").as("__g"))
        .collect()
      grad.foreach { r =>
        val k = r.getInt(0)
        w(k) = w(k) - lr * (r.getDouble(1) / nD)
      }
    }
    feats.unpersist()
    Model(w.take(dim), w(dim), dim)
  }
}
