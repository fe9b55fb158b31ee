package graft.operators

import graft.functions.{HashingEmbedder, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-vector (late-interaction) retrieval: each document carries
  * SEVERAL vectors — one per fixed-width character window — and a query
  * of Q segments scores a document as
  *   maxsim(doc) = Σ_q max_w cosineSim(query_q, window_w(doc)),
  * the ColBERT-style MaxSim operator of the public late-interaction
  * stacks. The reference scores one vector per node
  * (`/root/reference/src/vector_db/indexing/hnsw.py:128-134`); multi-
  * vector is the standard refinement when a single pooled vector washes
  * out local relevance.
  *
  * Windowing is fixed-width on characters (SQL-replicable with substr),
  * embeddings are the md5-variant signed token counts
  * ([[HashingEmbedder.embedMd5Counts]]) whose integer arithmetic makes
  * every cosine bit-exact across engines, so the whole operator is
  * oracle-checkable end-to-end — not just rows.
  *
  * Scale: windowing is a per-row generate (no shuffle); embedding is
  * one groupBy over (doc, window) token buckets; scoring is Q codegen
  * dot-folds per window plus ONE groupBy(doc) with Q max aggregates
  * (map-side combined); top-k is `TakeOrderedAndProject`. Q is a query-
  * side constant (≤ tens), never a join dimension.
  */
object MultiVec {

  /** Fixed-width character windows of `textCol`: one row per (id, k,
    * window text). Empty texts yield a single empty window (dropped
    * later by the zero-norm filter — absent from results, matching the
    * oracle's empty generate_series). */
  def windows(df: DataFrame, idCol: String, textCol: String,
              width: Int): DataFrame = {
    require(width > 0, s"window width must be positive, got $width")
    df.select(col(idCol), col(textCol))
      .withColumn("k",
        explode(sequence(lit(0),
          greatest(ceil(length(col(textCol)) / lit(width.toDouble))
            .cast("int") - 1, lit(0)))))
      .withColumn("wtext",
        col(textCol).substr(col("k") * width + 1, lit(width)))
      .select(col(idCol), col("k"), col("wtext"))
  }

  /** Embed each window with the md5-count embedder; zero-norm windows
    * (no tokens) are dropped so cosine never sees a 0/0. */
  def windowEmbeddings(df: DataFrame, idCol: String, textCol: String,
                       width: Int, dim: Int): DataFrame = {
    val win = windows(df, idCol, textCol, width)
      .withColumn("__wid",
        concat(col(idCol).cast("string"), lit("#"), col("k").cast("string")))
    HashingEmbedder.embedMd5Counts(win, "__wid", "wtext", dim)
      .filter(VectorFunctions.dot(col("embedding"), col("embedding")) > 0.0)
      .select(col(idCol), col("k"), col("embedding"))
  }

  /** MaxSim top-k: score = Σ over query segments of the max window
    * cosine, deterministic (score desc, id asc) cut. Query segments are
    * embedded driver-side with the identical md5-count fold. */
  def maxsimSearch(df: DataFrame, idCol: String, textCol: String,
                   querySegments: Seq[String], k: Int,
                   width: Int = 64, dim: Int = 64): DataFrame = {
    require(querySegments.nonEmpty, "maxsim needs at least one query segment")
    val qvecs = querySegments.map(HashingEmbedder.md5CountsLocal(_, dim))
    qvecs.zip(querySegments).foreach { case (qv, seg) =>
      require(qv.exists(_ != 0.0), s"query segment '$seg' has no tokens")
    }
    val wemb = windowEmbeddings(df, idCol, textCol, width, dim)
    val withSims = qvecs.zipWithIndex.foldLeft(wemb) { case (acc, (qv, i)) =>
      val qlit = lit(qv.map(_.toFloat))
      val qnorm = lit(math.sqrt(qv.map(c => c * c).sum))
      acc.withColumn(s"__sim$i",
        VectorFunctions.dot(col("embedding"), qlit) /
          (VectorFunctions.norm(col("embedding")) * qnorm))
    }
    val maxes = withSims.groupBy(col(idCol))
      .agg(max(col("__sim0")).as("__mx0"),
        qvecs.indices.drop(1).map(i => max(col(s"__sim$i")).as(s"__mx$i")): _*)
    val score = qvecs.indices.map(i => col(s"__mx$i"))
      .reduceLeft(_ + _)
    maxes.withColumn("score", score)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
