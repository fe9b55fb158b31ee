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

  /** Sparse per-window signed token counts: one row per (id, k, bucket)
    * with the exact-integer count `__c` — the md5-count construction
    * ([[HashingEmbedder.md5BucketSignCols]] — shared, so the hash can't
    * drift) WITHOUT materializing dense vectors. Token-less windows are
    * simply absent. One groupBy, map-side combined. */
  private def sparseCounts(df: DataFrame, idCol: String, textCol: String,
                           width: Int, dim: Int): DataFrame = {
    val (bucket, sign) = HashingEmbedder.md5BucketSignCols(col("__tok"), dim)
    windows(df, idCol, textCol, width)
      .select(col(idCol), col("k"),
        explode(split(lower(col("wtext")), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol), col("k"), bucket.as("__b"), sign.as("__s"))
      .groupBy(col(idCol), col("k"), col("__b"))
      .agg(sum(col("__s")).as("__c"))
  }

  /** Dense per-window embeddings (convenience view over
    * [[sparseCounts]]; zero-norm windows dropped so cosine never sees a
    * 0/0). The dense materialization pays an interpreted per-row
    * transform — fine for inspection and moderate corpora; the scoring
    * path ([[maxsimSearch]]) works on the sparse counts directly and
    * never builds these. */
  def windowEmbeddings(df: DataFrame, idCol: String, textCol: String,
                       width: Int, dim: Int): DataFrame =
    sparseCounts(df, idCol, textCol, width, dim)
      .groupBy(col(idCol), col("k"))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c"))))
        .as("__m"))
      .select(col(idCol), col("k"),
        transform(sequence(lit(0), lit(dim - 1)),
          b => coalesce(element_at(col("__m"), b), lit(0.0)).cast("float"))
          .as("embedding"))
      .filter(VectorFunctions.dot(col("embedding"), col("embedding")) > 0.0)

  /** MaxSim top-k: score = Σ over query segments of the max window
    * cosine, deterministic (score desc, id asc) cut. Query segments are
    * embedded driver-side with the identical md5-count fold.
    *
    * Scoring is per-ROW: a window's tokens live in its own row, so the
    * norm² and all Q dot products are per-row folds over the (bucket,
    * sign) pairs — dot_q = Σ_tok sign·qv[bucket] (the bucket-count dot
    * is linear in tokens) and norm² = Σ_p sign_p · (Σ_q [b_q = b_p]
    * sign_q) (a T² pairwise fold, T ≤ width tokens). The former
    * (id, window, bucket) count aggregation — the corpus-dominating
    * shuffle, 8 tokens × n rows — disappears entirely: the ONLY
    * exchange left is the doc-level max aggregate (map-side combined),
    * then a TakeOrdered cut. All window-side arithmetic is
    * integer-valued doubles (signs and counts), so the fold order
    * doesn't matter and the result is bit-identical to the grouped
    * formulation the oracle replays. Dense vectors are never
    * materialized. The `+ 0.0` on each dot keeps the historical IEEE
    * −0.0 normalization (the fold's +0.0 seed already prevents −0.0;
    * the term is kept so the expression mirrors the oracle's). */
  def maxsimSearch(df: DataFrame, idCol: String, textCol: String,
                   querySegments: Seq[String], k: Int,
                   width: Int = 64, dim: Int = 64): DataFrame = {
    require(querySegments.nonEmpty, "maxsim needs at least one query segment")
    val qvecs = querySegments.map(HashingEmbedder.md5CountsLocal(_, dim))
    qvecs.zip(querySegments).foreach { case (qv, seg) =>
      require(qv.exists(_ != 0.0), s"query segment '$seg' has no tokens")
    }
    import graft.functions.ColumnOps.bindOnce
    // per-window signed-count vector via the codegen md5 kernel (the
    // [[CountEmbedUtil.embedMd5]] bucket/sign identity — shared with
    // embedMd5Counts, so the hash can't drift), then norm² and the Q
    // query dots as codegen float folds. Every value is an exact
    // integer in double (signs, counts, and the driver-side qv counts
    // all < 2²⁴, so the float components are exact too): any summation
    // order yields the identical double, so this is bit-identical to
    // the interpreted per-token T² fold it replaces — which paid
    // CodegenFallback dispatch per token PAIR per window.
    val scored = bindOnce(graft.expressions.TextKernels.md5CountEmbed(
      split(lower(col("wtext")), "\\s+"), dim, normalize = false)) { emb =>
      val nsq = graft.expressions.FloatKernels.dot(emb, emb)
      val dots = qvecs.zipWithIndex.map { case (qv, i) =>
        (graft.expressions.FloatKernels.dot(emb,
          lit(qv.map(_.toFloat))) + lit(0.0)).as(s"d$i")
      }
      struct(nsq.as("nsq") +: dots: _*)
    }
    val perWin = windows(df, idCol, textCol, width)
      .select(col(idCol), scored.as("__sc"))
      .select(col(idCol) +: col("__sc.nsq").as("__nsq") +:
        qvecs.indices.map(i => col(s"__sc.d$i").as(s"__dot$i")): _*)
      .filter(col("__nsq") > 0)
    val maxAggs = qvecs.zipWithIndex.map { case (qv, i) =>
      val qnorm = lit(math.sqrt(qv.map(c => c * c).sum))
      max(col(s"__dot$i") / (sqrt(col("__nsq")) * qnorm)).as(s"__mx$i")
    }
    val maxes = perWin.groupBy(col(idCol))
      .agg(maxAggs.head, maxAggs.tail: _*)
    val score = qvecs.indices.map(i => col(s"__mx$i"))
      .reduceLeft(_ + _)
    maxes.withColumn("score", score)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
