package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.expressions.FloatKernels

/** Diversity selection over an embedding column — the coreset
  * primitive of training-data curation, complementing the dedup
  * families: where SemDeDup ([[Dedup.semanticDedup]]) prunes redundancy
  * inside clusters, k-center selection picks a budgeted subset that
  * COVERS the embedding space (cap over-represented modes, seed
  * active-learning batches, choose k diverse exemplars per domain).
  *
  * Greedy farthest-point traversal (Gonzalez '85 — a 2-approximation
  * of the optimal k-center radius, the standard coreset selector in
  * Sener & Savarese ICLR'18): seed with the smallest id, then k−1
  * times select the point whose distance to the nearest
  * already-selected center is largest.
  */
object Diversity {

  /** Greedy k-center selection. Output: one row per selected center,
    * `(sel_rank, vec_id, dist)` in selection order — `dist` is the
    * selection-time farthest distance (the non-increasing radius
    * trajectory; the seed's is 0.0). Rows whose embedding exactly
    * duplicates an already-selected center are never picked (they add
    * zero coverage), so corpora with fewer than k distinct embeddings
    * return fewer than k rows.
    *
    * Determinism: seed = min id; each round's argmax breaks distance
    * ties on ascending id; distances are the sequential double fold
    * ([[FloatKernels.l2Sq]]) every ANN operator here uses — the whole
    * trajectory, hence the selected set, replays bit-exactly in the
    * oracle's unrolled SQL.
    *
    * Scale: k driver rounds, each ONE map pass over a persisted
    * (id, emb, md) projection — the update is
    * `md ← least(md, d(x, c_new))`, one distance per row per round —
    * plus a TakeOrderedAndProject(1) argmax. Never a shuffle of the
    * corpus, never a pairwise product; driver state is k × dim floats.
    * Each round's replacement cache is materialized BEFORE its parent
    * is dropped (the [[Ivf.buildBalanced]] discipline), so lineage
    * never re-stacks. Greedy k-center is inherently k sequential
    * passes; for large k at petabyte scale, run it per-IVF-cell
    * (compose with [[Ivf.assign]]) and union the per-cell selections. */
  def kCenter(df: DataFrame, idCol: String, embCol: String,
              k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        col(embCol).as("emb"))
      .filter(col("id").isNotNull && col("emb").isNotNull)
    val seed = base.orderBy(col("id").asc).limit(1).collect()
    if (seed.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("sel_rank", "vec_id", "dist")

    var selected = Vector[(Long, Long, Double)](
      (1L, seed(0).getLong(0), 0.0))
    var center: Seq[Float] = seed(0).getSeq[Float](1)
    var cur = base
      .withColumn("md", FloatKernels.l2(col("emb"), typedLit(center)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    var i = 2L
    var exhausted = false
    while (i <= k && !exhausted) {
      // md > 0 excludes selected centers AND their exact duplicates
      val next = cur.filter(col("md") > 0)
        .orderBy(col("md").desc, col("id").asc).limit(1).collect()
      if (next.isEmpty) exhausted = true
      else {
        selected :+= ((i, next(0).getLong(0), next(0).getDouble(2)))
        center = next(0).getSeq[Float](1)
        if (i < k) {
          val upd = cur.withColumn("md", least(col("md"),
              FloatKernels.l2(col("emb"), typedLit(center))))
            .persist(StorageLevel.MEMORY_AND_DISK)
          upd.count() // materialize before dropping the parent's blocks
          cur.unpersist()
          cur = upd
        }
        i += 1
      }
    }
    cur.unpersist()
    selected.toDF("sel_rank", "vec_id", "dist")
  }

  /** Driver/executor mirror of [[FloatKernels.l2]]: sqrt of the
    * 0.0-seeded sequential double fold of (aᵢ−bᵢ)² — the same IEEE
    * sequence the codegen kernel and the oracle's unrolled SQL run, so
    * the per-cell greedy trajectory replays bit-exactly. */
  private def l2D(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
    }
    Math.sqrt(acc)
  }

  /** Largest-remainder apportionment of `k` over cell masses: cell c
    * gets ⌊k·n_c/n⌋ plus one of the k−Σ⌊⌋ leftovers, awarded by
    * descending remainder (ties → lower cell id). Σ budgets = k
    * exactly; budget ∝ mass, so a cell's selection density matches its
    * share of the corpus. */
  private[graft] def apportion(counts: Seq[(Int, Long)],
                               k: Int): Map[Int, Int] = {
    val n = counts.map(_._2).sum
    if (n == 0) return Map.empty
    val fl = counts.map { case (c, nc) =>
      (c, k.toLong * nc / n, k.toLong * nc % n)
    }
    val leftover = (k - fl.map(_._2).sum).toInt
    fl.sortBy { case (c, _, rem) => (-rem, c) }.zipWithIndex.map {
      case ((c, f, _), i) => c -> (f + (if (i < leftover) 1L else 0L)).toInt
    }.toMap
  }

  /** Per-IVF-cell greedy k-center — the large-k scale path. [[kCenter]]
    * is inherently k sequential driver rounds (one corpus pass each);
    * this composes a coarse IVF partition ([[Ivf.assign]] under the
    * caller's model — use [[Ivf.buildBalanced]] so no cell exceeds the
    * size cap) with an INDEPENDENT local greedy inside each cell,
    * budgeted by [[apportion]] (∝ cell mass). All cells run in
    * parallel, so wall time is ~flat in k: one assignment map pass, one
    * tiny count aggregation, ONE shuffle to co-locate each cell, then
    * each task greedies over its in-memory cell members (cell size is
    * the documented memory knob — the balanced build caps it).
    *
    * Output: `(cell, sel_rank, vec_id, dist)` — selection order within
    * each cell, seed dist 0.0, same determinism contract as
    * [[kCenter]] (min-id seed per cell, (dist DESC, id ASC) argmax,
    * exact-duplicate exclusion via md > 0, [[l2D]] distances). With a
    * fixed-centroid model the whole composition — assignment argmin,
    * apportionment arithmetic, every per-cell round — replays in
    * unrolled SQL (`sample_kcenter_cells`).
    *
    * Trade vs global greedy: each center covers only its own cell, so
    * the cover radius can exceed the global 2-approximation when a
    * sparse region shares a cell with a dense one — bounded in practice
    * by the coarse partition's quality (DiversitySpec measures the
    * radius ratio on a blob corpus).
    *
    * Memory guard: each cell is greedied IN ONE TASK'S MEMORY
    * (`~(8 + 4·dim)` bytes per member plus array overhead), so an
    * unbalanced caller model with a 90%-hot cell would be an executor
    * OOM, not a wrong answer. The per-cell counts are already a bounded
    * aggregation here, so the hot cell is detected BEFORE the shuffle:
    * any cell above `maxCellSize` fails fast with the fix
    * ([[Ivf.buildBalanced]] caps cell size by skew-splitting). The
    * default (4M rows ≈ 1.1 GiB at dim 64) fits a standard executor;
    * raise it only with the memory to match. */
  def kCenterPerCell(df: DataFrame, idCol: String, embCol: String, k: Int,
                     model: Ivf.Model,
                     maxCellSize: Long = 4000000L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        col(embCol).as("emb"))
      .filter(col("id").isNotNull && col("emb").isNotNull)
    val assigned = Ivf.assign(base, Ivf.Model(model.centroids, "emb"))
      .select(col(Ivf.ClusterCol).cast("int").as("cell"), col("id"),
        col("emb"))
    // bounded: one row per cell
    val counts = assigned.groupBy("cell").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    counts.filter(_._2 > maxCellSize) match {
      case Seq() =>
      case hot => throw new IllegalArgumentException(
        s"kCenterPerCell: ${hot.size} cell(s) exceed maxCellSize=$maxCellSize " +
          s"(largest: cell ${hot.maxBy(_._2)._1} with ${hot.maxBy(_._2)._2} rows) " +
          "— each cell is greedied in one task's memory. Rebuild the coarse " +
          "model with Ivf.buildBalanced(cap) to split hot cells, or raise " +
          "maxCellSize if the executors have the memory.")
    }
    val budget = apportion(counts, k)
    assigned.as[(Int, Long, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val b = budget.getOrElse(cell, 0)
        if (b == 0) Iterator.empty
        else {
          val members = it.map(t => (t._2, t._3.toArray)).toArray
          java.util.Arrays.sort(members,
            Ordering.by((m: (Long, Array[Float])) => m._1))
          val out = Vector.newBuilder[(Int, Long, Long, Double)]
          out += ((cell, 1L, members(0)._1, 0.0))
          var center = members(0)._2
          val md = members.map(m => l2D(m._2, center))
          var r = 2
          var exhausted = false
          while (r <= b && !exhausted) {
            var best = -1
            var bd = 0.0
            var i = 0
            while (i < members.length) {
              // strict > keeps the FIRST (lowest-id) maximum — the
              // (md DESC, id ASC) tie-break on the id-sorted array
              if (md(i) > 0 && (best < 0 || md(i) > bd)) {
                best = i; bd = md(i)
              }
              i += 1
            }
            if (best < 0) exhausted = true
            else {
              out += ((cell, r.toLong, members(best)._1, bd))
              center = members(best)._2
              var j = 0
              while (j < members.length) {
                val d = l2D(members(j)._2, center)
                if (d < md(j)) md(j) = d
                j += 1
              }
              r += 1
            }
          }
          out.result().iterator
        }
      }
      .toDF("cell", "sel_rank", "vec_id", "dist")
  }

  /** Nearest-selected-center assignment: every row labeled with the
    * `vec_id` of its closest center from `centers` (a small collected
    * list, e.g. [[kCenter]] output joined back to embeddings) and the
    * distance — the cover structure for diversity-balanced downstream
    * sampling (stratify on `center_id`). Ties → first center in
    * selection order (argmin first-match, the numpy/NearestCentroid
    * convention). One map pass, centers ride along as a codegen
    * constant — no join, no shuffle. */
  def assignToCenters(df: DataFrame, idCol: String, embCol: String,
                      centers: Array[(Long, Array[Float])]): DataFrame = {
    require(centers.nonEmpty, "assignToCenters: empty center set")
    val idx = FloatKernels.nearestCentroid(col(embCol), centers.map(_._2))
    val ids = centers.map(_._1)
    df.select(col(idCol), col(embCol),
        idx.as("__ci"))
      .withColumn("center_id",
        element_at(typedLit(ids.toSeq), col("__ci") + 1))
      .withColumn("center_dist",
        FloatKernels.l2(col(embCol),
          element_at(typedLit(centers.map(_._2.toSeq).toSeq), col("__ci") + 1)))
      .drop("__ci", embCol)
  }

  /** Driver mirror of [[FloatKernels.dot]]: acc ← acc + (double)aᵢ·(double)bᵢ
    * sequentially from 0.0 — the bit-exactness of [[mmrRerank]]'s greedy
    * trajectory against the distributed stage and the oracle rests on
    * this being the SAME IEEE sequence. */
  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Driver mirror of `VectorFunctions.cosine`: dot/(‖a‖·‖b‖). */
  private def cosD(a: Array[Float], b: Array[Float]): Double =
    dotD(a, b) / (Math.sqrt(dotD(a, a)) * Math.sqrt(dotD(b, b)))

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein,
    * SIGIR'98): from the exact top-`nCandidates` by cosine similarity
    * to `query`, greedily select `k` results maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` — the relevance/diversity
    * trade every RAG retriever and search-results page wants when the
    * corpus is near-duplicate-heavy (plain top-k returns ten copies of
    * the same passage; MMR returns one plus nine complements).
    *
    * Output: `(mmr_rank, vec_id, rel, score)` in selection order —
    * `score` is the selection-time MMR objective (the seed's is λ·rel:
    * max over the empty selected set is 0).
    *
    * Scale: the distributed stage is the exact top-C cosine cut — a
    * TakeOrderedAndProject per-partition heap, no corpus shuffle, and
    * at larger scale any ANN tier ([[Ivf]]/[[Lsh]]/[[Hnsw]]) can
    * supply the candidates instead. The greedy loop runs DRIVER-side
    * over the C collected candidates (C × dim floats, k·C cosines) —
    * MMR is inherently sequential in k and C is a result-page-sized
    * constant, not a corpus fraction.
    *
    * Determinism: candidate cut breaks ties (rel DESC, id ASC); each
    * round's argmax breaks score ties on ascending id; all driver
    * cosines replay [[FloatKernels.dot]]'s sequential fold bit-for-bit
    * ([[dotD]]), and `ms` accumulates through `Math.max` exactly as the
    * oracle's `greatest` chain — the whole trajectory replays in
    * unrolled SQL. NaN rel (zero vectors) sorts first in both engines;
    * callers with zero vectors filter upstream. */
  def mmrRerank(df: DataFrame, idCol: String, embCol: String,
                query: Array[Float], nCandidates: Int, k: Int,
                lambda: Double = 0.5): DataFrame = {
    require(nCandidates >= 1 && k >= 1 && k <= nCandidates,
      s"need 1 <= k <= nCandidates, got k=$k nCandidates=$nCandidates")
    val spark = df.sparkSession
    import spark.implicits._
    val qlit = typedLit(query.toSeq)
    val rel = FloatKernels.dot(col("emb"), qlit) /
      (sqrt(FloatKernels.dot(col("emb"), col("emb"))) *
        sqrt(FloatKernels.dot(qlit, qlit)))
    val cand = df.select(col(idCol).cast("long").as("id"),
        col(embCol).as("emb"))
      .filter(col("id").isNotNull && col("emb").isNotNull)
      .select(col("id"), col("emb"), rel.as("rel"))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(nCandidates)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))

    val lc = 1.0 - lambda
    // remaining candidates with their running max-sim-to-selected
    var rest = cand.toBuffer
    val ms = scala.collection.mutable.Map.empty[Long, Double]
    val out = Vector.newBuilder[(Long, Long, Double, Double)]
    var rank = 1L
    while (rank <= k && rest.nonEmpty) {
      val scored = rest.map { case (id, emb, r) =>
        val s = if (rank == 1L) lambda * r else lambda * r - lc * ms(id)
        (id, emb, r, s)
      }
      val pick = scored.minBy { case (id, _, _, s) => (-s, id) }
      out += ((rank, pick._1, pick._3, pick._4))
      rest = rest.filterNot(_._1 == pick._1)
      rest.foreach { case (id, emb, _) =>
        val sim = cosD(emb, pick._2)
        ms(id) = if (rank == 1L) sim else Math.max(ms(id), sim)
      }
      rank += 1L
    }
    out.result().toDF("mmr_rank", "vec_id", "rel", "score")
  }
}
