package graft.operators

import graft.expressions.FloatKernels
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary quantization (BQ): 1-bit sign codes + Hamming pre-screening —
  * the cheapest compression tier next to SQ8 ([[Sq]]), PQ ([[Pq]]) and
  * IVF-PQ ([[IvfPq]]). The standard binary-quantization scheme of the
  * public ANN stacks: bit_d = [v_d ≥ 0], packed into integer words, so
  * a float32 vector shrinks 32× and candidate screening is XOR+popcount.
  * Where the reference keeps full vectors memory-mapped and always pays
  * float distance (`/root/reference/src/vector_db/storage.py:254-259`),
  * BQ trades recall for a scan that reads 2 longs/row — the tier a
  * 100 TB corpus screens with before any float is touched.
  *
  * Train-free (no model object to persist — the code column IS the
  * index), deterministic, and exactly mirrored by the DuckDB oracle as
  * a CASE-weight sum (see `OracleSql.bqWord`).
  *
  * Scale: encode and Hamming scoring are per-row whole-stage-codegen
  * scans ([[graft.expressions.SignPackFloat]]/[[graft.expressions.HammingLongs]]),
  * no shuffle; top-k is `TakeOrderedAndProject`; the rerank path fetches
  * floats for only the `rerank` Hamming survivors.
  */
object Bq {

  /** Bits per packed word. 32 keeps every weight (≤ 2³¹) exactly
    * representable in both engines' BIGINT arithmetic with headroom. */
  val WordBits = 32

  /** `bq_code`: array<long> of sign-bit words (MSB-first within word).
    * `thresholds` non-empty = CENTERED BQ (bit_d = [v_d ≥ t_d]) — see
    * [[trainThresholds]] for why the zero-threshold default is blind on
    * non-centered corpora. */
  def encodeColumn(embCol: Column, thresholds: Seq[Double] = Nil): Column =
    FloatKernels.signPack(embCol, WordBits, thresholds)

  def encode(df: DataFrame, embCol: String,
             codeCol: String = "bq_code",
             thresholds: Seq[Double] = Nil): DataFrame =
    df.withColumn(codeCol, encodeColumn(col(embCol), thresholds))

  /** Per-dim thresholds for centered BQ: the RANGE MIDPOINT
    * (min+max)/2 of each dimension, in double — the same order-free
    * exact stats pass as [[Sq.train]]'s grid (deterministic, seedless,
    * in-SQL replayable), one aggregation over the corpus.
    *
    * Why it exists (measured, ScaleProbe `bq_recall_sweep` at 1M): on
    * an all-positive corpus ([0,1)-uniform — the shape of count
    * embeddings, ReLU features, normalized scores) plain sign bits are
    * CONSTANT, every Hamming distance is 0, and the screen returns the
    * id-ascending head: 0/10 recall at every rerank window up to 300×k.
    * Midpoint thresholds split each dim's occupied range instead of the
    * origin — identical behavior on already-centered data (midpoint ≈ 0)
    * and informative bits everywhere else. Midpoint, not mean/median:
    * min/max are order-free (bit-exact under any partitioning, like
    * SQ8's grid) where an IEEE mean depends on fold order. */
  def trainThresholds(df: DataFrame, embCol: String): Array[Double] =
    trainThresholdsOpt(df, embCol).getOrElse(
      throw new IllegalArgumentException(
        "cannot train BQ thresholds on an empty table"))

  /** [[trainThresholds]] that reports an empty corpus (no rows, or all
    * embeddings null) as None instead of throwing — the facade's
    * default path maps a filter matching zero rows to an empty RESULT,
    * never a crash (the exclusion contract). Ragged dims still throw. */
  def trainThresholdsOpt(df: DataFrame, embCol: String): Option[Array[Double]] = {
    val stats = df
      .select(posexplode(col(embCol)).as(Seq("__i", "__v")))
      .groupBy("__i")
      .agg(min(col("__v")).cast("double").as("mn"),
        max(col("__v")).cast("double").as("mx"),
        count(lit(1)).as("cnt"))
      .orderBy("__i")
      .collect()
    if (stats.isEmpty) None
    else {
      require(stats.length == stats.last.getAs[Int]("__i") + 1 &&
          stats.map(_.getAs[Long]("cnt")).distinct.length == 1,
        "ragged embedding dims in BQ threshold training input")
      Some(stats.map(r => (r.getAs[Double]("mn") + r.getAs[Double]("mx")) / 2.0))
    }
  }

  /** Measured anchor for the default rerank window (ScaleProbe
    * `bq_recall_sweep`, centered codes, 64-bit uniform-random worst
    * case, yardstick ≥0.6@10 on ≥7/10 queries): every fixed multiple
    * of k fails at corpus scale (3·k: 0/10 at 1M AND 10M; even 300·k
    * only 0→7/10), because the 64-bit Hamming ranker's discrimination
    * is fixed while the number of near-tied codes grows with N. The
    * window that holds a 9/10 margin tracks ≈3·√N: 1M → 3,000 (9/10),
    * 10M → 10,000 (9/10). More code bits (dim > 64) shift the anchor
    * down; compose BQ below IVF partition pruning when √N windows are
    * too hot. */
  val RerankScaleFactor: Double = 3.0

  /** Scale the exact-rerank window with corpus size so the DEFAULT
    * screen keeps the measured margin: max(3·k, ⌈3·√n⌉). Callers that
    * set a window explicitly pass it through unscaled. */
  def scaledRerank(k: Int, n: Long,
                   factor: Double = RerankScaleFactor): Int =
    math.max(3 * k,
      math.ceil(factor * math.sqrt(math.max(n, 0L).toDouble)).toInt)

  /** Driver-side encode of a query vector (same fold as the kernel). */
  def encodeQuery(query: Seq[Float],
                  thresholds: Seq[Double] = Nil): Array[Long] = {
    if (thresholds.nonEmpty) require(query.length <= thresholds.length,
      s"${thresholds.length} thresholds for a ${query.length}-dim query")
    val out = new Array[Long]((query.length + WordBits - 1) / WordBits)
    query.indices.foreach { d =>
      val t = if (thresholds.isEmpty) 0.0 else thresholds(d)
      out(d / WordBits) = out(d / WordBits) * 2L +
        (if (query(d).toDouble >= t) 1L else 0L)
    }
    out
  }

  /** Hamming distance of a code column to a driver-side query code. */
  def hammingColumn(codeCol: Column, queryCode: Array[Long]): Column =
    FloatKernels.hamming(codeCol, lit(queryCode))

  /** Approximate top-k by Hamming distance over encoded rows,
    * deterministic (ham, id) ascending order. The optional pre-filter
    * composes BEFORE the screen (pushdown-able; the reference's
    * exclusion contract — non-matching rows can never appear). */
  def hammingSearch(encoded: DataFrame, idCol: String, codeCol: String,
                    query: Seq[Float], k: Int,
                    filter: Option[org.apache.spark.sql.Column] = None,
                    thresholds: Seq[Double] = Nil): DataFrame =
    filter.fold(encoded)(encoded.filter)
      // null codes (null embeddings) would yield ham = null, which sorts
      // FIRST ascending in Spark — garbage rows must not crowd the top
      .filter(col(codeCol).isNotNull)
      // thresholds must match the ones the code column was encoded with
      .withColumn("ham", hammingColumn(col(codeCol),
        encodeQuery(query, thresholds)))
      .orderBy(col("ham").asc, col(idCol).asc)
      .limit(k)

  /** Two-stage search: Hamming top-`rerank` pre-screen (deterministic
    * (ham, id) cut), then exact L2 rerank of the survivors to top-k —
    * the screen-then-rerank shape every BQ deployment uses. `df` must
    * retain the float `embCol` alongside the code. */
  def rerankSearch(encoded: DataFrame, idCol: String, codeCol: String,
                   embCol: String, query: Seq[Float], k: Int,
                   rerank: Int,
                   filter: Option[org.apache.spark.sql.Column] = None,
                   thresholds: Seq[Double] = Nil): DataFrame = {
    require(rerank >= k, s"rerank window $rerank smaller than k=$k")
    hammingSearch(encoded, idCol, codeCol, query, rerank, filter, thresholds)
      .withColumn("dist",
        graft.functions.VectorFunctions.l2(col(embCol), lit(query.toArray)))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }
}
