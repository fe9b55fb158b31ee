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

  /** `bq_code`: array<long> of sign-bit words (MSB-first within word). */
  def encodeColumn(embCol: Column): Column =
    FloatKernels.signPack(embCol, WordBits)

  def encode(df: DataFrame, embCol: String,
             codeCol: String = "bq_code"): DataFrame =
    df.withColumn(codeCol, encodeColumn(col(embCol)))

  /** Driver-side encode of a query vector (same fold as the kernel). */
  def encodeQuery(query: Seq[Float]): Array[Long] = {
    val out = new Array[Long]((query.length + WordBits - 1) / WordBits)
    query.indices.foreach { d =>
      out(d / WordBits) = out(d / WordBits) * 2L +
        (if (query(d) >= 0f) 1L else 0L)
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
                    filter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    filter.fold(encoded)(encoded.filter)
      // null codes (null embeddings) would yield ham = null, which sorts
      // FIRST ascending in Spark — garbage rows must not crowd the top
      .filter(col(codeCol).isNotNull)
      .withColumn("ham", hammingColumn(col(codeCol), encodeQuery(query)))
      .orderBy(col("ham").asc, col(idCol).asc)
      .limit(k)

  /** Two-stage search: Hamming top-`rerank` pre-screen (deterministic
    * (ham, id) cut), then exact L2 rerank of the survivors to top-k —
    * the screen-then-rerank shape every BQ deployment uses. `df` must
    * retain the float `embCol` alongside the code. */
  def rerankSearch(encoded: DataFrame, idCol: String, codeCol: String,
                   embCol: String, query: Seq[Float], k: Int,
                   rerank: Int,
                   filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(rerank >= k, s"rerank window $rerank smaller than k=$k")
    hammingSearch(encoded, idCol, codeCol, query, rerank, filter)
      .withColumn("dist",
        graft.functions.VectorFunctions.l2(col(embCol), lit(query.toArray)))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }
}
