package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): per-dimension uniform 8-bit grids — the
  * third compression tier next to PQ ([[Pq]]) and IVF-PQ ([[IvfPq]]),
  * trading PQ's trained subspace codebooks for a train-cheap,
  * reconstruction-bounded uniform grid (the standard SQ8 of the public
  * ANN stacks; 4 B/dim float → 1 B/dim code).
  *
  * Model: per-dim (vmin, vdiff = vmax−vmin) from EXACT min/max
  * aggregates — order-independent, so training is deterministic under
  * any partitioning (unlike mean-based stats, no decimal detour
  * needed). code_i = clamp(⌊(v_i − vmin_i)/vdiff_i · 255 + 0.5⌋, 0, 255)
  * — the nearest grid point, written as the closed form rather than an
  * argmin scan so the DuckDB oracle can spell the identical arithmetic.
  *
  * Search is asymmetric (ADC): the query stays full-precision; a
  * 64×256-double distance table is built driver-side from the same
  * closed-form decode and each row pays one codegen table-lookup fold
  * ([[graft.expressions.FloatKernels.adcLookup]] — the hot path is
  * whole-stage codegen; only the one-time encode scan uses a HOF).
  *
  * Scale: train is one explode + per-dim min/max (map-side combined to
  * dims×partitions rows); encode and ADC are per-row scans, no shuffle;
  * top-k is TakeOrderedAndProject.
  */
object Sq {

  /** Per-dimension grid: decoded(i, code) = vmin(i) + code/255·vdiff(i).
    * Doubles, exactly the cast of the float min/max. */
  case class Model(vmin: Array[Double], vdiff: Array[Double]) {
    require(vmin.length == vdiff.length, "vmin/vdiff length mismatch")
    def dim: Int = vmin.length
  }

  val Levels = 256

  /** Exact per-dim min/max over the corpus (any row order, any
    * partitioning — min/max are order-free, so the model is
    * deterministic without sampling or seeds). */
  def train(df: DataFrame, embCol: String): Model = {
    val stats = df
      .select(posexplode(col(embCol)).as(Seq("__i", "__v")))
      .groupBy("__i")
      .agg(min(col("__v")).cast("double").as("mn"),
        max(col("__v")).cast("double").as("mx"),
        count(lit(1)).as("cnt"))
      .orderBy("__i")
      .collect()
    require(stats.nonEmpty, "cannot train SQ on an empty table")
    // every dim index must appear in every row: a max-index check alone
    // would let a short vector (e.g. 63 of 64 dims) slip through and
    // fail later, deep in ADC codegen, instead of here
    require(stats.length == stats.last.getAs[Int]("__i") + 1 &&
        stats.map(_.getAs[Long]("cnt")).distinct.length == 1,
      "ragged embedding dims in SQ training input")
    Model(stats.map(_.getAs[Double]("mn")),
      stats.map(r => r.getAs[Double]("mx") - r.getAs[Double]("mn")))
  }

  /** `sq_code`: array<int> of per-dim grid indices (0..255). Constant
    * dims (vdiff = 0) encode as 0. Closed-form quantize; clamp after
    * floor so out-of-train-range vectors saturate instead of wrapping. */
  def encodeColumn(embCol: Column, m: Model): Column = {
    val mn = typedLit(m.vmin)
    val df = typedLit(m.vdiff)
    transform(embCol, (x, i) => {
      val mnI = element_at(mn, i + 1)
      val dfI = element_at(df, i + 1)
      when(dfI === 0.0, lit(0L)).otherwise(
        greatest(lit(0L), least(lit(255L),
          floor((x.cast("double") - mnI) / dfI * lit(255.0) + lit(0.5)))))
        .cast("int")
    })
  }

  def encode(df: DataFrame, embCol: String, m: Model,
             codeCol: String = "sq_code"): DataFrame =
    df.withColumn(codeCol, encodeColumn(col(embCol), m))

  /** ADC distance: sqrt of the chunk-ordered fold over per-dim
    * (query_i − decoded_i)² lookups — same table construction the oracle
    * spells per row, built once driver-side. */
  def adcDistanceColumn(codeCol: Column, m: Model, query: Seq[Float]): Column = {
    require(query.length == m.dim, s"query dim ${query.length} != model dim ${m.dim}")
    val table: Array[Array[Double]] = Array.tabulate(m.dim) { i =>
      Array.tabulate(Levels) { j =>
        val dec = m.vmin(i) + j / 255.0 * m.vdiff(i)
        val d = query(i).toDouble - dec
        d * d
      }
    }
    sqrt(graft.expressions.FloatKernels.adcLookup(codeCol, table))
  }

  /** Approximate top-k via ADC over encoded rows (deterministic
    * (dist, id) order). */
  def adcSearch(encoded: DataFrame, idCol: String, codeCol: String,
                m: Model, query: Seq[Float], k: Int): DataFrame =
    encoded
      // null codes would yield dist = null, which sorts FIRST ascending
      .filter(col(codeCol).isNotNull)
      .withColumn("dist", adcDistanceColumn(col(codeCol), m, query))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)

  /** B11 parity: model persistence as a dim-rows parquet. */
  def save(m: Model, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    m.vmin.indices.map(i => (i, m.vmin(i), m.vdiff(i)))
      .toDF("i", "vmin", "vdiff")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).orderBy("i").collect()
    Model(rows.map(_.getAs[Double]("vmin")), rows.map(_.getAs[Double]("vdiff")))
  }
}
