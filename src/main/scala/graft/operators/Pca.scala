package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Principal-direction analysis of an embedding column: the dim × dim
  * second-moment matrix M = Σ_rows x·xᵀ as one distributed aggregation,
  * then fixed-iteration power method for the dominant direction — the
  * embedding-hygiene operator behind common-component removal
  * (Mu & Viswanath, ICLR 2018 "All-but-the-Top"; Arora et al., ICLR
  * 2017): embedding spaces carry a large shared direction that washes
  * out cosine contrast, and removing it is a standard pre-pass for the
  * SemDeDup/cosine-near-dup family in this repo.
  *
  * Determinism ([[PageRank]]'s discipline): each x_i·x_j product of two
  * FLOAT components is exact in double (24-bit mantissas, 48-bit
  * product), routed through DECIMAL(38,18) so the corpus sum is exact
  * and order-independent, then cast back correctly rounded — M is
  * bit-identical under any partitioning and replayable by the DuckDB
  * oracle. The power iteration runs on the driver over the collected
  * dim² matrix (bounded state: 64 × 64 = 32 KB regardless of corpus
  * size) with left-to-right folds that mirror SQL `list_reduce`, so
  * loadings and the eigenvalue are also hash-exact.
  *
  * Scale: the corpus is touched ONCE (the dim²-way per-row expansion is
  * collapsed by map-side partial aggregation to ≤ dim² rows per
  * partition before the single shuffle); everything after is
  * driver-local on dim² doubles. At dim = 1024 the expansion is 1M
  * products per row — callers with very wide embeddings should sample
  * rows (the [[Sketch.sampledQuantiles]] discipline), not shrink dim.
  */
object Pca {

  /** Second-moment (uncentered Gram) matrix as a (i, j, m) table,
    * i, j ∈ [0, dim). Decimal-routed exact sums → double.
    *
    * Only the upper triangle (i ≤ j) is aggregated — M is symmetric and
    * the decimal sum is order-independent, so mirroring M_ij into M_ji
    * afterward is bit-identical to aggregating both (same products,
    * same exact sum) at half the explode fan-out. */
  def secondMoment(df: DataFrame, vecCol: Column, dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val upper = df.select(vecCol.as("__v"))
      .select(explode(flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
        transform(sequence(i, lit(dim - 1)), j =>
          struct(i.as("i"), j.as("j"),
            (element_at(col("__v"), i + 1).cast("double") *
              element_at(col("__v"), j + 1).cast("double")).as("p"))))))
        .as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p").cast(DecimalType(38, 18))).cast("double").as("m"))
    // mirror AFTER the aggregation (a generate over ≤ dim² rows) — a
    // union of two references to `upper` would re-plan the whole
    // corpus aggregation twice
    upper.select(explode(
        when(col("i") === col("j"),
          array(struct(col("i").as("i"), col("j").as("j"), col("m").as("m"))))
          .otherwise(array(
            struct(col("i").as("i"), col("j").as("j"), col("m").as("m")),
            struct(col("j").as("i"), col("i").as("j"), col("m").as("m")))))
        .as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.m").as("m"))
  }

  /** Dominant eigen-direction of the second-moment matrix by `iters`
    * power iterations from the all-ones start vector. Returns one row
    * per component: (i, loading, lambda) with `loading` the i-th entry
    * of the unit top direction and `lambda` = ‖M·v_last‖ (the
    * eigenvalue estimate, constant across rows).
    *
    * Arithmetic contract (oracle-replayable): matvec row sums and the
    * norm-square fold left-to-right from the FIRST element (SQL
    * `list_reduce` semantics); normalization divides by the correctly
    * rounded sqrt. Deterministic given M — no randomized init. */
  def topComponent(df: DataFrame, vecCol: Column, dim: Int,
                   iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val m = Array.ofDim[Double](dim, dim)
    secondMoment(df, vecCol, dim).collect().foreach { r =>
      m(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    var v = Array.fill(dim)(1.0)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        val row = m(i)
        // left-to-right fold from the first product (list_reduce order)
        var s = row(0) * v(0)
        var j = 1
        while (j < dim) { s += row(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var nsq = w(0) * w(0)
      i = 1
      while (i < dim) { nsq += w(i) * w(i); i += 1 }
      lambda = math.sqrt(nsq)
      v = w.map(_ / lambda)
    }
    v.zipWithIndex.map { case (l, i) => (i, l, lambda) }
      .toSeq.toDF("i", "loading", "lambda")
  }

  /** Squared L2 norm of an array<double> column: left-to-right fold
    * from the first squared element (SQL `list_reduce` order, the
    * [[topComponent]] contract), with the array bound once so a derived
    * input (e.g. a [[projectOut]] residual) is not re-evaluated per
    * term. */
  def normSq(arr: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    graft.functions.ColumnOps.bindOnce(arr) { a =>
      (2 to dim).foldLeft(element_at(a, 1) * element_at(a, 1)) { (acc, k) =>
        acc + element_at(a, k) * element_at(a, k)
      }
    }
  }

  /** All-but-the-top residual: x − (x·v)·v as a per-row array<double>
    * expression (codegen'd, rides the scan — the 100 TB-shaped
    * application of a driver-computed component). The dot product folds
    * left-to-right from the first term, matching [[topComponent]]. */
  def projectOut(vec: Column, component: Array[Double]): Column = {
    require(component.nonEmpty, "empty component")
    val dim = component.length
    val dot = (1 until dim).foldLeft(
      element_at(vec, 1).cast("double") * lit(component(0))) { (acc, j) =>
      acc + element_at(vec, j + 1).cast("double") * lit(component(j))
    }
    graft.functions.ColumnOps.bindOnce(dot) { d =>
      transform(sequence(lit(0), lit(dim - 1)), i =>
        element_at(vec, i + 1).cast("double") -
          d * element_at(lit(component), i + 1))
    }
  }
}
