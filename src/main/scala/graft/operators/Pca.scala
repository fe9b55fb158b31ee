package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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
  * Scale: the corpus is touched ONCE — each row folds its dim·(dim+1)/2
  * products into a packed per-partition decimal buffer in place (the
  * KMeans dense-buffer discipline; no per-row struct generation, no
  * wide-key hash aggregate), and only numPartitions serialized buffers
  * cross the shuffle; everything after is driver-local on dim² doubles.
  * Row sampling (the [[Sketch.sampledQuantiles]] discipline) remains
  * the lever for very wide embeddings — the per-row arithmetic is still
  * O(dim²).
  */
object Pca {

  /** Dense upper-triangle Gram accumulator: ONE buffer of dim·(dim+1)/2
    * exact decimals per partition, updated in place per row — no
    * per-row struct generation, no dim²/2-key hash aggregate, nothing
    * but the packed buffer crosses the (single-row) shuffle. Arithmetic
    * is kept OPERATION-FOR-OPERATION identical to the SQL route it
    * replaces ([[secondMomentExplode]]), so results stay bit-exact and
    * DuckDB-replayable:
    *   - per-term decimal = `CAST(double AS DECIMAL(38,18))` semantics:
    *     shortest-decimal rendering (`Double.toString`, what Spark's
    *     `Decimal(d)` parses) rounded to scale 18 HALF_UP; NaN/Infinity
    *     skip as null-casts, finite out-of-range products throw —
    *     exactly the measured ANSI cast behavior;
    *   - cell sum = exact scale-18 decimal addition (order-free);
    *   - final value = decimal→double correct rounding (`doubleValue`).
    * Buffer ships kryo-serialized only at the partial→final boundary
    * (numPartitions rows); finish unpacks to (i, j, m) tuples. */
  private final class GramAgg(dim: Int) extends Aggregator[
      Seq[Double], Array[java.math.BigDecimal], Seq[(Int, Int, Double)]] {
    private val n = dim * (dim + 1) / 2

    override def zero: Array[java.math.BigDecimal] =
      Array.fill(n)(java.math.BigDecimal.ZERO.setScale(18))

    override def reduce(buf: Array[java.math.BigDecimal],
                        v: Seq[Double]): Array[java.math.BigDecimal] = {
      if (v == null) return buf
      // ANSI element_at semantics, same as the SQL route: an array
      // shorter than dim is an error (extra elements beyond dim are
      // simply unread on both routes)
      if (v.length < dim)
        throw new ArrayIndexOutOfBoundsException(
          s"vector has ${v.length} elements; the Gram aggregation reads dim=$dim")
      val len = dim
      val arr = new Array[Double](len)
      var c = 0
      while (c < len) { arr(c) = v(c); c += 1 }
      var i = 0
      var idx = 0
      while (i < len) {
        val vi = arr(i)
        // rows i with i >= len contribute nothing; their packed cells
        // are skipped by jumping idx to the row start each iteration
        idx = i * dim - i * (i - 1) / 2
        var j = i
        while (j < len) {
          val p = vi * arr(j)
          // ANSI cast semantics, same as the SQL route (measured, not
          // assumed — PcaSpec pins both): NaN/Infinity cast to null and
          // the term is skipped, while a FINITE value past
          // DECIMAL(38,18)'s range is an error
          if (!java.lang.Double.isNaN(p) && !java.lang.Double.isInfinite(p)) {
            val term = new java.math.BigDecimal(java.lang.Double.toString(p))
              .setScale(18, java.math.RoundingMode.HALF_UP)
            if (term.precision > 38)
              throw new ArithmeticException(
                s"product $p cannot be represented as Decimal(38,18)")
            buf(idx) = buf(idx).add(term)
          }
          idx += 1
          j += 1
        }
        i += 1
      }
      buf
    }

    override def merge(a: Array[java.math.BigDecimal],
                       b: Array[java.math.BigDecimal]): Array[java.math.BigDecimal] = {
      var i = 0
      while (i < n) { a(i) = a(i).add(b(i)); i += 1 }
      a
    }

    override def finish(r: Array[java.math.BigDecimal]): Seq[(Int, Int, Double)] = {
      val out = new Array[(Int, Int, Double)](n)
      var idx = 0
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          // ANSI sum-overflow check, mirrored from Decimal sum's final
          // changePrecision (signs can cancel, so only the final value
          // is checked)
          if (r(idx).precision > 38)
            throw new ArithmeticException(
              s"Gram sum ${r(idx)} cannot be represented as Decimal(38,18)")
          out(idx) = (i, j, r(idx).doubleValue)
          idx += 1
          j += 1
        }
        i += 1
      }
      out.toSeq
    }

    override def bufferEncoder: Encoder[Array[java.math.BigDecimal]] =
      Encoders.kryo[Array[java.math.BigDecimal]]
    override def outputEncoder: Encoder[Seq[(Int, Int, Double)]] =
      ExpressionEncoder[Seq[(Int, Int, Double)]]()
  }

  /** Second-moment (uncentered Gram) matrix as a (i, j, m) table,
    * i, j ∈ [0, dim). Decimal-routed exact sums → double, bit-exact
    * under any partitioning.
    *
    * Only the upper triangle (i ≤ j) is accumulated — M is symmetric
    * and the decimal sum is order-independent, so mirroring M_ij into
    * M_ji afterward is bit-identical to accumulating both. The
    * accumulation is a [[GramAgg]] dense-buffer aggregation (each row
    * updates a packed in-place buffer), NOT a dim²/2-way per-row
    * explode — the row-expansion shape made this the plan to rewrite
    * before a 100× scale-up (at dim 1024 it generated 1M structs per
    * input row; the buffer pays the same decimal arithmetic with zero
    * row fan-out). [[secondMomentExplode]] keeps the SQL-route twin
    * that the DuckDB oracle replays; PcaSpec pins bit-equality.
    *
    * Note: over an EMPTY input this emits the n zero cells (a global
    * aggregate always yields its zero buffer) where the explode route
    * emits no rows — [[topComponent]] sees the same all-zero matrix
    * either way. */
  def secondMoment(df: DataFrame, vecCol: Column, dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    // null ELEMENTS map to NaN before the typed boundary: in the SQL
    // route a null component nullifies (→ skips) every product touching
    // it, and NaN has exactly that skip semantics in the aggregator —
    // while a bare null would break Seq[Double] deserialization
    val upper = df.select(transform(vecCol.cast("array<double>"),
        x => coalesce(x, lit(Double.NaN))).as("__v"))
      .filter(col("__v").isNotNull)
      .as[Seq[Double]]
      .select(new GramAgg(dim).toColumn) // typed select: global aggregate
      .toDF("g")
      .select(explode(col("g")).as("e"))
      .select(col("e._1").as("i"), col("e._2").as("j"), col("e._3").as("m"))
    mirror(upper)
  }

  /** The SQL-route second moment (per-row upper-triangle explode →
    * decimal-sum hash aggregate) — the shape the DuckDB oracle replays
    * literally. Kept as the bit-equality twin for [[secondMoment]]'s
    * dense-buffer aggregator; prefer [[secondMoment]] everywhere (same
    * values, no dim²/2-per-row generate). */
  private[graft] def secondMomentExplode(df: DataFrame, vecCol: Column,
                                         dim: Int): DataFrame = {
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
    mirror(upper)
  }

  // mirror AFTER the aggregation (a generate over ≤ dim² rows) — a
  // union of two references to `upper` would re-plan the whole corpus
  // aggregation twice
  private def mirror(upper: DataFrame): DataFrame =
    upper.select(explode(
        when(col("i") === col("j"),
          array(struct(col("i").as("i"), col("j").as("j"), col("m").as("m"))))
          .otherwise(array(
            struct(col("i").as("i"), col("j").as("j"), col("m").as("m")),
            struct(col("j").as("i"), col("i").as("j"), col("m").as("m")))))
        .as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.m").as("m"))

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
