package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity primitives as native Catalyst column
  * expressions (codegen'd higher-order functions — no UDFs).
  *
  * Semantics replicate the reference's single distance metric
  * (`/root/reference/src/vector_db/util/distance.py:3-4`,
  * `euclidean_vector_distance = np.linalg.norm(v1-v2)`), computed in
  * Double with a deterministic left-to-right fold so results are
  * bitwise-reproducible across engines (the DuckDB oracle evaluates the
  * same IEEE-754 operation sequence).
  *
  * All functions operate on `array<float>` or `array<double>` columns;
  * elements are cast to Double before any arithmetic.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Squared L2 distance: sequential fold of (a_i - b_i)^2 in Double. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) distance — the reference's only metric. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product in Double, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a single vector. */
  def norm(a: Column): Column =
    sqrt(aggregate(zip_with(a, a, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity. NaN on zero vectors (caller filters if needed). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column = lit(1.0) - cosine(a, b)
}
