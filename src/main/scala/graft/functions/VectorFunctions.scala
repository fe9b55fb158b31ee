package graft.functions

import graft.expressions.FloatKernels
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity primitives as native Catalyst column
  * expressions — backed by the codegen'd [[graft.expressions.FloatKernels]]
  * (tight primitive loops inside whole-stage codegen).
  *
  * Semantics replicate the reference's single distance metric
  * (`/root/reference/src/vector_db/util/distance.py:3-4`,
  * `euclidean_vector_distance = np.linalg.norm(v1-v2)`), computed in
  * Double with a deterministic left-to-right fold so results are
  * bitwise-reproducible across engines (the DuckDB oracle evaluates the
  * same IEEE-754 operation sequence; the `*Hof` twins below are the
  * higher-order-function forms kept for cross-validation in tests).
  */
object VectorFunctions {

  /** Squared L2 distance: sequential fold of (a_i - b_i)^2 in Double. */
  def l2Sq(a: Column, b: Column): Column = FloatKernels.l2Sq(a, b)

  /** Euclidean (L2) distance — the reference's only metric. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product in Double, sequential fold. */
  def dot(a: Column, b: Column): Column = FloatKernels.dot(a, b)

  /** L2 norm of a single vector. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. NaN on zero vectors (caller filters if needed). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column = lit(1.0) - cosine(a, b)

  // ---- interpreted higher-order-function twins (bitwise-identical
  // results; used by tests to cross-check the codegen kernels) ----

  private def d(c: Column): Column = c.cast("double")

  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, v) => acc + v)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)
}
