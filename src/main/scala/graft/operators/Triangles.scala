package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficients over an
  * undirected pair graph — the graph-structure metric that tells a
  * dedup pipeline whether its near-dup pairs form tight mutual
  * clusters (triangle-rich components are true duplicate families;
  * triangle-free stars are often one hub falsely matching many
  * satellites). Complements [[Dedup.connectedComponents]] (membership)
  * and [[PageRank]] (authority).
  *
  * Scale design (Suri & Vassilvitskii, WWW 2011 "Counting Triangles
  * and the Curse of the Last Reducer"): each undirected edge is
  * ORIENTED from its (degree, id)-smaller endpoint to the larger, and
  * wedges are generated only from each vertex's out-edges. Out-degree
  * under this orientation is O(√m) for every vertex regardless of
  * skew, so the wedge fan-out is O(m^1.5) worst case instead of the
  * Σdeg² a hub would cost — the "last reducer" killer on
  * power-law graphs. One wedge self-join + one closing-edge join, all
  * key-partitioned; no driver state.
  *
  * Determinism: counting and degrees are exact integers; the
  * clustering coefficient is ONE IEEE division 2T/(d(d−1)) of exact
  * longs — bit-replayable in SQL, where the oracle counts the same
  * triangles by the id-ordered 3-way join (each triangle once either
  * way). */
object Triangles {

  /** Canonical distinct undirected edge list (a < b, self-loops
    * dropped). */
  private def canonical(pairs: DataFrame, aCol: String,
                        bCol: String): DataFrame =
    pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()

  /** One row per triangle: (t1, t2, t3) with t1 < t2 < t3. */
  def triangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = canonical(pairs, aCol, bCol)
    val und = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy(col("u").as("id")).agg(count(lit(1)).as("d"))
    val dirE = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("d").as("dv")), Seq("v"))
      .where(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"))
    val w1 = dirE.select(col("u"), col("v").as("x"))
    val w2 = dirE.select(col("u"), col("v").as("y"))
    val wedges = w1.join(w2, Seq("u")).where(col("x") < col("y"))
    wedges.join(e,
        e("a") === least(col("x"), col("y")) &&
          e("b") === greatest(col("x"), col("y")))
      .select(col("u"), col("x"), col("y"))
      .select(
        least(col("u"), least(col("x"), col("y"))).as("t1"),
        (col("u") + col("x") + col("y")
          - least(col("u"), least(col("x"), col("y")))
          - greatest(col("u"), greatest(col("x"), col("y")))).as("t2"),
        greatest(col("u"), greatest(col("x"), col("y"))).as("t3"))
  }

  /** Per-vertex structure: (id, deg, n_tri, coeff) for every vertex
    * with ≥ 1 edge; coeff = 2T/(d(d−1)), 0.0 below degree 2. */
  def perVertex(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = canonical(pairs, aCol, bCol)
    val und = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    val corners = triangles(pairs, aCol, bCol)
      .select(explode(array(col("t1"), col("t2"), col("t3"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.join(corners, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          (lit(2L) * coalesce(col("n_tri"), lit(0L))).cast("double") /
            (col("deg") * (col("deg") - 1L)).cast("double"))
          .otherwise(lit(0.0d)).as("coeff"))
  }
}
