package graft.core

/** Generators for DuckDB oracle SQL that is *bitwise-compatible* with the
  * Spark plans in SparkEntry.
  *
  * Strategy for cross-engine hash-identical floats:
  *  - All vector arithmetic is done in Double with an explicit
  *    left-to-right fold. Spark's `aggregate(zip_with(...))` folds
  *    sequentially over array order; the generated SQL spells out the
  *    same chain (`0.0 + t1 + t2 + ...`), which parses left-associative
  *    — identical IEEE-754 operation sequence, identical bits.
  *  - Aggregated doubles (SUM over rows) are order-dependent, so both
  *    sides cast to DECIMAL first (exact, order-independent), sum, then
  *    cast back to DOUBLE.
  *  - Integer outputs are cast to BIGINT on both sides; timestamps are
  *    formatted to strings (`yyyy-MM-dd HH:mm:ss`) to sidestep
  *    LTZ/NTZ/ns-precision representation differences.
  *
  * DuckDB lists are 1-indexed; Spark's `element_at` is 1-indexed too, so
  * the same index appears on both sides where needed.
  *
  * FLOAT LITERALS: write double constants as STRING casts —
  * `CAST('0.123…' AS DOUBLE)` — never bare decimal literals. DuckDB
  * parses a bare decimal literal as DECIMAL(38) (long sum chains then
  * overflow it), and its decimal→double conversion is NOT correctly
  * rounded (measured 1-ulp error on round-trip shortest-repr strings);
  * the string cast goes through strtod and is exact. Distance-only
  * oracles get away with bare literals because argmin/float-rounding
  * absorb the ulp — any DOUBLE output column does not.
  */
object OracleSql {

  /** Default embedding dimension of the driver testdata (FIXTURES.md). */
  val Dim = 64

  private def cd(s: String): String = s"CAST($s AS DOUBLE)"

  /** Sum chain `0.0 + t1 + ... + tn` — left-associative, matching a
    * sequential Spark `aggregate` fold with a 0.0 initial value. */
  private def chain(terms: Seq[String]): String = ("0.0" +: terms).mkString(" + ")

  /** Squared L2 distance between two list columns, explicit fold. */
  def l2Sq(a: String, b: String, dim: Int = Dim): String =
    chain((1 to dim).map { i =>
      val t = s"(${cd(s"$a[$i]")} - ${cd(s"$b[$i]")})"
      s"$t * $t"
    })

  def l2(a: String, b: String, dim: Int = Dim): String = s"sqrt(${l2Sq(a, b, dim)})"

  def dot(a: String, b: String, dim: Int = Dim): String =
    chain((1 to dim).map(i => s"${cd(s"$a[$i]")} * ${cd(s"$b[$i]")}"))

  def norm(a: String, dim: Int = Dim): String = s"sqrt(${dot(a, a, dim)})"

  def cosineDistance(a: String, b: String, dim: Int = Dim): String =
    s"1.0 - (${dot(a, b, dim)}) / (${norm(a, dim)} * ${norm(b, dim)})"

  def cosineSim(a: String, b: String, dim: Int = Dim): String =
    s"(${dot(a, b, dim)}) / (${norm(a, dim)} * ${norm(b, dim)})"

  /** CTE exposing the query vector (vec_id = `qid`) as table q(qe). */
  def queryCte(qid: Long): String =
    s"WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $qid)"

  /** Order-independent exact SUM of a double expression: route through
    * DECIMAL. `scale` must cover the true decimal precision of expr.
    *
    * The final decimal → double step goes through VARCHAR: DuckDB's
    * direct `CAST(DECIMAL AS DOUBLE)` double-rounds (int128 → double,
    * then × 10^-scale) and drifts from the correctly-rounded value
    * once the scaled integer exceeds 2^53 — measured at the sf1
    * spot-check tier (sum 114962.632068375 at scale 12 came back
    * …37501). String → double is correctly-rounded strtod, which is
    * exactly Spark's `BigDecimal.doubleValue` semantics, so the route
    * is bit-exact at ANY magnitude. (Mirror of the double → decimal
    * VARCHAR route used for Spark cast semantics elsewhere.) */
  def decSum(expr: String, scale: Int = 2, precision: Int = 28): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL($precision,$scale))) AS VARCHAR) AS DOUBLE)"

  /** BQ sign-bit word `w` (0-based) of a float list column: the
    * CASE-weight sum matching `SignPackFloat`'s MSB-first fold — bit for
    * dim d = w·wordBits + j carries weight 2^(wordBits−1−j), and a
    * trailing partial word folds fewer bits (weights shrink with it).
    * Integer arithmetic, so the sum is exact in both engines. */
  def bqWord(a: String, w: Int, dim: Int = Dim, wordBits: Int = 32): String = {
    val dims = (w * wordBits) until math.min((w + 1) * wordBits, dim)
    require(dims.nonEmpty, s"bqWord: word $w empty at dim $dim")
    val width = dims.size
    val terms = dims.zipWithIndex.map { case (d, j) =>
      val weight = 1L << (width - 1 - j)
      s"CASE WHEN $a[${d + 1}] >= 0 THEN CAST($weight AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    s"(${terms.mkString(" + ")})"
  }

  /** Full BQ code as a DuckDB list of words. */
  def bqCode(a: String, dim: Int = Dim, wordBits: Int = 32): String = {
    val words = (0 until (dim + wordBits - 1) / wordBits)
      .map(w => bqWord(a, w, dim, wordBits))
    s"[${words.mkString(", ")}]"
  }

  /** Hamming distance Σ_w bit_count(xor(word_w(a), word_w(b))). */
  def bqHamming(a: String, b: String, dim: Int = Dim, wordBits: Int = 32): String = {
    val words = (0 until (dim + wordBits - 1) / wordBits).map { w =>
      s"bit_count(xor(${bqWord(a, w, dim, wordBits)}, ${bqWord(b, w, dim, wordBits)}))"
    }
    s"CAST(${words.mkString(" + ")} AS BIGINT)"
  }

  /** CENTERED BQ word: bit_d = [a_d ≥ ts_d] with per-dim thresholds
    * from a list expression `ts` (the SignPackFloat thresholds path —
    * comparison in DOUBLE on both engines). */
  def bqWordThresh(a: String, ts: String, w: Int, dim: Int = Dim,
                   wordBits: Int = 32): String = {
    val dims = (w * wordBits) until math.min((w + 1) * wordBits, dim)
    require(dims.nonEmpty, s"bqWordThresh: word $w empty at dim $dim")
    val width = dims.size
    val terms = dims.zipWithIndex.map { case (d, j) =>
      val weight = 1L << (width - 1 - j)
      s"CASE WHEN CAST($a[${d + 1}] AS DOUBLE) >= $ts[${d + 1}] " +
        s"THEN CAST($weight AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    s"(${terms.mkString(" + ")})"
  }

  /** Hamming distance over centered codes (thresholds list `ts`). */
  def bqHammingThresh(a: String, b: String, ts: String, dim: Int = Dim,
                      wordBits: Int = 32): String = {
    val words = (0 until (dim + wordBits - 1) / wordBits).map { w =>
      s"bit_count(xor(${bqWordThresh(a, ts, w, dim, wordBits)}, " +
        s"${bqWordThresh(b, ts, w, dim, wordBits)}))"
    }
    s"CAST(${words.mkString(" + ")} AS BIGINT)"
  }
}
