package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Whole-stage-codegen'd distance kernels over `array<float>` columns.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every row pays interpreted lambda dispatch, which
  * bench showed dominating the pairwise operators (SURVEY §4 anticipated
  * exactly this: "L2Distance Expression (codegen) — optional, perf-gated;
  * measure first"). These kernels generate a tight primitive loop
  * instead.
  *
  * Numeric contract: identical IEEE-754 operation sequence to the HOF
  * fold and to the DuckDB oracle's explicit `0.0 + t1 + ... + tn` chain —
  * each element pair is converted float→double (exact) and accumulated
  * left-to-right — so swapping implementations cannot change a single
  * bit of any result.
  */
abstract class FloatFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Java source for one loop step: accumulate into `acc` from floats `xf`, `yf`. */
  protected def stepJava(acc: String, xf: String, yf: String): String
  protected def stepEval(x: Float, y: Float): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector dimension mismatch (${n} vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += stepEval(x.getFloat(i), y.getFloat(i)); i += 1 }
    acc
  }

  // Hard-error on dimension mismatch (the reference's dim-validation
  // contract, embedding_service.py:146-149) — an unchecked off-heap read
  // past a short vector would yield silent garbage distances.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dimension mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${stepJava(ev.value.toString, s"$x.getFloat($i)", s"$y.getFloat($i)")}
         |}
       """.stripMargin
    })
}

/** Σ (a_i - b_i)^2 in double, sequential. */
case class L2SqFloat(left: Expression, right: Expression) extends FloatFold {
  override protected def stepJava(acc: String, xf: String, yf: String): String =
    s"double d = (double)$xf - (double)$yf; $acc += d * d;"
  override protected def stepEval(x: Float, y: Float): Double = {
    val d = x.toDouble - y.toDouble; d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "l2_sq_float"
}

/** Σ a_i · b_i in double, sequential. */
case class DotFloat(left: Expression, right: Expression) extends FloatFold {
  override protected def stepJava(acc: String, xf: String, yf: String): String =
    s"$acc += (double)$xf * (double)$yf;"
  override protected def stepEval(x: Float, y: Float): Double =
    x.toDouble * y.toDouble
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_float"
}

/** Argmin-distance centroid index over (a slice of) a float vector —
  * the assignment/encode kernel shared by IVF (offset 0, full dim) and
  * PQ (per-chunk offsets). One generated loop over k×subDim; the
  * codebook rides along as a referenced object, not literal SQL.
  * First-match tie-break on equal distances (numpy argmin). */
case class NearestCentroidFloat(child: Expression,
                                centroids: Array[Array[Float]],
                                offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty,
    "nearest_centroid_float: empty centroid set (corrupt/empty model?) " +
      "would silently assign every row to index 0")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }

  private val subDim = if (centroids.nonEmpty) centroids(0).length else 0

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (offset + subDim > a.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector too short (${a.numElements()}) for slice " +
          s"[$offset, ${offset + subDim})")
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val d = a.getFloat(offset + i).toDouble - c(i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val bd = ctx.freshName("bestD")
      val cj = ctx.freshName("cj")
      s"""
         |if (${offset + subDim} > $a.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector too short (" + $a.numElements() +
         |    ") for slice [$offset, ${offset + subDim})");
         |}
         |double $bd = Double.MAX_VALUE;
         |${ev.value} = 0;
         |for (int $j = 0; $j < $cb.length; $j++) {
         |  float[] $cj = $cb[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $cj.length; $i++) {
         |    double $d = (double)$a.getFloat($offset + $i) - (double)$cj[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bd) { $bd = $s; ${ev.value} = $j; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_centroid_float"
}

/** Two-level argmin-distance assignment: argmin over `supers`
  * (coarse level), then argmin over that super-cluster's `children`,
  * returning the GLOBAL child index (children flattened in super
  * order). This is the hierarchical-IVF assignment kernel: per row it
  * scans k₁ + k₂(g) centroids — O(2·√k·dim) at the balanced geometry —
  * where the flat [[NearestCentroidFloat]] scans all k. The two levels
  * use the same double-accumulated L2² fold and first-match tie-break
  * as the flat kernel, so a one-super model degenerates to it exactly.
  * Offsets are precomputed once per expression instance; the (ragged)
  * child matrix rides along as a referenced object. */
case class TwoLevelNearestCentroidFloat(child: Expression,
                                        supers: Array[Array[Float]],
                                        childGroups: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(supers.nonEmpty, "two_level_nearest_centroid: empty super set")
  require(childGroups.length == supers.length,
    s"two_level_nearest_centroid: ${childGroups.length} child groups for " +
      s"${supers.length} supers")
  require(childGroups.forall(_.nonEmpty),
    "two_level_nearest_centroid: a super-cluster with zero children " +
      "would leave its rows unassignable")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }

  private val dim = supers(0).length
  // global id of group g's first child = count of all children before g
  @transient private lazy val offsets: Array[Int] =
    childGroups.scanLeft(0)(_ + _.length).init

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: vector dim ${a.numElements()} != centroid dim $dim")
    def argmin(cents: Array[Array[Float]]): Int = {
      var best = 0; var bestD = Double.MaxValue; var j = 0
      while (j < cents.length) {
        val c = cents(j); var s = 0.0; var i = 0
        while (i < c.length) {
          val d = a.getFloat(i).toDouble - c(i); s += d * d; i += 1
        }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      best
    }
    val g = argmin(supers)
    offsets(g) + argmin(childGroups(g))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sup = ctx.addReferenceObj("supers", supers, "float[][]")
    val kids = ctx.addReferenceObj("childGroups", childGroups, "float[][][]")
    val off = ctx.addReferenceObj("offsets", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val bd = ctx.freshName("bestD")
      val cj = ctx.freshName("cj")
      val grp = ctx.freshName("grp")
      val cb = ctx.freshName("cb")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dim " + $a.numElements() +
         |    " != centroid dim $dim");
         |}
         |int $g = 0;
         |double $bd = Double.MAX_VALUE;
         |for (int $j = 0; $j < $sup.length; $j++) {
         |  float[] $cj = $sup[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $cj.length; $i++) {
         |    double $d = (double)$a.getFloat($i) - (double)$cj[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bd) { $bd = $s; $g = $j; }
         |}
         |float[][] $grp = $kids[$g];
         |int $cb = 0;
         |$bd = Double.MAX_VALUE;
         |for (int $j = 0; $j < $grp.length; $j++) {
         |  float[] $cj = $grp[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $cj.length; $i++) {
         |    double $d = (double)$a.getFloat($i) - (double)$cj[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bd) { $bd = $s; $cb = $j; }
         |}
         |${ev.value} = $off[$g] + $cb;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "two_level_nearest_centroid_float"
}

/** Hyperplane-signature helper invoked from generated code: all L·b
  * plane dots in one pass over the vector row, one static call per row.
  * Bit j of table t = [dot(v, planes[t·b + j]) ≥ 0], with the engine-wide
  * left-to-right float→double dot fold (identical to [[DotFloat]] and to
  * the driver-side `Lsh.signatures`). */
object LshSigUtil {
  def signatures(v: ArrayData, planes: Array[Array[Float]],
                 bitsPerTable: Int): ArrayData = {
    val dim = planes(0).length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_sigs: vector dim ${v.numElements()} != plane dim $dim")
    val out = new Array[Int](planes.length / bitsPerTable)
    var p = 0
    while (p < planes.length) {
      val h = planes(p)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v.getFloat(i).toDouble * h(i).toDouble; i += 1 }
      if (acc >= 0) out(p / bitsPerTable) |= 1 << (p % bitsPerTable)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** array<float> → array<int> of per-table hyperplane LSH signatures. */
case class HyperplaneSigsFloat(child: Expression,
                               planes: Array[Array[Float]],
                               bitsPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes.nonEmpty && planes.length % bitsPerTable == 0,
    s"hyperplane_sigs: ${planes.length} planes not divisible by $bitsPerTable bits/table")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LshSigUtil.signatures(v.asInstanceOf[ArrayData], planes, bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.LshSigUtil.signatures($v, $ref, $bitsPerTable);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hyperplane_sigs"
}

/** Natural log via `java.lang.Math.log`. Spark's built-in `log` uses
  * StrictMath (fdlibm), which differs from the platform libm — and thus
  * from the DuckDB oracle — far more often; Math.log agrees with libm
  * on almost all inputs but NOT bitwise universally (counterexample:
  * ln(0x1.affd60b8p-1) differs in the last ulp). Queries that emit a
  * raw ln output for a hash-exact oracle compare are betting on their
  * specific inputs; compositions should emit ln-free columns and use
  * the ln only for ORDERING (a top-k flip needs two independent keys
  * within 1 ulp of each other at the cut — vanishing, vs per-value
  * ulp divergence which is merely rare). Null-in → null-out. */
case class LnDouble(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = java.lang.Math.log(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Math.log($x)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "ln_libm"
}

/** IEEE-754 double → order-preserving UNSIGNED-comparable long (as a
  * signed long whose UNSIGNED order matches double order): flip all
  * non-sign bits for negatives, then flip the sign bit — the classic
  * radix-sort key transform. -Inf < … < -0.0 < +0.0 < … < +Inf < NaN
  * (NaN's payload bits sort above +Inf, matching "NaN greatest" in
  * both Spark and DuckDB orderings). Exactly invertible
  * ([[graft.operators.Sketch]] `orderedBitsToDouble`); the distributed
  * exact-selection quantiles radix-bisect on this key. Null-in →
  * null-out. */
case class DoubleOrderedBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    (b ^ ((b >> 63) & 0x7fffffffffffffffL)) ^ java.lang.Long.MIN_VALUE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("bits")
      s"""long $b = Double.doubleToLongBits($x);
         |${ev.value} = ($b ^ (($b >> 63) & 0x7fffffffffffffffL)) ^ Long.MIN_VALUE;
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "double_ordered_bits"
}

/** ADC lookup fold: Σ_c table(c)(code(c)) over an `array<int>` PQ code —
  * the per-row cost of ADC search drops to `chunks` array reads. The
  * distance table (chunks×k query-to-centroid partials) rides along as a
  * referenced object. Codes are validated against the table bounds. */
case class AdcLookupFloat(child: Expression, table: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[ArrayData]
    if (code.numElements() != table.length)
      throw new IllegalArgumentException(
        s"$prettyName: code length ${code.numElements()} != chunks ${table.length}")
    var acc = 0.0
    var c = 0
    while (c < table.length) {
      val idx = code.getInt(c)
      if (idx < 0 || idx >= table(c).length)
        throw new IllegalArgumentException(
          s"$prettyName: code $idx out of range [0, ${table(c).length}) at chunk $c")
      acc += table(c)(idx)
      c += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tb = ctx.addReferenceObj("adcTable", table, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      s"""
         |if ($a.numElements() != $tb.length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: code length " + $a.numElements() + " != chunks " + $tb.length);
         |}
         |${ev.value} = 0.0;
         |for (int $c = 0; $c < $tb.length; $c++) {
         |  int $idx = $a.getInt($c);
         |  if ($idx < 0 || $idx >= $tb[$c].length) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: code " + $idx + " out of range at chunk " + $c);
         |  }
         |  ${ev.value} += $tb[$c][$idx];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "adc_lookup_float"
}

/** Sign-bit pack: array<float> → array<long> of `wordBits`-bit words.
  * Word w is a left fold over its dims d = w·wordBits + j (j ascending):
  * acc = acc·2 + [v_d ≥ t_d] — so bit weights are MSB-first within the
  * word and a trailing partial word simply folds fewer bits. The
  * default threshold is 0 for every dim (plain sign bits); a
  * `thresholds` array (CENTERED BQ — the per-dim range midpoints
  * [[graft.operators.Bq.trainThresholds]] produces) compares each dim
  * against its own cut in DOUBLE precision, which is what makes BQ
  * informative on non-centered corpora: on all-positive embeddings
  * (count vectors, [0,1)-normalized features) plain sign bits are
  * constant and the Hamming screen is blind — measured 0/10 recall at
  * every rerank window in ScaleProbe `bq_recall_sweep`. The ≥ is the
  * Java primitive comparison (−0.0f packs as 1 at t=0, NaN as 0); the
  * DuckDB oracle spells the identical CASE-weight sum. 1-bit binary
  * quantization for Hamming pre-screening (64× smaller than float32). */
case class SignPackFloat(child: Expression, wordBits: Int,
                         thresholds: Seq[Double] = Nil)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(wordBits >= 1 && wordBits <= 62,
    s"sign_pack_float: wordBits $wordBits outside [1, 62] (63+ risks sign overflow)")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.simpleString}")
  }

  @transient private lazy val threshArr: Array[Double] = thresholds.toArray

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (threshArr.nonEmpty) require(n <= threshArr.length,
      s"sign_pack_float: ${threshArr.length} thresholds for a $n-dim vector")
    val out = new Array[Long]((n + wordBits - 1) / wordBits)
    var d = 0
    while (d < n) {
      val w = d / wordBits
      val t = if (threshArr.isEmpty) 0.0 else threshArr(d)
      out(w) = out(w) * 2L + (if (x.getFloat(d) >= t) 1L else 0L)
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val d = ctx.freshName("d")
      // one reference slot serves both the guard and the loop
      val tRef =
        if (thresholds.isEmpty) ""
        else ctx.addReferenceObj("thresh", threshArr, "double[]")
      val cmp =
        if (thresholds.isEmpty) s"$v.getFloat($d) >= 0f"
        else s"((double) $v.getFloat($d)) >= $tRef[$d]"
      val guard =
        if (thresholds.isEmpty) ""
        else
          s"""if ($n > $tRef.length) throw new IllegalArgumentException(
             |  "sign_pack_float: " + $tRef.length + " thresholds for a " + $n + "-dim vector");""".stripMargin
      s"""
         |int $n = $v.numElements();
         |$guard
         |long[] $out = new long[($n + $wordBits - 1) / $wordBits];
         |for (int $d = 0; $d < $n; $d++) {
         |  $out[$d / $wordBits] =
         |    $out[$d / $wordBits] * 2L + ($cmp ? 1L : 0L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "sign_pack_float"
}

/** Hamming distance between two packed-word arrays: Σ bitCount(a_w ^ b_w)
  * as a long. Length mismatch is a hard error (same contract as the
  * float folds — silent zero-extension would understate distances). */
case class HammingLongs(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: code length mismatch ($n vs ${y.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: code length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hamming_longs"
}

object FloatKernels {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def l2Sq(a: Column, b: Column): Column = c(L2SqFloat(e(a), e(b)))
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))
  def dot(a: Column, b: Column): Column = c(DotFloat(e(a), e(b)))
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Index of the nearest centroid to vector[offset:offset+subDim). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Float]],
                      offset: Int = 0): Column =
    c(NearestCentroidFloat(e(vec), centroids, offset))

  /** Two-level assignment: nearest super, then nearest child within it;
    * returns the global child index (hierarchical-IVF kernel). */
  def nearestCentroidTwoLevel(vec: Column, supers: Array[Array[Float]],
                              children: Array[Array[Array[Float]]]): Column =
    c(TwoLevelNearestCentroidFloat(e(vec), supers, children))

  /** ADC table-lookup fold over an array<int> PQ code column. */
  def adcLookup(code: Column, table: Array[Array[Double]]): Column =
    c(AdcLookupFloat(e(code), table))

  /** Per-table hyperplane LSH signatures over an array<float> column. */
  def hyperplaneSigs(vec: Column, planes: Array[Array[Float]],
                     bitsPerTable: Int): Column =
    c(HyperplaneSigsFloat(e(vec), planes, bitsPerTable))

  /** Natural log matching platform libm (and the DuckDB oracle) bitwise. */
  def ln(x: Column): Column = c(LnDouble(e(x.cast("double"))))

  /** Order-preserving unsigned-comparable bit image of a double column
    * (radix-selection key; invert with `Sketch.orderedBitsToDouble`). */
  def orderedBits(x: Column): Column = c(DoubleOrderedBits(e(x.cast("double"))))

  /** Sign-bit pack an array<float> into array<long> words (1-bit BQ). */
  def signPack(vec: Column, wordBits: Int): Column =
    c(SignPackFloat(e(vec), wordBits))

  /** Centered sign pack: bit_d = [v_d ≥ thresholds(d)]. */
  def signPack(vec: Column, wordBits: Int, thresholds: Seq[Double]): Column =
    c(SignPackFloat(e(vec), wordBits, thresholds))

  /** Hamming distance between two packed-word array<long> codes. */
  def hamming(a: Column, b: Column): Column = c(HammingLongs(e(a), e(b)))
}
