package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bit-twiddling shared by the Bloom membership kernel's interpreted
  * eval and generated code (same dual-entry pattern as [[LshSigUtil]]).
  *
  * Probe positions come from Kirsch–Mitzenmacher double hashing
  * (g_i = h1 + i·h2 mod m, "Less Hashing, Same Performance", ESA 2006 —
  * the construction inside Guava's and Spark's own BloomFilter): two
  * 64-bit hashes simulate all k probes with no loss in the false
  * positive bound.
  */
object BloomUtil {
  /** Set the k probe bits for one key (build side; mutates `bits`). */
  def set(bits: Array[Long], h1: Long, h2: Long, k: Int): Unit = {
    val m = bits.length.toLong * 64L
    var h = h1
    var i = 0
    while (i < k) {
      val pos = ((h % m) + m) % m
      bits((pos >>> 6).toInt) |= 1L << (pos & 63L)
      h += h2
      i += 1
    }
  }

  /** True iff all k probe bits are set (membership screen: no false
    * negatives, false positives at the sizing-formula rate). */
  def contains(bits: Array[Long], h1: Long, h2: Long, k: Int): Boolean = {
    val m = bits.length.toLong * 64L
    var h = h1
    var i = 0
    while (i < k) {
      val pos = ((h % m) + m) % m
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }
}

/** (h1 bigint, h2 bigint) → boolean Bloom membership test against a
  * fixed bitmap. The bitmap rides the expression as a reference object
  * (shipped once per task in the plan binary, like the IVF centroid and
  * PQ codebook kernels) — rows never shuffle to meet the filter, the
  * filter comes to the scan. */
case class BloomMightContain(left: Expression, right: Expression,
                             bits: Array[Long], numHashes: Int)
    extends BinaryExpression {
  require(bits.nonEmpty, "bloom_might_contain: empty bitmap")
  require(numHashes > 0, s"bloom_might_contain: numHashes must be positive, got $numHashes")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(h1: Any, h2: Any): Any =
    BloomUtil.contains(bits, h1.asInstanceOf[Long], h2.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, (h1, h2) =>
      s"${ev.value} = graft.expressions.BloomUtil.contains($ref, $h1, $h2, $numHashes);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
