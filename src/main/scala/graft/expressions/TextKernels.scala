package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shingling helper invoked from generated code (one static call per row
  * instead of an interpreted HOF expression tree per shingle — benched
  * ~10× on the dedup operators). */
object ShingleUtil {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct lowercase word n-gram shingles, space-joined. Semantics
    * exactly match the declarative form
    * `array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
    *   i => concat_ws(" ", slice(split(lower(text), "\\s+"), i, n))))`
    * and the DuckDB oracle's list_transform mirror: fewer than n tokens
    * yield one shingle of all tokens. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = ws.split(text.toLowerCase.toString, -1)
    val count = math.max(tokens.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, tokens.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** text → array<string> of distinct lowercase word n-gram shingles. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.ShingleUtil.shingles($t, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "word_shingles"
}

object TextKernels {
  /** Distinct lowercase word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
