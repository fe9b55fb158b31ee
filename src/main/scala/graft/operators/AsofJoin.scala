package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the latest
  * right row with `right.ts <= left.ts` within the same key — the
  * standard temporal-enrichment operator Spark lacks natively.
  *
  * Implemented by composition (SURVEY's preference order (a)): tag and
  * union both sides, order by (key, ts, side) with right-before-left on
  * ties, and carry right payloads forward with `last(_, ignoreNulls)`
  * over an unbounded-preceding window. One shuffle on the key — same
  * cost as a regular sort-merge join, no per-key driver state, skew
  * behaves like any windowed aggregation.
  *
  * Right rows are first deduplicated to one per (key, ts) — keep the
  * max of `rightOrd` — so tie behavior is well-defined (DuckDB's ASOF
  * leaves same-timestamp winners unspecified otherwise).
  */
object AsofJoin {

  /** @param payload right-side columns carried onto left rows
    * @param rightOrd unique right column breaking (key, ts) ties */
  def asofLeft(left: DataFrame, leftKey: String, leftTs: Column,
               right: DataFrame, rightKey: String, rightTs: Column,
               rightOrd: String, payload: Seq[String]): DataFrame = {
    val rightDedup = right
      .groupBy(col(rightKey).as("__k"), unix_micros(rightTs.cast("timestamp")).as("__t"))
      .agg(max(col(rightOrd)).as(rightOrd),
        payload.filterNot(_ == rightOrd)
          .map(c => max_by(col(c), col(rightOrd)).as(c)): _*)
    val leftCols = left.columns
    // Payloads ride in ONE struct filled atomically with last(ignoreNulls):
    // the matched right row wins as a whole, so its null payload columns
    // come through as nulls instead of leaking stale values from an older
    // right row (per-column fill would skip just the null column).
    val payloadStruct = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(
        c, rightDedup.schema(c).dataType, nullable = true)))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", unix_micros(leftTs.cast("timestamp")))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadStruct))
      .select(Seq(col("__k"), col("__t"), col("__side"), col("__p")) ++
        leftCols.map(col): _*)
    val r = rightDedup
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
      .select(Seq(col("__k"), col("__t"), col("__side"), col("__p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val u = l.unionByName(r)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__f.$c").as(c)): _*)
  }
}
