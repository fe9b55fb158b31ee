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
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", unix_micros(leftTs.cast("timestamp")))
      .withColumn("__side", lit(1))
    val lPadded = payload.foldLeft(l) { (df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(rightDedup.schema(c).dataType))
    }
    val r = payload.foldLeft(
        rightDedup.withColumn("__side", lit(0))) { (df, c) =>
        df.withColumnRenamed(c, s"__p_$c")
      }
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(s"__p_$c")): _*)
    val u = lPadded.select(
      Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) ++ payload.map(c => col(s"__p_$c")): _*)
      .unionByName(r)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__f_$c").as(c)): _*)
  }
}
