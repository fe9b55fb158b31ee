package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join: pair each left row with the right rows sharing its
  * key whose timestamp falls in `[left.ts - window, left.ts]` — the
  * "recent history" enrichment operator (e.g. orders in the 30 days
  * before an event). Spark has no native range join; a naive theta join
  * plans as a broadcast-nested-loop over the key-matched cross product.
  *
  * Implemented as a bucketed equi-join (SURVEY preference order (a)):
  * timestamps bucket at `window` granularity; a right row in bucket b
  * can only match left rows in buckets {b, b+1}, so the right side is
  * replicated twice, the join is a plain hash equi-join on
  * (key, bucket), and the exact range predicate filters the residue.
  *
  * Scale: shuffle on (key, bucket) — same as any equi-join; 2× right
  * amplification is constant; no cross product, no driver state. Skewed
  * hot keys split across buckets by time.
  */
object RangeJoin {

  /** Inner pairs: left columns + `payload` right columns, one row per
    * (left row, matching right row). */
  def innerPairs(left: DataFrame, leftKey: String, leftTs: Column,
                 right: DataFrame, rightKey: String, rightTs: Column,
                 windowMicros: Long, payload: Seq[String]): DataFrame = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    val leftCols = left.columns
    val l = left
      .withColumn("__t", unix_micros(leftTs.cast("timestamp")))
      .withColumn("__b", floor(col("__t") / windowMicros))
      .withColumn("__k", col(leftKey))
    // payloads ride under internal names so a payload column that also
    // exists on the left (e.g. the join key itself) cannot make the
    // final projection ambiguous
    val r0 = right
      .withColumn("__rt", unix_micros(rightTs.cast("timestamp")))
      .withColumn("__k", col(rightKey))
      .select(Seq(col("__k"), col("__rt")) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)
    // a right row at rt matches left ts in [rt, rt + window] → left
    // buckets floor(rt/w) and floor(rt/w)+1
    val r = r0.withColumn("__b",
        explode(array(floor(col("__rt") / windowMicros),
          floor(col("__rt") / windowMicros) + 1)))
    l.join(r, Seq("__k", "__b"))
      .filter(col("__rt") >= col("__t") - windowMicros && col("__rt") <= col("__t"))
      .select(leftCols.map(col) ++ payload.map(c => col(s"__p_$c").as(c)): _*)
  }
}
