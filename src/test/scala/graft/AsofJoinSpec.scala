package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("asofLeft attaches the latest right row at or before each left ts") {
    val s = spark
    import s.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val quotes = Seq( // (key, ts, qid, price)
      (1L, ts(0), 10L, 1.0), (1L, ts(10), 11L, 2.0), (1L, ts(20), 12L, 3.0),
      (2L, ts(15), 20L, 9.0))
      .toDF("k", "t", "qid", "price")
    val trades = Seq( // (key, ts, tid)
      (1L, ts(5), 100L),   // → quote 10
      (1L, ts(10), 101L),  // tie: same-ts quote counts → 11
      (1L, ts(59), 102L),  // → latest quote 12
      (2L, ts(1), 200L),   // no prior quote → null
      (3L, ts(30), 300L))  // key never quoted → null
      .toDF("k", "t", "tid")
    val r = AsofJoin.asofLeft(trades, "k", col("t"), quotes, "k", col("t"),
        "qid", Seq("qid", "price"))
      .orderBy("tid").collect()
      .map(x => (x.getAs[Long]("tid"),
        Option(x.getAs[java.lang.Long]("qid")).map(_.toLong),
        Option(x.getAs[java.lang.Double]("price")).map(_.toDouble)))
    assert(r.toSeq == Seq(
      (100L, Some(10L), Some(1.0)),
      (101L, Some(11L), Some(2.0)),
      (102L, Some(12L), Some(3.0)),
      (200L, None, None),
      (300L, None, None)))
  }

  test("matched right row's null payload column wins (no stale leak-through)") {
    val s = spark
    import s.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // older quote has a price; the MATCHED (newer) quote's price is null —
    // true as-of semantics return the matched row's null, not the stale 1.0
    val quotes = Seq(
      (1L, ts(0), 10L, Option(1.0)),
      (1L, ts(10), 11L, Option.empty[Double]))
      .toDF("k", "t", "qid", "price")
    val trades = Seq((1L, ts(20), 100L)).toDF("k", "t", "tid")
    val r = AsofJoin.asofLeft(trades, "k", col("t"), quotes, "k", col("t"),
        "qid", Seq("qid", "price")).head
    assert(r.getAs[Long]("qid") == 11L)
    assert(r.isNullAt(r.fieldIndex("price")))
  }

  test("right-side (key, ts) duplicates resolve to the max-ord row") {
    val s = spark
    import s.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val quotes = Seq((1L, ts(0), 5L, 1.0), (1L, ts(0), 7L, 9.0)) // same key+ts
      .toDF("k", "t", "qid", "price")
    val trades = Seq((1L, ts(1), 100L)).toDF("k", "t", "tid")
    val r = AsofJoin.asofLeft(trades, "k", col("t"), quotes, "k", col("t"),
        "qid", Seq("qid", "price")).head
    assert(r.getAs[Long]("qid") == 7L && r.getAs[Double]("price") == 9.0)
  }
}
