package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed range join must equal the naive theta join exactly —
  * bucketing is a physical optimization, never a semantic change. */
class RangeJoinSpec extends SparkSpec {

  test("innerPairs equals the brute-force range predicate join") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    val left = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, ts(rnd.nextInt(10000).toLong)))
      .toDF("lid", "k", "t")
    val right = (0 until 300).map(i =>
      (i.toLong + 1000, rnd.nextInt(5).toLong, ts(rnd.nextInt(10000).toLong), rnd.nextDouble()))
      .toDF("rid", "k", "rt", "x")
    val w = 37L * 60000000L // 37 min in micros — deliberately not bucket-aligned

    val got = RangeJoin.innerPairs(left, "k", col("t"), right, "k", col("rt"),
        w, Seq("rid", "x"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          unix_micros(col("r.rt")) <= unix_micros(col("l.t")) &&
          unix_micros(col("r.rt")) >= unix_micros(col("l.t")) - w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == want)
    assert(want.nonEmpty) // the fixture actually exercises matches
  }

  test("boundary inclusivity: both window endpoints match") {
    val s = spark
    import s.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val w = 60L * 1000000L
    val left = Seq((1L, 1L, ts(100L * 1000000))).toDF("lid", "k", "t")
    val right = Seq(
      (10L, 1L, ts(40L * 1000000), 1.0),  // = t - w exactly → in
      (11L, 1L, ts(100L * 1000000), 2.0), // = t exactly → in
      (12L, 1L, ts(39L * 1000000), 3.0),  // just before window → out
      (13L, 1L, ts(101L * 1000000), 4.0)) // after t → out
      .toDF("rid", "k", "rt", "x")
    val got = RangeJoin.innerPairs(left, "k", col("t"), right, "k", col("rt"),
        w, Seq("rid")).select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L))
  }
}
