package graft

import org.apache.spark.sql.functions._

/** Invariants of the sf1 spot-check tier's 10× replication: the tier's
  * findings are only meaningful if each replica is a faithful,
  * self-contained copy of the source world. */
class MakeSf1Spec extends SparkSpec {

  test("replicate: 10x rows, unique remapped keys, self-contained join worlds") {
    val s = spark
    import s.implicits._
    val orders = Seq((1L, 10L, "A"), (2L, 11L, "B"), (3L, 10L, "C"))
      .toDF("o_key", "o_cust", "o_flag")
    val cust = Seq((10L, "alice"), (11L, "bob")).toDF("c_key", "c_name")
    val ro = MakeSf1.replicate(orders, Seq("o_key", "o_cust"), Nil)
    val rc = MakeSf1.replicate(cust, Seq("c_key"), Seq("c_name"))
    assert(ro.count() == 30 && rc.count() == 20)
    // keys unique across replicas; originals recoverable as k / 10
    assert(ro.select("o_key").distinct().count() == 30)
    assert(rc.select("c_name").distinct().count() == 20)
    // join cardinality scales exactly 10x: every order finds exactly its
    // own replica's customer (no cross-replica fan-out)
    val joined = ro.join(rc, ro("o_cust") === rc("c_key"))
    assert(joined.count() == 30)
    // replica r of order 1 joins the SAME replica of customer 10
    val r7 = joined.filter(col("o_key") === 17L).select("c_key")
      .as[Long].collect()
    assert(r7.toSeq == Seq(107L))
    // non-key payloads byte-identical across replicas (keys 30..39 are
    // the ten replicas of source order 3)
    val flags = ro.filter(expr("o_key div 10") === 3).select("o_flag")
      .distinct().as[String].collect()
    assert(flags.toSeq == Seq("C"))
  }

  test("replicate: key types stay long; r=0 names unsuffixed") {
    val s = spark
    import s.implicits._
    val df = Seq((5L, "x")).toDF("k", "nm")
    val out = MakeSf1.replicate(df, Seq("k"), Seq("nm"))
    assert(out.schema("k").dataType == org.apache.spark.sql.types.LongType)
    val names = out.orderBy("k").select("nm").as[String].collect()
    assert(names.head == "x" && names.last == "x#9")
    assert(out.select("k").as[Long].collect().toSet ==
      (0 until 10).map(r => 50L + r).toSet)
  }
}
