package graft

import graft.operators.Crud
import org.apache.spark.sql.functions._

/** Upsert/delete/next-id semantics (storage.py:198-306) over snapshot +
  * tombstone tables. */
class CrudSpec extends SparkSpec {

  private def base = {
    val s = spark
    import s.implicits._
    Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
  }

  test("upsert updates existing ids and inserts new ones") {
    val s = spark
    import s.implicits._
    val updates = Seq((1L, "B"), (3L, "d")).toDF("id", "v")
    val r = Crud.upsert(base, updates, "id").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(r.toSeq == Seq(0L -> "a", 1L -> "B", 2L -> "c", 3L -> "d"))
  }

  test("upsertVersioned keeps the latest version per id") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "old", 1), (1L, "new", 2), (2L, "only", 1)).toDF("id", "v", "ver")
    val r = Crud.upsertVersioned(df, "id", "ver").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(r.toSeq == Seq(1L -> "new", 2L -> "only"))
  }

  test("tombstone + compact removes deleted rows; hard delete filters") {
    val t = Crud.tombstone(base, "id", Seq(1L))
    assert(t.filter(col("is_deleted")).count() == 1)
    assert(Crud.compact(t).count() == 2)
    assert(Crud.delete(base, "id", Seq(0L, 2L)).count() == 1)
  }

  test("nextId = max+1, 0 on empty (storage.py:276-280)") {
    assert(Crud.nextId(base, "id") == 3L)
    assert(Crud.nextId(base.filter(col("id") < 0), "id") == 0L)
  }

  test("id assignment: contiguous and fast variants") {
    val s = spark
    import s.implicits._
    val df = Seq("x", "y", "z").toDF("v")
    val ids = Crud.assignIdsContiguous(df, "v", 10L).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(10L, 11L, 12L))
    val fast = Crud.assignIdsFast(df, 100L).select("id").collect().map(_.getLong(0))
    assert(fast.distinct.length == 3 && fast.forall(_ >= 100L))
  }

  test("snapshot persistence round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("crud").toString + "/snap"
    Crud.snapshot(base, dir)
    val r = Crud.restore(spark, dir)
    assert(r.count() == 3 && r.columns.toSeq == Seq("id", "v"))
  }

  test("snapshotDiff: added/removed/changed classified; unchanged dropped; self-diff empty") {
    val s = spark
    import s.implicits._
    val old_ = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "t")
    val new_ = Seq((2L, "b"), (3L, "C!"), (4L, "d"), (9L, "z")).toDF("id", "t")
    val d = Crud.snapshotDiff(old_, new_, "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2)).isDefined,
          Option(r.getString(3)).isDefined))).toMap
    assert(d.keySet == Set(1L, 3L, 9L), "2 and 4 are unchanged — dropped")
    assert(d(1L) == (("removed", true, false)))
    assert(d(3L) == (("changed", true, true)))
    assert(d(9L) == (("added", false, true)))
    assert(Crud.snapshotDiff(old_, old_, "id", "t").count() == 0L)
    // partitioning invariance
    val a = Crud.snapshotDiff(old_.repartition(5), new_.coalesce(1), "id", "t")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Crud.snapshotDiff(old_, new_, "id", "t")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
