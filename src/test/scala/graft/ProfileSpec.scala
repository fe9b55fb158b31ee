package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("profile: numeric + string metrics, nulls excluded from stats") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(10L), Some("alpha")),
      (Some(20L), None),
      (None, Some("beta")),
      (Some(20L), Some("x"))).toDF("v", "t")
    val rows = Profile.profile(df, Seq("v", "t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows(("v", "n_nonnull")) == 3.0)
    assert(rows(("v", "n_distinct")) == 2.0)
    assert(rows(("v", "min")) == 10.0 && rows(("v", "max")) == 20.0)
    assert(math.abs(rows(("v", "avg")) - 50.0 / 3) < 1e-9)
    assert(rows(("t", "n_nonnull")) == 3.0)
    assert(rows(("t", "min_len")) == 1.0 && rows(("t", "max_len")) == 5.0)
    assert(math.abs(rows(("t", "avg_len")) - 10.0 / 3) < 1e-9)
  }

  test("profile: non-numeric non-string columns get count metrics only") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f))).toDF("id", "emb")
    val metrics = Profile.profile(df, Seq("emb"))
      .collect().map(_.getString(1)).toSet
    assert(metrics == Set("n_nonnull", "n_distinct"))
  }

  test("profile: single pass — one aggregate node feeds the unpivot") {
    val s = spark
    import s.implicits._
    val df = (0L until 50L).map(i => (i, s"s$i")).toDF("id", "t")
    val plan = Profile.profile(df, Seq("id", "t"))
      .queryExecution.optimizedPlan.toString
    // one scan of the input: the source relation appears exactly once
    assert("LocalRelation".r.findAllIn(plan).length == 1,
      s"profile should scan the table once, plan:\n$plan")
  }

  test("profile rejects an empty column list") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Profile.profile(Seq((1L, "a")).toDF("id", "t"), Seq.empty)
    }
  }
}
