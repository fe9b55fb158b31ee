package graft

import java.sql.Timestamp
import graft.operators.Funnel

/** Ordered-funnel + cohort-retention analytics. */
class FunnelSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: ordered first-completion with attribution window") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1 completes all three in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: purchase BEFORE click → step 3 not reached
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "click"),
      // user 3: click outside the 1 h window → stalls at step 1
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 12:00:01"), "click"),
      // user 4: never views → absent
      (4L, ts("2024-01-01 10:00:00"), "click"),
      // user 5: click at the SAME instant as view → strictly-after fails
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (5L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinSeconds = Some(7200L))
      .orderBy("user_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    val u1 = out(0)
    assert(u1.getAs[Long]("steps_completed") == 3L)
    assert(u1.getAs[Timestamp]("t3") == ts("2024-01-01 12:00:00"))
    assert(out(1).getAs[Long]("steps_completed") == 2L)
    assert(out(1).getAs[Timestamp]("t2") == ts("2024-01-01 11:00:00"))
    assert(out(1).isNullAt(out(1).fieldIndex("t3")))
    assert(out(2).getAs[Long]("steps_completed") == 1L)
    assert(out(3).getAs[Long]("steps_completed") == 1L)
  }

  test("funnel: earliest qualifying completion wins, not earliest overall") {
    val s = spark
    import s.implicits._
    // the first click precedes the view; the SECOND click is the
    // qualifying step-2 time
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:15:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).collect()
    assert(out(0).getAs[Timestamp]("t2") == ts("2024-01-01 10:15:00"))
    assert(out(0).getAs[Long]("steps_completed") == 2L)
  }

  test("funnel: step times strictly increase and prefix is contiguous (sf0.001)") {
    val s = spark
    val ev = graft.core.Tables.events(s, "/root/testdata/sf0.001")
    val out = graft.operators.Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), withinSeconds = Some(86400L)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t1 = r.getAs[Timestamp]("t1")
      val t2 = r.getAs[Timestamp]("t2")
      val t3 = r.getAs[Timestamp]("t3")
      val n = r.getAs[Long]("steps_completed")
      assert(t1 != null)
      // contiguous prefix: t3 implies t2
      assert(t3 == null || t2 != null)
      assert(n == Seq(t1, t2, t3).count(_ != null))
      if (t2 != null) {
        assert(t2.after(t1))
        assert(t2.getTime <= t1.getTime + 86400000L)
      }
      if (t3 != null) {
        assert(t3.after(t2))
        assert(t3.getTime <= t1.getTime + 86400000L)
      }
    }
  }

  test("activeUsers: DAU vs trailing-window distinct, observed days only") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-08 10:00:00")))
      .toDF("user_id", "ts")
    val out = Funnel.activeUsers(ev, "user_id", "ts", windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, 2L), // u1+u2; window 12-30..01-01 adds nothing
      ("2024-01-03", 1L, 2L), // dau u1 only; window 01..03 still holds u2
      ("2024-01-08", 1L, 1L))) // u3; u1's 01-03 fell out of [06..08]
  }

  test("retention: cohort by first-seen day, distinct users per offset") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-02 10:00:00")))
      .toDF("user_id", "ts")
    val out = Funnel.retention(ev, "user_id", "ts")
      .orderBy("cohort", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L), // users 1, 2 (day-0 duplicates collapse)
      ("2024-01-01", 1, 1L), // user 2
      ("2024-01-01", 2, 1L), // user 1
      ("2024-01-02", 0, 1L))) // user 3's own cohort
  }
}
