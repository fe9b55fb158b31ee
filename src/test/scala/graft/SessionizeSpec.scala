package graft

import graft.operators.Sessionize
import graft.operators.Sessionize.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {

  test("batch sessionization splits on the inactivity gap") {
    val s = spark
    import s.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // user 1: events at 0,10,50 min (gap 30min → sessions {0,10}, {50});
    // user 2: single event
    val df = Seq(
      (1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 2.0), (1L, 3L, ts(50), 4.0),
      (2L, 4L, ts(5), 8.0))
      .toDF("user_id", "event_id", "ts", "value")
    val r = Sessionize.sessions(df, "user_id", "ts", "event_id", "value",
        gapMicros = 30L * 60 * 1000000)
      .orderBy("user_id", "session_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(5)))
    assert(r.toSeq == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 8.0)))
  }

  test("streaming sessionization closes sessions across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[Event]
    val gap = 60L * 1000000 // 60s
    val out = Sessionize.sessionsStream(source.toDS(), gap)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // batch 1: two events inside one session, then a far event that
      // closes it in batch 2
      source.addData(Event(1L, 0L, 1.0), Event(1L, 30L * 1000000, 2.0))
      q.processAllAvailable()
      assert(s.table("sess").count() == 0) // session still open
      source.addData(Event(1L, 300L * 1000000, 4.0))
      q.processAllAvailable()
      val closed = s.table("sess").as[Session].collect()
      assert(closed.length == 1)
      assert(closed.head == Session(1L, 0L, 30L * 1000000, 2L, 3.0))
    } finally q.stop()
  }

  test("streaming: a late cross-batch event never regresses the session bounds") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[Event]
    val gap = 60L * 1000000
    val out = Sessionize.sessionsStream(source.toDS(), gap)
    val q = out.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      source.addData(Event(1L, 100L * 1000000, 1.0))
      q.processAllAvailable()
      // late event 50s earlier — within the gap of the session interval:
      // merged with min/max, not a shrunken lastUs
      source.addData(Event(1L, 50L * 1000000, 2.0))
      q.processAllAvailable()
      source.addData(Event(1L, 500L * 1000000, 4.0)) // closes it
      q.processAllAvailable()
      val closed = s.table("sess_late").as[Session].collect()
      assert(closed.length == 1)
      val sess = closed.head
      assert(sess.startUs == 50L * 1000000 && sess.endUs == 100L * 1000000)
      assert(sess.endUs >= sess.startUs && sess.n == 2L && sess.sumValue == 3.0)
    } finally q.stop()
  }

  test("streaming: two pre-start stragglers within the gap merge into one session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[Event]
    val gap = 60L * 1000000
    val out = Sessionize.sessionsStream(source.toDS(), gap)
    val q = out.writeStream.format("memory").queryName("sess_strag")
      .outputMode("append").start()
    try {
      // open session starts at t=1000s
      source.addData(Event(1L, 1000L * 1000000, 1.0))
      q.processAllAvailable()
      // two stragglers at t=100s and t=130s — both predate the open
      // session by far more than the gap, but are within the gap of each
      // other: the batch path would make ONE session of them, so must we
      source.addData(Event(1L, 100L * 1000000, 2.0), Event(1L, 130L * 1000000, 3.0))
      q.processAllAvailable()
      val closed = s.table("sess_strag").as[Session].collect()
      assert(closed.length == 1, s"expected one merged straggler session, got ${closed.toSeq}")
      assert(closed.head == Session(1L, 100L * 1000000, 130L * 1000000, 2L, 5.0))
      // the open session is untouched: closing it later emits exactly it
      source.addData(Event(1L, 5000L * 1000000, 4.0))
      q.processAllAvailable()
      val all = s.table("sess_strag").as[Session].collect().sortBy(_.startUs)
      assert(all.length == 2)
      assert(all(1) == Session(1L, 1000L * 1000000, 1000L * 1000000, 1L, 1.0))
    } finally q.stop()
  }
}
