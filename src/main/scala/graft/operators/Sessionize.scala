package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: group per-user event streams into sessions separated
  * by an inactivity gap — a training-data-pipeline staple (conversation/
  * browsing session assembly) in both batch and streaming form.
  *
  * Batch: session boundaries via lag + running sum over a per-user
  * window (one shuffle on user_id, deterministic (ts, event_id) order).
  *
  * Streaming: `flatMapGroupsWithState` with ProcessingTimeTimeout —
  * per-user open-session state, sessions emitted when the gap passes or
  * the state times out. State is one small record per active user,
  * bounded by the user cardinality, not the stream length.
  */
object Sessionize {

  /** Batch sessionization. Emits one row per session:
    * (user_id, session_id, n_events, start_us, end_us, sum_value).
    * `valueScale` is the decimal scale of the exact value sum (default 2
    * — money-like values); it must cover the true decimal precision of
    * `valueCol` or each value is rounded to it (HALF_UP) first. The
    * streaming twin accumulates with the same rounding, so both paths
    * return the same sums. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, valueCol: String, gapMicros: Long,
               valueScale: Int = 2): DataFrame = {
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(userCol)).orderBy(us.asc, col(idCol).asc)
    val newSession = when(
      lag(us, 1).over(w).isNull || us - lag(us, 1).over(w) > gapMicros, 1)
      .otherwise(0)
    events
      .withColumn("__us", us)
      .withColumn("__new", newSession)
      .withColumn("session_id", sum(col("__new")).over(
        Window.partitionBy(col(userCol)).orderBy(col("__us").asc, col(idCol).asc))
        .cast("long"))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(28, valueScale)))
          .cast("double").as("sum_value"))
  }

  /** One event in the typed streaming path. */
  case class Event(userId: Long, tsMicros: Long, value: Double)
  /** Open-session state per user. The value sum is an exact decimal of
    * per-event values rounded to `valueScale` — same semantics as the
    * batch path's DECIMAL cast, so the two paths agree bit-for-bit. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long,
                          sumValue: BigDecimal)
  /** Emitted closed (or flushed) session. */
  case class Session(userId: Long, startUs: Long, endUs: Long, n: Long, sumValue: Double)

  /** Streaming sessionization over a typed event stream. Sessions close
    * when a later event arrives past the gap, or (when `flushTimeoutMs`
    * is set) when the group times out after that much processing-time
    * inactivity. Pass None to close on data gaps only — the timeout
    * trigger schedules periodic empty batches, which also makes
    * `processAllAvailable` unsuitable in tests. */
  def sessionsStream(events: Dataset[Event], gapMicros: Long,
                     flushTimeoutMs: Option[Long] = None,
                     valueScale: Int = 2): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = if (flushTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    def dec(v: Double): BigDecimal =
      BigDecimal(v).setScale(valueScale, BigDecimal.RoundingMode.HALF_UP)
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => Session(userId, s.startUs, s.lastUs, s.n, s.sumValue.toDouble)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.tsMicros)
            var cur = state.getOption
            // pre-start stragglers (cross-batch out-of-order events
            // predating the open session by more than the gap) accumulate
            // here and merge by the same gap rule — two stragglers within
            // the gap of each other form ONE session, as the batch path
            // would, not two singletons. Stragglers split across BATCHES
            // can still split sessions relative to batch; within a batch
            // the two paths agree.
            var straggler: Option[SessionState] = None
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              cur match {
                // within the gap of the open session's INTERVAL — a late
                // (cross-batch out-of-order) event extends the bounds
                // with min/max, never regresses them
                case Some(s) if e.tsMicros >= s.startUs - gapMicros &&
                    e.tsMicros - s.lastUs <= gapMicros =>
                  cur = Some(SessionState(math.min(s.startUs, e.tsMicros),
                    math.max(s.lastUs, e.tsMicros), s.n + 1, s.sumValue + dec(e.value)))
                // too old to belong to the open session: fold into the
                // straggler session (events arrive ts-sorted, so the gap
                // rule applies to the straggler's own end)
                case Some(s) if e.tsMicros < s.startUs - gapMicros =>
                  straggler = straggler match {
                    case Some(st) if e.tsMicros - st.lastUs <= gapMicros =>
                      Some(SessionState(st.startUs, e.tsMicros, st.n + 1,
                        st.sumValue + dec(e.value)))
                    case other =>
                      other.foreach(st => closed += Session(userId,
                        st.startUs, st.lastUs, st.n, st.sumValue.toDouble))
                      Some(SessionState(e.tsMicros, e.tsMicros, 1L, dec(e.value)))
                  }
                case Some(s) =>
                  closed += Session(userId, s.startUs, s.lastUs, s.n, s.sumValue.toDouble)
                  cur = Some(SessionState(e.tsMicros, e.tsMicros, 1L, dec(e.value)))
                case None =>
                  cur = Some(SessionState(e.tsMicros, e.tsMicros, 1L, dec(e.value)))
              }
            }
            straggler.foreach(st => closed += Session(userId,
              st.startUs, st.lastUs, st.n, st.sumValue.toDouble))
            cur.foreach { s =>
              state.update(s)
              flushTimeoutMs.foreach(state.setTimeoutDuration)
            }
            closed.result().iterator
          }
      }
  }
}
