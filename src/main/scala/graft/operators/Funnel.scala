package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ordered-funnel and cohort-retention analytics — the
  * product-analytics pair every event pipeline serves alongside
  * sessionization ([[Sessionize]]) and hourly rollups. The reference
  * engine stores and retrieves event-shaped metadata
  * (`/root/reference/src/vector_db/storage/store.py` persists arbitrary
  * per-id metadata); an analytics engine over the same data answers the
  * canonical questions asked OF that metadata, which are exactly these
  * two operators.
  *
  * Scale shape: every aggregation is user-keyed and map-side
  * combinable (per-user state = one timestamp per funnel step / one
  * first-seen date); step k's event scan filters to one event type
  * BEFORE joining the (much smaller) step-k−1 completion set, and all
  * step joins/aggregations share the user-hash partitioning, so AQE
  * reuses one exchange per step. No windows over the event stream, no
  * driver state.
  */
object Funnel {

  /** Ordered first-completion funnel: step k's time is the EARLIEST
    * event of type `steps(k)` STRICTLY after step k−1's time — and
    * within `withinSeconds` of step 1 when set (the "converted inside
    * the attribution window" form). A user appears iff they completed
    * step 1; steps_completed counts the contiguous prefix reached.
    *
    * First-completion semantics (min per step, conditioned on the
    * previous step's min) is deterministic and exactly replayable —
    * no per-user event-order scan, just one filtered min aggregation
    * per step. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             withinSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    withinSeconds.foreach(w => require(w > 0, s"window must be positive, got $w"))
    val ev = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__t"))
    // stage k: (__u, t1, tk) — t1 rides along for the window predicate
    val stage1 = ev.where(col("__t") === steps.head)
      .groupBy("__u").agg(min(col("__ts")).as("t1"))
    val stages = (2 to steps.size).scanLeft(
      stage1.select(col("__u"), col("t1"), col("t1").as("tk"))) { (prev, k) =>
      val windowOk = withinSeconds
        .map(w => col("__ts") <= col("t1") + expr(s"INTERVAL $w SECONDS"))
        .getOrElse(lit(true))
      ev.where(col("__t") === steps(k - 1))
        .join(prev, Seq("__u"))
        .where(col("__ts") > col("tk") && windowOk)
        .groupBy("__u")
        .agg(min(col("t1")).as("t1"), min(col("__ts")).as("tk"))
    }.toList
    val out = stages.zipWithIndex.tail.foldLeft(
      stage1.select(col("__u"), col("t1"))) { case (acc, (st, i)) =>
      acc.join(st.select(col("__u"), col("tk").as(s"t${i + 1}")), Seq("__u"), "left")
    }
    val stepCols = (1 to steps.size).map(k => col(s"t$k"))
    // contiguous-prefix count: step k only exists when k−1 did (the
    // join chain guarantees it), so counting non-nulls is the prefix
    out.select((col("__u").as(userCol) +: stepCols) :+
      stepCols.map(c => when(c.isNotNull, 1L).otherwise(0L))
        .reduce(_ + _).as("steps_completed"): _*)
  }

  /** One event in the typed streaming-funnel path (ts in micros). */
  case class FunnelEvent(userId: Long, tsMicros: Long, eventType: String)
  /** Per-user funnel state: completion time per step in micros, −1
    * unset — bounded at |steps| longs per active user regardless of
    * stream length. */
  case class FunnelProgress(times: Seq[Long])
  /** Per-user snapshot emitted each batch the user appears in (Update
    * mode): the LAST row per user is the funnel answer. */
  case class FunnelRow(userId: Long, times: Seq[Long], stepsCompleted: Long)

  /** Streaming funnel: the [[funnel]] semantics maintained as live
    * per-user state. Each step k completes at the first event of its
    * type STRICTLY after step k−1's time (and within `withinMicros` of
    * step 1) — processing events in ascending time order makes that
    * first qualifying event exactly the batch path's filtered min, so
    * the stream result is IDENTICAL to batch when events arrive in
    * time order across micro-batches (the watermark assumption; within
    * a batch the group sorts, so only cross-batch disorder can
    * diverge). Completion times never regress once set; states of
    * users who never complete step 1 are dropped, not stored. */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
                   withinMicros: Option[Long] = None): Dataset[FunnelRow] = {
    require(steps.size >= 2, s"need >= 2 steps, got ${steps.size}")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelProgress, FunnelRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
         state: GroupState[FunnelProgress]) =>
          val t = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(steps.size)(-1L))
          batch.toSeq.filter(e => stepIdx.contains(e.eventType))
            .sortBy(_.tsMicros)
            .foreach { e =>
              val k = stepIdx(e.eventType)
              val prevOk = k == 0 || (t(k - 1) >= 0 && e.tsMicros > t(k - 1))
              val windowOk = k == 0 ||
                withinMicros.forall(w => e.tsMicros <= t(0) + w)
              if (t(k) < 0 && prevOk && windowOk) t(k) = e.tsMicros
            }
          if (t(0) < 0) Iterator.empty // never completed step 1: no state
          else {
            state.update(FunnelProgress(t.toSeq))
            Iterator.single(
              FunnelRow(uid, t.toSeq, t.count(_ >= 0).toLong))
          }
      }
  }

  /** Daily + trailing-window active users (DAU/WAU): for every
    * observed day, the count of distinct users active that day and
    * within the `windowDays`-day window ENDING that day. The trailing
    * distinct is NOT derivable from daily distincts (users repeat
    * across days), so each distinct (user, day) pair fans out to the
    * `windowDays` window-end days it supports — a bounded explode on
    * the (user, day) table (already ≪ the event count after the first
    * dedup), then one distinct-count aggregation per day. No window
    * functions, no event-stream sort.
    *
    * Output: day (date), dau, wau — observed days only (a day with no
    * events reports nothing, trailing ghosts are cut by the join). */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String,
                  windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = events.select(col(userCol).as("__u"),
      to_date(col(tsCol)).as("__d")).distinct()
    val dau = ud.groupBy(col("__d").as("day"))
      .agg(countDistinct(col("__u")).as("dau"))
    val wau = ud
      .select(col("__u"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__k"), col("__d"))
      .select(col("__u"), date_add(col("__d"), col("__k")).as("day"))
      .groupBy("day").agg(countDistinct(col("__u")).as("wau"))
    dau.join(wau, Seq("day"))
  }

  /** Day-cohort retention matrix: users cohort by their first-seen
    * day; each (cohort, day_offset) cell counts DISTINCT users from
    * that cohort active that day. The product-analytics retention
    * curve, exactly: n_users at offset 0 is the cohort size. */
  def retention(events: DataFrame, userCol: String,
                tsCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("__u"),
      to_date(col(tsCol)).as("__d"))
    val first = ev.groupBy("__u").agg(min(col("__d")).as("cohort"))
    ev.join(first, Seq("__u"))
      .groupBy(col("cohort"), datediff(col("__d"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }
}
