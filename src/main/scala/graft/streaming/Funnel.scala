package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Ordered-funnel conversion, batch + streaming (the stateful twin of
  * the declared `s4_funnel` query; reference ancestor: the append-only
  * query log in backend/app.py:42-71 is the only event surface the
  * reference has — the funnel is its §2.11 streaming extension).
  *
  * A user progresses step i → i+1 when an event of step i+1's type
  * occurs STRICTLY AFTER the user's earliest completion of step i
  * (first step: earliest event of that type). Both forms return, per
  * user, how many steps were reached and when the funnel completed.
  *
  *  - [[funnelBatch]]: the s4 join chain at per-user granularity —
  *    each stage one groupBy(user) + one equi join on user, step
  *    tables shrink monotonically.
  *  - [[funnelStream]]: `flatMapGroupsWithState` with event-time
  *    timeout. Out-of-order events make the chain non-monotonic (a
  *    late early "view" can lower t1 and admit previously-rejected
  *    clicks), so the exact answer needs the user's step events until
  *    the attribution horizon closes: state = the user's funnel-step
  *    events inside the horizon, bounded per user by horizon ×
  *    per-user step-event rate — the same bound every attribution
  *    system carries; the final chain replay is [[chain]], shared
  *    with nothing else so batch/stream parity is a pure-function
  *    property plus the state plumbing (FunnelSpec pins both).
  */
object Funnel {

  case class FEvent(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

  /** Buffered step events for one live user. */
  case class FunnelBuf(tsMs: List[Long], step: List[String])

  case class FunnelResult(user_id: Long, steps_reached: Int,
                          completed_at: Option[Timestamp])

  /** Replay the strict-order chain over one user's events: returns
    * (steps reached, completion time of the last step if all reached).
    */
  def chain(evts: Seq[(Long, String)], steps: Seq[String]): (Int, Option[Long]) = {
    var i = 0
    var bound = Long.MinValue
    var stuck = false
    while (i < steps.length && !stuck) {
      val cand = evts.iterator
        .filter(e => e._2 == steps(i) && (i == 0 || e._1 > bound))
        .map(_._1)
      if (cand.isEmpty) stuck = true
      else { bound = cand.min; i += 1 }
    }
    (i, if (i == steps.length) Some(bound) else None)
  }

  /** Batch form: population = every user with at least one step event
    * (matching the streaming form, which keeps state for exactly those
    * users). */
  def funnelBatch(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelBatch: steps must be non-empty")
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
      .filter(col("event_type").isin(steps.map(lit): _*))
    var prev: Option[DataFrame] = None
    val stepCols = steps.zipWithIndex.map { case (st, i) =>
      val base = ev.filter(col("event_type") === st)
      val gated = prev match {
        case Some(p) => base
          .join(p.select(col("user_id"), col(s"t${i - 1}").as("t_prev")), Seq("user_id"))
          .filter(col("ts") > col("t_prev"))
        case None => base
      }
      val cur = gated.groupBy(col("user_id")).agg(min(col("ts")).as(s"t$i"))
      prev = Some(cur)
      cur
    }
    val pop = ev.select(col("user_id")).distinct()
    val acc = stepCols.foldLeft(pop)((a, df) => a.join(df, Seq("user_id"), "left"))
    val reached = steps.indices
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.select(col("user_id"), reached.as("steps_reached"),
      col(s"t${steps.length - 1}").as("completed_at"))
  }

  /** Streaming form: one result row per user once the horizon closes. */
  def funnelStream(events: Dataset[FEvent], steps: Seq[String],
                   horizonSeconds: Long,
                   watermark: String = "10 minutes"): Dataset[FunnelResult] = {
    require(steps.nonEmpty, "funnelStream: steps must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    val stepSet = steps.toSet
    events
      .filter(e => stepSet.contains(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[FEvent], state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val b = state.get
            state.remove()
            val (n, t) = chain(b.tsMs.zip(b.step), steps)
            Iterator.single(FunnelResult(userId, n, t.map(new Timestamp(_))))
          } else {
            val fresh = rows.map(e => (e.ts.getTime, e.event_type)).toList
            val prev = state.getOption.getOrElse(FunnelBuf(Nil, Nil))
            val buf = FunnelBuf(prev.tsMs ++ fresh.map(_._1),
              prev.step ++ fresh.map(_._2))
            state.update(buf)
            // close once the watermark passes last activity + horizon;
            // clamp strictly after the current watermark (Sessionize's
            // late-event lesson: setTimeoutTimestamp(≤ wm) throws)
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
              math.max(buf.tsMs.max + horizonSeconds * 1000, wm + 1))
            Iterator.empty
          }
      }
  }
}
