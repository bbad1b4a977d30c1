package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering the streaming funnel. */
case class FunnelEvent(user_id: Long, event_type: String,
                       ts: java.sql.Timestamp)

/** A stage advance: `stage` is 1-based position in the step list. */
case class FunnelStage(user_id: Long, stage: Int, ts: java.sql.Timestamp)

/** Streaming ORDERED funnel — q164's strictly-after semantics as a
  * per-user state machine instead of three passes over history:
  * state is (stage, ts of the last advance), O(1) per user; an event
  * advances the funnel iff it matches the NEXT step and lands
  * strictly after the previous advance. Emits one row per advance,
  * so downstream stage counts are a plain streaming aggregation.
  *
  * Ordering contract: rows are processed in event-time order WITHIN
  * each micro-batch; across batches arrival order stands in for
  * event order (the watermark bounds how late a step can be). A step
  * that arrives after the funnel already advanced past it is not
  * retracted — streaming funnels are monotone; the batch q164 is the
  * retroactive truth.
  *
  * State expires via event-time timeout once the watermark passes
  * the last advance + `idleMs` — abandoned funnels cost nothing.
  */
object FunnelState {

  def funnelStages(events: Dataset[FunnelEvent], steps: Seq[String],
                   idleMs: Long): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Int, Long), FunnelStage](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[(Int, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (stage, lastTs) = state.getOption.getOrElse((0, Long.MinValue))
            val out = Seq.newBuilder[FunnelStage]
            rows.toSeq.sortBy(r => (r.ts.getTime, r.event_type)).foreach { r =>
              if (stage < steps.size && r.event_type == steps(stage) &&
                  r.ts.getTime > lastTs) {
                stage += 1
                lastTs = r.ts.getTime
                out += FunnelStage(uid, stage, r.ts)
              }
            }
            state.update((stage, lastTs))
            // drop state once the watermark passes the idle horizon;
            // a fresh user (no advance yet) expires off the watermark
            state.setTimeoutTimestamp(math.max(
              if (lastTs == Long.MinValue) 0L else lastTs + idleMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
