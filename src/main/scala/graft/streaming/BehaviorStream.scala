package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of a user journey on the stream. */
final case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)

/** A user reaching funnel stage `stage` (1-based) at `ts_us`;
  * `delta_us` = time since the previous stage (None for stage 1). */
final case class StageReach(
    user_id: Long, stage: Int, stage_name: String, ts_us: Long,
    delta_us: Option[Long])

/** Per-user funnel progress: the next stage index awaited and the
  * timestamp of the last reached stage. */
final case class FunnelProgress(stage: Int, ts: Long)

/** Streaming conversion funnel — the incremental analog of
  * [[graft.operators.Behavior.funnel]]: per-user stage progress lives in
  * `flatMapGroupsWithState` (one (int, long) entry per user), and a
  * stage-reach row is emitted the moment a user advances — the live
  * dashboard shape, vs the batch operator's end-of-corpus totals.
  *
  * State growth contract: by default (`completedTtlMs = None`) an entry is
  * retained for EVERY user ever seen, completed or not — state grows with
  * total user cardinality, not active users. That retention is what makes
  * the funnel correct under late events: dropping a user's entry would let
  * a later event re-enter them at stage 1 and re-emit reaches. Deployments
  * where that trade is wrong (unbounded user id space, bounded state store)
  * pass `completedTtlMs = Some(ttl)`: users who have COMPLETED the funnel —
  * the only users whose entry can no longer change any emission unless
  * they re-appear — are evicted after `ttl` ms without activity, accepting
  * that a completed user re-appearing after the TTL re-funnels from
  * stage 1. In-flight users are never evicted under either setting.
  *
  * Ordering contract: events are processed in event-time order WITHIN a
  * micro-batch (sorted here) and batches are assumed event-time monotone
  * per user across batches (the capture-feed guarantee an LSN-ordered CDC
  * source provides). A strictly out-of-order stage event arriving in a
  * LATER batch is ignored rather than retroactively re-funneled —
  * retroactive correction would require unbounded event retention.
  */
object BehaviorStream {

  implicit private val reachEnc: Encoder[StageReach] = Encoders.product[StageReach]

  def funnel(events: Dataset[FunnelEvent], stages: Seq[String],
      completedTtlMs: Option[Long] = None): Dataset[StageReach] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (completedTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, StageReach](
        OutputMode.Append, timeoutConf) {
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            // only completed-funnel users ever arm a timeout (below)
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelProgress(0, 0L))
            val out = Vector.newBuilder[StageReach]
            // event-time order inside the batch; a stage advances on the
            // FIRST qualifying event strictly after the previous stage
            it.toVector.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
              if (st.stage < stages.size && e.event_type == stages(st.stage) &&
                  (st.stage == 0 || e.ts_us > st.ts)) {
                out += StageReach(user, st.stage + 1, stages(st.stage), e.ts_us,
                  if (st.stage == 0) None else Some(e.ts_us - st.ts))
                st = FunnelProgress(st.stage + 1, e.ts_us)
              }
            }
            state.update(st)
            completedTtlMs.foreach { ttl =>
              if (st.stage >= stages.size) state.setTimeoutDuration(ttl)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming event-type transitions — the incremental analog of the
    * batch `q_transition_matrix` pairing: per-user state is ONE row (the
    * last event seen — the same "previous image per key" shape the CDC
    * before/after pairing keeps), and each arriving event emits its
    * (from → to) edge the moment it happens. Downstream, any windowed or
    * running aggregation of the emitted edges gives the live matrix.
    *
    * Ordering contract matches [[funnel]]: within a micro-batch events
    * process in (ts_us, event_id) order — the batch query's exact
    * tie-break — and batches are assumed event-time monotone per user
    * across batches (the LSN-ordered capture-feed guarantee). The stored
    * (ts_us, event_id) ENFORCE the contract at the batch seam: an event
    * arriving in a later batch at or before the stored position is
    * DROPPED (the funnel's ignore-out-of-order rule) rather than paired
    * in arrival order, so a violated guarantee degrades to a missing edge,
    * never a wrong one. State is O(users), one small row each, never the
    * event history.
    *
    * State growth contract (the funnel's `completedTtlMs` posture): by
    * default state is retained for every user ever seen — on an unbounded
    * user-id space that grows forever. `idleTtlMs = Some(ttl)` evicts a
    * user's last-event row after `ttl` ms without activity; a re-appearing
    * user starts fresh, so the edge from the pre-eviction last event to
    * the first post-eviction event is MISSING (never wrong), and the
    * cross-batch stale-drop guard restarts from the new position. Default
    * off: eviction changes the emission set, so it is an explicit
    * deployment trade, not a silent one. */
  def transitions(events: Dataset[TransEvent],
      idleTtlMs: Option[Long] = None): Dataset[Transition] = {
    implicit val transEnc: Encoder[Transition] = Encoders.product[Transition]
    implicit val lastEnc: Encoder[LastEvent] = Encoders.product[LastEvent]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, timeoutConf) {
        (user: Long, it: Iterator[TransEvent], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption
            val out = Vector.newBuilder[Transition]
            it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              val inOrder = last.forall(l =>
                e.ts_us > l.ts_us || (e.ts_us == l.ts_us && e.event_id > l.event_id))
              if (inOrder) {
                last.foreach(l =>
                  out += Transition(user, l.event_type, e.event_type, e.ts_us))
                last = Some(LastEvent(e.event_type, e.ts_us, e.event_id))
              }
            }
            last.foreach(state.update)
            idleTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming last-touch attribution — the incremental analog of the
    * batch `q_attribution` window: per-user state is the CURRENT touch
    * (the most recent view/click/signup) plus the last processed
    * (ts_us, event_id) position, and each purchase emits its credited
    * channel the moment it lands — the live-campaign shape, vs the batch
    * query's end-of-corpus channel rollup.
    *
    * Ordering contract matches [[funnel]]/[[transitions]]: events process
    * in (ts_us, event_id) order within a micro-batch (the batch window's
    * exact tie-break), batches are assumed event-time monotone per user,
    * and an event arriving at or before the stored position is DROPPED —
    * a violated guarantee degrades to a stale channel, never a
    * retroactively rewritten one. State is O(users), one small row each.
    *
    * State growth contract (the funnel's `completedTtlMs` posture):
    * `idleTtlMs = Some(ttl)` evicts a user's touch row after `ttl` ms
    * without activity; a re-appearing user's purchase with no fresh prior
    * touch credits 'direct' (the stale pre-eviction channel is dropped,
    * never mis-credited), and the cross-batch stale-drop guard restarts.
    * Default off — eviction changes credits, an explicit trade. */
  def attribution(events: Dataset[AttrEvent],
      touchTypes: Set[String] = Set("view", "click", "signup"),
      purchaseType: String = "purchase",
      idleTtlMs: Option[Long] = None): Dataset[Attribution] = {
    implicit val attrEnc: Encoder[Attribution] = Encoders.product[Attribution]
    implicit val touchEnc: Encoder[TouchState] = Encoders.product[TouchState]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append, timeoutConf) {
        (user: Long, it: Iterator[AttrEvent], state: GroupState[TouchState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(TouchState(None, Long.MinValue, Long.MinValue))
            val out = Vector.newBuilder[Attribution]
            it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              val inOrder = e.ts_us > st.ts_us ||
                (e.ts_us == st.ts_us && e.event_id > st.event_id)
              if (inOrder) {
                if (e.event_type == purchaseType)
                  out += Attribution(user, e.event_id,
                    st.touch.getOrElse("direct"), e.ts_us, e.value)
                val touch =
                  if (touchTypes.contains(e.event_type)) Some(e.event_type) else st.touch
                st = TouchState(touch, e.ts_us, e.event_id)
              }
            }
            state.update(st)
            idleTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}

/** One observed event for the transition stream; `event_id` is the
  * deterministic within-timestamp tie-break (as in the batch query). */
final case class TransEvent(
    user_id: Long, event_id: Long, event_type: String, ts_us: Long)

/** An emitted (from → to) edge of a user's journey at `ts_us`. */
final case class Transition(
    user_id: Long, from_type: String, to_type: String, ts_us: Long)

/** Per-user transition state: the last event seen. */
final case class LastEvent(event_type: String, ts_us: Long, event_id: Long)

/** One event for the attribution stream; `value` is the purchase amount
  * (ignored on touch events). */
final case class AttrEvent(
    user_id: Long, event_id: Long, event_type: String, ts_us: Long, value: Double)

/** A purchase credited to `channel` ('direct' when no touch preceded). */
final case class Attribution(
    user_id: Long, event_id: Long, channel: String, ts_us: Long, value: Double)

/** Per-user attribution state: current touch + last processed position
  * ((ts_us, event_id) — the out-of-order drop guard at the batch seam). */
final case class TouchState(touch: Option[String], ts_us: Long, event_id: Long)
