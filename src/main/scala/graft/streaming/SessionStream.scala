package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of a user's activity stream for sessionization. */
final case class SessEvent(user_id: Long, event_id: Long, ts_us: Long, value: Double)

/** The CURRENT rollup of one (user, session): re-emitted (Update-style)
  * every micro-batch that touches the session, so the latest emission per
  * (user_id, session_id) — picked distributively by max n_events — IS the
  * final session rollup, open or closed. */
final case class SessionUpdate(
    user_id: Long, session_id: Long, n_events: Long,
    session_start_us: Long, session_end_us: Long, sum_value: Double)

/** Per-user sessionization state: the current session's rollup plus the
  * last processed (ts_us, event_id) position (the cross-batch stale-drop
  * guard every behavior stream carries). */
final case class SessState(
    session_id: Long, n: Long, start_us: Long, end_us: Long, sum_value: Double,
    ts_us: Long, event_id: Long)

/** Streaming gap-based sessionization — the incremental analog of
  * [[graft.operators.Relational.sessionize]] + the q_sessionize rollup:
  * per-user state is ONE current-session row (never the event history),
  * a gap strictly greater than `gapUs` closes the session and opens the
  * next (session ids are 1-based per user, the batch operator's numbering),
  * and each micro-batch emits the current rollup of every session it
  * touched — so a dashboard sees live session totals, and the latest
  * emission per (user, session) equals the batch rollup of the same feed.
  *
  * Ordering contract matches [[BehaviorStream.transitions]]: (ts_us,
  * event_id) order within a micro-batch, event-time monotone per user
  * across batches (the LSN-ordered capture-feed guarantee), and an event
  * at or before the stored position is DROPPED — a violated guarantee
  * degrades to an undercounted session, never a corrupted one.
  *
  * State growth contract: `idleTtlMs = Some(ttl)` evicts a user idle for
  * `ttl` ms (the transitions/attribution posture). Under TTL the emitted
  * session_id is the session's own START TIMESTAMP (epoch µs) rather than
  * the 1-based counter: eviction erases the counter, so a re-appearing
  * user would renumber from 1 and a consumer keying on (user, session_no)
  * could silently merge two different sessions (r10 VERDICT residual 3).
  * Session starts are strictly increasing per user (a new session opens at
  * an event strictly after the previous session's end, and the event-time-
  * monotone contract spans eviction), so start-keyed ids never collide
  * across evictions — the epoch IS the key. With TTL off (default, the
  * gate posture) numbering stays 1-based, byte-identical to the batch
  * operator.
  */
object SessionStream {

  def sessionize(events: Dataset[SessEvent], gapUs: Long,
      idleTtlMs: Option[Long] = None): Dataset[SessionUpdate] = {
    val stableIds = idleTtlMs.isDefined
    implicit val upEnc: Encoder[SessionUpdate] = Encoders.product[SessionUpdate]
    implicit val stEnc: Encoder[SessState] = Encoders.product[SessState]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionUpdate](
        OutputMode.Update, timeoutConf) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.orNull
            // one rollup per touched session per batch, in touch order —
            // emissions are O(sessions touched), not O(events)
            val touched = scala.collection.mutable.LinkedHashMap.empty[Long, SessionUpdate]
            it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              val inOrder = st == null || e.ts_us > st.ts_us ||
                (e.ts_us == st.ts_us && e.event_id > st.event_id)
              if (inOrder) {
                st =
                  if (st == null || e.ts_us - st.end_us > gapUs)
                    SessState(if (st == null) 1L else st.session_id + 1L,
                      1L, e.ts_us, e.ts_us, e.value, e.ts_us, e.event_id)
                  else
                    SessState(st.session_id, st.n + 1, st.start_us, e.ts_us,
                      st.sum_value + e.value, e.ts_us, e.event_id)
                // TTL mode: the eviction-stable id is the session's start
                // instant — unique per user across epochs by the monotone
                // event-time contract
                val sid = if (stableIds) st.start_us else st.session_id
                touched(sid) = SessionUpdate(user, sid,
                  st.n, st.start_us, st.end_us, st.sum_value)
              }
            }
            if (st != null) state.update(st)
            idleTtlMs.foreach(state.setTimeoutDuration)
            touched.values.iterator
          }
      }
  }
}
