package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SESSIONIZATION with custom state — the
  * `flatMapGroupsWithState` member of the streaming surface (SURVEY
  * §2.10 names watermarked windows and AvailableNow ticks; this is the
  * arbitrary-state third leg): per-user sessions split on a gap timeout,
  * the streaming form of batch q25's gaps-and-islands window.
  *
  * Emission contract (the standard one for gap sessionization with
  * event-time timeouts):
  *  - a session CLOSED BY A LATER EVENT in the same or a later trigger
  *    (gap exceeded) is emitted immediately;
  *  - the tail session of a user is held in state and emitted when the
  *    WATERMARK passes `last event + gap` (EventTimeTimeout) — so a
  *    drained stream leaves no session behind (StreamingSpec proves
  *    parity with the batch shape on the same events);
  *  - a LATE event (inside the watermark allowance) that lands after its
  *    session was already gap-closed starts a fresh session rather than
  *    reopening the emitted one; one landing inside or gap-adjacent to
  *    the HELD session merges into it (span widens via min/max, never
  *    shifts backwards) — the documented trades of eager emission,
  *    bounded by the watermark delay.
  *
  * Scale: state is ONE small record per active user key (start/last/
  * count/sum — no event buffering), the shuffle is the groupByKey on
  * user, and closed sessions leave state immediately; memory is bounded
  * by ACTIVE users, not history. The per-group sort is over one
  * trigger's events for that user only.
  */
object StreamingSessionize {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  case class SessionAcc(start: Long, last: Long, n: Long, sum: Double) {
    // min/max, NOT assignment: a late-but-allowed event from an earlier
    // trigger can land INSIDE the held session's span — overwriting
    // `last` backwards would corrupt session_end (it could precede
    // session_start) and manufacture spurious gap splits against later
    // events
    def extend(e: SessionEvent): SessionAcc =
      SessionAcc(math.min(start, e.ts.getTime), math.max(last, e.ts.getTime),
        n + 1, sum + e.value)
    def toSession(user: Long): Session =
      Session(user, new Timestamp(start), new Timestamp(last), n, sum)
  }
  object SessionAcc {
    def first(e: SessionEvent): SessionAcc =
      SessionAcc(e.ts.getTime, e.ts.getTime, 1L, e.value)
  }

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Append-mode session stream over a (possibly streaming) event set.
    * `watermarkDelay` bounds how late an event may arrive; the tail
    * session of each user emits once the watermark passes its gap.
    */
  def sessions(events: Dataset[SessionEvent], gapMinutes: Int,
               watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes.toLong * 60L * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMs))
  }

  private def update(gapMs: Long)(
      user: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionAcc]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val done = state.get.toSession(user)
      state.remove()
      Iterator.single(done)
    } else {
      // one trigger's events for this user; order within the trigger is
      // not guaranteed, so sort (bounded by the trigger's batch, never
      // by history). Ties on ts keep arrival order (stable sortBy).
      val sorted = events.toArray.sortBy(_.ts.getTime)
      val closed = Seq.newBuilder[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        cur = cur match {
          case Some(s) if e.ts.getTime - s.last <= gapMs => Some(s.extend(e))
          case Some(s) =>
            closed += s.toSession(user)
            Some(SessionAcc.first(e))
          case None => Some(SessionAcc.first(e))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.result().iterator
    }
  }
}
