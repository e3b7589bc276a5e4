package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state — the stream-native form of
  * the batch e02_sessionize query: a session closes after `gapSeconds` of
  * user inactivity (tracked in per-key GroupState with a processing-time
  * timeout), then is emitted once, complete.
  *
  * Scale: state is partitioned by user key (one shuffle), each group's
  * state is O(1) (open-session bounds only), and timeouts purge idle keys
  * — the standard Structured Streaming `flatMapGroupsWithState` shape for
  * unbounded key spaces.
  */
object Sessionize {

  final case class Click(userId: Long, tsSec: Long, value: Double)
  final case class OpenSession(startSec: Long, lastSec: Long, nEvents: Long,
      sumValue: Double)
  final case class SessionOut(userId: Long, startSec: Long, endSec: Long,
      nEvents: Long, sumValue: Double)

  /** Fold a user's new events into the open session; emit sessions closed
    * by a gap within the batch or by state timeout. */
  def step(gapSeconds: Long, armTimeout: Boolean)(
      userId: Long,
      events: Iterator[Click],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    var open = state.getOption
    val out = Seq.newBuilder[SessionOut]
    events.toSeq.sortBy(_.tsSec).foreach { e =>
      open match {
        // membership is two-sided: within gap of the session's LAST
        // event, or (a LATE cross-batch event) within gap of its START.
        // The late event joins via min/max bounds without dragging
        // lastSec backwards — which would spuriously split the session
        // on the next on-time event and emit endSec < startSec. An event
        // MORE than a gap before startSec belongs to a DIFFERENT (older)
        // session: merging it (the old one-sided `e.tsSec - s.lastSec <=
        // gap`, always true for late events) produced sessions with
        // internal gaps far beyond gapSeconds, diverging from the batch
        // e02 ground truth.
        case Some(s) if e.tsSec >= s.startSec - gapSeconds &&
            e.tsSec <= s.lastSec + gapSeconds =>
          open = Some(OpenSession(math.min(s.startSec, e.tsSec),
            math.max(s.lastSec, e.tsSec), s.nEvents + 1,
            s.sumValue + e.value))
        case Some(s) if e.tsSec > s.lastSec + gapSeconds =>
          out += SessionOut(userId, s.startSec, s.lastSec, s.nEvents, s.sumValue)
          open = Some(OpenSession(e.tsSec, e.tsSec, 1, e.value))
        case Some(s) =>
          // too old to join the open session (more than a gap before its
          // start) and everything between has already been observed: the
          // straggler is its own already-closed session, emitted now.
          // (One state slot per key: holding two open sessions would need
          // a different state model for an event this late.)
          out += SessionOut(userId, e.tsSec, e.tsSec, 1, e.value)
          open = Some(s)
        case None =>
          open = Some(OpenSession(e.tsSec, e.tsSec, 1, e.value))
      }
    }
    if (state.hasTimedOut) {
      open.foreach(s =>
        out += SessionOut(userId, s.startSec, s.lastSec, s.nEvents, s.sumValue))
      state.remove()
    } else {
      open.foreach { s =>
        state.update(s)
        // a timer only exists under a timeout mode (production flushes
        // idle sessions); with NoTimeout the open session flushes on the
        // next gap-breaking event instead
        if (armTimeout) state.setTimeoutDuration(gapSeconds * 1000)
      }
    }
    out.result().iterator
  }

  /** Wire a click stream into gap-based sessions. `timeout` should be
    * ProcessingTimeTimeout in production (flushes idle sessions); tests
    * use NoTimeout for deterministic single-batch behavior. */
  def sessions(
      spark: SparkSession,
      clicks: Dataset[Click],
      gapSeconds: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()): Dataset[SessionOut] = {
    import spark.implicits._
    clicks.groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), timeout)(
        step(gapSeconds, timeout != GroupStateTimeout.NoTimeout()))
  }
}
