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
        case Some(s) if e.tsSec - s.lastSec <= gapSeconds =>
          // bounds via min/max: a LATE cross-batch event (tsSec below the
          // open session's lastSec) joins the session without dragging
          // lastSec backwards — which would spuriously split the session
          // on the next on-time event and emit endSec < startSec
          open = Some(OpenSession(math.min(s.startSec, e.tsSec),
            math.max(s.lastSec, e.tsSec), s.nEvents + 1,
            s.sumValue + e.value))
        case Some(s) =>
          out += SessionOut(userId, s.startSec, s.lastSec, s.nEvents, s.sumValue)
          open = Some(OpenSession(e.tsSec, e.tsSec, 1, e.value))
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
