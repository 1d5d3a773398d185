package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming liveness tracking — the engine's analog of the reference's
  * heartbeat/idle machinery (XmppPacketReader.getLastActive,
  * MXParser.java:277-281: whitespace keepalives update a lastActive
  * timestamp; consumers detect idle streams). Re-expressed on Spark's
  * own state machinery: per-key `GroupState` with an event-time timeout —
  * when the watermark passes lastActive+gap, the key is declared idle
  * and its summary is emitted.
  *
  * Scale: state is per-key-constant-size (two longs), partitioned by the
  * shuffle on the grouping key, checkpointed with the query — the same
  * unbounded-keys-bounded-state shape that holds at any fleet size.
  */
object Liveness {

  final case class Activity(user: String, ts: Timestamp)

  final case class UserState(lastActiveMs: Long, nEvents: Long)

  /** Emitted when a user goes idle (no activity for `gapSeconds` in
    * event time).
    */
  final case class WentIdle(
      user: String, lastActive: Timestamp, nEvents: Long)

  implicit private val stateEnc: Encoder[UserState] = Encoders.product[UserState]
  implicit private val outEnc: Encoder[WentIdle] = Encoders.product[WentIdle]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  /** @param activities watermarked stream of per-user activity
    * @param gapSeconds idle threshold in event time
    */
  def wentIdle(activities: Dataset[Activity], gapSeconds: Long): Dataset[WentIdle] = {
    activities
      .groupByKey(_.user)
      .flatMapGroupsWithState[UserState, WentIdle](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, events: Iterator[Activity], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(WentIdle(user, new Timestamp(s.lastActiveMs), s.nEvents))
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0L))
            var last = prev.lastActiveMs
            var n = prev.nEvents
            events.foreach { e =>
              n += 1
              if (e.ts.getTime > last) last = e.ts.getTime
            }
            state.update(UserState(last, n))
            state.setTimeoutTimestamp(last + gapSeconds * 1000L)
            Iterator.empty
          }
      }
  }
}
